/**
 * Drude (polarizable) Langevin integrator with image-charge
 * bookkeeping: dual thermostat (center-of-mass motion and internal
 * Drude degrees of freedom), optional hard-wall constraint on the
 * Drude displacement, and per-step image mirroring.
 *
 * Public API parity:
 * /root/reference/lib/openmm-ic-plugin/openmmapi/include/
 * ICDrudeLangevinIntegrator.h.
 */

#ifndef OPENMM_ICDRUDELANGEVININTEGRATOR_H_
#define OPENMM_ICDRUDELANGEVININTEGRATOR_H_

#include <string>
#include <vector>

#include "internal/windowsExportIC.h"
#include "openmm/Integrator.h"
#include "openmm/Kernel.h"
#include "openmm/OpenMMException.h"

namespace ICPlugin {

class OPENMM_EXPORT_IC ICDrudeLangevinIntegrator
    : public OpenMM::Integrator {
 public:
    ICDrudeLangevinIntegrator(double temperature, double frictionCoeff,
                              double drudeTemperature,
                              double drudeFrictionCoeff, double stepSize,
                              int numCells = 2, double cellZSize = -1);

    double getTemperature() const { return temperature; }
    void setTemperature(double temp) {
        if (temp < 0)
            throw OpenMM::OpenMMException("Temperature cannot be negative");
        temperature = temp;
    }

    double getFriction() const { return friction; }
    void setFriction(double coeff) {
        if (coeff < 0)
            throw OpenMM::OpenMMException(
                "Friction coefficient cannot be negative");
        friction = coeff;
    }

    double getDrudeTemperature() const { return drudeTemperature; }
    void setDrudeTemperature(double temp) {
        if (temp < 0)
            throw OpenMM::OpenMMException("Temperature cannot be negative");
        drudeTemperature = temp;
    }

    double getDrudeFriction() const { return drudeFriction; }
    void setDrudeFriction(double coeff) {
        if (coeff < 0)
            throw OpenMM::OpenMMException(
                "Friction coefficient cannot be negative");
        drudeFriction = coeff;
    }

    /** Maximum Drude-core distance (nm); 0 disables the hard wall. */
    double getMaxDrudeDistance() const { return maxDrudeDistance; }
    void setMaxDrudeDistance(double distance) {
        if (distance < 0)
            throw OpenMM::OpenMMException(
                "Max Drude distance cannot be negative");
        maxDrudeDistance = distance;
    }

    int getRandomNumberSeed() const { return randomNumberSeed; }
    void setRandomNumberSeed(int seed) { randomNumberSeed = seed; }

    int getNumCells() const { return numCells; }
    void setNumCells(int cells) { numCells = cells; }

    double getCellZSize() const { return cellZSize; }
    void setCellZSize(double size) { cellZSize = size; }

    void step(int steps);

 protected:
    void initialize(OpenMM::ContextImpl& context);
    void cleanup() { kernel = OpenMM::Kernel(); }
    std::vector<std::string> getKernelNames();
    double computeKineticEnergy();

 private:
    double temperature, friction, drudeTemperature, drudeFriction;
    double maxDrudeDistance, cellZSize;
    int randomNumberSeed, numCells;
    OpenMM::Kernel kernel;
};

}  // namespace ICPlugin

#endif  // OPENMM_ICDRUDELANGEVININTEGRATOR_H_
