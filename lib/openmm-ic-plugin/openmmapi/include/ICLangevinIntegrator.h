/**
 * Langevin integrator with image-charge bookkeeping: after every step
 * the positions of the image particles in cells 1..numCells-1 are
 * rewritten as mirrors of the real particles in cell 0.
 *
 * Public API parity:
 * /root/reference/lib/openmm-ic-plugin/openmmapi/include/
 * ICLangevinIntegrator.h:10-157.
 */

#ifndef OPENMM_ICLANGEVININTEGRATOR_H_
#define OPENMM_ICLANGEVININTEGRATOR_H_

#include <string>
#include <vector>

#include "internal/windowsExportIC.h"
#include "openmm/Integrator.h"
#include "openmm/Kernel.h"
#include "openmm/OpenMMException.h"

namespace ICPlugin {

class OPENMM_EXPORT_IC ICLangevinIntegrator : public OpenMM::Integrator {
 public:
    /**
     * @param temperature  heat-bath temperature (K)
     * @param frictionCoeff  friction (1/ps)
     * @param stepSize  step size (ps)
     * @param numCells  number of cells along z (cell 0 = real atoms)
     * @param cellZSize  z-extent of one cell (nm); -1 derives it from
     *                   the periodic box (box_z / numCells)
     */
    ICLangevinIntegrator(double temperature, double frictionCoeff,
                         double stepSize, int numCells = 2,
                         double cellZSize = -1);

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
    double temperature, friction, cellZSize;
    int randomNumberSeed, numCells;
    OpenMM::Kernel kernel;
};

}  // namespace ICPlugin

#endif  // OPENMM_ICLANGEVININTEGRATOR_H_
