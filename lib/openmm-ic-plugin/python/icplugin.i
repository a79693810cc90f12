/* SWIG interface exposing the image-charge integrators as the
 * `openmm_ic` Python package (parity:
 * /root/reference/lib/openmm-ic-plugin/python/icplugin.i). */

%module openmm_ic

%import(module="openmm") "swig/OpenMMSwigHeaders.i"
%include "swig/typemaps.i"
%include <std_string.i>

%{
#include "ICDrudeLangevinIntegrator.h"
#include "ICLangevinIntegrator.h"
#include "OpenMM.h"
#include "OpenMMAmoeba.h"
#include "OpenMMDrude.h"
#include "openmm/RPMDIntegrator.h"
#include "openmm/RPMDMonteCarloBarostat.h"
%}

%pythoncode %{
from openmm import unit
%}

/* Unit-annotated getters, pint-style. */
%pythonappend ICPlugin::ICLangevinIntegrator::getTemperature() const %{
    val = unit.Quantity(val, unit.kelvin)
%}
%pythonappend ICPlugin::ICLangevinIntegrator::getFriction() const %{
    val = unit.Quantity(val, 1 / unit.picosecond)
%}
%pythonappend ICPlugin::ICLangevinIntegrator::getCellZSize() const %{
    val = unit.Quantity(val, unit.nanometer)
%}
%pythonappend ICPlugin::ICDrudeLangevinIntegrator::getTemperature() const %{
    val = unit.Quantity(val, unit.kelvin)
%}
%pythonappend ICPlugin::ICDrudeLangevinIntegrator::getFriction() const %{
    val = unit.Quantity(val, 1 / unit.picosecond)
%}
%pythonappend ICPlugin::ICDrudeLangevinIntegrator::getDrudeTemperature() const %{
    val = unit.Quantity(val, unit.kelvin)
%}
%pythonappend ICPlugin::ICDrudeLangevinIntegrator::getDrudeFriction() const %{
    val = unit.Quantity(val, 1 / unit.picosecond)
%}
%pythonappend ICPlugin::ICDrudeLangevinIntegrator::getMaxDrudeDistance() const %{
    val = unit.Quantity(val, unit.nanometer)
%}
%pythonappend ICPlugin::ICDrudeLangevinIntegrator::getCellZSize() const %{
    val = unit.Quantity(val, unit.nanometer)
%}

namespace ICPlugin {

class ICLangevinIntegrator : public OpenMM::Integrator {
 public:
    ICLangevinIntegrator(double temperature, double frictionCoeff,
                         double stepSize, int numCells = 2,
                         double cellZSize = -1);
    double getTemperature() const;
    void setTemperature(double temp);
    double getFriction() const;
    void setFriction(double coeff);
    int getRandomNumberSeed() const;
    void setRandomNumberSeed(int seed);
    int getNumCells() const;
    void setNumCells(int cells);
    double getCellZSize() const;
    void setCellZSize(double size);
    virtual void step(int steps);
};

class ICDrudeLangevinIntegrator : public OpenMM::Integrator {
 public:
    ICDrudeLangevinIntegrator(double temperature, double frictionCoeff,
                              double drudeTemperature,
                              double drudeFrictionCoeff, double stepSize,
                              int numCells = 2, double cellZSize = -1);
    double getTemperature() const;
    void setTemperature(double temp);
    double getFriction() const;
    void setFriction(double coeff);
    double getDrudeTemperature() const;
    void setDrudeTemperature(double temp);
    double getDrudeFriction() const;
    void setDrudeFriction(double coeff);
    double getMaxDrudeDistance() const;
    void setMaxDrudeDistance(double distance);
    int getRandomNumberSeed() const;
    void setRandomNumberSeed(int seed);
    int getNumCells() const;
    void setNumCells(int cells);
    double getCellZSize() const;
    void setCellZSize(double size);
    virtual void step(int steps);
};

}  // namespace ICPlugin
