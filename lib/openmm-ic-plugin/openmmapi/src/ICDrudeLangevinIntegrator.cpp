#include "ICDrudeLangevinIntegrator.h"

#include <string>
#include <vector>

#include "ICKernels.h"
#include "openmm/Context.h"
#include "openmm/OpenMMException.h"
#include "openmm/internal/ContextImpl.h"

using namespace ICPlugin;
using namespace OpenMM;

ICDrudeLangevinIntegrator::ICDrudeLangevinIntegrator(
    double temperature, double frictionCoeff, double drudeTemperature,
    double drudeFrictionCoeff, double stepSize, int numCells,
    double cellZSize) {
    setTemperature(temperature);
    setFriction(frictionCoeff);
    setDrudeTemperature(drudeTemperature);
    setDrudeFriction(drudeFrictionCoeff);
    setMaxDrudeDistance(0);
    setStepSize(stepSize);
    setConstraintTolerance(1e-5);
    setRandomNumberSeed(0);
    setNumCells(numCells);
    setCellZSize(cellZSize);
}

void ICDrudeLangevinIntegrator::initialize(ContextImpl& contextRef) {
    if (owner != NULL && &contextRef.getOwner() != owner)
        throw OpenMMException(
            "This Integrator is already bound to a context");
    context = &contextRef;
    owner = &contextRef.getOwner();
    if (cellZSize <= 0) {
        Vec3 a, b, c;
        contextRef.getOwner().getState(0).getPeriodicBoxVectors(a, b, c);
        cellZSize = c[2] / numCells;
    }
    kernel = context->getPlatform().createKernel(
        IntegrateICDrudeLangevinStepKernel::Name(), contextRef);
    kernel.getAs<IntegrateICDrudeLangevinStepKernel>().initialize(
        contextRef.getSystem(), *this);
}

std::vector<std::string> ICDrudeLangevinIntegrator::getKernelNames() {
    std::vector<std::string> names;
    names.push_back(IntegrateICDrudeLangevinStepKernel::Name());
    return names;
}

double ICDrudeLangevinIntegrator::computeKineticEnergy() {
    return kernel.getAs<IntegrateICDrudeLangevinStepKernel>()
        .computeKineticEnergy(*context, *this);
}

void ICDrudeLangevinIntegrator::step(int steps) {
    if (context == NULL)
        throw OpenMMException(
            "This Integrator is not bound to a context");
    for (int i = 0; i < steps; ++i) {
        context->updateContextState();
        context->calcForcesAndEnergy(true, false);
        kernel.getAs<IntegrateICDrudeLangevinStepKernel>().execute(
            *context, *this);
    }
}
