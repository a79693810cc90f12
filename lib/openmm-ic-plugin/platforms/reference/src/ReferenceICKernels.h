/**
 * CPU (Reference platform) implementations of the image-charge
 * integrator kernels.  The reference repository ships CUDA kernels
 * only; this Reference-platform backend makes the plugin usable
 * without a GPU and serves as the behavioral oracle for the device
 * implementations.
 */

#ifndef REFERENCE_IC_KERNELS_H_
#define REFERENCE_IC_KERNELS_H_

#include <vector>

#include "ICKernels.h"
#include "openmm/reference/ReferencePlatform.h"

namespace ICPlugin {

class ReferenceIntegrateICLangevinStepKernel
    : public IntegrateICLangevinStepKernel {
 public:
    ReferenceIntegrateICLangevinStepKernel(
        std::string name, const OpenMM::Platform& platform)
        : IntegrateICLangevinStepKernel(name, platform) {}

    void initialize(const OpenMM::System& system,
                    const ICLangevinIntegrator& integrator) override;
    void execute(OpenMM::ContextImpl& context,
                 const ICLangevinIntegrator& integrator) override;
    double computeKineticEnergy(
        OpenMM::ContextImpl& context,
        const ICLangevinIntegrator& integrator) override;

 private:
    std::vector<double> masses;
    std::vector<OpenMM::Vec3> previous;
    int numRealAtoms = 0;
};

class ReferenceIntegrateICDrudeLangevinStepKernel
    : public IntegrateICDrudeLangevinStepKernel {
 public:
    ReferenceIntegrateICDrudeLangevinStepKernel(
        std::string name, const OpenMM::Platform& platform)
        : IntegrateICDrudeLangevinStepKernel(name, platform) {}

    void initialize(
        const OpenMM::System& system,
        const ICDrudeLangevinIntegrator& integrator) override;
    void execute(OpenMM::ContextImpl& context,
                 const ICDrudeLangevinIntegrator& integrator) override;
    double computeKineticEnergy(
        OpenMM::ContextImpl& context,
        const ICDrudeLangevinIntegrator& integrator) override;

 private:
    std::vector<double> masses;
    std::vector<int> normalParticles;
    std::vector<std::pair<int, int>> drudePairs;  // (drude, core)
    int numRealAtoms = 0;
};

}  // namespace ICPlugin

#endif  // REFERENCE_IC_KERNELS_H_
