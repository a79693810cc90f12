/**
 * Platform-independent kernel contracts for the image-charge
 * integrators (parity:
 * /root/reference/lib/openmm-ic-plugin/openmmapi/include/ICKernels.h).
 */

#ifndef IC_KERNELS_H_
#define IC_KERNELS_H_

#include <string>

#include "ICDrudeLangevinIntegrator.h"
#include "ICLangevinIntegrator.h"
#include "openmm/KernelImpl.h"
#include "openmm/Platform.h"
#include "openmm/System.h"

namespace ICPlugin {

class IntegrateICLangevinStepKernel : public OpenMM::KernelImpl {
 public:
    static std::string Name() { return "IntegrateICLangevinStep"; }

    IntegrateICLangevinStepKernel(std::string name,
                                  const OpenMM::Platform& platform)
        : OpenMM::KernelImpl(name, platform) {}

    virtual void initialize(const OpenMM::System& system,
                            const ICLangevinIntegrator& integrator) = 0;
    virtual void execute(OpenMM::ContextImpl& context,
                         const ICLangevinIntegrator& integrator) = 0;
    virtual double computeKineticEnergy(
        OpenMM::ContextImpl& context,
        const ICLangevinIntegrator& integrator) = 0;
};

class IntegrateICDrudeLangevinStepKernel : public OpenMM::KernelImpl {
 public:
    static std::string Name() { return "IntegrateICDrudeLangevinStep"; }

    IntegrateICDrudeLangevinStepKernel(std::string name,
                                       const OpenMM::Platform& platform)
        : OpenMM::KernelImpl(name, platform) {}

    virtual void initialize(
        const OpenMM::System& system,
        const ICDrudeLangevinIntegrator& integrator) = 0;
    virtual void execute(OpenMM::ContextImpl& context,
                         const ICDrudeLangevinIntegrator& integrator) = 0;
    virtual double computeKineticEnergy(
        OpenMM::ContextImpl& context,
        const ICDrudeLangevinIntegrator& integrator) = 0;
};

}  // namespace ICPlugin

#endif  // IC_KERNELS_H_
