/**
 * CUDA-platform kernels for the image-charge integrators.  Device code
 * lives in src/kernels/*.cu (compiled at runtime by the OpenMM CUDA
 * platform); this header declares the host-side drivers implementing
 * the contracts in openmmapi/include/ICKernels.h.
 */

#ifndef CUDA_IC_KERNELS_H_
#define CUDA_IC_KERNELS_H_

#include <utility>
#include <vector>

#include "CudaArray.h"
#include "CudaContext.h"
#include "ICKernels.h"

namespace ICPlugin {

class CudaIntegrateICLangevinStepKernel
    : public IntegrateICLangevinStepKernel {
 public:
    CudaIntegrateICLangevinStepKernel(std::string name,
                                      const OpenMM::Platform& platform,
                                      OpenMM::CudaContext& cu)
        : IntegrateICLangevinStepKernel(name, platform), cu(cu) {}

    void initialize(const OpenMM::System& system,
                    const ICLangevinIntegrator& integrator) override;
    void execute(OpenMM::ContextImpl& context,
                 const ICLangevinIntegrator& integrator) override;
    double computeKineticEnergy(
        OpenMM::ContextImpl& context,
        const ICLangevinIntegrator& integrator) override;

 private:
    void refreshInverseOrder();

    OpenMM::CudaContext& cu;
    OpenMM::CudaArray invAtomIndex;
    CUfunction velocityKernel = nullptr;
    CUfunction positionKernel = nullptr;
    CUfunction mirrorKernel = nullptr;
    CUfunction invertOrderKernel = nullptr;
    double cellZSize = -1.0;
    int numRealAtoms = 0;
};

class CudaIntegrateICDrudeLangevinStepKernel
    : public IntegrateICDrudeLangevinStepKernel {
 public:
    CudaIntegrateICDrudeLangevinStepKernel(
        std::string name, const OpenMM::Platform& platform,
        OpenMM::CudaContext& cu)
        : IntegrateICDrudeLangevinStepKernel(name, platform), cu(cu) {}

    void initialize(
        const OpenMM::System& system,
        const ICDrudeLangevinIntegrator& integrator) override;
    void execute(OpenMM::ContextImpl& context,
                 const ICDrudeLangevinIntegrator& integrator) override;
    double computeKineticEnergy(
        OpenMM::ContextImpl& context,
        const ICDrudeLangevinIntegrator& integrator) override;

 private:
    OpenMM::CudaContext& cu;
    OpenMM::CudaArray invAtomIndex;
    OpenMM::CudaArray normalParticles;
    OpenMM::CudaArray pairParticles;
    CUfunction normalKernel = nullptr;
    CUfunction pairKernel = nullptr;
    CUfunction positionKernel = nullptr;
    CUfunction hardWallKernel = nullptr;
    CUfunction mirrorKernel = nullptr;
    CUfunction invertOrderKernel = nullptr;
    double cellZSize = -1.0;
    int numRealAtoms = 0;
    int numNormal = 0;
    int numPairs = 0;
};

}  // namespace ICPlugin

#endif  // CUDA_IC_KERNELS_H_
