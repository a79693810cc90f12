#include "CudaICKernelFactory.h"

#include <exception>

#include "CudaContext.h"
#include "CudaICKernels.h"
#include "CudaPlatform.h"
#include "openmm/OpenMMException.h"
#include "openmm/internal/ContextImpl.h"
#include "openmm/internal/windowsExport.h"

using namespace ICPlugin;
using namespace OpenMM;

extern "C" OPENMM_EXPORT void registerPlatforms() {}

extern "C" OPENMM_EXPORT void registerKernelFactories() {
    try {
        Platform& platform = Platform::getPlatformByName("CUDA");
        CudaICKernelFactory* factory = new CudaICKernelFactory();
        platform.registerKernelFactory(
            IntegrateICLangevinStepKernel::Name(), factory);
        platform.registerKernelFactory(
            IntegrateICDrudeLangevinStepKernel::Name(), factory);
    } catch (std::exception&) {
        // CUDA platform unavailable: nothing to register.
    }
}

extern "C" OPENMM_EXPORT void registerICCudaKernelFactories() {
    registerKernelFactories();
}

KernelImpl* CudaICKernelFactory::createKernelImpl(
    std::string name, const Platform& platform,
    ContextImpl& context) const {
    CudaContext& cu = *static_cast<CudaPlatform::PlatformData*>(
                           context.getPlatformData())
                           ->contexts[0];
    if (name == IntegrateICLangevinStepKernel::Name())
        return new CudaIntegrateICLangevinStepKernel(name, platform,
                                                     cu);
    if (name == IntegrateICDrudeLangevinStepKernel::Name())
        return new CudaIntegrateICDrudeLangevinStepKernel(
            name, platform, cu);
    throw OpenMMException(
        "Tried to create illegal kernel name '" + name + "'");
}
