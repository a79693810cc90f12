/**
 * Registers the Reference-platform implementations of the image-charge
 * kernels with OpenMM's plugin machinery.
 */

#include <exception>

#include "ICKernels.h"
#include "ReferenceICKernels.h"
#include "openmm/OpenMMException.h"
#include "openmm/internal/windowsExport.h"
#include "openmm/reference/ReferencePlatform.h"

using namespace ICPlugin;
using namespace OpenMM;

namespace {

class ReferenceICKernelFactory : public KernelFactory {
 public:
    KernelImpl* createKernelImpl(std::string name,
                                 const Platform& platform,
                                 ContextImpl& context) const override {
        if (name == IntegrateICLangevinStepKernel::Name())
            return new ReferenceIntegrateICLangevinStepKernel(name,
                                                              platform);
        if (name == IntegrateICDrudeLangevinStepKernel::Name())
            return new ReferenceIntegrateICDrudeLangevinStepKernel(
                name, platform);
        throw OpenMMException(
            "Unknown kernel name '" + name + "'");
    }
};

}  // namespace

extern "C" OPENMM_EXPORT void registerPlatforms() {}

extern "C" OPENMM_EXPORT void registerKernelFactories() {
    for (int i = 0; i < Platform::getNumPlatforms(); ++i) {
        Platform& platform = Platform::getPlatform(i);
        if (dynamic_cast<ReferencePlatform*>(&platform) != nullptr) {
            auto* factory = new ReferenceICKernelFactory();
            platform.registerKernelFactory(
                IntegrateICLangevinStepKernel::Name(), factory);
            platform.registerKernelFactory(
                IntegrateICDrudeLangevinStepKernel::Name(), factory);
        }
    }
}
