/**
 * Factory registering the CUDA implementations of the image-charge
 * integrator kernels with OpenMM's CUDA platform.
 */

#ifndef CUDA_IC_KERNEL_FACTORY_H_
#define CUDA_IC_KERNEL_FACTORY_H_

#include "openmm/KernelFactory.h"

namespace ICPlugin {

class CudaICKernelFactory : public OpenMM::KernelFactory {
 public:
    OpenMM::KernelImpl* createKernelImpl(
        std::string name, const OpenMM::Platform& platform,
        OpenMM::ContextImpl& context) const override;
};

}  // namespace ICPlugin

#endif  // CUDA_IC_KERNEL_FACTORY_H_
