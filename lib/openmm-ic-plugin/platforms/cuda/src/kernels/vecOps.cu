/**
 * Minimal device vector helpers shared by the force kernels
 * (drudeForce.cu): prepend this source when building their module,
 *     cu.createModule(CudaICKernelSources::vecOps +
 *                     CudaICKernelSources::drudeForce, defines);
 *
 * Native equivalent of the reference plugin's bundled blanket
 * operator library (/root/reference/lib/openmm-ic-plugin/platforms/
 * cuda/src/kernels/vectorOps.cu, 678 lines duplicating OpenMM's
 * internal helpers) — reduced to the operations the force kernels
 * actually use.  The integrator kernels (icLangevin.cu,
 * icDrudeLangevin.cu) stay self-contained component math and do not
 * need this file.
 */

inline __device__ real3 ic_make3(real x, real y, real z) {
    return make_real3(x, y, z);
}

inline __device__ real3 ic_sub(real3 a, real3 b) {
    return make_real3(a.x - b.x, a.y - b.y, a.z - b.z);
}

inline __device__ real3 ic_add(real3 a, real3 b) {
    return make_real3(a.x + b.x, a.y + b.y, a.z + b.z);
}

inline __device__ real3 ic_scale(real3 a, real s) {
    return make_real3(a.x * s, a.y * s, a.z * s);
}

inline __device__ real ic_dot(real3 a, real3 b) {
    return a.x * b.x + a.y * b.y + a.z * b.z;
}

inline __device__ real3 ic_xyz(real4 a) {
    return make_real3(a.x, a.y, a.z);
}

/**
 * Accumulate a real3 force into OpenMM's 64-bit fixed-point force
 * buffer (x, y, z planes of paddedNumAtoms entries each).
 */
inline __device__ void ic_atomicAddForce(
    unsigned long long* __restrict__ forceBuffers, int index,
    int paddedNumAtoms, real3 f) {
    atomicAdd(&forceBuffers[index],
              static_cast<unsigned long long>(
                  static_cast<long long>(f.x * 0x100000000)));
    atomicAdd(&forceBuffers[index + paddedNumAtoms],
              static_cast<unsigned long long>(
                  static_cast<long long>(f.y * 0x100000000)));
    atomicAdd(&forceBuffers[index + 2 * paddedNumAtoms],
              static_cast<unsigned long long>(
                  static_cast<long long>(f.z * 0x100000000)));
}
