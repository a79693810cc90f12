/**
 * Drude-oscillator forces, CUDA device code: Thole-screened dipole
 * pairs and (an)isotropic core-shell springs.
 *
 * Same math as openmmapi/include/internal/DrudeForceMath.h (the
 * CPU-testable source of truth; see tests/test_drude_math.cpp for
 * the finite-difference force verification) — native equivalent of
 * the reference plugin's bundled force fragments
 * (/root/reference/lib/openmm-ic-plugin/platforms/cuda/src/kernels/
 * drudePairForce.cu, drudeParticleForce.cu).
 *
 * Build with the shared helpers prepended:
 *     cu.createModule(CudaICKernelSources::vecOps +
 *                     CudaICKernelSources::drudeForce, defines);
 * Runtime (nvrtc) compilation provides the real/mixed typedefs,
 * EXP/SQRT/RECIP/RSQRT intrinsic macros and the mixed/double energy
 * accumulator type (energyBuffer entries, one per thread).
 *
 * Screened pairs: each entry couples two Drude dipoles
 * (shell1, core1, shell2, core2) with params (a, qq) — a the Thole
 * damping coefficient thole / (alpha1 * alpha2)^(1/6), qq the Coulomb
 * constant times the product of the shell charges.  The four
 * charge-charge terms enter with sign products (+, -, -, +).
 *
 * Springs: each entry binds (shell, core) with isotropic stiffness
 * k3 and optional anisotropic stiffnesses k1, k2 along the axes
 * core->p1 and p2->p3.
 */

inline __device__ real ic_tholeScreening(real u) {
    return 1 - (1 + ((real)0.5) * u) * EXP(-u);
}

inline __device__ real ic_tholeScreeningDerivative(real u) {
    return ((real)0.5) * (1 + u) * EXP(-u);
}

/**
 * One screened charge pair: returns the energy, accumulates the
 * force on particle i into *fi (caller applies the opposite to j).
 */
inline __device__ real ic_tholePair(real3 ri, real3 rj, real qq,
                                    real a, real3* fi) {
    const real3 delta = ic_sub(ri, rj);
    const real r2 = ic_dot(delta, delta);
    const real rInv = RSQRT(r2);
    const real u = a * RECIP(rInv);
    const real s = ic_tholeScreening(u);
    const real coef =
        qq * rInv * rInv *
        (s * rInv - a * ic_tholeScreeningDerivative(u));
    *fi = ic_add(*fi, ic_scale(delta, coef));
    return qq * s * rInv;
}

/**
 * Thole-screened dipole-dipole interactions.  pairParticles holds
 * (shell1, core1, shell2, core2) indices; pairParams holds (a, qq).
 */
extern "C" __global__ void computeTholePairs(
    int numPairs, int paddedNumAtoms,
    const real4* __restrict__ posq,
    const int4* __restrict__ pairParticles,
    const float2* __restrict__ pairParams,
    unsigned long long* __restrict__ forceBuffers,
    mixed* __restrict__ energyBuffer) {
    mixed energy = 0;
    for (int index = blockIdx.x * blockDim.x + threadIdx.x;
         index < numPairs; index += blockDim.x * gridDim.x) {
        const int4 atoms = pairParticles[index];
        const float2 params = pairParams[index];
        const real a = params.x;
        const real qq = params.y;
        const real3 s1 = ic_xyz(posq[atoms.x]);
        const real3 c1 = ic_xyz(posq[atoms.y]);
        const real3 s2 = ic_xyz(posq[atoms.z]);
        const real3 c2 = ic_xyz(posq[atoms.w]);
        real3 fs1 = ic_make3(0, 0, 0);
        real3 fc1 = ic_make3(0, 0, 0);
        real3 fs2 = ic_make3(0, 0, 0);
        real3 fc2 = ic_make3(0, 0, 0);
        real3 f = ic_make3(0, 0, 0);

        f = ic_make3(0, 0, 0);
        energy += ic_tholePair(s1, s2, qq, a, &f);
        fs1 = ic_add(fs1, f);
        fs2 = ic_sub(fs2, f);

        f = ic_make3(0, 0, 0);
        energy += ic_tholePair(s1, c2, -qq, a, &f);
        fs1 = ic_add(fs1, f);
        fc2 = ic_sub(fc2, f);

        f = ic_make3(0, 0, 0);
        energy += ic_tholePair(c1, s2, -qq, a, &f);
        fc1 = ic_add(fc1, f);
        fs2 = ic_sub(fs2, f);

        f = ic_make3(0, 0, 0);
        energy += ic_tholePair(c1, c2, qq, a, &f);
        fc1 = ic_add(fc1, f);
        fc2 = ic_sub(fc2, f);

        ic_atomicAddForce(forceBuffers, atoms.x, paddedNumAtoms, fs1);
        ic_atomicAddForce(forceBuffers, atoms.y, paddedNumAtoms, fc1);
        ic_atomicAddForce(forceBuffers, atoms.z, paddedNumAtoms, fs2);
        ic_atomicAddForce(forceBuffers, atoms.w, paddedNumAtoms, fc2);
    }
    energyBuffer[blockIdx.x * blockDim.x + threadIdx.x] += energy;
}

/**
 * Core-shell springs.  springParticles holds (shell, core, p1, p2,
 * p3) indices (p* = -1 when the matching anisotropic term is
 * absent); springParams holds (k1, k2, k3) with k3 the isotropic
 * stiffness, k1 along core->p1 and k2 along p2->p3.
 */
extern "C" __global__ void computeDrudeSprings(
    int numSprings, int paddedNumAtoms,
    const real4* __restrict__ posq,
    const int* __restrict__ springParticles,  // 5 per spring
    const float4* __restrict__ springParams,
    unsigned long long* __restrict__ forceBuffers,
    mixed* __restrict__ energyBuffer) {
    mixed energy = 0;
    for (int index = blockIdx.x * blockDim.x + threadIdx.x;
         index < numSprings; index += blockDim.x * gridDim.x) {
        const int shell = springParticles[5 * index + 0];
        const int core = springParticles[5 * index + 1];
        const float4 params = springParams[index];
        const real3 rShell = ic_xyz(posq[shell]);
        const real3 rCore = ic_xyz(posq[core]);
        const real3 d = ic_sub(rShell, rCore);

        const real k3 = params.z;
        energy += ((real)0.5) * k3 * ic_dot(d, d);
        real3 fShell = ic_scale(d, -k3);
        real3 fCore = ic_scale(d, k3);

        for (int term = 0; term < 2; ++term) {
            const real k = term == 0 ? params.x : params.y;
            if (k == 0)
                continue;
            // Axis core->p1 for term 0, p2->p3 for term 1.
            const int ia = term == 0 ? core
                                     : springParticles[5 * index + 3];
            const int ib = term == 0 ? springParticles[5 * index + 2]
                                     : springParticles[5 * index + 4];
            const real3 ra = ic_xyz(posq[ia]);
            const real3 rb = ic_xyz(posq[ib]);
            real3 n = ic_sub(rb, ra);
            const real invLen = RSQRT(ic_dot(n, n));
            n = ic_scale(n, invLen);
            const real proj = ic_dot(d, n);
            energy += ((real)0.5) * k * proj * proj;
            const real3 onAxis = ic_scale(n, k * proj);
            const real3 transverse = ic_scale(
                ic_sub(d, ic_scale(n, proj)), k * proj * invLen);
            fShell = ic_sub(fShell, onAxis);
            fCore = ic_add(fCore, onAxis);
            ic_atomicAddForce(forceBuffers, ia, paddedNumAtoms,
                              transverse);
            ic_atomicAddForce(
                forceBuffers, ib, paddedNumAtoms,
                ic_scale(transverse, (real)-1));
        }

        ic_atomicAddForce(forceBuffers, shell, paddedNumAtoms,
                          fShell);
        ic_atomicAddForce(forceBuffers, core, paddedNumAtoms, fCore);
    }
    energyBuffer[blockIdx.x * blockDim.x + threadIdx.x] += energy;
}
