/**
 * Image-charge Langevin integration, CUDA device code.
 *
 * Same math as the Reference platform
 * (platforms/reference/src/ReferenceICKernels.cpp) and the shared
 * coefficient definitions in openmmapi/include/internal/ICMirror.h:
 * velocities decay by vscale, get a fscale/m force kick and a
 * noise*sqrt(1/m) thermal kick; positions advance by v*dt; image-cell
 * particles are massless and follow by iterated z-mirroring
 * z_i = -z_{i-1} + 2*i*cellZSize.
 *
 * Compiled at runtime by the OpenMM CUDA platform (nvrtc), which
 * provides the real/mixed typedefs and optionally defines
 * USE_MIXED_PRECISION.
 */

/**
 * Velocity half of the step: thermostatted velocity update, then stage
 * the displacement in posDelta so constraints can act before positions
 * commit.  coefficients = (vscale, fscale, noise).
 */
extern "C" __global__ void icLangevinUpdateVelocities(
    int numAtoms, int paddedNumAtoms, mixed4* __restrict__ velm,
    const long long* __restrict__ force, mixed4* __restrict__ posDelta,
    mixed vscale, mixed fscale, mixed noise,
    const mixed2* __restrict__ dt, const float4* __restrict__ random,
    unsigned int randomIndex) {
    const mixed forceToFloat = ((mixed)1) / (mixed)0x100000000;
    const mixed stepSize = dt[0].y;
    for (int index = blockIdx.x * blockDim.x + threadIdx.x;
         index < numAtoms; index += blockDim.x * gridDim.x) {
        mixed4 v = velm[index];
        if (v.w != 0) {  // v.w = 1/m; image particles are massless
            const mixed noiseScale = noise * SQRT(v.w);
            const float4 g = random[randomIndex + index];
            v.x = vscale * v.x +
                  fscale * v.w * forceToFloat * force[index] +
                  noiseScale * g.x;
            v.y = vscale * v.y +
                  fscale * v.w * forceToFloat *
                      force[index + paddedNumAtoms] +
                  noiseScale * g.y;
            v.z = vscale * v.z +
                  fscale * v.w * forceToFloat *
                      force[index + 2 * paddedNumAtoms] +
                  noiseScale * g.z;
            velm[index] = v;
            posDelta[index] = make_mixed4(
                stepSize * v.x, stepSize * v.y, stepSize * v.z, 0);
        }
    }
}

/**
 * Position half of the step: commit the (possibly constraint-adjusted)
 * posDelta and recover the effective velocity delta/dt.
 */
extern "C" __global__ void icLangevinUpdatePositions(
    int numAtoms, real4* __restrict__ posq,
    const mixed4* __restrict__ posDelta, mixed4* __restrict__ velm,
    const mixed2* __restrict__ dt,
    real4* __restrict__ posqCorrection) {
    const mixed invStepSize = ((mixed)1) / dt[0].y;
    for (int index = blockIdx.x * blockDim.x + threadIdx.x;
         index < numAtoms; index += blockDim.x * gridDim.x) {
        mixed4 v = velm[index];
        if (v.w != 0) {
            const mixed4 delta = posDelta[index];
#ifdef USE_MIXED_PRECISION
            const real4 lo = posq[index];
            const real4 hi = posqCorrection[index];
            mixed4 pos = make_mixed4(lo.x + (mixed)hi.x,
                                     lo.y + (mixed)hi.y,
                                     lo.z + (mixed)hi.z, lo.w);
#else
            real4 pos = posq[index];
#endif
            pos.x += delta.x;
            pos.y += delta.y;
            pos.z += delta.z;
            v.x = invStepSize * delta.x;
            v.y = invStepSize * delta.y;
            v.z = invStepSize * delta.z;
#ifdef USE_MIXED_PRECISION
            posq[index] = make_real4((real)pos.x, (real)pos.y,
                                     (real)pos.z, (real)pos.w);
            posqCorrection[index] =
                make_real4(pos.x - (real)pos.x, pos.y - (real)pos.y,
                           pos.z - (real)pos.z, 0);
#else
            posq[index] = pos;
#endif
            velm[index] = v;
        }
    }
}

/**
 * Rewrite every image cell's positions as mirrors of the real atoms:
 * z_cell = -z_{cell-1} + 2*cell*cellZSize (ICMirror.h::mirrorZ).  The
 * CUDA platform stores atoms in a reordered layout, so real atom i's
 * storage slot is invAtomIndex[i] and its cell-c image lives at
 * invAtomIndex[i + c*numRealAtoms].  One thread per real atom.
 */
extern "C" __global__ void icMirrorImagePositions(
    int numRealAtoms, int numCells, double cellZSize,
    real4* __restrict__ posq, real4* __restrict__ posqCorrection,
    const int* __restrict__ invAtomIndex) {
    for (int index = blockIdx.x * blockDim.x + threadIdx.x;
         index < numRealAtoms; index += blockDim.x * gridDim.x) {
        const int slot0 = invAtomIndex[index];
        const real4 base = posq[slot0];
        if (base.w != base.w)  // NaN charge: uninitialized slot
            continue;
#ifdef USE_MIXED_PRECISION
        const real4 hi = posqCorrection[slot0];
        mixed4 pos = make_mixed4(base.x + (mixed)hi.x,
                                 base.y + (mixed)hi.y,
                                 base.z + (mixed)hi.z, base.w);
#else
        real4 pos = base;
#endif
        for (int cell = 1; cell < numCells; ++cell) {
            const int slot = invAtomIndex[index + cell * numRealAtoms];
            pos.z = -pos.z + cellZSize * (2 * cell);
            pos.w = posq[slot].w;  // keep the image's own charge
#ifdef USE_MIXED_PRECISION
            posq[slot] = make_real4((real)pos.x, (real)pos.y,
                                    (real)pos.z, (real)pos.w);
            posqCorrection[slot] =
                make_real4(pos.x - (real)pos.x, pos.y - (real)pos.y,
                           pos.z - (real)pos.z, 0);
#else
            posq[slot] = pos;
#endif
        }
    }
}

/**
 * Refresh the atom-order inverse map after the platform reorders
 * atoms: invAtomIndex[original] = storage slot.
 */
extern "C" __global__ void icInvertAtomOrder(
    int numAtoms, const int* __restrict__ atomIndex,
    int* __restrict__ invAtomIndex) {
    for (int index = blockIdx.x * blockDim.x + threadIdx.x;
         index < numAtoms; index += blockDim.x * gridDim.x)
        invAtomIndex[atomIndex[index]] = index;
}
