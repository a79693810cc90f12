/**
 * Image-charge dual-thermostat Drude Langevin integration, CUDA device
 * code.  Same math as ReferenceICKernels.cpp: normal particles are
 * thermostatted at T with (vscale, fscale, noise); Drude pairs split
 * into center-of-mass motion at T and internal (relative) motion at
 * T_drude with (vscaleDrude, fscaleDrude, noiseDrude).  Image cells
 * follow by mirroring (icMirrorImagePositions in ICLangevin.cu).
 */

/** Thermostatted velocity update for non-Drude particles.
 * particleIndices lists the real, massive, non-Drude atoms. */
extern "C" __global__ void icDrudeUpdateNormalVelocities(
    int numNormal, int paddedNumAtoms,
    const int* __restrict__ particleIndices,
    mixed4* __restrict__ velm, const long long* __restrict__ force,
    mixed4* __restrict__ posDelta, mixed vscale, mixed fscale,
    mixed noise, const mixed2* __restrict__ dt,
    const float4* __restrict__ random, unsigned int randomIndex) {
    const mixed forceToFloat = ((mixed)1) / (mixed)0x100000000;
    const mixed stepSize = dt[0].y;
    for (int i = blockIdx.x * blockDim.x + threadIdx.x; i < numNormal;
         i += blockDim.x * gridDim.x) {
        const int index = particleIndices[i];
        mixed4 v = velm[index];
        if (v.w == 0) continue;
        const mixed noiseScale = noise * SQRT(v.w);
        const float4 g = random[randomIndex + i];
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
        posDelta[index] =
            make_mixed4(stepSize * v.x, stepSize * v.y,
                        stepSize * v.z, 0);
    }
}

/** Dual-thermostat velocity update for Drude pairs.  pairIndices packs
 * (drude, core) index pairs; two independent Gaussian draws per pair
 * (COM channel, internal channel). */
extern "C" __global__ void icDrudeUpdatePairVelocities(
    int numPairs, int paddedNumAtoms,
    const int2* __restrict__ pairIndices, mixed4* __restrict__ velm,
    const long long* __restrict__ force, mixed4* __restrict__ posDelta,
    mixed vscale, mixed fscale, mixed noise, mixed vscaleDrude,
    mixed fscaleDrude, mixed noiseDrude,
    const mixed2* __restrict__ dt, const float4* __restrict__ random,
    unsigned int randomIndex) {
    const mixed forceToFloat = ((mixed)1) / (mixed)0x100000000;
    const mixed stepSize = dt[0].y;
    for (int i = blockIdx.x * blockDim.x + threadIdx.x; i < numPairs;
         i += blockDim.x * gridDim.x) {
        const int d = pairIndices[i].x;
        const int c = pairIndices[i].y;
        mixed4 vd = velm[d];
        mixed4 vc = velm[c];
        const mixed md = ((mixed)1) / vd.w;
        const mixed mc = ((mixed)1) / vc.w;
        const mixed mTot = md + mc;
        const mixed invTot = ((mixed)1) / mTot;
        const mixed reduced = md * mc * invTot;
        const mixed wd = md * invTot;  // mass fractions
        const mixed wc = mc * invTot;
        const float4 gCom = random[randomIndex + 2 * i];
        const float4 gRel = random[randomIndex + 2 * i + 1];
        const mixed comNoise = noise * SQRT(invTot);
        const mixed relNoise = noiseDrude * RSQRT(reduced);
        #pragma unroll
        for (int k = 0; k < 3; ++k) {
            const mixed fd = forceToFloat *
                force[d + k * paddedNumAtoms];
            const mixed fc = forceToFloat *
                force[c + k * paddedNumAtoms];
            const mixed velD = (&vd.x)[k];
            const mixed velC = (&vc.x)[k];
            const mixed vCom = wd * velD + wc * velC;
            const mixed vRel = velD - velC;
            const mixed fCom = fd + fc;
            const mixed fRel = wc * fd - wd * fc;
            const mixed gC = (&gCom.x)[k];
            const mixed gR = (&gRel.x)[k];
            const mixed newCom = vscale * vCom +
                                 fscale * fCom * invTot +
                                 comNoise * gC;
            const mixed newRel = vscaleDrude * vRel +
                                 fscaleDrude * fRel / reduced +
                                 relNoise * gR;
            (&vd.x)[k] = newCom + newRel * wc;
            (&vc.x)[k] = newCom - newRel * wd;
        }
        velm[d] = vd;
        velm[c] = vc;
        posDelta[d] = make_mixed4(stepSize * vd.x, stepSize * vd.y,
                                  stepSize * vd.z, 0);
        posDelta[c] = make_mixed4(stepSize * vc.x, stepSize * vc.y,
                                  stepSize * vc.z, 0);
    }
}

/** Hard-wall constraint: clamp each Drude displacement to maxDistance
 * about the pair's center of mass (post-position-update). */
extern "C" __global__ void icDrudeHardWall(
    int numPairs, const int2* __restrict__ pairIndices,
    real4* __restrict__ posq, real4* __restrict__ posqCorrection,
    const mixed4* __restrict__ velm, mixed maxDistance) {
    for (int i = blockIdx.x * blockDim.x + threadIdx.x; i < numPairs;
         i += blockDim.x * gridDim.x) {
        const int d = pairIndices[i].x;
        const int c = pairIndices[i].y;
#ifdef USE_MIXED_PRECISION
        const real4 dLo = posq[d], dHi = posqCorrection[d];
        const real4 cLo = posq[c], cHi = posqCorrection[c];
        mixed4 pd = make_mixed4(dLo.x + (mixed)dHi.x,
                                dLo.y + (mixed)dHi.y,
                                dLo.z + (mixed)dHi.z, dLo.w);
        mixed4 pc = make_mixed4(cLo.x + (mixed)cHi.x,
                                cLo.y + (mixed)cHi.y,
                                cLo.z + (mixed)cHi.z, cLo.w);
#else
        real4 pd = posq[d];
        real4 pc = posq[c];
#endif
        const mixed dx = pd.x - pc.x;
        const mixed dy = pd.y - pc.y;
        const mixed dz = pd.z - pc.z;
        const mixed dist = SQRT(dx * dx + dy * dy + dz * dz);
        if (dist <= maxDistance) continue;
        const mixed md = ((mixed)1) / velm[d].w;
        const mixed mc = ((mixed)1) / velm[c].w;
        const mixed invTot = ((mixed)1) / (md + mc);
        const mixed scale = maxDistance / dist;
        const mixed cx = (pd.x * md + pc.x * mc) * invTot;
        const mixed cy = (pd.y * md + pc.y * mc) * invTot;
        const mixed cz = (pd.z * md + pc.z * mc) * invTot;
        const mixed wd = md * invTot, wc = mc * invTot;
        pd.x = cx + dx * scale * wc;
        pd.y = cy + dy * scale * wc;
        pd.z = cz + dz * scale * wc;
        pc.x = cx - dx * scale * wd;
        pc.y = cy - dy * scale * wd;
        pc.z = cz - dz * scale * wd;
#ifdef USE_MIXED_PRECISION
        posq[d] = make_real4((real)pd.x, (real)pd.y, (real)pd.z,
                             dLo.w);
        posqCorrection[d] = make_real4(pd.x - (real)pd.x,
                                       pd.y - (real)pd.y,
                                       pd.z - (real)pd.z, 0);
        posq[c] = make_real4((real)pc.x, (real)pc.y, (real)pc.z,
                             cLo.w);
        posqCorrection[c] = make_real4(pc.x - (real)pc.x,
                                       pc.y - (real)pc.y,
                                       pc.z - (real)pc.z, 0);
#else
        posq[d] = pd;
        posq[c] = pc;
#endif
    }
}
