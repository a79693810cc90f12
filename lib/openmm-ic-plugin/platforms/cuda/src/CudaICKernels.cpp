/**
 * Host-side drivers for the CUDA image-charge integrator kernels.
 * Integration math and mirroring semantics are single-sourced with the
 * Reference platform through ICMirror.h (langevinCoefficients,
 * mirrorZ); this file only marshals device buffers and launches.
 */

#include "CudaICKernels.h"

#include <cmath>
#include <map>
#include <string>
#include <vector>

#include "CudaICKernelSources.h"
#include "CudaIntegrationUtilities.h"
#include "internal/ICMirror.h"
#include "openmm/DrudeForce.h"
#include "openmm/OpenMMException.h"
#include "openmm/internal/ContextImpl.h"
#include "openmm/reference/SimTKOpenMMRealType.h"

using namespace ICPlugin;
using namespace OpenMM;

/** Shared validation: image cells hold exactly one massless copy of
 * every real atom, and the box height matches numCells cells. */
static double validateImageCells(const System& system, int numCells,
                                 double cellZSize, int* numRealAtoms) {
    if (numCells % 2 != 0)
        throw OpenMMException("Number of cells must be even");
    const int numAtoms = system.getNumParticles();
    if (numAtoms % numCells != 0)
        throw OpenMMException(
            "Number of particles is not a multiple of the number of "
            "cells");
    *numRealAtoms = numAtoms / numCells;
    for (int i = *numRealAtoms; i < numAtoms; ++i)
        if (system.getParticleMass(i) != 0.0)
            throw OpenMMException("Image particle has nonzero mass");
    Vec3 a, b, c;
    system.getDefaultPeriodicBoxVectors(a, b, c);
    if (cellZSize < 0) return c[2] / numCells;
    if (cellZSize * numCells != c[2])
        throw OpenMMException(
            "Unit cell dimension does not match the provided "
            "cellZSize value");
    return cellZSize;
}

// ----------------------------------------------------------------------
// ICLangevin
// ----------------------------------------------------------------------

void CudaIntegrateICLangevinStepKernel::initialize(
    const System& system, const ICLangevinIntegrator& integrator) {
    cu.getPlatformData().initializeContexts(system);
    cu.setAsCurrent();
    cu.getIntegrationUtilities().initRandomNumberGenerator(
        integrator.getRandomNumberSeed());
    cellZSize = validateImageCells(system, integrator.getNumCells(),
                                   integrator.getCellZSize(),
                                   &numRealAtoms);
    std::map<std::string, std::string> defines;
    CUmodule module =
        cu.createModule(CudaICKernelSources::icLangevin, defines);
    velocityKernel = cu.getKernel(module, "icLangevinUpdateVelocities");
    positionKernel = cu.getKernel(module, "icLangevinUpdatePositions");
    mirrorKernel = cu.getKernel(module, "icMirrorImagePositions");
    invertOrderKernel = cu.getKernel(module, "icInvertAtomOrder");
    invAtomIndex.initialize<int>(cu, cu.getPaddedNumAtoms(),
                                 "icInvAtomIndex");
}

void CudaIntegrateICLangevinStepKernel::refreshInverseOrder() {
    int numAtoms = cu.getNumAtoms();
    void* args[] = {&numAtoms,
                    &cu.getAtomIndexArray().getDevicePointer(),
                    &invAtomIndex.getDevicePointer()};
    cu.executeKernel(invertOrderKernel, args, numAtoms, 128);
}

void CudaIntegrateICLangevinStepKernel::execute(
    ContextImpl& context, const ICLangevinIntegrator& integrator) {
    cu.setAsCurrent();
    CudaIntegrationUtilities& integration =
        cu.getIntegrationUtilities();
    int numAtoms = cu.getNumAtoms();
    int paddedNumAtoms = cu.getPaddedNumAtoms();
    const double stepSize = integrator.getStepSize();
    integration.setNextStepSize(stepSize);

    // Single-source coefficients (ICMirror.h).
    const double kT = BOLTZ * integrator.getTemperature();
    const auto coeff = ICPlugin::langevinCoefficients(
        integrator.getFriction(), stepSize, kT);

    if (cu.getAtomsWereReordered() || cu.getStepCount() == 0)
        refreshInverseOrder();

    const bool useDouble =
        cu.getUseDoublePrecision() || cu.getUseMixedPrecision();
    int randomIndex =
        integration.prepareRandomNumbers(cu.getPaddedNumAtoms());
    float vscaleF = (float)coeff.vscale, fscaleF = (float)coeff.fscale,
          noiseF = (float)coeff.noise;
    double vscaleD = coeff.vscale, fscaleD = coeff.fscale,
           noiseD = coeff.noise;
    void* vscale = useDouble ? (void*)&vscaleD : (void*)&vscaleF;
    void* fscale = useDouble ? (void*)&fscaleD : (void*)&fscaleF;
    void* noise = useDouble ? (void*)&noiseD : (void*)&noiseF;

    void* argsVel[] = {&numAtoms,
                       &paddedNumAtoms,
                       &cu.getVelm().getDevicePointer(),
                       &cu.getForce().getDevicePointer(),
                       &integration.getPosDelta().getDevicePointer(),
                       vscale,
                       fscale,
                       noise,
                       &integration.getStepSize().getDevicePointer(),
                       &integration.getRandom().getDevicePointer(),
                       &randomIndex};
    cu.executeKernel(velocityKernel, argsVel, numAtoms, 128);

    integration.applyConstraints(integrator.getConstraintTolerance());

    CUdeviceptr posCorrection =
        (cu.getUseMixedPrecision()
             ? cu.getPosqCorrection().getDevicePointer()
             : 0);
    void* argsPos[] = {&numAtoms,
                       &cu.getPosq().getDevicePointer(),
                       &integration.getPosDelta().getDevicePointer(),
                       &cu.getVelm().getDevicePointer(),
                       &integration.getStepSize().getDevicePointer(),
                       &posCorrection};
    cu.executeKernel(positionKernel, argsPos, numAtoms, 128);
    integration.computeVirtualSites();

    int numCells = integrator.getNumCells();
    void* argsMirror[] = {&numRealAtoms,
                          &numCells,
                          &cellZSize,
                          &cu.getPosq().getDevicePointer(),
                          &posCorrection,
                          &invAtomIndex.getDevicePointer()};
    cu.executeKernel(mirrorKernel, argsMirror, numRealAtoms, 128);

    cu.setTime(cu.getTime() + stepSize);
    cu.setStepCount(cu.getStepCount() + 1);
    cu.reorderAtoms();
    if (cu.getAtomsWereReordered()) refreshInverseOrder();
}

double CudaIntegrateICLangevinStepKernel::computeKineticEnergy(
    ContextImpl& context, const ICLangevinIntegrator& integrator) {
    return cu.getIntegrationUtilities().computeKineticEnergy(
        0.5 * integrator.getStepSize());
}

// ----------------------------------------------------------------------
// ICDrudeLangevin
// ----------------------------------------------------------------------

void CudaIntegrateICDrudeLangevinStepKernel::initialize(
    const System& system, const ICDrudeLangevinIntegrator& integrator) {
    cu.getPlatformData().initializeContexts(system);
    cu.setAsCurrent();
    cu.getIntegrationUtilities().initRandomNumberGenerator(
        (unsigned int)integrator.getRandomNumberSeed());
    cellZSize = validateImageCells(system, integrator.getNumCells(),
                                   integrator.getCellZSize(),
                                   &numRealAtoms);

    // Partition the real atoms into Drude pairs and normal particles
    // (same bookkeeping as ReferenceICKernels.cpp).
    std::vector<bool> isDrude(system.getNumParticles(), false);
    std::vector<int2> pairs;
    for (int fi = 0; fi < system.getNumForces(); ++fi) {
        const auto* drude =
            dynamic_cast<const DrudeForce*>(&system.getForce(fi));
        if (drude == nullptr) continue;
        for (int i = 0; i < drude->getNumParticles(); ++i) {
            int p, p1, p2, p3, p4;
            double charge, polarizability, aniso12, aniso34;
            drude->getParticleParameters(i, p, p1, p2, p3, p4, charge,
                                         polarizability, aniso12,
                                         aniso34);
            pairs.push_back(make_int2(p, p1));
            isDrude[p] = true;
            isDrude[p1] = true;
        }
    }
    std::vector<int> normals;
    for (int i = 0; i < numRealAtoms; ++i)
        if (!isDrude[i] && system.getParticleMass(i) != 0.0)
            normals.push_back(i);
    numNormal = (int)normals.size();
    numPairs = (int)pairs.size();
    if (numNormal > 0) {
        normalParticles.initialize<int>(cu, numNormal,
                                        "icDrudeNormalParticles");
        normalParticles.upload(normals);
    }
    if (numPairs > 0) {
        pairParticles.initialize<int2>(cu, numPairs,
                                       "icDrudePairParticles");
        pairParticles.upload(pairs);
    }

    std::map<std::string, std::string> defines;
    CUmodule module = cu.createModule(
        CudaICKernelSources::icLangevin +
            CudaICKernelSources::icDrudeLangevin,
        defines);
    normalKernel =
        cu.getKernel(module, "icDrudeUpdateNormalVelocities");
    pairKernel = cu.getKernel(module, "icDrudeUpdatePairVelocities");
    hardWallKernel = cu.getKernel(module, "icDrudeHardWall");
    positionKernel = cu.getKernel(module, "icLangevinUpdatePositions");
    mirrorKernel = cu.getKernel(module, "icMirrorImagePositions");
    invertOrderKernel = cu.getKernel(module, "icInvertAtomOrder");
    invAtomIndex.initialize<int>(cu, cu.getPaddedNumAtoms(),
                                 "icInvAtomIndex");
}

void CudaIntegrateICDrudeLangevinStepKernel::execute(
    ContextImpl& context,
    const ICDrudeLangevinIntegrator& integrator) {
    cu.setAsCurrent();
    CudaIntegrationUtilities& integration =
        cu.getIntegrationUtilities();
    int numAtoms = cu.getNumAtoms();
    int paddedNumAtoms = cu.getPaddedNumAtoms();
    const double stepSize = integrator.getStepSize();
    integration.setNextStepSize(stepSize);

    const auto com = ICPlugin::langevinCoefficients(
        integrator.getFriction(), stepSize,
        BOLTZ * integrator.getTemperature());
    const auto internal = ICPlugin::langevinCoefficients(
        integrator.getDrudeFriction(), stepSize,
        BOLTZ * integrator.getDrudeTemperature());

    if (cu.getAtomsWereReordered() || cu.getStepCount() == 0) {
        void* args[] = {&numAtoms,
                        &cu.getAtomIndexArray().getDevicePointer(),
                        &invAtomIndex.getDevicePointer()};
        cu.executeKernel(invertOrderKernel, args, numAtoms, 128);
    }

    const bool useDouble =
        cu.getUseDoublePrecision() || cu.getUseMixedPrecision();
    // One draw per normal atom + two per pair.
    int randomIndex = integration.prepareRandomNumbers(
        cu.getPaddedNumAtoms() + 2 * numPairs);

    double comD[3] = {com.vscale, com.fscale, com.noise};
    double intD[3] = {internal.vscale, internal.fscale,
                      internal.noise};
    float comF[3] = {(float)com.vscale, (float)com.fscale,
                     (float)com.noise};
    float intF[3] = {(float)internal.vscale, (float)internal.fscale,
                     (float)internal.noise};
    void* vscale = useDouble ? (void*)&comD[0] : (void*)&comF[0];
    void* fscale = useDouble ? (void*)&comD[1] : (void*)&comF[1];
    void* noise = useDouble ? (void*)&comD[2] : (void*)&comF[2];
    void* vscaleDrude = useDouble ? (void*)&intD[0] : (void*)&intF[0];
    void* fscaleDrude = useDouble ? (void*)&intD[1] : (void*)&intF[1];
    void* noiseDrude = useDouble ? (void*)&intD[2] : (void*)&intF[2];

    if (numNormal > 0) {
        void* args[] = {
            &numNormal,
            &paddedNumAtoms,
            &normalParticles.getDevicePointer(),
            &cu.getVelm().getDevicePointer(),
            &cu.getForce().getDevicePointer(),
            &integration.getPosDelta().getDevicePointer(),
            vscale,
            fscale,
            noise,
            &integration.getStepSize().getDevicePointer(),
            &integration.getRandom().getDevicePointer(),
            &randomIndex};
        cu.executeKernel(normalKernel, args, numNormal, 128);
    }
    if (numPairs > 0) {
        int pairRandomIndex = randomIndex + numNormal;
        void* args[] = {
            &numPairs,
            &paddedNumAtoms,
            &pairParticles.getDevicePointer(),
            &cu.getVelm().getDevicePointer(),
            &cu.getForce().getDevicePointer(),
            &integration.getPosDelta().getDevicePointer(),
            vscale,
            fscale,
            noise,
            vscaleDrude,
            fscaleDrude,
            noiseDrude,
            &integration.getStepSize().getDevicePointer(),
            &integration.getRandom().getDevicePointer(),
            &pairRandomIndex};
        cu.executeKernel(pairKernel, args, numPairs, 128);
    }

    integration.applyConstraints(integrator.getConstraintTolerance());

    CUdeviceptr posCorrection =
        (cu.getUseMixedPrecision()
             ? cu.getPosqCorrection().getDevicePointer()
             : 0);
    void* argsPos[] = {&numAtoms,
                       &cu.getPosq().getDevicePointer(),
                       &integration.getPosDelta().getDevicePointer(),
                       &cu.getVelm().getDevicePointer(),
                       &integration.getStepSize().getDevicePointer(),
                       &posCorrection};
    cu.executeKernel(positionKernel, argsPos, numAtoms, 128);

    const double maxDistance = integrator.getMaxDrudeDistance();
    if (maxDistance > 0 && numPairs > 0) {
        double maxD = maxDistance;
        float maxF = (float)maxDistance;
        void* maxArg = useDouble ? (void*)&maxD : (void*)&maxF;
        void* args[] = {&numPairs,
                        &pairParticles.getDevicePointer(),
                        &cu.getPosq().getDevicePointer(),
                        &posCorrection,
                        &cu.getVelm().getDevicePointer(),
                        maxArg};
        cu.executeKernel(hardWallKernel, args, numPairs, 128);
    }

    integration.computeVirtualSites();

    int numCells = integrator.getNumCells();
    void* argsMirror[] = {&numRealAtoms,
                          &numCells,
                          &cellZSize,
                          &cu.getPosq().getDevicePointer(),
                          &posCorrection,
                          &invAtomIndex.getDevicePointer()};
    cu.executeKernel(mirrorKernel, argsMirror, numRealAtoms, 128);

    cu.setTime(cu.getTime() + stepSize);
    cu.setStepCount(cu.getStepCount() + 1);
    cu.reorderAtoms();
}

double CudaIntegrateICDrudeLangevinStepKernel::computeKineticEnergy(
    ContextImpl& context,
    const ICDrudeLangevinIntegrator& integrator) {
    return cu.getIntegrationUtilities().computeKineticEnergy(
        0.5 * integrator.getStepSize());
}
