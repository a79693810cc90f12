#include "ReferenceICKernels.h"

#include <cmath>
#include <vector>

#include "internal/ICMirror.h"
#include "openmm/Context.h"
#include "openmm/DrudeForce.h"
#include "openmm/OpenMMException.h"
#include "openmm/internal/ContextImpl.h"
#include "openmm/reference/ReferenceConstraints.h"
#include "openmm/reference/SimTKOpenMMRealType.h"
#include "openmm/reference/SimTKOpenMMUtilities.h"

using namespace ICPlugin;
using namespace OpenMM;

static std::vector<Vec3>& positions(ContextImpl& context) {
    auto* data = reinterpret_cast<ReferencePlatform::PlatformData*>(
        context.getPlatformData());
    return *reinterpret_cast<std::vector<Vec3>*>(data->positions);
}

static std::vector<Vec3>& velocities(ContextImpl& context) {
    auto* data = reinterpret_cast<ReferencePlatform::PlatformData*>(
        context.getPlatformData());
    return *reinterpret_cast<std::vector<Vec3>*>(data->velocities);
}

static std::vector<Vec3>& forces(ContextImpl& context) {
    auto* data = reinterpret_cast<ReferencePlatform::PlatformData*>(
        context.getPlatformData());
    return *reinterpret_cast<std::vector<Vec3>*>(data->forces);
}

/** Rewrite image-cell positions as mirrors of the real atoms. */
static void applyImageMirroring(std::vector<Vec3>& pos, int numRealAtoms,
                                int numCells, double cellZSize) {
    for (int i = 0; i < numRealAtoms; ++i) {
        double z = pos[i][2];
        for (int cell = 1; cell < numCells; ++cell) {
            z = ICPlugin::mirrorZ(z, cell, cellZSize);
            const int image = i + cell * numRealAtoms;
            pos[image] = Vec3(pos[i][0], pos[i][1], z);
        }
    }
}

// ----------------------------------------------------------------------
// ICLangevin
// ----------------------------------------------------------------------

void ReferenceIntegrateICLangevinStepKernel::initialize(
    const System& system, const ICLangevinIntegrator& integrator) {
    const int numParticles = system.getNumParticles();
    numRealAtoms = numParticles / integrator.getNumCells();
    masses.resize(numParticles);
    for (int i = 0; i < numParticles; ++i)
        masses[i] = system.getParticleMass(i);
    previous.resize(numParticles);
    SimTKOpenMMUtilities::setRandomNumberSeed(
        static_cast<uint32_t>(integrator.getRandomNumberSeed()));
}

void ReferenceIntegrateICLangevinStepKernel::execute(
    ContextImpl& context, const ICLangevinIntegrator& integrator) {
    std::vector<Vec3>& pos = positions(context);
    std::vector<Vec3>& vel = velocities(context);
    std::vector<Vec3>& frc = forces(context);

    const double dt = integrator.getStepSize();
    const double kT = BOLTZ * integrator.getTemperature();
    const auto coeff = ICPlugin::langevinCoefficients(
        integrator.getFriction(), dt, kT);

    // BAOA update on the real (massive) particles; image particles are
    // massless and follow by mirroring.
    for (int i = 0; i < numRealAtoms; ++i) {
        if (masses[i] == 0.0) continue;
        previous[i] = pos[i];
        const double invMass = 1.0 / masses[i];
        const double noiseScale = coeff.noise * std::sqrt(invMass);
        for (int k = 0; k < 3; ++k) {
            const double gauss = SimTKOpenMMUtilities::
                getNormallyDistributedRandomNumber();
            // Velocity: decay + force kick + thermal noise.
            vel[i][k] = coeff.vscale * vel[i][k] +
                        coeff.fscale * invMass * frc[i][k] +
                        noiseScale * gauss;
            pos[i][k] += vel[i][k] * dt;
        }
    }

    context.applyConstraints(integrator.getConstraintTolerance());
    applyImageMirroring(pos, numRealAtoms, integrator.getNumCells(),
                        integrator.getCellZSize());
    context.computeVirtualSites();

    // Advance time.
    context.setTime(context.getTime() + dt);
}

double ReferenceIntegrateICLangevinStepKernel::computeKineticEnergy(
    ContextImpl& context, const ICLangevinIntegrator& integrator) {
    std::vector<Vec3>& vel = velocities(context);
    double energy = 0.0;
    for (int i = 0; i < numRealAtoms; ++i)
        if (masses[i] != 0.0)
            energy += masses[i] * vel[i].dot(vel[i]);
    return 0.5 * energy;
}

// ----------------------------------------------------------------------
// ICDrudeLangevin
// ----------------------------------------------------------------------

void ReferenceIntegrateICDrudeLangevinStepKernel::initialize(
    const System& system, const ICDrudeLangevinIntegrator& integrator) {
    const int numParticles = system.getNumParticles();
    numRealAtoms = numParticles / integrator.getNumCells();
    masses.resize(numParticles);
    for (int i = 0; i < numParticles; ++i)
        masses[i] = system.getParticleMass(i);

    // Partition real particles into Drude pairs and normal particles.
    std::vector<bool> isDrude(numParticles, false);
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
            drudePairs.emplace_back(p, p1);
            isDrude[p] = true;
            isDrude[p1] = true;
        }
    }
    for (int i = 0; i < numRealAtoms; ++i)
        if (!isDrude[i] && masses[i] != 0.0) normalParticles.push_back(i);
    SimTKOpenMMUtilities::setRandomNumberSeed(
        static_cast<uint32_t>(integrator.getRandomNumberSeed()));
}

void ReferenceIntegrateICDrudeLangevinStepKernel::execute(
    ContextImpl& context, const ICDrudeLangevinIntegrator& integrator) {
    std::vector<Vec3>& pos = positions(context);
    std::vector<Vec3>& vel = velocities(context);
    std::vector<Vec3>& frc = forces(context);

    const double dt = integrator.getStepSize();
    const double kT = BOLTZ * integrator.getTemperature();
    const double kTDrude = BOLTZ * integrator.getDrudeTemperature();
    const auto com =
        ICPlugin::langevinCoefficients(integrator.getFriction(), dt, kT);
    const auto internal = ICPlugin::langevinCoefficients(
        integrator.getDrudeFriction(), dt, kTDrude);

    auto gauss = [&]() {
        return SimTKOpenMMUtilities::
            getNormallyDistributedRandomNumber();
    };

    // Normal particles: plain Langevin.
    for (int i : normalParticles) {
        const double invMass = 1.0 / masses[i];
        const double noiseScale = com.noise * std::sqrt(invMass);
        for (int k = 0; k < 3; ++k) {
            vel[i][k] = com.vscale * vel[i][k] +
                        com.fscale * invMass * frc[i][k] +
                        noiseScale * gauss();
            pos[i][k] += vel[i][k] * dt;
        }
    }

    // Drude pairs: thermostat the COM motion at T and the internal
    // (relative) motion at T_Drude.
    for (const auto& pair : drudePairs) {
        const int d = pair.first, c = pair.second;
        const double md = masses[d], mc = masses[c];
        const double mTot = md + mc;
        const double reduced = md * mc / mTot;
        for (int k = 0; k < 3; ++k) {
            const double vCom =
                (md * vel[d][k] + mc * vel[c][k]) / mTot;
            const double vRel = vel[d][k] - vel[c][k];
            const double fCom = frc[d][k] + frc[c][k];
            const double fRel =
                (mc * frc[d][k] - md * frc[c][k]) / mTot;
            const double newCom =
                com.vscale * vCom + com.fscale * fCom / mTot +
                com.noise / std::sqrt(mTot) * gauss();
            const double newRel =
                internal.vscale * vRel +
                internal.fscale * fRel / reduced +
                internal.noise / std::sqrt(reduced) * gauss();
            vel[d][k] = newCom + newRel * mc / mTot;
            vel[c][k] = newCom - newRel * md / mTot;
            pos[d][k] += vel[d][k] * dt;
            pos[c][k] += vel[c][k] * dt;
        }

        // Hard-wall constraint on the Drude displacement.
        const double maxDist = integrator.getMaxDrudeDistance();
        if (maxDist > 0) {
            Vec3 delta = pos[d] - pos[c];
            const double dist = std::sqrt(delta.dot(delta));
            if (dist > maxDist) {
                const double scale = maxDist / dist;
                const Vec3 center =
                    (pos[d] * md + pos[c] * mc) * (1.0 / mTot);
                pos[d] = center + delta * (scale * mc / mTot);
                pos[c] = center - delta * (scale * md / mTot);
            }
        }
    }

    context.applyConstraints(integrator.getConstraintTolerance());
    applyImageMirroring(pos, numRealAtoms, integrator.getNumCells(),
                        integrator.getCellZSize());
    context.computeVirtualSites();
    context.setTime(context.getTime() + dt);
}

double ReferenceIntegrateICDrudeLangevinStepKernel::computeKineticEnergy(
    ContextImpl& context, const ICDrudeLangevinIntegrator& integrator) {
    std::vector<Vec3>& vel = velocities(context);
    double energy = 0.0;
    for (int i = 0; i < numRealAtoms; ++i)
        if (masses[i] != 0.0)
            energy += masses[i] * vel[i].dot(vel[i]);
    return 0.5 * energy;
}
