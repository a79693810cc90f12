/**
 * Standalone unit tests for the Drude force math (Thole-screened
 * pairs + core-shell springs).  No OpenMM required:
 *   g++ -std=c++14 -I ../openmmapi/include tests/test_drude_math.cpp
 *
 * Forces are verified against central finite differences of the
 * energy — the definitive check that every analytic gradient in
 * DrudeForceMath.h (and its CUDA mirror drudeForce.cu) is -dE/dx.
 */

#include <cassert>
#include <cmath>
#include <cstdio>
#include <vector>

#include "internal/DrudeForceMath.h"

using ICPlugin::drudeDipolePairInteraction;
using ICPlugin::drudeSpringInteraction;
using ICPlugin::tholePairInteraction;
using ICPlugin::tholeScreening;
using ICPlugin::tholeScreeningDerivative;

static bool close(double a, double b, double tol = 1e-9) {
    return std::fabs(a - b) <= tol * (1.0 + std::fabs(a) +
                                      std::fabs(b));
}

// Deterministic LCG so the test needs no <random> seeding debates.
static double nextRand(unsigned long long* state) {
    *state = *state * 6364136223846793005ULL + 1442695040888963407ULL;
    return ((*state >> 17) % 100000) / 100000.0;
}

int main() {
    // --- screening function ----------------------------------------------
    // Large-u limit: bare Coulomb.
    assert(close(tholeScreening(50.0), 1.0, 1e-12));
    // Small-u expansion: S(u) = u/2 - u^3/12 + O(u^4).
    for (double u : {1e-3, 1e-2}) {
        assert(close(tholeScreening(u), 0.5 * u - u * u * u / 12.0,
                     1e-4));
    }
    // Derivative matches finite differences.
    for (double u : {0.1, 0.7, 2.5, 6.0}) {
        const double h = 1e-6;
        const double fd =
            (tholeScreening(u + h) - tholeScreening(u - h)) / (2 * h);
        assert(close(tholeScreeningDerivative(u), fd, 1e-7));
    }

    unsigned long long state = 12345;

    // --- single screened pair: force = -dE/dx ----------------------------
    for (int trial = 0; trial < 20; ++trial) {
        double ri[3], rj[3];
        for (int axis = 0; axis < 3; ++axis) {
            ri[axis] = nextRand(&state) * 2.0 - 1.0;
            rj[axis] = nextRand(&state) * 2.0 + 1.5;  // keep r > 0.5
        }
        const double qq = nextRand(&state) * 4.0 - 2.0;
        const double a = 0.5 + 2.0 * nextRand(&state);
        double fi[3] = {0, 0, 0}, fj[3] = {0, 0, 0};
        tholePairInteraction(ri, rj, qq, a, fi, fj);
        // Newton's third law.
        for (int axis = 0; axis < 3; ++axis)
            assert(close(fi[axis], -fj[axis], 1e-12));
        const double h = 1e-6;
        for (int axis = 0; axis < 3; ++axis) {
            double rp[3] = {ri[0], ri[1], ri[2]};
            double rm[3] = {ri[0], ri[1], ri[2]};
            rp[axis] += h;
            rm[axis] -= h;
            double dump[3] = {0, 0, 0}, dump2[3] = {0, 0, 0};
            const double ep =
                tholePairInteraction(rp, rj, qq, a, dump, dump2);
            const double em =
                tholePairInteraction(rm, rj, qq, a, dump, dump2);
            assert(close(fi[axis], -(ep - em) / (2 * h), 1e-5));
        }
    }

    // --- dipole pair = sum of 4 screened terms; total force zero ---------
    for (int trial = 0; trial < 10; ++trial) {
        double pos[4][3];
        for (int p = 0; p < 4; ++p)
            for (int axis = 0; axis < 3; ++axis)
                pos[p][axis] =
                    nextRand(&state) * 0.4 + (p < 2 ? 0.0 : 2.0);
        const double qq = 1.7;
        const double a = 1.3;
        double f[4][3] = {{0}};
        const double energy = drudeDipolePairInteraction(
            pos[0], pos[1], pos[2], pos[3], qq, a, f[0], f[1], f[2],
            f[3]);
        double manual = 0.0;
        double g[4][3] = {{0}};
        manual += tholePairInteraction(pos[0], pos[2], qq, a, g[0],
                                       g[2]);
        manual += tholePairInteraction(pos[0], pos[3], -qq, a, g[0],
                                       g[3]);
        manual += tholePairInteraction(pos[1], pos[2], -qq, a, g[1],
                                       g[2]);
        manual += tholePairInteraction(pos[1], pos[3], qq, a, g[1],
                                       g[3]);
        assert(close(energy, manual, 1e-12));
        double total[3] = {0, 0, 0};
        for (int p = 0; p < 4; ++p)
            for (int axis = 0; axis < 3; ++axis) {
                assert(close(f[p][axis], g[p][axis], 1e-12));
                total[axis] += f[p][axis];
            }
        for (int axis = 0; axis < 3; ++axis)
            assert(close(total[axis], 0.0, 1e-12));
        // Distant dipoles: screened energy approaches bare Coulomb.
        if (trial == 0) {
            double far[4][3];
            for (int p = 0; p < 4; ++p)
                for (int axis = 0; axis < 3; ++axis)
                    far[p][axis] =
                        pos[p][axis] + (p < 2 ? 0.0 : 100.0);
            double fd[4][3] = {{0}};
            const double screened = drudeDipolePairInteraction(
                far[0], far[1], far[2], far[3], qq, a, fd[0], fd[1],
                fd[2], fd[3]);
            double bare = 0.0;
            const int other[2] = {2, 3};
            for (int p = 0; p < 2; ++p)
                for (int oi = 0; oi < 2; ++oi) {
                    const int q = other[oi];
                    const double sign =
                        ((p == 0) == (q == 2)) ? 1.0 : -1.0;
                    double dx = far[p][0] - far[q][0];
                    double dy = far[p][1] - far[q][1];
                    double dz = far[p][2] - far[q][2];
                    bare += sign * qq /
                            std::sqrt(dx * dx + dy * dy + dz * dz);
                }
            assert(close(screened, bare, 1e-9));
        }
    }

    // --- springs: isotropic + both anisotropic terms, FD forces ----------
    for (int trial = 0; trial < 10; ++trial) {
        // Layout: 0 = shell, 1 = core, 2 = axis1 end, 3/4 = axis2.
        double pos[5][3];
        for (int p = 0; p < 5; ++p)
            for (int axis = 0; axis < 3; ++axis)
                pos[p][axis] = nextRand(&state) * 3.0 - 1.5;
        // Keep the axes well-conditioned.
        pos[2][0] += 2.0;
        pos[4][1] += 2.0;
        const double kIso = 0.8 + nextRand(&state);
        const double k1 = 0.5 + nextRand(&state);
        const double k2 = 0.3 + nextRand(&state);

        auto evalEnergy = [&](double p[5][3],
                              double fbuf[5][3]) -> double {
            return drudeSpringInteraction(
                p[0], p[1], kIso, fbuf[0], fbuf[1], k1, p[1], p[2],
                fbuf[1], fbuf[2], k2, p[3], p[4], fbuf[3], fbuf[4]);
        };
        double f[5][3] = {{0}};
        evalEnergy(pos, f);

        // Total force is zero (springs are internal).
        for (int axis = 0; axis < 3; ++axis) {
            double total = 0.0;
            for (int p = 0; p < 5; ++p)
                total += f[p][axis];
            assert(close(total, 0.0, 1e-12));
        }

        const double h = 1e-6;
        for (int p = 0; p < 5; ++p)
            for (int axis = 0; axis < 3; ++axis) {
                double pp[5][3], pm[5][3];
                for (int q = 0; q < 5; ++q)
                    for (int b = 0; b < 3; ++b) {
                        pp[q][b] = pos[q][b];
                        pm[q][b] = pos[q][b];
                    }
                pp[p][axis] += h;
                pm[p][axis] -= h;
                double dump[5][3] = {{0}};
                const double ep = evalEnergy(pp, dump);
                const double em = evalEnergy(pm, dump);
                assert(
                    close(f[p][axis], -(ep - em) / (2 * h), 1e-5));
            }
    }

    // Isotropic-only spring: Hooke's law along the displacement.
    {
        double shell[3] = {1.0, 2.0, 3.5};
        double core[3] = {1.0, 2.0, 3.0};
        double fs[3] = {0, 0, 0}, fc[3] = {0, 0, 0};
        const double energy =
            drudeSpringInteraction(shell, core, 4.0, fs, fc);
        assert(close(energy, 0.5 * 4.0 * 0.25, 1e-12));
        assert(close(fs[2], -4.0 * 0.5, 1e-12));
        assert(close(fc[2], 4.0 * 0.5, 1e-12));
        assert(close(fs[0], 0.0, 1e-12));
    }

    std::printf("all assertions passed\n");
    return 0;
}
