/**
 * Standalone unit tests for the image-charge mirroring math and the
 * Langevin coefficients.  No OpenMM required:
 *   g++ -std=c++14 -I ../openmmapi/include tests/test_ic_mirror.cpp
 */

#include <cassert>
#include <cmath>
#include <cstdio>
#include <vector>

#include "internal/ICMirror.h"

using ICPlugin::langevinCoefficients;
using ICPlugin::mirrorImagePositions;
using ICPlugin::mirrorZ;

static bool close(double a, double b, double tol = 1e-12) {
    return std::fabs(a - b) < tol;
}

int main() {
    // Two cells: the image of z sits at 2L - z (mirror across z = L).
    const double L = 5.0;
    assert(close(mirrorZ(1.25, 1, L), 2 * L - 1.25));
    assert(close(mirrorZ(0.0, 1, L), 2 * L));
    // A particle on the mirror plane is its own image.
    assert(close(mirrorZ(L, 1, L), L));

    // Multi-cell chain matches the CUDA kernel's iterative update:
    // z_i = -z_{i-1} + 2 i L.
    std::vector<double> buffer(4 * 3, 0.0);
    buffer[0] = 0.5;
    buffer[1] = -0.25;
    buffer[2] = 1.25;
    mirrorImagePositions(buffer.data(), 4, L);
    double z = 1.25;
    for (int cell = 1; cell < 4; ++cell) {
        z = -z + 2.0 * cell * L;
        assert(close(buffer[3 * cell + 0], 0.5));
        assert(close(buffer[3 * cell + 1], -0.25));
        assert(close(buffer[3 * cell + 2], z));
    }

    // Mirroring twice across the same plane is the identity.
    assert(close(mirrorZ(mirrorZ(3.7, 1, L), 1, L), 3.7));

    // Langevin coefficients: zero friction degenerates to velocity
    // Verlet-like scaling; finite friction decays correctly.
    auto free_coeff = langevinCoefficients(0.0, 0.002, 2.5);
    assert(close(free_coeff.vscale, 1.0));
    assert(close(free_coeff.fscale, 0.002));
    assert(close(free_coeff.noise, 0.0));

    const double gamma = 1.0, dt = 0.002, kT = 2.494;
    auto coeff = langevinCoefficients(gamma, dt, kT);
    assert(close(coeff.vscale, std::exp(-gamma * dt)));
    assert(close(coeff.fscale, (1 - std::exp(-gamma * dt)) / gamma));
    assert(close(coeff.noise,
                 std::sqrt(kT * (1 - std::exp(-2 * gamma * dt)))));
    // Fluctuation-dissipation: vscale^2 + noise^2/kT == 1.
    assert(close(coeff.vscale * coeff.vscale +
                     coeff.noise * coeff.noise / kT,
                 1.0));

    std::printf("test_ic_mirror: all assertions passed\n");
    return 0;
}
