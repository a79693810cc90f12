/**
 * Pure image-charge mirroring math, shared by every platform kernel
 * and unit-testable without OpenMM.
 *
 * The simulation box is extended to `numCells` copies along z.  Cell 0
 * holds the real particles; cell i holds their images, mirrored
 * iteratively as z_i = -z_{i-1} + 2*i*cellZSize (reference behavior:
 * /root/reference/lib/openmm-ic-plugin/platforms/cuda/src/kernels/
 * ICLangevin.cu:167-199).
 */

#ifndef IC_PLUGIN_MIRROR_H_
#define IC_PLUGIN_MIRROR_H_

#include <cmath>
#include <cstddef>

namespace ICPlugin {

/** z-coordinate of the image of a (possibly already-imaged) particle
 * in cell `cell`, given the previous cell's z. */
inline double mirrorZ(double previousZ, int cell, double cellZSize) {
    return -previousZ + 2.0 * cell * cellZSize;
}

/**
 * Update the image-particle positions for one real particle.
 *
 * positions: array of numCells * 3 doubles laid out [x, y, z] per
 * cell; entry 0 is the real particle, entries 1..numCells-1 are
 * rewritten in place.
 */
inline void mirrorImagePositions(double* positions, int numCells,
                                 double cellZSize) {
    double x = positions[0];
    double y = positions[1];
    double z = positions[2];
    for (int cell = 1; cell < numCells; ++cell) {
        z = mirrorZ(z, cell, cellZSize);
        positions[3 * cell + 0] = x;
        positions[3 * cell + 1] = y;
        positions[3 * cell + 2] = z;
    }
}

/** Langevin BAOA(B) splitting coefficients for one step. */
struct LangevinCoefficients {
    double vscale;   ///< velocity decay exp(-gamma dt)
    double fscale;   ///< force prefactor (1 - vscale) / gamma
    double noise;    ///< thermal noise amplitude sqrt(kT (1 - vscale^2))
};

inline LangevinCoefficients langevinCoefficients(double friction,
                                                 double stepSize,
                                                 double kT) {
    LangevinCoefficients c;
    if (friction <= 0.0) {
        c.vscale = 1.0;
        c.fscale = stepSize;
        c.noise = 0.0;
    } else {
        c.vscale = std::exp(-stepSize * friction);
        c.fscale = (1.0 - c.vscale) / friction;
        c.noise = std::sqrt(kT * (1.0 - c.vscale * c.vscale));
    }
    return c;
}

}  // namespace ICPlugin

#endif  // IC_PLUGIN_MIRROR_H_
