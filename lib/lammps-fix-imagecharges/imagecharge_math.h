/**
 * Pure reflection math for the LAMMPS image-charge fix, unit-testable
 * without LAMMPS.
 *
 * An image particle is the mirror of a real particle across the plane
 * through point p with normal n: r' = r - 2 ((r - p) . n_hat) n_hat
 * (reference behavior:
 * /root/reference/lib/lammps-fix-imagecharges/fix_imagecharges.cpp:
 * 357-363; this form normalizes the full reflection so non-unit
 * normals are handled exactly).
 */

#ifndef LAMMPS_FIX_IMAGECHARGES_MATH_H_
#define LAMMPS_FIX_IMAGECHARGES_MATH_H_

#include <cmath>

namespace ImageCharges {

/** Reflect point r across the plane (p, n); writes r_image. */
inline void reflectAcrossPlane(const double r[3], const double p[3],
                               const double n[3], double rImage[3]) {
    const double norm2 = n[0] * n[0] + n[1] * n[1] + n[2] * n[2];
    const double along =
        ((r[0] - p[0]) * n[0] + (r[1] - p[1]) * n[1] +
         (r[2] - p[2]) * n[2]) /
        norm2;
    rImage[0] = r[0] - 2.0 * along * n[0];
    rImage[1] = r[1] - 2.0 * along * n[1];
    rImage[2] = r[2] - 2.0 * along * n[2];
}

/** Image charge magnitude: q' = -scale * q. */
inline double imageCharge(double q, double scale) { return -scale * q; }

}  // namespace ImageCharges

#endif  // LAMMPS_FIX_IMAGECHARGES_MATH_H_
