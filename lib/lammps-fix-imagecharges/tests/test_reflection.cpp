/**
 * Standalone unit tests for the image-charge reflection math.
 *   g++ -std=c++14 tests/test_reflection.cpp
 */

#include <cassert>
#include <cmath>
#include <cstdio>

#include "../imagecharge_math.h"

static bool close(double a, double b, double tol = 1e-12) {
    return std::fabs(a - b) < tol;
}

int main() {
    // Reflection across the z = 2 plane.
    const double p[3] = {0.0, 0.0, 2.0};
    const double n[3] = {0.0, 0.0, 1.0};
    double r[3] = {1.0, -2.0, 5.0};
    double image[3];
    ImageCharges::reflectAcrossPlane(r, p, n, image);
    assert(close(image[0], 1.0));
    assert(close(image[1], -2.0));
    assert(close(image[2], -1.0));  // 2*2 - 5

    // Non-unit normals give identical results (full normalization).
    const double n_scaled[3] = {0.0, 0.0, 7.5};
    double image2[3];
    ImageCharges::reflectAcrossPlane(r, p, n_scaled, image2);
    for (int k = 0; k < 3; ++k) assert(close(image[k], image2[k]));

    // A point on the plane maps to itself.
    const double on_plane[3] = {3.0, 4.0, 2.0};
    ImageCharges::reflectAcrossPlane(on_plane, p, n, image);
    for (int k = 0; k < 3; ++k) assert(close(image[k], on_plane[k]));

    // Reflection is an involution for a tilted plane too.
    const double p2[3] = {1.0, 0.0, 0.0};
    const double n2[3] = {1.0, 1.0, 0.0};
    const double r2[3] = {0.3, -0.7, 1.9};
    double once[3], twice[3];
    ImageCharges::reflectAcrossPlane(r2, p2, n2, once);
    ImageCharges::reflectAcrossPlane(once, p2, n2, twice);
    for (int k = 0; k < 3; ++k) assert(close(twice[k], r2[k]));
    // The midpoint of (r, image) lies on the plane.
    const double mid[3] = {(r2[0] + once[0]) / 2,
                           (r2[1] + once[1]) / 2,
                           (r2[2] + once[2]) / 2};
    const double plane_eval = (mid[0] - p2[0]) * n2[0] +
                              (mid[1] - p2[1]) * n2[1] +
                              (mid[2] - p2[2]) * n2[2];
    assert(close(plane_eval, 0.0));

    // Image charges flip sign and scale.
    assert(close(ImageCharges::imageCharge(0.8, 1.0), -0.8));
    assert(close(ImageCharges::imageCharge(-0.5, 0.4), 0.2));

    // MOVING plane (equal-style variable parameters re-evaluated per
    // step): an electrode oscillating as z = 2 + 0.5 sin(w t).  Each
    // step's reflection must track that step's plane exactly — the
    // image z is 2 z_plane(t) - z for every t, the involution holds
    // per step, and the (atom, image) midpoint always sits on the
    // instantaneous plane.
    const double r_fixed[3] = {0.4, 1.3, 4.2};
    for (int step = 0; step < 25; ++step) {
        const double zp = 2.0 + 0.5 * std::sin(0.37 * step);
        const double p_t[3] = {0.0, 0.0, zp};
        const double n_t[3] = {0.0, 0.0, 1.0};
        double img_t[3], back[3];
        ImageCharges::reflectAcrossPlane(r_fixed, p_t, n_t, img_t);
        assert(close(img_t[0], r_fixed[0]));
        assert(close(img_t[1], r_fixed[1]));
        assert(close(img_t[2], 2.0 * zp - r_fixed[2]));
        ImageCharges::reflectAcrossPlane(img_t, p_t, n_t, back);
        for (int k = 0; k < 3; ++k) assert(close(back[k], r_fixed[k]));
        assert(close((r_fixed[2] + img_t[2]) / 2, zp));
    }

    // Moving TILTED plane: normal rotating in the x-z plane while the
    // point drifts; per-step involution + midpoint-on-plane + mirror
    // distance preservation (|r - p| == |image - p| projected onto n).
    for (int step = 0; step < 25; ++step) {
        const double theta = 0.1 * step;
        const double p_t[3] = {0.05 * step, -0.02 * step, 1.0};
        const double n_t[3] = {std::sin(theta), 0.0, std::cos(theta)};
        const double r_t[3] = {1.1, -0.3, 3.7};
        double img_t[3], back[3];
        ImageCharges::reflectAcrossPlane(r_t, p_t, n_t, img_t);
        ImageCharges::reflectAcrossPlane(img_t, p_t, n_t, back);
        for (int k = 0; k < 3; ++k) assert(close(back[k], r_t[k]));
        double mid_eval = 0.0;
        for (int k = 0; k < 3; ++k)
            mid_eval += ((r_t[k] + img_t[k]) / 2 - p_t[k]) * n_t[k];
        assert(close(mid_eval, 0.0));
        // Signed distances to the plane are opposite.
        double da = 0.0, db = 0.0;
        for (int k = 0; k < 3; ++k) {
            da += (r_t[k] - p_t[k]) * n_t[k];
            db += (img_t[k] - p_t[k]) * n_t[k];
        }
        assert(close(da, -db));
    }

    // Per-atom (atom-style) parameters: two atoms with different
    // scale values get independently scaled image charges.
    assert(close(ImageCharges::imageCharge(0.8, 0.25), -0.2));
    assert(close(ImageCharges::imageCharge(0.8, 0.75), -0.6));

    std::printf("test_reflection: all assertions passed\n");
    return 0;
}
