/**
 * Pure Drude-oscillator force math: Thole-screened charge pairs and
 * the (an)isotropic core-shell springs.  Shared by the CPU Reference
 * platform and mirrored by the CUDA kernels (drudeForce.cu), and
 * unit-testable without OpenMM (tests/test_drude_math.cpp).
 *
 * Native-grade equivalent of the reference plugin's bundled force
 * fragments (/root/reference/lib/openmm-ic-plugin/platforms/cuda/src/
 * kernels/drudePairForce.cu:1-61, drudeParticleForce.cu:1-45), which
 * duplicate OpenMM's internal Drude helpers; here the math lives in
 * one standalone header with the forces derived below.
 *
 * Physics:
 *  - A Drude "dipole" is a (core, shell) pair carrying charges
 *    (-q, +q); the shell is bound to its core by a harmonic spring
 *    whose stiffness k = q^2 / alpha sets the polarizability alpha.
 *  - Between two nearby dipoles, bare Coulomb interactions diverge as
 *    the induced dipoles collapse onto each other; Thole damping
 *    multiplies each charge-charge term by the screening
 *        S(u) = 1 - (1 + u/2) exp(-u),        u = a * r,
 *    where a = thole / (alpha_1 * alpha_2)^(1/6).  S -> 1 at large r
 *    (bare Coulomb) and S ~ u^2/2 at small r (finite energy).
 *  - Anisotropic polarizability replaces the isotropic spring with
 *    per-axis stiffnesses; the off-axis components project the
 *    core->shell displacement onto directions defined by neighboring
 *    (bonded) particles.
 */

#ifndef IC_PLUGIN_DRUDE_FORCE_MATH_H_
#define IC_PLUGIN_DRUDE_FORCE_MATH_H_

#include <cmath>

namespace ICPlugin {

/** Thole screening factor S(u) = 1 - (1 + u/2) e^{-u}. */
inline double tholeScreening(double u) {
    return 1.0 - (1.0 + 0.5 * u) * std::exp(-u);
}

/** dS/du = (1 + u) e^{-u} / 2. */
inline double tholeScreeningDerivative(double u) {
    return 0.5 * (1.0 + u) * std::exp(-u);
}

/**
 * Energy and forces of ONE Thole-screened charge pair.
 *
 * E(r) = qq * S(a r) / r  (qq = k_e * q_i * q_j, Coulomb constant
 * folded into the charge product by the caller).
 *
 * The force on particle i at `ri` is -dE/dr * rhat with
 * dE/dr = qq * (a S'(a r) / r - S(a r) / r^2); the equal-and-opposite
 * force acts on j.  `fi` and `fj` are ACCUMULATED into (+= / -=).
 * Returns the pair energy.
 */
inline double tholePairInteraction(const double* ri, const double* rj,
                                   double qq, double a, double* fi,
                                   double* fj) {
    const double dx = ri[0] - rj[0];
    const double dy = ri[1] - rj[1];
    const double dz = ri[2] - rj[2];
    const double r2 = dx * dx + dy * dy + dz * dz;
    const double r = std::sqrt(r2);
    const double u = a * r;
    const double s = tholeScreening(u);
    const double energy = qq * s / r;
    // -dE/dr / r, so that force_i = coef * delta.
    const double coef =
        qq * (s / (r2 * r) - a * tholeScreeningDerivative(u) / r2);
    fi[0] += coef * dx;
    fi[1] += coef * dy;
    fi[2] += coef * dz;
    fj[0] -= coef * dx;
    fj[1] -= coef * dy;
    fj[2] -= coef * dz;
    return energy;
}

/**
 * Full screened interaction of two Drude dipoles: shells s1, s2 carry
 * +q1, +q2 and cores c1, c2 carry -q1, -q2, so the four charge-charge
 * terms enter with products (+, -, -, +) * q1 q2.  `qq` is
 * k_e * q1 * q2; `a` the Thole damping coefficient for this pair.
 * All four force buffers are accumulated; the total energy of the
 * four screened terms is returned.
 */
inline double drudeDipolePairInteraction(
    const double* s1, const double* c1, const double* s2,
    const double* c2, double qq, double a, double* fs1, double* fc1,
    double* fs2, double* fc2) {
    double energy = 0.0;
    energy += tholePairInteraction(s1, s2, qq, a, fs1, fs2);
    energy += tholePairInteraction(s1, c2, -qq, a, fs1, fc2);
    energy += tholePairInteraction(c1, s2, -qq, a, fc1, fs2);
    energy += tholePairInteraction(c1, c2, qq, a, fc1, fc2);
    return energy;
}

/**
 * Core-shell spring with optional anisotropy.
 *
 * Isotropic part: E = k_iso |d|^2 / 2 with d = shell - core.
 * Each anisotropic part adds E = k (d . n)^2 / 2, where n is the unit
 * vector from `axisA` to `axisB` (two particles defining the axis);
 * differentiating moves force onto the axis particles too because n
 * depends on their positions:
 *   dE/d(shell) =  k (d.n) n
 *   dE/d(axisB) =  k (d.n) (d - (d.n) n) / |axisB - axisA|
 * with the core and axisA taking the opposite shares (total force and
 * torque balance).
 *
 * Forces are ACCUMULATED into fShell/fCore/fAxisA/fAxisB; pass
 * k = 0 to skip a term.  Returns the spring energy.
 */
inline double drudeSpringInteraction(
    const double* shell, const double* core, double kIso,
    double* fShell, double* fCore, double k1 = 0.0,
    const double* axisA1 = 0, const double* axisB1 = 0,
    double* fAxisA1 = 0, double* fAxisB1 = 0, double k2 = 0.0,
    const double* axisA2 = 0, const double* axisB2 = 0,
    double* fAxisA2 = 0, double* fAxisB2 = 0) {
    const double d[3] = {shell[0] - core[0], shell[1] - core[1],
                         shell[2] - core[2]};
    double energy =
        0.5 * kIso * (d[0] * d[0] + d[1] * d[1] + d[2] * d[2]);
    for (int axis = 0; axis < 3; ++axis) {
        fShell[axis] -= kIso * d[axis];
        fCore[axis] += kIso * d[axis];
    }

    const double ks[2] = {k1, k2};
    const double* as[2] = {axisA1, axisA2};
    const double* bs[2] = {axisB1, axisB2};
    double* fas[2] = {fAxisA1, fAxisA2};
    double* fbs[2] = {fAxisB1, fAxisB2};
    for (int term = 0; term < 2; ++term) {
        const double k = ks[term];
        if (k == 0.0)
            continue;
        const double* a = as[term];
        const double* b = bs[term];
        double n[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
        const double invLen =
            1.0 /
            std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
        n[0] *= invLen;
        n[1] *= invLen;
        n[2] *= invLen;
        const double proj = d[0] * n[0] + d[1] * n[1] + d[2] * n[2];
        energy += 0.5 * k * proj * proj;
        for (int axis = 0; axis < 3; ++axis) {
            const double onAxis = k * proj * n[axis];
            // Transverse component: rotating the axis changes the
            // projection; the lever arm is 1/|b - a|.
            const double transverse =
                k * proj * (d[axis] - proj * n[axis]) * invLen;
            fShell[axis] -= onAxis;
            fCore[axis] += onAxis;
            fbs[term][axis] -= transverse;
            fas[term][axis] += transverse;
        }
    }
    return energy;
}

}  // namespace ICPlugin

#endif  // IC_PLUGIN_DRUDE_FORCE_MATH_H_
