"""Numeric validation of the OpenMM energy-expression strings.

OpenMM is not installable in this environment, so the custom-force
energy strings (``mdhelper_tpu/openmm/expressions.py``) were previously
verified only structurally (regex/arity).  This module EXECUTES them:
a small interpreter of the OpenMM expression language (``;``-separated
statements, definitions after use, ``^`` power, ``step``/``erf``/
``exp``/``sqrt``/``log``) evaluates each factory's string on parameter
and distance grids and compares against independent NumPy
implementations of the reference formulas
(``/root/reference/src/mdhelper/openmm/pair.py:266-268`` coul_gauss,
``:372`` dpd, ``:522-524`` gauss, ``:868-880`` ljts/mie/wca, ``:1011``
solvation, ``:1262-1264`` yukawa; ``openmm/bond.py:100`` FENE) plus the
physical invariants OpenMM would enforce (shift continuity at the
inner cutoff, particle-exchange symmetry of every mixing rule).
"""

import numpy as np
import pytest
from scipy.special import erf

from mdhelper_tpu.openmm.expressions import (
    coul_gauss_energy,
    dpd_energy,
    ewald_g,
    fene_energy,
    gauss_energy,
    ljts_energy,
    solvation_energy,
    yukawa_energy,
)

rng = np.random.default_rng(404)


def evaluate_expression(expr: str, **variables) -> np.ndarray:
    """Evaluate an OpenMM energy expression numerically.

    OpenMM semantics: statements are ``;``-separated; the first is the
    energy; the rest define intermediate variables and may appear in
    any order AFTER their use, so definitions evaluate last-to-first.
    ``^`` is power; ``step(x)`` is 0 for x < 0 else 1.
    """

    env = {
        "sqrt": np.sqrt,
        "exp": np.exp,
        "log": np.log,
        "erf": erf,
        "abs": np.abs,
        "step": lambda x: np.where(np.asarray(x) < 0, 0.0, 1.0),
        "select": lambda c, a, b: np.where(np.asarray(c) != 0, a, b),
    }
    env.update(variables)
    statements = [s.strip() for s in expr.split(";") if s.strip()]
    for stmt in reversed(statements[1:]):
        name, rhs = stmt.split("=", 1)
        env[name.strip()] = eval(  # noqa: S307 - test interpreter
            rhs.replace("^", "**"), {"__builtins__": {}}, env
        )
    return eval(  # noqa: S307
        statements[0].replace("^", "**"), {"__builtins__": {}}, env
    )


def _pair_grid(n=5):
    """Random positive per-particle parameter pairs + r grid."""

    return (
        rng.uniform(0.2, 2.0, n),
        rng.uniform(0.2, 2.0, n),
        np.linspace(0.3, 1.19, 23),
    )


def _assert_exchange_symmetric(expr, r, p1, p2):
    """Swapping particles 1 <-> 2 must not change the energy (OpenMM
    applies the expression to unordered pairs)."""

    swapped = {}
    for k, v in p1.items():
        swapped[k] = v
    a = evaluate_expression(expr, r=r, **p1, **p2)
    flipped = {
        k[:-1] + ("2" if k.endswith("1") else "1"): v
        for k, v in {**p1, **p2}.items()
        if k[-1] in "12"
    }
    flipped.update(
        {k: v for k, v in {**p1, **p2}.items() if k[-1] not in "12"}
    )
    b = evaluate_expression(expr, r=r, **flipped)
    np.testing.assert_allclose(a, b, rtol=1e-12)


# ---------------------------------------------------------------------
# coul_gauss (reference pair.py:266-268)
# ---------------------------------------------------------------------
def test_coul_gauss_default_matches_reference_formula():
    cutoff, tol = 1.2, 1e-4
    g = ewald_g(cutoff, tol)
    assert np.isclose(g, np.sqrt(-np.log(2 * tol)) / cutoff)
    expr, per = coul_gauss_energy("default")
    assert per == ["alpha"]
    a1, a2, r = _pair_grid()
    one4pe = 138.935458
    for i in range(len(a1)):
        q1, q2 = rng.uniform(-1, 1, 2)
        got = evaluate_expression(
            expr, r=r, alpha1=a1[i], alpha2=a2[i], q1=q1, q2=q2,
            G_EWALD=g, ONE_4PI_EPS0=one4pe,
        )
        a12 = a1[i] * a2[i] / np.sqrt(a1[i] ** 2 + a2[i] ** 2)
        ref = one4pe * q1 * q2 * (erf(a12 * r) - erf(g * r)) / r
        np.testing.assert_allclose(got, ref, rtol=1e-12)
        _assert_exchange_symmetric(
            expr, r,
            dict(alpha1=a1[i], q1=q1),
            dict(alpha2=a2[i], q2=q2,
                 G_EWALD=g, ONE_4PI_EPS0=one4pe),
        )


def test_coul_gauss_core_matches_reference_formula():
    expr, per = coul_gauss_energy("core")
    assert per == ["a"]
    a1, a2, r = _pair_grid()
    one4pe = 138.935458
    g = ewald_g(1.2, 1e-4)
    for i in range(len(a1)):
        got = evaluate_expression(
            expr, r=r, a1=a1[i], a2=a2[i], q1=0.7, q2=-0.4,
            G_EWALD=g, ONE_4PI_EPS0=one4pe,
        )
        alpha12 = np.sqrt(np.pi / (2 * (a1[i] ** 2 + a2[i] ** 2)))
        ref = (
            one4pe * 0.7 * -0.4 * (erf(alpha12 * r) - erf(g * r)) / r
        )
        np.testing.assert_allclose(got, ref, rtol=1e-12)


# ---------------------------------------------------------------------
# dpd (reference pair.py:372)
# ---------------------------------------------------------------------
def test_dpd_matches_reference_formula():
    rc = 1.0
    expr = dpd_energy(rc, mix="A12=sqrt(A1*A2);")
    A1, A2, r = _pair_grid()
    for i in range(len(A1)):
        got = evaluate_expression(expr, r=r, A1=A1[i], A2=A2[i])
        ref = 0.5 * np.sqrt(A1[i] * A2[i]) * rc * (1 - r / rc) ** 2
        np.testing.assert_allclose(got, ref, rtol=1e-12)
    # Global-A12 variant (no mixing statement).
    got = evaluate_expression(dpd_energy(rc), r=r, A12=25.0)
    np.testing.assert_allclose(
        got, 0.5 * 25.0 * rc * (1 - r / rc) ** 2, rtol=1e-12
    )


# ---------------------------------------------------------------------
# gauss (reference pair.py:522-535)
# ---------------------------------------------------------------------
@pytest.mark.parametrize("shift", [True, False])
@pytest.mark.parametrize("mix", ["geometric", "arithmetic"])
def test_gauss_matches_reference_formula(mix, shift):
    cutoff, cg = 1.2, 1.0
    expr, per = gauss_energy(cutoff, cg, shift=shift, mix=mix)
    assert per == ["alpha", "beta"]
    a1, a2, r = _pair_grid()
    b1, b2 = rng.uniform(0.5, 3.0, 2)
    for i in range(len(a1)):
        got = evaluate_expression(
            expr, r=r, alpha1=a1[i], alpha2=a2[i], beta1=b1, beta2=b2
        )
        alpha12 = np.sqrt(a1[i] * a2[i])
        if mix == "geometric":
            beta12 = np.sqrt(b1 * b2)
        else:
            beta12 = 2 / (1 / b1 + 1 / b2)
        bare = alpha12 * np.exp(-beta12 * r**2)
        ucut = alpha12 * np.exp(-beta12 * cg**2) if shift else 0.0
        ref = np.where(r < cg, bare - ucut, 0.0)
        np.testing.assert_allclose(got, ref, rtol=1e-12)
    if shift:
        # Continuity: the shifted energy vanishes at the inner cutoff.
        at_cut = evaluate_expression(
            expr, r=np.array([cg - 1e-12]),
            alpha1=1.0, alpha2=1.0, beta1=1.0, beta2=1.0,
        )
        np.testing.assert_allclose(at_cut, 0.0, atol=1e-10)


def test_gauss_core_mix_matches_reference_formula():
    cutoff = cg = 1.1
    expr, per = gauss_energy(
        cutoff, cg, shift=False, mix="core", known_globals=("A",)
    )
    assert per == ["sigma"]
    s1, s2, r = _pair_grid()
    A = 7.5
    for i in range(len(s1)):
        got = evaluate_expression(
            expr, r=r, sigma1=s1[i], sigma2=s2[i], A=A
        )
        s12sq = s1[i] ** 2 + s2[i] ** 2
        beta12 = 3 / (2 * s12sq)
        alpha12 = A * (beta12 / np.pi) ** 1.5
        np.testing.assert_allclose(
            got, alpha12 * np.exp(-beta12 * r**2), rtol=1e-12
        )
    with pytest.raises(ValueError, match="'A'"):
        gauss_energy(cutoff, cg, mix="core")


# ---------------------------------------------------------------------
# ljts / mie / wca (reference pair.py:860-899)
# ---------------------------------------------------------------------
@pytest.mark.parametrize(
    "mix", ["arithmetic", "geometric", "sixthpower"]
)
@pytest.mark.parametrize("shift", [True, False])
def test_ljts_matches_reference_formula(mix, shift):
    cutoff, cl = 1.2, 1.0
    expr, per = ljts_energy(cutoff, cl, shift=shift, mix=mix)
    assert per == ["sigma", "epsilon"]
    s1, s2, r = _pair_grid()
    e1, e2 = rng.uniform(0.5, 2.0, 2)
    for i in range(len(s1)):
        got = evaluate_expression(
            expr, r=r, sigma1=s1[i], sigma2=s2[i],
            epsilon1=e1, epsilon2=e2,
        )
        if mix == "arithmetic":
            s12 = (s1[i] + s2[i]) / 2
            e12 = np.sqrt(e1 * e2)
        elif mix == "geometric":
            s12 = np.sqrt(s1[i] * s2[i])
            e12 = np.sqrt(e1 * e2)
        else:
            s12 = ((s1[i] ** 6 + s2[i] ** 6) / 2) ** (1 / 6)
            e12 = (
                2 * np.sqrt(e1 * e2) * s1[i] ** 3 * s2[i] ** 3
                / (s1[i] ** 6 + s2[i] ** 6)
            )

        def u(x, s12=s12, e12=e12):
            return 4 * e12 * ((s12 / x) ** 12 - (s12 / x) ** 6)

        ref = np.where(
            r < cl, u(r) - (u(cl) if shift else 0.0), 0.0
        )
        np.testing.assert_allclose(got, ref, rtol=1e-11)


def test_ljts_custom_coefs_powers_dicts():
    cutoff = cl = 1.3
    expr, _ = ljts_energy(
        cutoff, cl, shift=False,
        coefs={"A": 2.0, "B": 3.0, "C": 1.5},
        powers={"r": 9, "a": 3},
    )
    r = np.linspace(0.4, 1.2, 17)
    got = evaluate_expression(
        expr, r=r, sigma1=0.8, sigma2=1.0, epsilon1=1.0, epsilon2=4.0
    )
    s12, e12 = 0.9, 2.0
    ref = 1.5 * e12 * (2.0 * (s12 / r) ** 9 - 3.0 * (s12 / r) ** 3)
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_mie_prefactor_matches_reference_formula():
    p, q = 14, 7
    cutoff = cl = 1.5
    expr, _ = ljts_energy(
        cutoff, cl, shift=False, powers=(p, q), mie=True
    )
    coef = p / (p - q) * (p / q) ** (q / (p - q))
    r = np.linspace(0.6, 1.4, 9)
    got = evaluate_expression(
        expr, r=r, sigma1=1.0, sigma2=1.0, epsilon1=1.0, epsilon2=1.0
    )
    ref = coef * ((1 / r) ** p - (1 / r) ** q)
    np.testing.assert_allclose(got, ref, rtol=1e-12)
    # The Mie minimum is exactly -epsilon at r = (p/q)^(1/(p-q)) sigma.
    rmin = np.array([(p / q) ** (1 / (p - q))])
    np.testing.assert_allclose(
        evaluate_expression(
            expr, r=rmin, sigma1=1.0, sigma2=1.0,
            epsilon1=1.0, epsilon2=1.0,
        ),
        -1.0, rtol=1e-12,
    )


def test_wca_matches_reference_formula():
    expr, per = ljts_energy(1.5, 1.5, wca=True, mix="arithmetic")
    assert per == ["sigma", "epsilon"]
    p, q = 12, 6
    coef = p / (p - q) * (p / q) ** (q / (p - q))  # = 4 for 12-6
    assert np.isclose(coef, 4.0)
    s1, s2, r = _pair_grid()
    for i in range(len(s1)):
        s12 = (s1[i] + s2[i]) / 2
        got = evaluate_expression(
            expr, r=r, sigma1=s1[i], sigma2=s2[i],
            epsilon1=1.3, epsilon2=1.3,
        )
        rc = 2 ** (1 / 6) * s12
        u = 4 * 1.3 * ((s12 / r) ** 12 - (s12 / r) ** 6) + 1.3
        ref = np.where(r < rc, u, 0.0)
        np.testing.assert_allclose(got, ref, rtol=1e-11)
        # Purely repulsive: never negative, and exactly 0 at its
        # minimum-distance cutoff.
        assert (got >= -1e-12).all()
        np.testing.assert_allclose(
            evaluate_expression(
                expr, r=np.array([rc - 1e-13]),
                sigma1=s1[i], sigma2=s2[i],
                epsilon1=1.3, epsilon2=1.3,
            ),
            0.0, atol=1e-9,
        )


# ---------------------------------------------------------------------
# solvation (reference pair.py:1011-1016)
# ---------------------------------------------------------------------
@pytest.mark.parametrize("mix", ["arithmetic", "geometric"])
def test_solvation_matches_reference_formula(mix):
    cut = 1.0
    expr, per = solvation_energy(cut, mix=mix)
    assert per == ["sigma", "S"]
    s1, s2, r = _pair_grid()
    S1, S2 = rng.uniform(0.5, 2.0, 2)
    for i in range(len(s1)):
        got = evaluate_expression(
            expr, r=r, sigma1=s1[i], sigma2=s2[i], S1=S1, S2=S2,
            cut=cut,
        )
        s12 = (
            (s1[i] + s2[i]) / 2
            if mix == "arithmetic"
            else np.sqrt(s1[i] * s2[i])
        )
        S12 = np.sqrt(S1 * S2)
        ref = -S12 * ((s12 / r) ** 4 - (s12 / cut) ** 4)
        np.testing.assert_allclose(got, ref, rtol=1e-12)
    # Zero at the cutoff by construction.
    np.testing.assert_allclose(
        evaluate_expression(
            expr, r=np.array([cut]), sigma1=1.0, sigma2=1.0,
            S1=1.0, S2=1.0, cut=cut,
        ),
        0.0, atol=1e-14,
    )


# ---------------------------------------------------------------------
# yukawa (reference pair.py:1262-1270)
# ---------------------------------------------------------------------
@pytest.mark.parametrize("shift", [True, False])
def test_yukawa_matches_reference_formula(shift):
    cutoff, cy, kappa = 1.2, 1.0, 2.5
    expr, per = yukawa_energy(
        cutoff, cy, shift=shift, mix="geometric",
        known_globals=("kappa",),
    )
    assert per == ["alpha"]
    a1, a2, r = _pair_grid()
    for i in range(len(a1)):
        got = evaluate_expression(
            expr, r=r, alpha1=a1[i], alpha2=a2[i], kappa=kappa
        )
        a12 = np.sqrt(a1[i] * a2[i])
        bare = a12 * np.exp(-kappa * r) / r
        ucut = a12 * np.exp(-kappa * cy) / cy if shift else 0.0
        ref = np.where(r < cy, bare - ucut, 0.0)
        np.testing.assert_allclose(got, ref, rtol=1e-12)
    with pytest.raises(ValueError, match="kappa"):
        yukawa_energy(cutoff, cy, mix="geometric")


# ---------------------------------------------------------------------
# FENE bond (reference bond.py:100)
# ---------------------------------------------------------------------
def test_fene_matches_reference_formula():
    expr = fene_energy()
    k, r0 = 30.0, 1.5
    r = np.linspace(0.1, 1.4, 31)
    got = evaluate_expression(expr, r=r, k=k, r0=r0)
    ref = -0.5 * k * r0**2 * np.log(1 - (r / r0) ** 2)
    np.testing.assert_allclose(got, ref, rtol=1e-12)
    # Diverges at full extension, harmonic near zero: u ~ k r^2 / 2.
    small = np.array([1e-4])
    np.testing.assert_allclose(
        evaluate_expression(expr, r=small, k=k, r0=r0),
        0.5 * k * small**2, rtol=1e-6,
    )
    assert evaluate_expression(
        expr, r=np.array([r0 * (1 - 1e-9)]), k=k, r0=r0
    ) > 1e2
