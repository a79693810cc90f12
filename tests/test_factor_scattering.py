"""Tests for the tensor-factorized lattice structure-factor path
(`ops/factor_scattering.py` and `StructureFactor(method="factor")`).
Oracle: direct f64 NumPy sums (parity target: the reference's exact
per-wavevector sweep, /root/reference/src/mdhelper/algorithm/
accelerated.py:81-165)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mdhelper_tpu.analysis.structure import (
    IntermediateScatteringFunction,
    StructureFactor,
)
from mdhelper_tpu.core import Universe
from mdhelper_tpu.ops.factor_scattering import (
    factor_plan,
    factor_trig_sums,
)

rng = np.random.default_rng(7)

BOX = (20.0, 17.5, 23.0)


def grid_wavevectors(k, box):
    grids = [2 * np.pi * np.arange(k) / L for L in box]
    return np.stack(
        np.meshgrid(*grids, indexing="ij"), -1
    ).reshape(-1, 3)


def oracle(qs, pos, w=None):
    phases = qs @ pos.astype(np.float64).T
    w = np.ones(pos.shape[0]) if w is None else w
    return (np.cos(phases) * w).sum(1), (np.sin(phases) * w).sum(1)


@pytest.mark.parametrize("precision,tol", [("fast", 5e-4), ("exact", 5e-5)])
def test_factor_trig_sums_vs_oracle(precision, tol):
    n, k = 3000, 7
    pos = (rng.random((n, 3)) * BOX).astype(np.float32)
    qs = grid_wavevectors(k, BOX)
    plan = factor_plan(qs, BOX)
    assert plan["k"] == (k, k, k)
    c, s = factor_trig_sums(
        jnp.asarray(pos), k=plan["k"], box=plan["box"],
        precision=precision,
    )
    c = np.asarray(c)[plan["flat_idx"]]
    s = np.asarray(s)[plan["flat_idx"]]
    oc, os_ = oracle(qs, pos)
    rel = np.hypot(c - oc, s - os_) / np.maximum(
        np.hypot(oc, os_), 1e-30
    )
    assert np.median(rel[1:]) < tol / 10
    assert rel[1:].max() < tol * 10
    # q = 0: sum of weights exactly.
    assert np.isclose(c[0], n) and np.isclose(s[0], 0.0)


def test_factor_trig_sums_weights_and_unwrapped():
    n, k = 1000, 5
    pos = (rng.random((n, 3)) * BOX).astype(np.float32)
    # Unwrapped coordinates several boxes away; the phase reduction is
    # periodic, so the sums must match the wrapped oracle.
    pos = pos + np.float32([3 * BOX[0], -2 * BOX[1], 5 * BOX[2]])
    w = rng.random(n).astype(np.float32)
    qs = grid_wavevectors(k, BOX)
    plan = factor_plan(qs, BOX)
    c, s = factor_trig_sums(
        jnp.asarray(pos), jnp.asarray(w), k=plan["k"],
        box=plan["box"], precision="exact",
    )
    c = np.asarray(c)[plan["flat_idx"]]
    s = np.asarray(s)[plan["flat_idx"]]
    oc, os_ = oracle(qs, pos, w)
    assert np.allclose(c, oc, atol=5e-4)
    assert np.allclose(s, os_, atol=5e-4)


def test_factor_plan_rejects_off_lattice():
    qs = grid_wavevectors(4, BOX)
    with pytest.raises(ValueError):
        factor_plan(qs + 1e-3, BOX)
    with pytest.raises(ValueError):
        factor_plan(-qs[1:], BOX)  # negative indices
    # q_max-style subsets of the lattice are fine (any ordering).
    sub = qs[np.linalg.norm(qs, axis=1) <= 1.0][::-1]
    plan = factor_plan(sub, BOX)
    assert len(plan["flat_idx"]) == len(sub)


# ---------------------------------------------------------------------
# Analysis-class integration
# ---------------------------------------------------------------------
T, NA, NB = 6, 30, 20
N = NA + NB
UBOX = 8.0


@pytest.fixture(scope="module")
def universe():
    # float32-representable coordinates so the float64 direct oracle
    # and the float32 factor tables see identical inputs.
    positions = (
        rng.random((T, N, 3)).astype(np.float32).astype(np.float64)
        * UBOX
    )
    return Universe.from_arrays(
        positions,
        np.array([UBOX] * 3),
        types=np.array(["A"] * NA + ["B"] * NB, dtype=object),
        dt=1.0,
    )


def test_ssf_factor_matches_direct(universe):
    direct = StructureFactor(
        universe.atoms, n_points=5, method="direct", verbose=False
    ).run()
    factor = StructureFactor(
        universe.atoms, n_points=5, method="factor",
        precision="exact", verbose=False,
    ).run()
    assert np.allclose(
        factor.results.ssf, direct.results.ssf, rtol=1e-4, atol=1e-5
    )


def test_ssf_factor_partial_and_qmax(universe):
    ag_a = universe.select_atoms("type A")
    ag_b = universe.select_atoms("type B")
    kwargs = dict(
        mode="partial", n_points=4, q_max=2.5, unique=False,
        sort=False, verbose=False,
    )
    direct = StructureFactor(
        [ag_a, ag_b], method="direct", **kwargs
    ).run()
    factor = StructureFactor(
        [ag_a, ag_b], method="factor", precision="exact", **kwargs
    ).run()
    assert np.allclose(
        factor.results.ssf, direct.results.ssf, rtol=1e-4, atol=1e-5
    )


def test_ssf_auto_routes_float32_to_factor(universe):
    # float32 streaming (the TPU configuration: x64 disabled downcasts
    # device arrays to f32) must route method="auto" onto the factor
    # kernel and still match the direct sweep.
    auto = StructureFactor(universe.atoms, n_points=4, verbose=False)
    auto._coord_dtype = np.float32
    auto.run()
    assert auto._factor is not None
    assert auto._use_factor(jnp.zeros((1, 3), jnp.float32))
    assert not auto._use_factor(jnp.zeros((1, 3), jnp.float64))
    direct = StructureFactor(
        universe.atoms, n_points=4, method="direct", verbose=False
    ).run()
    assert np.allclose(
        auto.results.ssf, direct.results.ssf, rtol=1e-4, atol=1e-5
    )


def test_ssf_auto_splits_or_falls_back_off_lattice(universe):
    # Spherical-surface extras are off-lattice: with a big enough
    # lattice subset the set SPLITS (grid -> factorized kernel,
    # extras -> direct sweep); the plan then covers the subset only.
    sf = StructureFactor(
        universe.atoms, n_points=4, n_surfaces=2, verbose=False
    ).run()
    assert sf._factor is not None
    assert sf._factor_split is not None
    assert len(sf._factor_split["qs_rest"]) == 2 * 8
    # A tiny lattice subset (3^3 = 27 < 64 points) is not worth the
    # tables: auto falls back to the direct sweep, explicit factor
    # raises.
    tiny = StructureFactor(
        universe.atoms, n_points=3, n_surfaces=2, verbose=False
    ).run()
    assert tiny._factor is None
    with pytest.raises(ValueError):
        StructureFactor(
            universe.atoms, n_points=3, n_surfaces=2,
            method="factor", verbose=False,
        ).run()


def test_ssf_factor_shard_q_rejected(universe):
    with pytest.raises(ValueError):
        StructureFactor(
            universe.atoms, n_points=4, shard="q", method="factor",
            verbose=False,
        )


def test_isf_factor_matches_direct(universe):
    kwargs = dict(
        n_points=4, n_lags=4, unique=False, sort=False,
        incoherent=True, verbose=False,
    )
    direct = IntermediateScatteringFunction(
        universe.atoms, method="direct", **kwargs
    ).run()
    factor = IntermediateScatteringFunction(
        universe.atoms, method="factor", precision="exact", **kwargs
    ).run()
    assert np.allclose(
        factor.results.cisf, direct.results.cisf, rtol=1e-4, atol=1e-5
    )
    assert np.allclose(
        factor.results.iisf, direct.results.iisf, rtol=1e-4, atol=1e-5
    )


def test_isf_factor_split_with_surfaces(universe):
    kwargs = dict(
        n_points=4, n_surfaces=2, n_lags=4, unique=False, sort=False,
        verbose=False,
    )
    direct = IntermediateScatteringFunction(
        universe.atoms, method="direct", **kwargs
    ).run()
    factor = IntermediateScatteringFunction(
        universe.atoms, method="factor", precision="exact", **kwargs
    ).run()
    assert factor._factor_split is not None
    assert np.allclose(
        factor.results.cisf, direct.results.cisf, rtol=1e-4, atol=1e-5
    )
