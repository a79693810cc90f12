"""Mesh (Kaiser-Bessel NUFFT) structure-factor kernel tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from mdhelper_tpu.core import Universe
from mdhelper_tpu.analysis.structure import StructureFactor
from mdhelper_tpu.ops.mesh_scattering import mesh_plan, mesh_trig_sums

rng = np.random.default_rng(13)


def test_mesh_trig_sums_matches_f64_oracle():
    n, box, n_points = 1500, 20.0, 10
    pos = (rng.random((n, 3)) * box).astype(np.float32)
    plan = mesh_plan(n_points, [box] * 3)
    cos, sin = mesh_trig_sums(
        jnp.asarray(pos), n_points=n_points, mesh=plan["mesh"],
        width=plan["width"], beta=plan["beta"], box=plan["box"],
        deconv=plan["deconv"], atom_chunk=512,
    )
    cos = np.asarray(cos, np.float64).reshape(-1)
    sin = np.asarray(sin, np.float64).reshape(-1)

    k = np.arange(n_points)
    nn = np.stack(np.meshgrid(k, k, k, indexing="ij"), -1).reshape(-1, 3)
    ph = (2 * np.pi * nn / box) @ pos.astype(np.float64).T
    oc, os_ = np.cos(ph).sum(1), np.sin(ph).sum(1)
    err = np.hypot(cos - oc, sin - os_)
    assert np.median(err[1:]) / np.sqrt(n) < 1e-5
    assert err[1:].max() / np.sqrt(n) < 1e-4
    # q = 0 is analytic.
    assert cos[0] == n and sin[0] == 0


def test_mesh_trig_sums_weights():
    n, box, n_points = 600, 15.0, 6
    pos = (rng.random((n, 3)) * box).astype(np.float32)
    w = rng.random(n).astype(np.float32)
    plan = mesh_plan(n_points, [box] * 3)
    cos, _ = mesh_trig_sums(
        jnp.asarray(pos), n_points=n_points, mesh=plan["mesh"],
        width=plan["width"], beta=plan["beta"], box=plan["box"],
        deconv=plan["deconv"], weights=jnp.asarray(w),
        atom_chunk=256,
    )
    cos = np.asarray(cos, np.float64).reshape(-1)
    k = np.arange(n_points)
    nn = np.stack(np.meshgrid(k, k, k, indexing="ij"), -1).reshape(-1, 3)
    ph = (2 * np.pi * nn / box) @ pos.astype(np.float64).T
    oc = (np.cos(ph) * w).sum(1)
    assert np.abs(cos - oc).max() / np.sqrt(n) < 1e-4
    assert np.isclose(cos[0], w.sum(), rtol=1e-6)


def test_structure_factor_mesh_method():
    n, box, T = 2000, 18.0, 3
    traj = (rng.random((T, n, 3)) * box).astype(np.float32)
    u = Universe.from_arrays(traj, np.array([box] * 3), dt=1.0)
    sf_d = StructureFactor(u.atoms, n_points=8, verbose=False).run()
    sf_m = StructureFactor(
        u.atoms, n_points=8, method="mesh", verbose=False
    ).run()
    np.testing.assert_allclose(
        sf_m.results.ssf, sf_d.results.ssf, rtol=5e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        sf_m.results.wavenumbers, sf_d.results.wavenumbers
    )


def test_structure_factor_mesh_rejects_surfaces():
    n, box = 200, 12.0
    traj = (rng.random((2, n, 3)) * box).astype(np.float32)
    u = Universe.from_arrays(traj, np.array([box] * 3), dt=1.0)
    with pytest.raises(ValueError, match="mesh"):
        StructureFactor(
            u.atoms, n_points=6, n_surfaces=2, method="mesh",
            verbose=False,
        ).run()


def test_isf_mesh_matches_direct():
    from mdhelper_tpu.analysis.structure import (
        IntermediateScatteringFunction,
    )

    n, box, T = 800, 14.0, 6
    traj = (rng.random((T, n, 3)) * box).astype(np.float32)
    u = Universe.from_arrays(traj, np.array([box] * 3), dt=1.0)
    kw = dict(n_points=6, n_lags=4, incoherent=True, verbose=False)
    isf_d = IntermediateScatteringFunction(u.atoms, **kw).run()
    isf_m = IntermediateScatteringFunction(
        u.atoms, method="mesh", **kw
    ).run()
    np.testing.assert_allclose(
        isf_m.results.cisf, isf_d.results.cisf, rtol=2e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        isf_m.results.iisf, isf_d.results.iisf, rtol=2e-3, atol=1e-3
    )
