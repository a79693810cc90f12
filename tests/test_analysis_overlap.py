"""Overlap function Q(t) / four-point susceptibility chi4(t) vs a
float64 NumPy oracle — beyond-reference capability (glassy-dynamics
observable; no reference counterpart)."""

import numpy as np
import pytest

from mdhelper_tpu.analysis.dynamics import OverlapFunction
from mdhelper_tpu.core.universe import Universe

rng = np.random.default_rng(41)


def _make_universe(n=30, n_frames=12, box_length=8.0, seed=5):
    r = np.random.default_rng(seed)
    box = np.array([box_length] * 3)
    pos = np.empty((n_frames, n, 3))
    pos[0] = r.random((n, 3)) * box
    for f in range(1, n_frames):
        pos[f] = (pos[f - 1] + 0.4 * r.standard_normal((n, 3))) % box
    u = Universe.from_arrays(
        pos, box,
        masses=np.ones(n),
        types=np.array(["A"] * n, dtype=object),
        resindices=np.repeat(np.arange(n // 3), 3),
        segindices=np.zeros(n, int),
    )
    return u, pos, box


def _oracle(pos, box, a, lags):
    """Float64 Q(t), chi4(t) over all valid time origins."""

    n_frames, n, _ = pos.shape
    q_mean = np.empty(len(lags))
    chi4 = np.empty(len(lags))
    for li, lag in enumerate(lags):
        qs = []
        for t0 in range(n_frames - lag):
            d = pos[t0 + lag] - pos[t0]
            d -= box * np.round(d / box)
            qs.append(
                (np.linalg.norm(d, axis=1) < a).mean()
            )
        qs = np.array(qs)
        q_mean[li] = qs.mean()
        chi4[li] = n * (np.mean(qs**2) - qs.mean() ** 2)
    return q_mean, chi4


def test_overlap_matches_oracle():
    u, pos, box = _make_universe()
    a = 0.9
    ov = OverlapFunction(u.atoms, a, verbose=False).run()
    lags = np.arange(pos.shape[0])
    q_o, chi4_o = _oracle(pos, box, a, lags)
    np.testing.assert_allclose(ov.results.Q, q_o, atol=1e-12)
    np.testing.assert_allclose(ov.results.chi4, chi4_o, atol=1e-9)
    # identities: full overlap and zero fluctuation at t = 0
    assert ov.results.Q[0] == 1.0
    np.testing.assert_allclose(ov.results.chi4[0], 0.0, atol=1e-9)
    np.testing.assert_array_equal(
        ov.results.origins, pos.shape[0] - lags
    )


def test_overlap_lag_subset_and_ring():
    u, pos, box = _make_universe(n_frames=16)
    a = 1.1
    ov = OverlapFunction(
        u.atoms, a, n_lags=8, lags=[0, 1, 3, 7], verbose=False
    ).run()
    q_o, chi4_o = _oracle(pos, box, a, [0, 1, 3, 7])
    np.testing.assert_allclose(ov.results.Q, q_o, atol=1e-12)
    np.testing.assert_allclose(ov.results.chi4, chi4_o, atol=1e-9)


def test_overlap_grouping_com():
    u, pos, box = _make_universe()
    ov = OverlapFunction(
        u.atoms, 1.0, grouping="residues", verbose=False
    ).run()
    # oracle on residue COMs (unit masses)
    com = pos.reshape(pos.shape[0], -1, 3, 3).mean(axis=2)
    q_o, chi4_o = _oracle(com, box, 1.0, np.arange(pos.shape[0]))
    np.testing.assert_allclose(ov.results.Q, q_o, atol=1e-12)
    np.testing.assert_allclose(ov.results.chi4, chi4_o, atol=1e-9)


def test_overlap_triclinic():
    n, F = 20, 6
    dims = np.array([8.0, 8.0, 8.0, 80.0, 95.0, 100.0])
    pos = rng.random((F, n, 3)) * 7.0
    u = Universe.from_arrays(
        pos, dims, types=np.array(["A"] * n, dtype=object)
    )
    ov = OverlapFunction(u.atoms, 1.5, verbose=False).run()
    # triclinic oracle: brute 27-image minimum distance
    def h_matrix(d):
        a, b, c = d[:3]
        al, be, ga = np.deg2rad(d[3:6])
        bx, by = b * np.cos(ga), b * np.sin(ga)
        cx = c * np.cos(be)
        cy = c * (np.cos(al) - np.cos(be) * np.cos(ga)) / np.sin(ga)
        cz = np.sqrt(c**2 - cx**2 - cy**2)
        return np.array([[a, 0, 0], [bx, by, 0], [cx, cy, cz]])

    h = h_matrix(dims)
    inv = np.linalg.inv(h)
    qs = np.empty((F, F))
    for lag in range(F):
        for t0 in range(F - lag):
            d = pos[t0 + lag] - pos[t0]
            frac = d @ inv
            frac -= np.round(frac)
            base = frac @ h
            best = (base**2).sum(-1)
            for sx in (-1, 0, 1):
                for sy in (-1, 0, 1):
                    for sz in (-1, 0, 1):
                        cand = base + np.array([sx, sy, sz]) @ h
                        best = np.minimum(best, (cand**2).sum(-1))
            qs[lag, t0] = (np.sqrt(best) < 1.5).mean()
    for lag in range(F):
        v = qs[lag, : F - lag]
        np.testing.assert_allclose(
            ov.results.Q[lag], v.mean(), atol=1e-12
        )


def test_overlap_validation():
    u, _, _ = _make_universe()
    with pytest.raises(ValueError, match="'a' must be positive"):
        OverlapFunction(u.atoms, -1.0, verbose=False)
