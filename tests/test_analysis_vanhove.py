"""Van Hove correlation function G(r, t) vs NumPy oracles.

Beyond-reference capability (the reference computes only the t = 0
limit as the RDF and the reciprocal-space ISF); the oracle is a
double-loop float64 NumPy implementation of the textbook definition.
"""

import numpy as np
import pytest

from mdhelper_tpu.analysis.structure import (
    RadialDistributionFunction,
    VanHoveFunction,
)
from mdhelper_tpu.core.universe import Universe

rng = np.random.default_rng(77)


def _make_universe(n=24, n_frames=10, box_length=8.0, seed=77):
    r = np.random.default_rng(seed)
    box = np.array([box_length] * 3)
    pos = np.empty((n_frames, n, 3))
    pos[0] = r.random((n, 3)) * box
    for f in range(1, n_frames):
        pos[f] = (pos[f - 1] + 0.3 * r.standard_normal((n, 3))) % box
    return Universe.from_arrays(
        pos,
        box,
        masses=np.ones(n),
        charges=np.zeros(n),
        types=np.array(["A"] * n, dtype=object),
        resindices=np.repeat(np.arange(n // 4), 4),
        segindices=np.zeros(n, int),
    ), pos, box


def _oracle(pos, box, edges, lags):
    """Float64 double-loop Van Hove counts (self, distinct)."""

    n_frames, n, _ = pos.shape
    counts_s = np.zeros((len(lags), len(edges) - 1))
    counts_d = np.zeros_like(counts_s)
    box = np.asarray(box, dtype=float)
    for li, lag in enumerate(lags):
        for t0 in range(n_frames - lag):
            a, b = pos[t0], pos[t0 + lag]
            d = b - a
            d -= box * np.round(d / box)
            counts_s[li] += np.histogram(
                np.linalg.norm(d, axis=1), bins=edges
            )[0]
            delta = a[:, None, :] - b[None, :, :]
            delta -= box * np.round(delta / box)
            dist = np.linalg.norm(delta, axis=-1)
            np.fill_diagonal(dist, np.inf)
            counts_d[li] += np.histogram(dist, bins=edges)[0]
    return counts_s, counts_d


def test_vanhove_counts_match_oracle():
    u, pos, box = _make_universe()
    vh = VanHoveFunction(u.atoms, n_bins=25, range=(0.0, 4.0)).run()
    lags = np.arange(u.trajectory.n_frames)
    edges = vh.results.edges
    counts_s, counts_d = _oracle(pos, box, edges, lags)
    np.testing.assert_array_equal(vh.results.counts_self, counts_s)
    np.testing.assert_array_equal(
        vh.results.counts_distinct, counts_d
    )

    # Normalizations: Gs integrates to 1 over the (generous) range;
    # g_d(r, 0) equals the self-RDF of the same trajectory.
    shell = 4 * np.pi * np.diff(edges**3) / 3
    np.testing.assert_allclose(
        (vh.results.gs * shell).sum(axis=1), 1.0, rtol=1e-12
    )
    rdf = RadialDistributionFunction(
        u.atoms, n_bins=25, range=(0.0, 4.0), exclusion=(1, 1)
    ).run()
    np.testing.assert_array_equal(
        vh.results.counts_distinct[0], rdf.results.counts
    )
    origins = len(lags) - lags
    volume = float(np.prod(box))
    n = u.atoms.n_atoms
    np.testing.assert_allclose(
        vh.results.gd,
        counts_d
        * volume
        / (origins[:, None] * n * (n - 1) * shell),
        rtol=1e-12,
    )
    assert vh.results.times.shape == (len(lags),)

    # Displacement moments: <r^2>(t) and the non-Gaussian parameter,
    # accumulated exactly (not re-binned from the histogram).
    n_frames = pos.shape[0]
    m2 = np.zeros(len(lags))
    m4 = np.zeros(len(lags))
    for li, lag in enumerate(lags):
        for t0 in range(n_frames - lag):
            d = pos[t0 + lag] - pos[t0]
            d -= box * np.round(d / box)
            r2 = (d**2).sum(axis=1)
            m2[li] += r2.sum()
            m4[li] += (r2**2).sum()
    origins_n = (n_frames - lags) * n
    np.testing.assert_allclose(
        vh.results.msd, m2 / origins_n, rtol=1e-12
    )
    with np.errstate(invalid="ignore"):
        alpha2 = (
            3 * (m4 / origins_n) / (5 * (m2 / origins_n) ** 2) - 1
        )
    np.testing.assert_allclose(
        vh.results.alpha2[1:], alpha2[1:], rtol=1e-10
    )


def test_vanhove_lag_subsets_and_ring_reuse():
    u, pos, box = _make_universe(n_frames=14)
    dense = VanHoveFunction(u.atoms, n_bins=20, range=(0.0, 4.0)).run()
    lag_values = np.array([0, 3, 7, 13])
    sub = VanHoveFunction(
        u.atoms, n_bins=20, range=(0.0, 4.0), lags=lag_values
    ).run()
    np.testing.assert_array_equal(
        sub.results.counts_self, dense.results.counts_self[lag_values]
    )
    np.testing.assert_array_equal(
        sub.results.counts_distinct,
        dense.results.counts_distinct[lag_values],
    )
    # Short ring: n_lags bounds residency, lags select within it.
    ring = VanHoveFunction(
        u.atoms, n_bins=20, range=(0.0, 4.0), n_lags=8, lags="log"
    ).run()
    picked = ring.results.times / u.trajectory.dt
    np.testing.assert_array_equal(
        ring.results.counts_distinct,
        dense.results.counts_distinct[picked.astype(int)],
    )


def test_vanhove_chunked_equals_single_chunk():
    u, pos, box = _make_universe(n_frames=12)
    whole = VanHoveFunction(u.atoms, n_bins=15, range=(0.0, 3.5)).run()
    chunked = VanHoveFunction(u.atoms, n_bins=15, range=(0.0, 3.5))
    chunked._chunk_bytes = 5 * u.atoms.n_atoms * 3 * 8  # 5 frames
    chunked.run()
    np.testing.assert_array_equal(
        whole.results.counts_self, chunked.results.counts_self
    )
    np.testing.assert_array_equal(
        whole.results.counts_distinct, chunked.results.counts_distinct
    )


def test_vanhove_lag_split_matches_single_pass(monkeypatch):
    """The brute-path lag-split mode (one compiled step per lag
    subset, forced here via a tiny MDTPU_EXEC_BUDGET_S) reproduces
    the single-pass scan bit-for-bit — the watchdog escape for
    configurations whose one-frame sweep exceeds the execution
    budget."""

    u, pos, box = _make_universe(n_frames=12)
    whole = VanHoveFunction(
        u.atoms, n_bins=15, range=(0.0, 3.5), verbose=False
    ).run()
    monkeypatch.setenv("MDTPU_EXEC_BUDGET_S", "1e-9")
    u2, _, _ = _make_universe(n_frames=12)
    with pytest.warns(UserWarning, match="splitting"):
        split = VanHoveFunction(
            u2.atoms, n_bins=15, range=(0.0, 3.5), verbose=False
        ).run()
    for key in (
        "counts_self", "counts_distinct", "gs", "gd", "msd", "alpha2"
    ):
        np.testing.assert_array_equal(
            np.asarray(getattr(whole.results, key)),
            np.asarray(getattr(split.results, key)),
            err_msg=key,
        )


def test_vanhove_lag_split_log_lags(monkeypatch):
    """Lag splitting composes with the log lag grid and a >1-frame
    chunk request (the chunk cap shrinks it; grouping stays exact)."""

    u, pos, box = _make_universe(n_frames=14)
    whole = VanHoveFunction(
        u.atoms, n_bins=12, range=(0.0, 3.2), n_lags=8,
        lags="log", verbose=False,
    ).run()
    monkeypatch.setenv("MDTPU_EXEC_BUDGET_S", "1e-9")
    u2, _, _ = _make_universe(n_frames=14)
    with pytest.warns(UserWarning, match="splitting"):
        split = VanHoveFunction(
            u2.atoms, n_bins=12, range=(0.0, 3.2), n_lags=8,
            lags="log", verbose=False,
        ).run()
    np.testing.assert_array_equal(
        whole.results.counts_distinct, split.results.counts_distinct
    )
    np.testing.assert_array_equal(
        whole.results.counts_self, split.results.counts_self
    )


def test_vanhove_offset_range():
    """range[0] > 0 against the f64 oracle (the Pallas route's
    offset-grid binning is covered kernel-level in test_pallas; this
    covers the class plumbing both paths share)."""

    u, pos, box = _make_universe(n_frames=8)
    vh = VanHoveFunction(
        u.atoms, n_bins=14, range=(1.2, 3.6), verbose=False
    ).run()
    counts_s, counts_d = _oracle(
        pos, box, vh.results.edges, np.arange(8)
    )
    np.testing.assert_array_equal(vh.results.counts_self, counts_s)
    np.testing.assert_array_equal(
        vh.results.counts_distinct, counts_d
    )


def test_vanhove_exact_f32_stream_matches_f64_oracle():
    u, pos, box = _make_universe(n=20, n_frames=8)
    vh = VanHoveFunction(u.atoms, n_bins=18, range=(0.0, 3.9))
    vh._coord_dtype = np.float32  # TPU streaming configuration
    vh.run()
    # The oracle sees the same float32-rounded coordinates the exact
    # double-float kernels bin (exactness is relative to the stream).
    pos32 = pos.astype(np.float32).astype(np.float64)
    counts_s, counts_d = _oracle(
        pos32, box.astype(np.float32), vh.results.edges,
        np.arange(u.trajectory.n_frames),
    )
    np.testing.assert_array_equal(vh.results.counts_self, counts_s)
    np.testing.assert_array_equal(
        vh.results.counts_distinct, counts_d
    )


def test_vanhove_grouping_and_parts():
    u, pos, box = _make_universe()
    vh = VanHoveFunction(
        u.atoms, n_bins=12, range=(0.0, 4.0), grouping="residues",
        distinct_part=False,
    ).run()
    assert vh.results.counts_distinct is None
    assert vh.results.gd is None
    # Residue-COM displacement counts vs oracle over COM trajectories.
    n_res = 6
    com = pos.reshape(pos.shape[0], n_res, 4, 3).mean(axis=2)
    counts_s, _ = _oracle(
        com, box, vh.results.edges, np.arange(pos.shape[0])
    )
    np.testing.assert_array_equal(vh.results.counts_self, counts_s)

    with pytest.raises(ValueError):
        VanHoveFunction(
            u.atoms, self_part=False, distinct_part=False
        )


def test_vanhove_triclinic():
    from mdhelper_tpu.algorithm.topology import triclinic_matrices

    r = np.random.default_rng(5)
    n, n_frames = 18, 6
    dims6 = np.array([8.0, 7.5, 7.0, 80.0, 95.0, 100.0])
    mat = np.asarray(triclinic_matrices(dims6))
    frac = r.random((n_frames, n, 3))
    pos = frac @ mat
    u = Universe.from_arrays(
        pos,
        dims6,
        masses=np.ones(n),
        charges=np.zeros(n),
        types=np.array(["A"] * n, dtype=object),
        resindices=np.zeros(n, int),
        segindices=np.zeros(n, int),
    )
    vh = VanHoveFunction(u.atoms, n_bins=16, range=(0.0, 3.5)).run()

    # Oracle: brute 27-image minimum-distance search per pair.
    shifts = (
        np.array(
            [
                (i, j, k)
                for i in (-1, 0, 1)
                for j in (-1, 0, 1)
                for k in (-1, 0, 1)
            ],
            dtype=float,
        )
        @ mat
    )
    inv = np.linalg.inv(mat)

    def min_dist(delta):
        fr = delta @ inv
        fr -= np.round(fr)
        base = fr @ mat
        best = np.full(delta.shape[:-1], np.inf)
        for s in shifts:
            cand = base + s
            best = np.minimum(best, (cand**2).sum(axis=-1))
        return np.sqrt(best)

    edges = vh.results.edges
    lags = np.arange(n_frames)
    counts_s = np.zeros((n_frames, len(edges) - 1))
    counts_d = np.zeros_like(counts_s)
    for li, lag in enumerate(lags):
        for t0 in range(n_frames - lag):
            a, b = pos[t0], pos[t0 + lag]
            counts_s[li] += np.histogram(
                min_dist(b - a), bins=edges
            )[0]
            dist = min_dist(a[:, None, :] - b[None, :, :])
            np.fill_diagonal(dist, np.inf)
            counts_d[li] += np.histogram(dist, bins=edges)[0]
    np.testing.assert_array_equal(vh.results.counts_self, counts_s)
    np.testing.assert_array_equal(
        vh.results.counts_distinct, counts_d
    )


def test_vanhove_checkpoint_resume(tmp_path):
    """The ring carry (positions + counters) checkpoints and resumes
    mid-stream like any carry-accumulating analysis."""

    u, pos, box = _make_universe(n=16, n_frames=10)
    ckpt = str(tmp_path / "vh_carry.npz")

    full = VanHoveFunction(
        u.atoms, n_bins=10, range=(0.0, 4.0), n_lags=4,
        verbose=False,
    ).run()

    partial = VanHoveFunction(
        u.atoms, n_bins=10, range=(0.0, 4.0), n_lags=4,
        verbose=False,
    )
    partial._chunk_bytes = 2 * 16 * 3 * 8  # 2 frames per chunk
    partial.run(stop=6, checkpoint=ckpt)

    resumed = VanHoveFunction(
        u.atoms, n_bins=10, range=(0.0, 4.0), n_lags=4,
        verbose=False,
    )
    resumed._chunk_bytes = 2 * 16 * 3 * 8
    resumed.run(checkpoint=ckpt)
    np.testing.assert_array_equal(
        resumed.results.counts_self, full.results.counts_self
    )
    np.testing.assert_array_equal(
        resumed.results.counts_distinct, full.results.counts_distinct
    )


def test_vanhove_reduced_units():
    u, pos, box = _make_universe(n=12, n_frames=4)
    vh = VanHoveFunction(
        u.atoms, n_bins=8, range=(0.0, 3.0), reduced=True,
        verbose=False,
    ).run()
    assert vh.results.units == {}
    assert vh.results.msd is not None
