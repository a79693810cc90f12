"""Pallas kernel tests (interpreter mode on CPU; the same code paths
compile with Mosaic on TPU — see ops/pallas_kernels.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mdhelper_tpu.ops.pallas_kernels import pair_histogram, trig_sums

rng = np.random.default_rng(31)
BOX = 24.0


@pytest.mark.parametrize("precision", ["fast", "exact"])
def test_trig_sums_matches_oracle(precision):
    pos = (rng.random((700, 3)) * BOX).astype(np.float32)
    qs = (rng.random((300, 3)) * 4).astype(np.float32)
    ph = qs.astype(np.float64) @ pos.astype(np.float64).T
    oc, os_ = np.cos(ph).sum(-1), np.sin(ph).sum(-1)
    c, s = trig_sums(
        jnp.asarray(qs), jnp.asarray(pos),
        precision=precision, q_tile=128, atom_tile=256,
    )
    amp = np.hypot(oc, os_).mean()
    tol = 1e-4 * amp if precision == "fast" else 1e-6 * amp
    assert np.abs(np.asarray(c) - oc).max() < tol
    assert np.abs(np.asarray(s) - os_).max() < tol


def test_trig_sums_weights_and_padding():
    """Weights select a subgroup; non-tile-multiple sizes exercise the
    padding path (padded atoms must contribute nothing)."""

    pos = (rng.random((333, 3)) * BOX).astype(np.float32)
    qs = (rng.random((77, 3)) * 4).astype(np.float32)
    w = (rng.random(333) < 0.5).astype(np.float32)
    ph = qs.astype(np.float64) @ pos.astype(np.float64).T
    oc = (np.cos(ph) * w).sum(-1)
    c, s = trig_sums(
        jnp.asarray(qs), jnp.asarray(pos), jnp.asarray(w),
        q_tile=128, atom_tile=256,
    )
    assert np.abs(np.asarray(c) - oc).max() < 1e-3


def test_pair_histogram_matches_numpy():
    n, r_max, n_bins = 900, 7.0, 150
    pos = (rng.random((n, 3)) * BOX).astype(np.float32)
    counts = np.asarray(
        pair_histogram(
            jnp.asarray(pos), (BOX,) * 3, r_max, n_bins,
            exclusion=(1, 1), i_tile=128, j_tile=256,
        )
    ).astype(int)
    p64 = pos.astype(np.float64)
    d = p64[:, None] - p64[None]
    d -= BOX * np.round(d / BOX)
    dist = np.sqrt((d**2).sum(-1))
    dist[np.arange(n), np.arange(n)] = np.inf
    oracle = np.histogram(dist, bins=n_bins, range=(0.0, r_max))[0]
    _assert_histogram_close(counts, oracle)


def _assert_histogram_close(counts, oracle):
    """Fast-mode (f32) binning can flip pairs sitting within one f32
    ulp of a bin edge vs the f64 oracle; totals must match exactly and
    per-bin deviations stay at edge-straddle level."""

    assert counts.sum() == oracle.sum()
    assert np.abs(counts - oracle).max() <= 2


def test_pair_histogram_molecule_exclusion():
    """exclusion=(4, 4) drops intra-molecular pairs of 4-atom
    molecules."""

    n, r_max, n_bins = 512, 8.0, 64
    pos = (rng.random((n, 3)) * BOX).astype(np.float32)
    counts = np.asarray(
        pair_histogram(
            jnp.asarray(pos), (BOX,) * 3, r_max, n_bins,
            exclusion=(4, 4), i_tile=128, j_tile=128,
        )
    ).astype(int)
    p64 = pos.astype(np.float64)
    d = p64[:, None] - p64[None]
    d -= BOX * np.round(d / BOX)
    dist = np.sqrt((d**2).sum(-1))
    mol = np.arange(n) // 4
    dist[mol[:, None] == mol[None, :]] = np.inf
    oracle = np.histogram(dist, bins=n_bins, range=(0.0, r_max))[0]
    _assert_histogram_close(counts, oracle)


@pytest.mark.parametrize("precision", ["fast", "exact"])
def test_pallas_cell_histogram_matches_oracle(precision):
    from mdhelper_tpu.ops.pallas_cell_histogram import (
        cell_pair_histogram_pallas,
        pallas_cell_plan,
    )

    n, box, r_max, n_bins = 1200, 16.0, 3.5, 96
    pos = (rng.random((n, 3)) * box).astype(np.float32)
    plan = pallas_cell_plan(n, [box] * 3, r_max)
    counts, occ = cell_pair_histogram_pallas(
        jnp.asarray(pos),
        box=(box,) * 3, r_max=r_max,
        n_cells_dim=plan["n_cells_dim"],
        capacity=plan["capacity"],
        n_bins=n_bins,
        precision=precision,
    )
    assert int(occ) <= plan["capacity"]
    counts = np.asarray(counts).astype(int)

    p64 = pos.astype(np.float64)
    d = p64[:, None] - p64[None]
    d -= box * np.round(d / box)
    dist = np.sqrt((d**2).sum(-1))
    dist[np.arange(n), np.arange(n)] = np.inf
    oracle = np.histogram(dist, bins=n_bins, range=(0.0, r_max))[0]
    if precision == "exact":
        # Bit-exact for float32 inputs (box 16.0 is exactly
        # representable, so the oracle sees the same min-image).
        np.testing.assert_array_equal(counts, oracle)
    else:
        _assert_histogram_close(counts, oracle)


def test_pallas_cell_histogram_molecule_exclusion():
    """(4, 4) tile exclusion on the self kernel drops intra-molecular
    pairs of 4-atom molecules (reference exclusion blocks,
    ``analysis/structure.py:92-104``)."""

    from mdhelper_tpu.ops.pallas_cell_histogram import (
        cell_pair_histogram_pallas,
        pallas_cell_plan,
    )

    n, box, r_max, n_bins = 1024, 16.0, 3.5, 96
    pos = (rng.random((n, 3)) * box).astype(np.float32)
    plan = pallas_cell_plan(n, [box] * 3, r_max)
    counts, occ = cell_pair_histogram_pallas(
        jnp.asarray(pos), box=(box,) * 3, r_max=r_max,
        n_cells_dim=plan["n_cells_dim"],
        capacity=plan["capacity"], n_bins=n_bins,
        precision="exact", exclusion=(4, 4),
    )
    assert int(occ) <= plan["capacity"]
    p64 = pos.astype(np.float64)
    d = p64[:, None] - p64[None]
    d -= box * np.round(d / box)
    dist = np.sqrt((d**2).sum(-1))
    mol = np.arange(n) // 4
    dist[mol[:, None] == mol[None, :]] = np.inf
    oracle = np.histogram(dist, bins=n_bins, range=(0.0, r_max))[0]
    np.testing.assert_array_equal(np.asarray(counts).astype(int), oracle)


@pytest.mark.parametrize("precision", ["fast", "exact"])
def test_pallas_cell_histogram_offset_range(precision):
    """range[0] > 0: the offset-grid binning convention (replicating
    ``ops/histogram._exact_bin_indices`` — below-range spill, closed
    last edge) on both self and cross kernels vs the f64 oracle."""

    from mdhelper_tpu.ops.pallas_cell_histogram import (
        cell_pair_histogram_pallas,
        cross_pair_histogram_pallas,
        pallas_cell_plan,
    )

    # deliberately NOT exactly representable in float32: the offset
    # constants must derive from full-f64 endpoints like the XLA
    # path's linspace edges (round-4 review catch)
    n, box, r0, r1, n_bins = 800, 16.0, 1.2, 3.7, 45
    pos = (rng.random((n, 3)) * box).astype(np.float32)
    plan = pallas_cell_plan(n, [box] * 3, r1)
    counts, occ = cell_pair_histogram_pallas(
        jnp.asarray(pos), box=(box,) * 3, r_max=r1, r_min=r0,
        n_cells_dim=plan["n_cells_dim"], capacity=plan["capacity"],
        n_bins=n_bins, precision=precision,
    )
    p64 = pos.astype(np.float64)
    d = p64[:, None] - p64[None]
    d -= box * np.round(d / box)
    dist = np.sqrt((d**2).sum(-1))
    dist[np.arange(n), np.arange(n)] = np.inf
    # full-f64 edges, like the analysis classes build.
    edges = np.linspace(r0, r1, n_bins + 1)
    oracle = np.histogram(dist, bins=edges)[0]
    if precision == "exact":
        np.testing.assert_array_equal(
            np.asarray(counts).astype(int), oracle
        )
    else:
        _assert_histogram_close(np.asarray(counts), oracle)

    n2 = 500
    p2 = (rng.random((n2, 3)) * box).astype(np.float32)
    plan2 = pallas_cell_plan(n2, [box] * 3, r1)
    c, _, _ = cross_pair_histogram_pallas(
        jnp.asarray(pos), jnp.asarray(p2), box=(box,) * 3,
        r_max=r1, r_min=r0,
        n_cells_dim=plan["n_cells_dim"],
        capacity1=plan["capacity"], capacity2=plan2["capacity"],
        n_bins=n_bins, precision=precision,
    )
    dc = p64[:, None] - p2.astype(np.float64)[None]
    dc -= box * np.round(dc / box)
    oracle_c = np.histogram(
        np.sqrt((dc**2).sum(-1)), bins=edges
    )[0]
    if precision == "exact":
        np.testing.assert_array_equal(
            np.asarray(c).astype(int), oracle_c
        )
    else:
        _assert_histogram_close(np.asarray(c), oracle_c)


@pytest.mark.parametrize("exclusion", [(2, 3), (3, 2), (1, 4)])
@pytest.mark.parametrize("precision", ["fast", "exact"])
def test_pallas_cell_histogram_asymmetric_exclusion(
    precision, exclusion
):
    """Asymmetric (e0, e1) tiles on the SELF kernel: each unordered
    pair contributes its ordered multiplicity
    ``[i//e0 != j//e1] + [j//e0 != i//e1]`` and surviving diagonal
    (i, i) pairs land in bin 0 — exactly the XLA full-product sweep /
    reference ``analysis/structure.py:100-102`` semantics."""

    from mdhelper_tpu.ops.pallas_cell_histogram import (
        cell_pair_histogram_pallas,
        pallas_cell_plan,
    )

    n, box, r_max, n_bins = 900, 16.0, 3.5, 96
    pos = (rng.random((n, 3)) * box).astype(np.float32)
    plan = pallas_cell_plan(n, [box] * 3, r_max)
    counts, occ = cell_pair_histogram_pallas(
        jnp.asarray(pos), box=(box,) * 3, r_max=r_max,
        n_cells_dim=plan["n_cells_dim"],
        capacity=plan["capacity"], n_bins=n_bins,
        precision=precision, exclusion=exclusion,
    )
    assert int(occ) <= plan["capacity"]
    p64 = pos.astype(np.float64)
    d = p64[:, None] - p64[None]
    d -= box * np.round(d / box)
    dist = np.sqrt((d**2).sum(-1))
    e0, e1 = exclusion
    i = np.arange(n)
    dist[(i[:, None] // e0) == (i[None, :] // e1)] = np.inf
    oracle = np.histogram(dist, bins=n_bins, range=(0.0, r_max))[0]
    if precision == "exact":
        np.testing.assert_array_equal(
            np.asarray(counts).astype(int), oracle
        )
    else:
        _assert_histogram_close(np.asarray(counts), oracle)


def test_pallas_cell_histogram_per_frame_boxes():
    """One compiled kernel serves per-frame (NPT) boxes; a box below
    the planned cell grid NaN-poisons instead of silently missing
    pairs."""

    from mdhelper_tpu.ops.pallas_cell_histogram import (
        cell_pair_histogram_pallas,
        pallas_cell_plan,
    )

    n, r_max, n_bins = 800, 3.5, 64
    plan = pallas_cell_plan(n, [16.0] * 3, r_max)
    for box in (16.0, 17.5):  # both hold >= 4 cells of 3.5 per axis
        pos = (rng.random((n, 3)) * box).astype(np.float32)
        counts, _ = cell_pair_histogram_pallas(
            jnp.asarray(pos), box=(box,) * 3, r_max=r_max,
            n_cells_dim=plan["n_cells_dim"],
            capacity=plan["capacity"], n_bins=n_bins,
            precision="exact",
        )
        p64 = pos.astype(np.float64)
        d = p64[:, None] - p64[None]
        d -= box * np.round(d / box)
        dist = np.sqrt((d**2).sum(-1))
        dist[np.arange(n), np.arange(n)] = np.inf
        oracle = np.histogram(dist, bins=n_bins, range=(0.0, r_max))[0]
        np.testing.assert_array_equal(
            np.asarray(counts).astype(int), oracle
        )
    # 13.0 < 4 * 3.5: the 27-cell sweep is invalid -> NaN poison.
    pos = (rng.random((n, 3)) * 13.0).astype(np.float32)
    counts, _ = cell_pair_histogram_pallas(
        jnp.asarray(pos), box=(13.0,) * 3, r_max=r_max,
        n_cells_dim=plan["n_cells_dim"],
        capacity=plan["capacity"], n_bins=n_bins,
    )
    assert np.isnan(np.asarray(counts)).all()


def test_pallas_cross_histogram_molecule_exclusion():
    """(2, 3) exclusion between disjoint groups drops same-molecule
    cation-anion pairs (2 cations + 3 anions per molecule)."""

    from mdhelper_tpu.ops.pallas_cell_histogram import (
        cross_pair_histogram_pallas,
        pallas_cell_plan,
    )

    box, r_max, n_bins = 16.0, 3.5, 96
    n1, n2 = 600, 900
    p1 = (rng.random((n1, 3)) * box).astype(np.float32)
    p2 = (rng.random((n2, 3)) * box).astype(np.float32)
    plan1 = pallas_cell_plan(n1, [box] * 3, r_max)
    plan2 = pallas_cell_plan(n2, [box] * 3, r_max)
    counts, m1, m2 = cross_pair_histogram_pallas(
        jnp.asarray(p1), jnp.asarray(p2),
        box=(box,) * 3, r_max=r_max,
        n_cells_dim=plan1["n_cells_dim"],
        capacity1=plan1["capacity"], capacity2=plan2["capacity"],
        n_bins=n_bins, precision="exact", exclusion=(2, 3),
    )
    d = p1.astype(np.float64)[:, None] - p2.astype(np.float64)[None]
    d -= box * np.round(d / box)
    dist = np.sqrt((d**2).sum(-1))
    mol1 = np.arange(n1) // 2
    mol2 = np.arange(n2) // 3
    dist[mol1[:, None] == mol2[None, :]] = np.inf
    oracle = np.histogram(dist, bins=n_bins, range=(0.0, r_max))[0]
    np.testing.assert_array_equal(np.asarray(counts).astype(int), oracle)


@pytest.mark.parametrize("precision", ["fast", "exact"])
def test_pallas_cross_histogram_matches_oracle(precision):
    from mdhelper_tpu.ops.pallas_cell_histogram import (
        cross_pair_histogram_pallas,
        pallas_cell_plan,
    )

    box, r_max, n_bins = 16.0, 3.5, 96
    n1, n2 = 900, 500
    p1 = (rng.random((n1, 3)) * box).astype(np.float32)
    p2 = (rng.random((n2, 3)) * box).astype(np.float32)
    plan1 = pallas_cell_plan(n1, [box] * 3, r_max)
    plan2 = pallas_cell_plan(n2, [box] * 3, r_max)
    counts, m1, m2 = cross_pair_histogram_pallas(
        jnp.asarray(p1), jnp.asarray(p2),
        box=(box,) * 3, r_max=r_max,
        n_cells_dim=plan1["n_cells_dim"],
        capacity1=plan1["capacity"], capacity2=plan2["capacity"],
        n_bins=n_bins, precision=precision,
    )
    assert int(m1) <= plan1["capacity"]
    assert int(m2) <= plan2["capacity"]
    counts = np.asarray(counts).astype(int)
    d = p1.astype(np.float64)[:, None] - p2.astype(np.float64)[None]
    d -= box * np.round(d / box)
    dist = np.sqrt((d**2).sum(-1))
    oracle = np.histogram(dist, bins=n_bins, range=(0.0, r_max))[0]
    if precision == "exact":
        np.testing.assert_array_equal(counts, oracle)
    else:
        _assert_histogram_close(counts, oracle)


def test_pallas_cell_histogram_three_cell_grid():
    """The minimum 3-cell-per-axis grid is the trickiest half-shell
    wrap geometry (every +-1 offset pair lands on the two distinct
    other cells); counts must still match the brute-force oracle
    exactly."""

    from mdhelper_tpu.ops.pallas_cell_histogram import (
        cell_pair_histogram_pallas,
        pallas_cell_plan,
    )

    n, box, r_max, n_bins = 900, 16.0, 4.8, 64
    pos = (rng.random((n, 3)) * box).astype(np.float32)
    plan = pallas_cell_plan(n, [box] * 3, r_max)
    assert plan["n_cells_dim"] == (3, 3, 3)
    counts, occ = cell_pair_histogram_pallas(
        jnp.asarray(pos), box=(box,) * 3, r_max=r_max,
        n_cells_dim=plan["n_cells_dim"],
        capacity=plan["capacity"], n_bins=n_bins,
        precision="exact",
    )
    assert int(occ) <= plan["capacity"]
    p64 = pos.astype(np.float64)
    d = p64[:, None] - p64[None]
    d -= box * np.round(d / box)
    dist = np.sqrt((d**2).sum(-1))
    dist[np.arange(n), np.arange(n)] = np.inf
    oracle = np.histogram(dist, bins=n_bins, range=(0.0, r_max))[0]
    np.testing.assert_array_equal(np.asarray(counts).astype(int), oracle)


def test_pallas_plan_search_prefers_coarse_grid(monkeypatch):
    """At low per-cell occupancy the lane-snapped capacity is mostly
    padding on the finest grid; the cost search must pick a coarser
    (still legal) grid, and MDTPU_CELL_SEARCH=0 must restore the naive
    finest-grid plan."""

    from mdhelper_tpu.ops.pallas_cell_histogram import (
        pallas_cell_plan,
        pallas_cell_plan_search,
    )

    monkeypatch.delenv("MDTPU_CELL_SEARCH", raising=False)
    n, box, r_max = 600, 16.0, 2.0  # finest grid: 8^3 cells, occ ~1.2
    naive = pallas_cell_plan(n, [box] * 3, r_max)
    plan = pallas_cell_plan_search(n, [box] * 3, r_max)
    assert plan["capacity"] % 128 == 0
    assert all(
        3 <= d <= m
        for d, m in zip(plan["n_cells_dim"], naive["n_cells_dim"])
    )
    assert plan["n_cells"] < naive["n_cells"]
    assert plan["_cost"] <= 14 * naive["n_cells"] * naive["capacity"] ** 2

    # Cross: one shared grid, both capacities planned jointly.
    joint = pallas_cell_plan_search(
        n, [box] * 3, r_max, n_atoms2=3 * n
    )
    assert joint["capacity"] % 128 == 0
    assert joint["capacity2"] % 128 == 0
    assert joint["capacity2"] >= joint["capacity"]

    # Empty groups never plan a zero capacity (the kernel wrapper
    # divides by it); one lane tile is the floor.
    tiny = pallas_cell_plan_search(0, [box] * 3, r_max, n_atoms2=5)
    assert tiny["capacity"] == 128 and tiny["capacity2"] == 128
    assert pallas_cell_plan(0, [box] * 3, r_max)["capacity"] == 128

    # Large-box/small-cutoff systems must not stall _prepare: the
    # axis candidates are geometrically thinned.
    import time as _time

    t0 = _time.perf_counter()
    big = pallas_cell_plan_search(1_000_000, [1000.0] * 3, 3.0)
    assert _time.perf_counter() - t0 < 5.0
    assert big["capacity"] % 128 == 0

    monkeypatch.setenv("MDTPU_CELL_SEARCH", "0")
    disabled = pallas_cell_plan_search(n, [box] * 3, r_max)
    assert disabled["n_cells_dim"] == naive["n_cells_dim"]
    assert disabled["capacity"] == naive["capacity"]


def test_pallas_cross_histogram_searched_plan_matches_oracle(
    monkeypatch,
):
    """The cross kernel under a cost-searched (coarse) joint plan —
    the 50/50 binary-mixture configuration — stays bit-exact against
    the float64 oracle."""

    from mdhelper_tpu.ops.pallas_cell_histogram import (
        cross_pair_histogram_pallas,
        pallas_cell_plan,
        pallas_cell_plan_search,
    )

    monkeypatch.delenv("MDTPU_CELL_SEARCH", raising=False)
    box, r_max, n_bins = 16.0, 2.0, 64
    n1 = n2 = 700
    p1 = (rng.random((n1, 3)) * box).astype(np.float32)
    p2 = (rng.random((n2, 3)) * box).astype(np.float32)
    plan = pallas_cell_plan_search(
        n1, [box] * 3, r_max, n_atoms2=n2
    )
    naive = pallas_cell_plan(n1, [box] * 3, r_max)
    assert plan["n_cells"] < naive["n_cells"]  # searched, not finest
    counts, m1, m2 = cross_pair_histogram_pallas(
        jnp.asarray(p1), jnp.asarray(p2),
        box=(box,) * 3, r_max=r_max,
        n_cells_dim=plan["n_cells_dim"],
        capacity1=plan["capacity"], capacity2=plan["capacity2"],
        n_bins=n_bins, precision="exact",
    )
    assert int(m1) <= plan["capacity"]
    assert int(m2) <= plan["capacity2"]
    d = p1.astype(np.float64)[:, None] - p2.astype(np.float64)[None]
    d -= box * np.round(d / box)
    dist = np.sqrt((d**2).sum(-1))
    oracle = np.histogram(dist, bins=n_bins, range=(0.0, r_max))[0]
    np.testing.assert_array_equal(np.asarray(counts).astype(int), oracle)


def _triclinic_fixture(seed, n, dims6):
    """Interior-wrapped positions in a tilted cell + the f32 box
    matrix (interior margins keep the fractional fold an exact no-op,
    so kernel inputs match the oracle's coordinates bit-for-bit)."""

    from mdhelper_tpu.algorithm.topology import triclinic_matrices

    r = np.random.default_rng(seed)
    h64 = np.asarray(triclinic_matrices(dims6), np.float64)
    h32 = h64.astype(np.float32)
    frac = 0.02 + 0.96 * r.random((n, 3))
    pos = (frac @ h64).astype(np.float32)
    return pos, h32


def _triclinic_oracle_dist(p1, p2, h32):
    """f64 minimum distance over the 27 images of the f32 box."""

    d = p1.astype(np.float64)[:, None] - p2.astype(np.float64)[None]
    best = None
    rows = h32.astype(np.float64)
    for wx in (-1, 0, 1):
        for wy in (-1, 0, 1):
            for wz in (-1, 0, 1):
                sh = wx * rows[0] + wy * rows[1] + wz * rows[2]
                d2 = ((d - sh) ** 2).sum(-1)
                best = d2 if best is None else np.minimum(best, d2)
    return np.sqrt(best)


def test_pallas_triclinic_self_matches_oracle():
    """Triclinic self kernel (per-neighbor-block lattice shifts, no
    per-pair image search) is bit-exact against the 27-image f64
    oracle on a tilted cell."""

    from mdhelper_tpu.ops.pallas_cell_histogram import (
        cell_pair_histogram_pallas,
        pallas_cell_plan_search,
        triclinic_perpendicular_widths,
    )

    dims6 = np.array([16.0, 15.0, 14.0, 80.0, 95.0, 100.0])
    n, r_max, n_bins = 700, 3.0, 64
    pos, h32 = _triclinic_fixture(21, n, dims6)
    perps = np.asarray(triclinic_perpendicular_widths(h32), float)
    plan = pallas_cell_plan_search(n, perps, r_max)
    counts, occ = cell_pair_histogram_pallas(
        jnp.asarray(pos), box=jnp.asarray(h32), r_max=r_max,
        n_cells_dim=plan["n_cells_dim"], capacity=plan["capacity"],
        n_bins=n_bins, precision="exact",
    )
    assert int(occ) <= plan["capacity"]
    dist = _triclinic_oracle_dist(pos, pos, h32)
    np.fill_diagonal(dist, np.inf)
    oracle = np.histogram(dist, bins=n_bins, range=(0.0, r_max))[0]
    np.testing.assert_array_equal(
        np.asarray(counts).astype(int), oracle
    )


def test_pallas_triclinic_cross_exclusion_and_poison():
    """Triclinic cross kernel: (2, 1) molecule exclusion bit-exact vs
    the f64 oracle; a shrunk c-vector (perpendicular width below the
    planned grid) NaN-poisons instead of missing pairs."""

    from mdhelper_tpu.ops.pallas_cell_histogram import (
        cross_pair_histogram_pallas,
        pallas_cell_plan_search,
        triclinic_perpendicular_widths,
    )

    dims6 = np.array([16.0, 15.0, 14.0, 80.0, 95.0, 100.0])
    n1, n2, r_max, n_bins = 600, 400, 3.0, 64
    p1, h32 = _triclinic_fixture(22, n1, dims6)
    p2, _ = _triclinic_fixture(23, n2, dims6)
    perps = np.asarray(triclinic_perpendicular_widths(h32), float)
    plan = pallas_cell_plan_search(n1, perps, r_max, n_atoms2=n2)
    counts, m1, m2 = cross_pair_histogram_pallas(
        jnp.asarray(p1), jnp.asarray(p2),
        box=jnp.asarray(h32), r_max=r_max,
        n_cells_dim=plan["n_cells_dim"],
        capacity1=plan["capacity"], capacity2=plan["capacity2"],
        n_bins=n_bins, precision="exact", exclusion=(2, 1),
    )
    dist = _triclinic_oracle_dist(p1, p2, h32)
    mol1 = np.arange(n1) // 2
    mol2 = np.arange(n2) // 1
    dist[mol1[:, None] == mol2[None, :]] = np.inf
    oracle = np.histogram(dist, bins=n_bins, range=(0.0, r_max))[0]
    np.testing.assert_array_equal(
        np.asarray(counts).astype(int), oracle
    )

    h_bad = h32.copy()
    h_bad[2] *= 0.5  # perpendicular width 2 below 3 * r_max
    bad, _, _ = cross_pair_histogram_pallas(
        jnp.asarray(p1), jnp.asarray(p2),
        box=jnp.asarray(h_bad), r_max=r_max,
        n_cells_dim=plan["n_cells_dim"],
        capacity1=plan["capacity"], capacity2=plan["capacity2"],
        n_bins=n_bins,
    )
    assert np.isnan(np.asarray(bad)).all()


def test_triclinic_class_route_matches_xla_sweep():
    """RadialDistributionFunction on a tilted cell: the Pallas
    per-block-shift route (forced; off-TPU it would pick XLA) is
    bit-equal to the XLA 27-image brute sweep — including the
    double-float SPLIT alignment of shift table and bin boundaries
    (real-chip A/B in BASELINE.md caught split-sensitive tie pairs)."""

    from mdhelper_tpu.algorithm.topology import triclinic_matrices
    from mdhelper_tpu.analysis import structure as S
    from mdhelper_tpu.core.universe import Universe

    r = np.random.default_rng(29)
    dims6 = np.array([16.0, 15.0, 14.0, 80.0, 95.0, 100.0])
    h64 = np.asarray(triclinic_matrices(dims6), np.float64)
    traj = (0.02 + 0.96 * r.random((2, 600, 3))) @ h64

    def run(force):
        u = Universe.from_arrays(traj, dims6, dt=1.0)
        if force:
            orig = S.RadialDistributionFunction._use_pallas_cell_kernel
            S.RadialDistributionFunction._use_pallas_cell_kernel = (
                lambda self: True
            )
        try:
            a = S.RadialDistributionFunction(
                u.atoms, n_bins=48, range=(0.0, 3.0), verbose=False
            )
            a.run()
        finally:
            if force:
                S.RadialDistributionFunction._use_pallas_cell_kernel = (
                    orig
                )
        return a.results.counts, a.results.rdf

    cx, rx = run(False)
    cp, rp = run(True)
    np.testing.assert_array_equal(cx, cp)
    np.testing.assert_allclose(rx, rp, rtol=1e-12)


def test_rdf_capacity_overflow_auto_escalation(monkeypatch):
    """The cost-searched plan leaves ~4 sigma of occupancy headroom;
    on the rare statistical overflow run() must re-plan with +2 sigma
    (clearing the plan cache) and re-stream, bounded at two retries."""

    import warnings as w

    from mdhelper_tpu.analysis import structure as S
    from mdhelper_tpu.core.universe import Universe
    from mdhelper_tpu.ops.pallas_cell_histogram import (
        CellCapacityOverflow,
    )

    r = np.random.default_rng(5)
    u = Universe.from_arrays(
        r.random((2, 60, 3)) * 20.0, np.array([20.0] * 3)
    )
    rdf = S.RadialDistributionFunction(
        u.atoms, n_bins=16, range=(0.0, 3.0), verbose=False
    )

    calls = {"n": 0}

    def fake_run(self, *a, **k):
        calls["n"] += 1
        self._cell_plan_cache = object()  # a plan was built
        if calls["n"] <= 2:
            raise CellCapacityOverflow("cell capacity overflow")
        return self

    monkeypatch.setattr(S.DynamicAnalysisBase, "run", fake_run)
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        out = rdf.run()
    assert out is rdf
    assert calls["n"] == 3
    assert rdf._capacity_sigmas == 8.0
    assert rdf._capacity_retries == 2
    assert rdf._cell_plan_cache is not None  # rebuilt by the last run
    msgs = [str(c.message) for c in caught]
    assert sum("capacity_sigmas=6.0" in m for m in msgs) == 1
    assert sum("capacity_sigmas=8.0" in m for m in msgs) == 1

    # a third overflow propagates
    rdf2 = S.RadialDistributionFunction(
        u.atoms, n_bins=16, range=(0.0, 3.0), verbose=False
    )
    calls["n"] = -10**9  # always raise
    with w.catch_warnings():
        w.simplefilter("ignore")
        with pytest.raises(CellCapacityOverflow):
            rdf2.run()
    assert rdf2._capacity_sigmas == 8.0


def test_vanhove_capacity_overflow_auto_escalation(monkeypatch):
    from mdhelper_tpu.analysis import structure as S
    from mdhelper_tpu.core.universe import Universe
    from mdhelper_tpu.ops.pallas_cell_histogram import (
        CellCapacityOverflow,
    )

    import warnings as w

    r = np.random.default_rng(6)
    u = Universe.from_arrays(
        r.random((4, 40, 3)) * 20.0, np.array([20.0] * 3), dt=1.0
    )
    vh = S.VanHoveFunction(
        u.atoms, n_bins=8, range=(0.0, 3.0), n_lags=2, verbose=False
    )
    calls = {"n": 0}

    def fake_run(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise CellCapacityOverflow("cell capacity overflow")
        return self

    monkeypatch.setattr(S.SerialAnalysisBase, "run", fake_run)
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        out = vh.run()
    assert out is vh and calls["n"] == 2
    assert vh._capacity_sigmas == 6.0
    assert any(
        "capacity_sigmas=6.0" in str(c.message) for c in caught
    )


@pytest.mark.parametrize("triclinic", (False, True), ids=("ortho", "tri"))
def test_streaming_block_kernels_match_resident(monkeypatch, triclinic):
    """MDTPU_PALLAS_STREAM=1 forces the per-(cell, neighbor) DMA
    kernels; counts must be bit-equal to the resident-table layout
    for self (half-shell) and cross sweeps, exact and fast, with and
    without exclusion."""

    from mdhelper_tpu.algorithm.topology import triclinic_matrices
    from mdhelper_tpu.ops import pallas_cell_histogram as P

    r = np.random.default_rng(33)
    n1, n2 = 300, 200
    if triclinic:
        dims6 = np.array([14.0, 13.0, 12.0, 80.0, 95.0, 100.0])
        h = np.asarray(triclinic_matrices(dims6), np.float32)
        box = jnp.asarray(h)
        frac1, frac2 = r.random((n1, 3)), r.random((n2, 3))
        pos1 = (frac1 @ np.asarray(h, np.float64)).astype(np.float32)
        pos2 = (frac2 @ np.asarray(h, np.float64)).astype(np.float32)
        widths = P.triclinic_perpendicular_widths(h)
    else:
        widths = np.array([14.0, 13.0, 12.0])
        box = jnp.asarray(widths.astype(np.float32))
        pos1 = (r.random((n1, 3)) * widths).astype(np.float32)
        pos2 = (r.random((n2, 3)) * widths).astype(np.float32)
    r_max, n_bins = 3.5, 37
    plan = P.pallas_cell_plan(n1, widths, r_max)

    def self_counts(**kw):
        c, _ = P.cell_pair_histogram_pallas(
            jnp.asarray(pos1), box=box, r_max=r_max,
            n_cells_dim=plan["n_cells_dim"],
            capacity=plan["capacity"], n_bins=n_bins, **kw,
        )
        return np.asarray(c)

    def cross_counts(**kw):
        c, _, _ = P.cross_pair_histogram_pallas(
            jnp.asarray(pos1), jnp.asarray(pos2), box=box,
            r_max=r_max, n_cells_dim=plan["n_cells_dim"],
            capacity1=plan["capacity"], capacity2=plan["capacity"],
            n_bins=n_bins, **kw,
        )
        return np.asarray(c)

    cases = [
        dict(precision="exact"),
        dict(precision="fast"),
        dict(precision="exact", exclusion=(2, 2)),
        dict(precision="exact", exclusion=(2, 3)),
    ]
    for kw in cases:
        monkeypatch.delenv("MDTPU_PALLAS_STREAM", raising=False)
        P.cell_pair_histogram_pallas._clear_cache()
        P.cross_pair_histogram_pallas._clear_cache()
        resident_self = self_counts(**kw)
        resident_cross = cross_counts(**kw)
        monkeypatch.setenv("MDTPU_PALLAS_STREAM", "1")
        P.cell_pair_histogram_pallas._clear_cache()
        P.cross_pair_histogram_pallas._clear_cache()
        streamed_self = self_counts(**kw)
        streamed_cross = cross_counts(**kw)
        np.testing.assert_array_equal(
            resident_self, streamed_self, err_msg=f"self {kw}"
        )
        np.testing.assert_array_equal(
            resident_cross, streamed_cross, err_msg=f"cross {kw}"
        )
        assert resident_self.sum() > 0 and resident_cross.sum() > 0
    monkeypatch.delenv("MDTPU_PALLAS_STREAM", raising=False)
    P.cell_pair_histogram_pallas._clear_cache()
    P.cross_pair_histogram_pallas._clear_cache()
