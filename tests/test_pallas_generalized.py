"""Round-5 generalized Pallas cell-kernel routes (interpreter mode on
CPU; chip oracles in scripts/chip_verify.py): 2-D ``drop_axis``
grids, small-box / subdivided grids (ordered deduped-table sweeps,
per-axis reach), and the per-pair 27-candidate triclinic minimum
image.  Every exact-mode comparison is BIT-equality against a float64
oracle over the f32-rounded stream — the same bar as the legacy
routes."""

import numpy as np
import pytest

import jax.numpy as jnp

from mdhelper_tpu.ops.pallas_cell_histogram import (
    _neighbor_tables_general,
    cell_pair_histogram_pallas,
    cross_pair_histogram_pallas,
    pallas_cell_plan_search,
)

rng = np.random.default_rng(47)


def _oracle(p1, p2, box, edges, axes=(0, 1, 2), excl=None,
            drop_ident=False):
    """f64 ordered-pair histogram over the f32-rounded stream with
    per-axis minimum image (orthorhombic)."""

    a = p1.astype(np.float32).astype(np.float64)[:, list(axes)]
    b = p2.astype(np.float32).astype(np.float64)[:, list(axes)]
    bx = np.float64(np.float32(box))[list(axes)]
    d = a[:, None] - b[None, :]
    d -= bx * np.round(d / bx)
    dist = np.sqrt((d ** 2).sum(-1))
    if drop_ident:
        np.fill_diagonal(dist, np.inf)
    if excl is not None:
        e0, e1 = excl
        m = (np.arange(len(a))[:, None] // e0) == (
            np.arange(len(b))[None, :] // e1
        )
        if drop_ident:
            np.fill_diagonal(m, False)
        dist = np.where(m, np.inf, dist)
    return np.histogram(dist, bins=edges)[0]


# ------------------------------------------------------------------
# neighbor-table properties (pure NumPy — covers the combinatorics
# the slow interpret kernels cannot sweep exhaustively)
# ------------------------------------------------------------------

@pytest.mark.parametrize(
    "dims,reach",
    [
        ((1, 1, 1), (1, 1, 1)),
        ((2, 1, 3), (1, 1, 1)),
        ((4, 4, 4), (1, 1, 1)),
        ((8, 5, 5), (2, 1, 1)),
        ((5, 5, 5), (2, 2, 2)),   # n == 2m+1 boundary
        ((7, 9, 5), (3, 4, 2)),
        ((6, 4), (1, 1)),         # 2-D grids
        ((2, 2), (1, 1)),
        ((9, 7), (4, 3)),
    ],
)
def test_neighbor_tables_general_properties(dims, reach):
    full, half = _neighbor_tables_general(dims, reach)
    n_cells = int(np.prod(dims))
    d = len(dims)
    strides = [1] * d
    for ax in range(d - 2, -1, -1):
        strides[ax] = strides[ax + 1] * dims[ax + 1]

    def coords(cid):
        out = []
        for ax in range(d):
            out.append(cid // strides[ax] % dims[ax])
        return tuple(out)

    # the exact neighbor set: wrapped cells within reach per axis
    def neighbor_set(c):
        cc = coords(c)
        axes_sets = []
        for ax in range(d):
            n, m = dims[ax], reach[ax]
            if n <= 2 * m + 1:
                axes_sets.append(set(range(n)))
            else:
                axes_sets.append(
                    {(cc[ax] + o) % n for o in range(-m, m + 1)}
                )
        out = set()

        def rec(ax, acc):
            if ax == d:
                out.add(sum(a * s for a, s in zip(acc, strides)))
                return
            for v in axes_sets[ax]:
                rec(ax + 1, acc + [v])

        rec(0, [])
        return out

    assert full.shape[0] == n_cells
    for c in range(n_cells):
        row = full[c]
        # distinct entries, home first, exact coverage
        assert row[0] == c
        assert len(set(row.tolist())) == len(row)
        assert set(row.tolist()) == neighbor_set(c)

    half_legal = all(
        n >= 2 * m + 1 for n, m in zip(dims, reach)
    )
    if not half_legal:
        assert half is None
        return
    # half-shell single-visit property: every unordered pair of
    # neighboring cells appears exactly once across the whole table
    # (and each home cell exactly once in column 0)
    seen = {}
    for c in range(n_cells):
        assert half[c, 0] == c
        for j in half[c, 1:]:
            key = frozenset((int(c), int(j)))
            seen[key] = seen.get(key, 0) + 1
    assert all(v == 1 for v in seen.values())
    # and it covers exactly the distinct unordered neighbor pairs
    expect = set()
    for c in range(n_cells):
        for j in neighbor_set(c):
            if j != c:
                expect.add(frozenset((c, int(j))))
    assert set(seen) == expect


def test_plan_search_spaces():
    # legacy box: reach-1 plan, >= 3 cells per axis (pre-round-5
    # behavior preserved)
    plan = pallas_cell_plan_search(5000, [30.0, 30.0, 30.0], 5.0)
    assert plan["reach"] == (1, 1, 1)
    assert all(n >= 3 for n in plan["n_cells_dim"])
    # small box: generalized plan, capacities within the block budget
    plan = pallas_cell_plan_search(4000, [9.0, 9.0, 9.0], 4.0)
    assert len(plan["reach"]) == 3
    assert plan["capacity"] <= 512
    # sweep completeness invariant: either whole-axis or
    # reach * cell_width covers the cutoff
    for n, m, b in zip(plan["n_cells_dim"], plan["reach"],
                       [9.0] * 3):
        assert n <= 2 * m + 1 or m * b / n > 4.0
    # 2-D plan
    plan = pallas_cell_plan_search(3000, [25.0, 18.0], 5.0)
    assert len(plan["n_cells_dim"]) == 2
    # dense legacy box falls through to subdivided generalized space
    plan = pallas_cell_plan_search(300_000, [12.5, 12.5, 12.5], 4.0)
    assert plan["capacity"] <= 512
    # triclinic generalized plans run the per-pair 27-candidate
    # kernels whose scoped-VMEM footprint caps capacity at 128
    plan = pallas_cell_plan_search(
        4000, [9.0, 9.0, 9.0], 4.0, triclinic=True
    )
    assert plan["capacity"] <= 128
    # ... but a legacy-eligible triclinic box keeps the 512 budget
    plan = pallas_cell_plan_search(
        4000, [30.0, 30.0, 30.0], 5.0, triclinic=True
    )
    assert plan["reach"] == (1, 1, 1)


# ------------------------------------------------------------------
# kernel routes vs f64 oracles (small configs: interpret mode)
# ------------------------------------------------------------------

@pytest.mark.parametrize("precision", ["fast", "exact"])
def test_small_box_self_matches_oracle(precision):
    n, box, r_max, n_bins = 500, 9.0, 4.0, 40
    p = rng.random((n, 3)) * box
    plan = pallas_cell_plan_search(n, [box] * 3, r_max)
    edges = np.linspace(0, r_max, n_bins + 1)
    c, occ = cell_pair_histogram_pallas(
        p.astype(np.float32), box=np.float32([box] * 3),
        r_max=r_max, n_cells_dim=plan["n_cells_dim"],
        capacity=plan["capacity"], n_bins=n_bins,
        precision=precision, reach=plan["reach"],
    )
    ref = _oracle(p, p, np.array([box] * 3), edges, drop_ident=True)
    got = np.asarray(c)
    if precision == "exact":
        np.testing.assert_array_equal(got, ref)
    else:
        assert np.abs(got - ref).sum() <= max(4, 1e-5 * ref.sum())


def test_drop_axis_halfshell_matches_oracle():
    # kept extents >= 3 cutoffs: the 2-D legacy half-shell sweep
    n, box, r_max, n_bins = 700, 20.0, 5.0, 40
    p = rng.random((n, 3)) * box
    axes = (0, 2)
    plan = pallas_cell_plan_search(n, [box, box], r_max)
    assert plan["reach"] == (1, 1)
    edges = np.linspace(0, r_max, n_bins + 1)
    c, _ = cell_pair_histogram_pallas(
        p.astype(np.float32), box=np.float32([box] * 3),
        r_max=r_max, n_cells_dim=plan["n_cells_dim"],
        capacity=plan["capacity"], n_bins=n_bins,
        precision="exact", axes=axes, reach=plan["reach"],
    )
    ref = _oracle(
        p, p, np.array([box] * 3), edges, axes=axes, drop_ident=True
    )
    np.testing.assert_array_equal(np.asarray(c), ref)


def test_drop_axis_small_ordered_matches_oracle():
    # kept extents under 3 cutoffs: ordered deduped 2-D sweep
    n, box, r_max, n_bins = 450, 9.0, 4.0, 30
    p = rng.random((n, 3)) * box
    plan = pallas_cell_plan_search(n, [box, box], r_max)
    edges = np.linspace(0, r_max, n_bins + 1)
    c, _ = cell_pair_histogram_pallas(
        p.astype(np.float32), box=np.float32([box] * 3),
        r_max=r_max, n_cells_dim=plan["n_cells_dim"],
        capacity=plan["capacity"], n_bins=n_bins,
        precision="exact", axes=(1, 2), reach=plan["reach"],
    )
    ref = _oracle(
        p, p, np.array([box] * 3), edges, axes=(1, 2),
        drop_ident=True,
    )
    np.testing.assert_array_equal(np.asarray(c), ref)


def test_small_box_cross_exclusion_matches_oracle():
    na, nb, box, r_max = 350, 450, 9.0, 4.0
    pa = rng.random((na, 3)) * box
    pb = rng.random((nb, 3)) * box
    plan = pallas_cell_plan_search(na, [box] * 3, r_max,
                                   n_atoms2=nb)
    edges = np.linspace(0, r_max, 31)
    c, m1, m2 = cross_pair_histogram_pallas(
        pa.astype(np.float32), pb.astype(np.float32),
        box=np.float32([box] * 3), r_max=r_max,
        n_cells_dim=plan["n_cells_dim"],
        capacity1=plan["capacity"], capacity2=plan["capacity2"],
        n_bins=30, precision="exact", exclusion=(3, 4),
        reach=plan["reach"],
    )
    ref = _oracle(pa, pb, np.array([box] * 3), edges, excl=(3, 4))
    np.testing.assert_array_equal(np.asarray(c), ref)


def test_small_box_asym_offset_matches_oracle():
    # ordered mode with asymmetric exclusion AND an offset bin grid
    n, box, r_lo, r_max = 420, 9.0, 1.2, 4.0
    p = rng.random((n, 3)) * box
    plan = pallas_cell_plan_search(n, [box] * 3, r_max)
    edges = np.linspace(r_lo, r_max, 31)
    c, _ = cell_pair_histogram_pallas(
        p.astype(np.float32), box=np.float32([box] * 3),
        r_max=r_max, n_cells_dim=plan["n_cells_dim"],
        capacity=plan["capacity"], n_bins=30, precision="exact",
        exclusion=(2, 3), r_min=r_lo, reach=plan["reach"],
    )
    ref = _oracle(
        p, p, np.array([box] * 3), edges, excl=(2, 3),
        drop_ident=True,
    )
    np.testing.assert_array_equal(np.asarray(c), ref)


def test_subdivided_halfshell_matches_oracle():
    # cells NARROWER than the cutoff with half-shell still legal
    # (all n_i >= 2 m_i + 1): reach > 1 on one axis
    n, box, r_max = 600, 20.0, 4.0
    p = rng.random((n, 3)) * box
    edges = np.linspace(0, r_max, 31)
    c, _ = cell_pair_histogram_pallas(
        p.astype(np.float32), box=np.float32([box] * 3),
        r_max=r_max, n_cells_dim=(8, 5, 5), capacity=128,
        n_bins=30, precision="exact", reach=(2, 1, 1),
    )
    ref = _oracle(p, p, np.array([box] * 3), edges, drop_ident=True)
    np.testing.assert_array_equal(np.asarray(c), ref)


@pytest.mark.parametrize("stream", [False, True])
def test_small_box_ordered_streaming_matches(monkeypatch, stream):
    monkeypatch.setenv("MDTPU_PALLAS_STREAM", "1" if stream else "0")
    n, box, r_max = 400, 9.0, 4.0
    p = rng.random((n, 3)) * box
    plan = pallas_cell_plan_search(n, [box] * 3, r_max)
    edges = np.linspace(0, r_max, 31)
    c, _ = cell_pair_histogram_pallas(
        p.astype(np.float32), box=np.float32([box] * 3),
        r_max=r_max, n_cells_dim=plan["n_cells_dim"],
        capacity=plan["capacity"], n_bins=30, precision="exact",
        reach=plan["reach"],
    )
    ref = _oracle(p, p, np.array([box] * 3), edges, drop_ident=True)
    np.testing.assert_array_equal(np.asarray(c), ref)


# ------------------------------------------------------------------
# triclinic per-pair (27-candidate) routes
# ------------------------------------------------------------------

def _tri_fixture(n, seed=3):
    from mdhelper_tpu.algorithm.topology import triclinic_matrices

    r = np.random.default_rng(seed)
    dims6 = np.array([10.0, 9.5, 9.0, 75.0, 100.0, 95.0])
    h = np.asarray(triclinic_matrices(dims6), np.float64)
    pos = (r.random((n, 3)) @ h).astype(np.float32)
    return dims6, h.astype(np.float32), pos


def test_tri_pp_self_bitequal_xla():
    from mdhelper_tpu.ops.histogram import radial_histogram_frame

    n, r_max, n_bins = 240, 4.0, 30
    dims6, h32, pos = _tri_fixture(n)
    from mdhelper_tpu.ops.pallas_cell_histogram import (
        triclinic_perpendicular_widths,
    )

    widths = np.asarray(
        triclinic_perpendicular_widths(h32.astype(np.float64))
    )
    assert np.any(np.floor(widths / r_max) < 3)  # genuinely small
    plan = pallas_cell_plan_search(n, widths, r_max)
    edges = np.linspace(0, r_max, n_bins + 1)
    c, _ = cell_pair_histogram_pallas(
        pos, box=jnp.asarray(h32), r_max=r_max,
        n_cells_dim=plan["n_cells_dim"],
        capacity=plan["capacity"], n_bins=n_bins,
        precision="exact", reach=plan["reach"],
    )
    xla = np.array(
        radial_histogram_frame(
            jnp.asarray(pos), jnp.asarray(pos), jnp.asarray(h32),
            jnp.asarray(edges), precision="exact",
        )
    )
    xla[0] -= n  # XLA counts identical-atom pairs at distance 0
    np.testing.assert_array_equal(np.asarray(c), xla)


def test_tri_pp_cross_bitequal_xla(monkeypatch):
    from mdhelper_tpu.ops.histogram import radial_histogram_frame
    from mdhelper_tpu.ops.pallas_cell_histogram import (
        triclinic_perpendicular_widths,
    )

    na, nb, r_max, n_bins = 200, 260, 4.0, 30
    dims6, h32, pos = _tri_fixture(na + nb, seed=5)
    pa, pb = pos[:na], pos[na:]
    widths = np.asarray(
        triclinic_perpendicular_widths(h32.astype(np.float64))
    )
    plan = pallas_cell_plan_search(na, widths, r_max, n_atoms2=nb)
    edges = np.linspace(0, r_max, n_bins + 1)
    c, _, _ = cross_pair_histogram_pallas(
        pa, pb, box=jnp.asarray(h32), r_max=r_max,
        n_cells_dim=plan["n_cells_dim"],
        capacity1=plan["capacity"], capacity2=plan["capacity2"],
        n_bins=n_bins, precision="exact", reach=plan["reach"],
    )
    xla = np.array(
        radial_histogram_frame(
            jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(h32),
            jnp.asarray(edges), precision="exact",
        )
    )
    np.testing.assert_array_equal(np.asarray(c), xla)


# ------------------------------------------------------------------
# analysis-class routes (forced on CPU; the router itself gates on
# a real TPU)
# ------------------------------------------------------------------

def _forced_rdf(u_args, force, **kw):
    from mdhelper_tpu.analysis import structure as S
    from mdhelper_tpu.core.universe import Universe

    traj, dims = u_args
    u = Universe.from_arrays(traj, dims, dt=1.0)
    if force:
        orig = S.RadialDistributionFunction._use_pallas_cell_kernel
        S.RadialDistributionFunction._use_pallas_cell_kernel = (
            lambda self: True
        )
    try:
        a = S.RadialDistributionFunction(
            u.atoms, verbose=False, **kw
        )
        a.run()
    finally:
        if force:
            S.RadialDistributionFunction._use_pallas_cell_kernel = (
                orig
            )
    return a


def test_rdf_class_drop_axis_matches_xla():
    """The headline round-5 route: 2-D drop_axis RDF through the
    Pallas cell kernels, bit-equal counts and identical area
    normalization vs the XLA sweep."""

    r = np.random.default_rng(53)
    box = 18.0
    traj = r.random((2, 500, 3)) * box
    dims = np.array([box] * 3)
    kw = dict(n_bins=36, range=(0.0, 4.5), drop_axis="y")
    ax = _forced_rdf((traj, dims), False, **kw)
    ap = _forced_rdf((traj, dims), True, **kw)
    np.testing.assert_array_equal(
        ax.results.counts, ap.results.counts
    )
    np.testing.assert_allclose(
        ax.results.rdf, ap.results.rdf, rtol=1e-12
    )


def test_rdf_class_small_box_matches_xla():
    r = np.random.default_rng(59)
    box = 9.5
    traj = r.random((2, 450, 3)) * box
    dims = np.array([box] * 3)
    kw = dict(n_bins=32, range=(0.0, 4.0))
    ax = _forced_rdf((traj, dims), False, **kw)
    ap = _forced_rdf((traj, dims), True, **kw)
    np.testing.assert_array_equal(
        ax.results.counts, ap.results.counts
    )
    np.testing.assert_allclose(
        ax.results.rdf, ap.results.rdf, rtol=1e-12
    )


def test_vanhove_small_box_cell_route_matches_xla(monkeypatch):
    from mdhelper_tpu.analysis import structure as S
    from mdhelper_tpu.core.universe import Universe

    r = np.random.default_rng(61)
    box = 9.0
    traj = r.random((5, 220, 3)) * box
    dims = np.array([box] * 3)
    kw = dict(n_bins=24, range=(0.0, 4.0), n_lags=3, verbose=False)

    def run(force_cell):
        u = Universe.from_arrays(traj, dims, dt=1.0)
        if force_cell:
            monkeypatch.setattr(
                S.VanHoveFunction, "_use_cell_kernel",
                lambda self: True,
            )
        else:
            monkeypatch.setenv("MDTPU_VANHOVE_IMPL", "xla")
        vh = S.VanHoveFunction(u.atoms, **kw)
        vh.run()
        if force_cell:
            monkeypatch.undo()
        else:
            monkeypatch.delenv("MDTPU_VANHOVE_IMPL")
        return vh

    vx = run(False)
    vp = run(True)
    np.testing.assert_array_equal(
        vx.results.counts_distinct, vp.results.counts_distinct
    )
    np.testing.assert_array_equal(
        vx.results.counts_self, vp.results.counts_self
    )


@pytest.mark.parametrize("triclinic", [False, True])
def test_vanhove_cell_lag_split_matches_xla(monkeypatch, triclinic):
    """Round 5 allows the watchdog lag-split to combine with the
    Pallas cell route (cell_plan= in _prepare_lag_split): a
    sub-frame MDTPU_EXEC_BUDGET_S must split the lag grid across
    executions of the cell-kernel step and still match the
    unsplit XLA sweep bit-for-bit (occ threading, ring wrap and
    advance bookkeeping included)."""

    from mdhelper_tpu.analysis import structure as S
    from mdhelper_tpu.core.universe import Universe

    r = np.random.default_rng(67)
    n, T = 160, 5
    if triclinic:
        from mdhelper_tpu.algorithm.topology import (
            triclinic_matrices,
        )

        dims = np.array([9.0, 8.5, 8.0, 80.0, 95.0, 100.0])
        h = np.asarray(triclinic_matrices(dims), np.float64)
        traj = r.random((T, n, 3)) @ h
    else:
        dims = np.array([9.0] * 3)
        traj = r.random((T, n, 3)) * 9.0
    kw = dict(n_bins=16, range=(0.0, 3.5), n_lags=3, verbose=False)

    def run(force_cell, split):
        if split:
            monkeypatch.setenv("MDTPU_EXEC_BUDGET_S", "1e-9")
        else:
            monkeypatch.delenv(
                "MDTPU_EXEC_BUDGET_S", raising=False
            )
        u = Universe.from_arrays(traj, dims, dt=1.0)
        if force_cell:
            monkeypatch.setattr(
                S.VanHoveFunction, "_use_cell_kernel",
                lambda self: True,
            )
        else:
            monkeypatch.setenv("MDTPU_VANHOVE_IMPL", "xla")
        with np.errstate(all="ignore"):
            import warnings as _w

            with _w.catch_warnings():
                _w.simplefilter("ignore")
                vh = S.VanHoveFunction(u.atoms, **kw)
                vh.run()
        monkeypatch.undo()
        return vh

    ref = run(False, False)
    split = run(True, True)
    np.testing.assert_array_equal(
        ref.results.counts_distinct, split.results.counts_distinct
    )
    np.testing.assert_array_equal(
        ref.results.counts_self, split.results.counts_self
    )
