"""Tests for the core runtime: readers, Universe/AtomGroup, analysis
base classes and the batched streaming driver."""

import numpy as np
import pytest

from mdhelper_tpu.analysis.base import Hash, SerialAnalysisBase
from mdhelper_tpu.core import ArrayReader, Topology, Universe

rng = np.random.default_rng(5)


def make_universe(n_frames=12, n_atoms=24, box=10.0):
    positions = rng.random((n_frames, n_atoms, 3)) * box
    return Universe.from_arrays(
        positions,
        np.array([box, box, box]),
        masses=np.arange(1, n_atoms + 1, dtype=float),
        charges=np.tile([1.0, -1.0], n_atoms // 2),
        types=np.array(["A", "B"] * (n_atoms // 2), dtype=object),
        resindices=np.repeat(np.arange(n_atoms // 4), 4),
        segindices=np.repeat(np.arange(2), n_atoms // 2),
        bonds=[[0, 1], [1, 2], [4, 5]],
        dt=0.5,
    )


def test_hash():
    h = Hash({"a": 1}, b=2)
    assert h.a == 1 and h["b"] == 2
    h.c = 3
    assert h["c"] == 3
    del h.c
    assert h.c is None
    with pytest.raises(TypeError):
        Hash([1, 2])


def test_array_reader():
    u = make_universe()
    traj = u.trajectory
    assert traj.n_frames == 12 and traj.n_atoms == 24
    frame = traj[3]
    assert frame.frame == 3 and frame.time == 1.5
    pos, dims = traj.read_frames([1, 5, 7])
    assert pos.shape == (3, 24, 3) and dims.shape == (3, 6)
    assert np.allclose(dims[0][:3], 10.0) and np.allclose(dims[0][3:], 90)
    with pytest.raises(IndexError):
        traj[100]


def test_atomgroup_attributes():
    u = make_universe()
    ag = u.atoms
    assert ag.n_atoms == 24
    assert ag.n_residues == 6 and ag.n_segments == 2
    assert len(ag.residues) == 6
    assert ag.residues[1].atoms.n_atoms == 4
    np.testing.assert_array_equal(ag.residues[1].atoms.ix, [4, 5, 6, 7])
    # COM matches the manual mass-weighted mean.
    com = ag.center_of_mass()
    manual = (ag.masses[:, None] * ag.positions).sum(0) / ag.masses.sum()
    assert np.allclose(com, manual)


def test_atomgroup_selection():
    u = make_universe()
    ag = u.atoms
    assert u.select_atoms("all").n_atoms == 24
    a_atoms = u.select_atoms("type A")
    assert a_atoms.n_atoms == 12
    assert set(a_atoms.types) == {"A"}
    sel = u.select_atoms("type A and index 0:7")
    np.testing.assert_array_equal(sel.ix, [0, 2, 4, 6])
    both = u.select_atoms("type A or type B")
    assert both.n_atoms == 24


def test_selection_around():
    """Geometric ``around CUTOFF sel`` selection: periodic KD-tree
    shell query vs a brute-force minimum-image oracle (MDAnalysis
    ``around`` semantics: within cutoff of any reference atom,
    excluding the reference itself)."""

    u = make_universe()
    box = np.asarray(u.dimensions[:3], dtype=np.float64)
    pos = np.asarray(u.atoms.positions, dtype=np.float64)
    ref_ix = u.select_atoms("type A").ix
    inner = np.zeros(u.atoms.n_atoms, dtype=bool)
    inner[ref_ix] = True
    cutoff = 2.5

    delta = pos[:, None, :] - pos[ref_ix][None, :, :]
    delta -= box * np.round(delta / box)
    dmin = np.linalg.norm(delta, axis=-1).min(axis=1)
    expect = np.flatnonzero((dmin <= cutoff) & ~inner)

    got = u.select_atoms("around 2.5 type A")
    np.testing.assert_array_equal(got.ix, expect)

    # composes with boolean operators (shell restricted to anions)
    anion_shell = u.select_atoms("charge < 0 and around 2.5 type A")
    np.testing.assert_array_equal(
        anion_shell.ix, np.intersect1d(expect, np.arange(1, 24, 2))
    )

    # parenthesised compound reference binds as one unit
    sub_ref = u.select_atoms("type A and index 0:7").ix
    delta = pos[:, None, :] - pos[sub_ref][None, :, :]
    delta -= box * np.round(delta / box)
    dmin = np.linalg.norm(delta, axis=-1).min(axis=1)
    sub_inner = np.zeros(u.atoms.n_atoms, dtype=bool)
    sub_inner[sub_ref] = True
    np.testing.assert_array_equal(
        u.select_atoms("around 2.5 (type A and index 0:7)").ix,
        np.flatnonzero((dmin <= cutoff) & ~sub_inner),
    )

    # empty reference set -> empty shell
    assert u.select_atoms("around 3 none").n_atoms == 0

    # errors: missing/invalid cutoff, missing reference selection
    for bad in ("around type A", "around 2.5", "around"):
        with pytest.raises(ValueError):
            u.select_atoms(bad)


def test_selection_positional_terms():
    """prop/point/sphzone geometric selections (current frame,
    minimum-image for orthorhombic boxes)."""

    n = 6
    pos = np.array(
        [
            [0.5, 0.5, 0.5],
            [0.5, 0.5, 4.0],
            [0.5, 0.5, 9.5],   # wraps to within 1.0 of the origin
            [5.0, 5.0, 5.0],
            [5.2, 5.0, 5.0],
            [9.0, 9.0, 9.0],
        ]
    )
    u = Universe.from_arrays(
        pos[None],
        np.array([10.0, 10.0, 10.0]),
        masses=np.ones(n),
        charges=np.zeros(n),
        types=np.array(list("ABCDEF"), dtype=object),
        resindices=np.zeros(n, int),
        segindices=np.zeros(n, int),
    )
    np.testing.assert_array_equal(
        u.select_atoms("prop z < 4.5").ix, [0, 1]
    )
    np.testing.assert_array_equal(
        u.select_atoms("prop z >= 4.0 and prop x > 1").ix, [3, 4, 5]
    )
    # point: periodic — atom 2 (z=9.5) is 1.0 from the origin corner
    np.testing.assert_array_equal(
        u.select_atoms("point 0.5 0.5 0.5 1.5").ix, [0, 2]
    )
    # sphzone: inclusive of the reference selection
    np.testing.assert_array_equal(
        u.select_atoms("sphzone 1.0 type D").ix, [3, 4]
    )
    np.testing.assert_array_equal(
        u.select_atoms("around 1.0 type D").ix, [4]
    )
    for bad in (
        "prop w < 1",
        "prop z 1",
        "point 1 2 3",
        "sphzone type A",
    ):
        with pytest.raises(ValueError):
            u.select_atoms(bad)


def test_selection_byres():
    n = 9
    u = Universe.from_arrays(
        np.arange(n * 3, dtype=float).reshape(1, n, 3),
        np.array([100.0, 100.0, 100.0]),
        types=np.array(list("ABCABCABC"), dtype=object),
        resindices=np.repeat(np.arange(3), 3),
        segindices=np.array([0, 0, 0, 0, 0, 0, 1, 1, 1]),
    )
    # expand one matched atom per residue to the whole residue
    np.testing.assert_array_equal(
        u.select_atoms("byres type A").ix, np.arange(9)
    )
    np.testing.assert_array_equal(
        u.select_atoms("byres index 4").ix, [3, 4, 5]
    )
    np.testing.assert_array_equal(
        u.select_atoms("bysegment (type C and index 8)").ix,
        [6, 7, 8],
    )
    # without parentheses 'and' applies after the expansion
    np.testing.assert_array_equal(
        u.select_atoms("bysegment type C and index 8").ix, [8]
    )
    # precedence: byres binds one not_expr unit
    np.testing.assert_array_equal(
        u.select_atoms("byres (index 0 or index 8)").ix,
        [0, 1, 2, 6, 7, 8],
    )
    # same ATTR as <sel>: the general attribute expansion
    np.testing.assert_array_equal(
        u.select_atoms("same type as index 0").ix, [0, 3, 6]
    )
    np.testing.assert_array_equal(
        u.select_atoms("same resid as index 4").ix, [3, 4, 5]
    )
    for bad in ("same foo as type A", "same type index 0"):
        with pytest.raises(ValueError):
            u.select_atoms(bad)


def test_selection_glob():
    """fnmatch globbing on label terms (MDAnalysis semantics)."""

    n = 8
    u = Universe.from_arrays(
        rng.random((2, n, 3)) * 5.0,
        np.array([5.0, 5.0, 5.0]),
        masses=np.ones(n),
        charges=np.zeros(n),
        types=np.array(
            ["HW1", "HW2", "OW", "H1", "NA", "CL", "H", "OW"],
            dtype=object,
        ),
        resindices=np.zeros(n, int),
        segindices=np.zeros(n, int),
    )
    np.testing.assert_array_equal(
        u.select_atoms("type H*").ix, [0, 1, 3, 6]
    )
    np.testing.assert_array_equal(
        u.select_atoms("type HW?").ix, [0, 1]
    )
    np.testing.assert_array_equal(
        u.select_atoms("type OW H1").ix, [2, 3, 7]
    )
    # mixed literal + glob, and glob matching nothing
    np.testing.assert_array_equal(
        u.select_atoms("type NA X* H?").ix, [3, 4]
    )
    assert u.select_atoms("type Z*").n_atoms == 0


def test_selection_grammar_not_parens_numeric():
    """Widened selection grammar: ``not``, parentheses and numeric
    property comparisons (mass/charge/resid/index with
    <, <=, >, >=, ==, !=)."""

    u = make_universe()

    # not
    not_a = u.select_atoms("not type A")
    np.testing.assert_array_equal(not_a.ix, u.select_atoms("type B").ix)
    # double negation
    np.testing.assert_array_equal(
        u.select_atoms("not not type A").ix, u.select_atoms("type A").ix
    )

    # numeric comparisons (masses are 1..24, charges alternate +1/-1)
    heavy = u.select_atoms("mass > 20")
    np.testing.assert_array_equal(heavy.ix, np.arange(20, 24))
    anions = u.select_atoms("charge < 0")
    np.testing.assert_array_equal(anions.ix, np.arange(1, 24, 2))
    np.testing.assert_array_equal(
        u.select_atoms("mass <= 2").ix, [0, 1]
    )
    np.testing.assert_array_equal(
        u.select_atoms("index == 7").ix, [7]
    )
    np.testing.assert_array_equal(
        u.select_atoms("mass != 1 and index < 3").ix, [1, 2]
    )
    # resid supports both range syntax and comparisons
    np.testing.assert_array_equal(
        u.select_atoms("resid >= 5").ix,
        u.select_atoms("resid 5:6").ix,
    )

    # parentheses + precedence: and binds tighter than or
    np.testing.assert_array_equal(
        u.select_atoms("(type A or type B) and index 0:3").ix,
        np.arange(4),
    )
    np.testing.assert_array_equal(
        u.select_atoms("type A or type B and index 0:3").ix,
        np.union1d(u.select_atoms("type A").ix, [1, 3]),
    )
    np.testing.assert_array_equal(
        u.select_atoms("not (type A or mass > 4) and charge < 0").ix,
        [1, 3],
    )

    # errors
    for bad in (
        "mass 5",              # comparison required
        "type",                # missing label
        "(type A",             # unbalanced parens
        "type A)",             # trailing token
        "mass > abc",          # not a number
        "",                    # empty
        "resid",               # missing values
    ):
        with pytest.raises(ValueError):
            u.select_atoms(bad)


def test_atomgroup_fragments():
    u = make_universe()
    frags = u.atoms.fragments
    # bonds: 0-1-2 connected, 4-5 connected, rest isolated.
    sizes = sorted(len(f) for f in frags)
    assert sizes == [1] * 19 + [2, 3]


def test_serial_frame_loop_contract():
    """User subclasses using the classic _single_frame protocol work."""

    u = make_universe()

    class MeanZ(SerialAnalysisBase):
        def __init__(self, universe):
            super().__init__(universe.trajectory)
            self._u = universe

        def _prepare(self):
            self._z = []

        def _single_frame(self):
            self._z.append(self._ts.positions[:, 2].mean())

        def _conclude(self):
            self.results.mean_z = np.array(self._z)

    analysis = MeanZ(u).run(start=2, stop=10, step=2)
    assert analysis.n_frames == 4
    ref = [u.trajectory[i].positions[:, 2].mean() for i in (2, 4, 6, 8)]
    assert np.allclose(analysis.results.mean_z, ref)


def test_save_roundtrip(tmp_path):
    u = make_universe()

    class Noop(SerialAnalysisBase):
        def _single_frame(self):
            pass

        def _conclude(self):
            self.results.data = np.arange(5.0)

    analysis = Noop(u.trajectory).run(stop=1)
    out = tmp_path / "results.npz"
    analysis.save(out)
    loaded = np.load(out)
    assert np.allclose(loaded["data"], np.arange(5.0))


def test_frames_argument():
    u = make_universe()

    class Count(SerialAnalysisBase):
        def _prepare(self):
            self.seen = []

        def _single_frame(self):
            self.seen.append(self._ts.frame)

    picked = [0, 3, 7]
    analysis = Count(u.trajectory).run(frames=picked)
    assert analysis.seen == picked
    mask = np.zeros(12, dtype=bool)
    mask[[1, 2]] = True
    analysis = Count(u.trajectory).run(frames=mask)
    assert analysis.seen == [1, 2]
    with pytest.raises(ValueError):
        Count(u.trajectory).run(start=1, frames=picked)


def test_ring_radial_histogram_matches_single_device():
    """Atom-sharded ring pass (ppermute) == single-device histogram."""

    import jax
    import jax.numpy as jnp

    from mdhelper_tpu.ops.histogram import radial_histogram_frame
    from mdhelper_tpu.parallel.ring import ring_radial_histogram

    assert len(jax.devices()) == 8  # conftest virtual mesh
    box = np.array([12.0, 12.0, 12.0])
    edges = np.linspace(0.0, 5.0, 41)
    # 83 atoms: not divisible by 8, exercises padding.
    pos = rng.random((83, 3)) * box

    ring = ring_radial_histogram(pos, box, edges, exclusion=(1, 1))
    direct = np.asarray(
        radial_histogram_frame(
            jnp.asarray(pos), jnp.asarray(pos), jnp.asarray(box),
            jnp.asarray(edges), exclusion=(1, 1),
        )
    )
    np.testing.assert_array_equal(ring.astype(int), direct.astype(int))


def test_checkpoint_resume(tmp_path):
    """A killed carry-accumulating analysis resumes mid-stream."""

    from mdhelper_tpu.analysis.structure import (
        RadialDistributionFunction,
    )

    u = make_universe(n_frames=10, n_atoms=16)
    ag = u.atoms
    ckpt = str(tmp_path / "rdf_carry.npz")

    full = RadialDistributionFunction(
        ag, n_bins=12, range=(0.0, 4.0), exclusion=(1, 1),
        verbose=False,
    ).run()

    # Run partially (first 4 frames) with checkpointing...
    partial = RadialDistributionFunction(
        ag, n_bins=12, range=(0.0, 4.0), exclusion=(1, 1),
        verbose=False,
    )
    partial._chunk_bytes = 2 * 16 * 3 * 8  # 2 frames per chunk
    partial.run(stop=4, checkpoint=ckpt)

    # ...then resume the full range from the same checkpoint file.
    resumed = RadialDistributionFunction(
        ag, n_bins=12, range=(0.0, 4.0), exclusion=(1, 1),
        verbose=False,
    )
    resumed._chunk_bytes = 2 * 16 * 3 * 8
    resumed.run(checkpoint=ckpt)
    np.testing.assert_array_equal(
        resumed.results.counts, full.results.counts
    )


def test_profiling_helpers():
    import jax.numpy as jnp

    from mdhelper_tpu.core.profiling import Timer, benchmark_grid

    timer = Timer()
    with timer("stage_a"):
        pass
    with timer("stage_a"):
        pass
    assert timer.counts["stage_a"] == 2
    assert "stage_a" in timer.report()

    import jax

    def build(scale):
        return jax.jit(lambda x: x * scale)

    best, ranking = benchmark_grid(
        build, [{"scale": 2.0}, {"scale": 3.0}], jnp.ones(8),
        warmup=1, repeats=1,
    )
    assert best in ({"scale": 2.0}, {"scale": 3.0})
    assert len(ranking) == 2


def test_cell_pair_histogram_matches_brute_force():
    """Sorted cell list == tiled brute force (np.histogram binning)."""

    import jax.numpy as jnp

    from mdhelper_tpu.ops.bench_kernels import pair_histogram_two_level
    from mdhelper_tpu.ops.cell_histogram import (
        cell_histogram_plan,
        cell_pair_histogram,
        neighbor_cell_ids,
    )

    box, r_max, n_bins = 18.0, 4.0, 48
    pos = (rng.random((700, 3)) * box).astype(np.float32)
    plan = cell_histogram_plan(len(pos), [box] * 3, r_max)
    nbr = jnp.asarray(neighbor_cell_ids(plan["n_cells_dim"]))
    counts, occupancy = cell_pair_histogram(
        jnp.asarray(pos),
        jnp.asarray(np.full(3, box, np.float32)),
        r_max,
        nbr,
        n_cells_dim=plan["n_cells_dim"],
        capacity=plan["capacity"],
        n_bins=n_bins,
        exclusion=(1, 1),
    )
    assert int(occupancy) <= plan["capacity"]
    brute = np.asarray(
        pair_histogram_two_level(
            jnp.asarray(pos), box, r_max, n_bins, tile=256
        )
    ).copy()
    brute[0] -= len(pos)  # remove self pairs
    np.testing.assert_array_equal(
        np.asarray(counts).astype(int), brute.astype(int)
    )


def test_doublefloat_primitives_exact():
    """two_sum/two_prod error terms recover the float64 value."""

    import jax.numpy as jnp

    from mdhelper_tpu.ops.doublefloat import (
        df_add,
        df_square,
        two_diff,
        two_prod,
        two_sum,
    )

    a = rng.standard_normal(512).astype(np.float32) * 1e3
    b = rng.standard_normal(512).astype(np.float32)
    aj, bj = jnp.asarray(a), jnp.asarray(b)

    s, e = two_sum(aj, bj)
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64),
        a.astype(np.float64) + b.astype(np.float64),
    )
    d, de = two_diff(aj, bj)
    np.testing.assert_array_equal(
        np.asarray(d, np.float64) + np.asarray(de, np.float64),
        a.astype(np.float64) - b.astype(np.float64),
    )
    p, pe = two_prod(aj, bj)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(pe, np.float64),
        a.astype(np.float64) * b.astype(np.float64),
    )
    # df_add of two exact pairs stays within 1 ulp of the f64 sum.
    h, l = df_add((s, e), (p, pe))
    got = np.asarray(h, np.float64) + np.asarray(l, np.float64)
    want = (a.astype(np.float64) + b.astype(np.float64)) + (
        a.astype(np.float64) * b.astype(np.float64)
    )
    np.testing.assert_allclose(got, want, rtol=1e-14)
    # Squares of exact differences are the core of the exact binning.
    h, l = df_square((d, de))
    got = np.asarray(h, np.float64) + np.asarray(l, np.float64)
    want = (a.astype(np.float64) - b.astype(np.float64)) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-13)


def test_cell_pair_histogram_exact_matches_float64_oracle():
    """precision="exact" bins agree with a float64 NumPy histogram."""

    import jax.numpy as jnp

    from mdhelper_tpu.ops.cell_histogram import (
        cell_histogram_plan,
        cell_pair_histogram,
        neighbor_cell_ids,
    )

    box, r_max, n_bins = 40.0, 6.0, 200
    pos = (rng.random((1500, 3)) * box).astype(np.float32)
    # Generous capacity: with only ~216 cells at mean occupancy ~7,
    # the Poisson tail regularly exceeds the default 1.6x headroom.
    plan = cell_histogram_plan(
        len(pos), [box] * 3, r_max, capacity_factor=3.0
    )
    nbr = jnp.asarray(neighbor_cell_ids(plan["n_cells_dim"]))
    counts, occupancy = cell_pair_histogram(
        jnp.asarray(pos),
        jnp.asarray(np.full(3, box, np.float32)),
        r_max,
        nbr,
        n_cells_dim=plan["n_cells_dim"],
        capacity=plan["capacity"],
        n_bins=n_bins,
        exclusion=(1, 1),
        precision="exact",
    )
    assert int(occupancy) <= plan["capacity"]

    p64 = pos.astype(np.float64)
    delta = p64[:, None, :] - p64[None, :, :]
    delta -= box * np.round(delta / box)
    dist = np.sqrt((delta**2).sum(-1))
    iu = ~np.eye(len(pos), dtype=bool)
    oracle, _ = np.histogram(
        dist[iu], bins=n_bins, range=(0.0, r_max)
    )
    # np.histogram's last bin is closed ([.., r_max]); the kernel's is
    # half-open — align by dropping exact-r_max hits (none here with
    # random coordinates, so require strict equality).
    np.testing.assert_array_equal(
        np.asarray(counts).astype(int), oracle.astype(int)
    )


def test_trig_sums_exact_matches_float64_oracle():
    """precision="exact" trig sums track the float64 oracle to ~1e-6
    relative even with phases of hundreds of radians (where the f32
    path loses several per-cent)."""

    import jax.numpy as jnp

    from mdhelper_tpu.ops.scattering import trig_sums_frame

    box = 60.0
    local_rng = np.random.default_rng(2024)
    pos = (local_rng.random((3000, 3)) * box).astype(np.float32)
    grid = 2 * np.pi * np.arange(1, 9) / box
    qs = np.stack(np.meshgrid(grid, grid, grid), -1).reshape(-1, 3)
    qs = qs.astype(np.float32)

    phases = qs.astype(np.float64) @ pos.astype(np.float64).T
    oc, os_ = np.cos(phases).sum(-1), np.sin(phases).sum(-1)
    amp = np.hypot(oc, os_)

    c_exact, s_exact = trig_sums_frame(
        jnp.asarray(qs), jnp.asarray(pos),
        precision="exact", q_tile=128,
    )
    err = np.hypot(
        np.asarray(c_exact, np.float64) - oc,
        np.asarray(s_exact, np.float64) - os_,
    )
    assert np.median(err / amp) < 1e-5
    assert (err / amp).max() < 1e-3

    # And the fast path is measurably worse at this phase scale —
    # guards against the exact path silently falling back to f32.
    c_fast, s_fast = trig_sums_frame(jnp.asarray(qs), jnp.asarray(pos))
    err_fast = np.hypot(
        np.asarray(c_fast, np.float64) - oc,
        np.asarray(s_fast, np.float64) - os_,
    )
    # A silent f32 fallback would give a ratio of ~1; the genuine
    # double-float path lands ~10x better (seed-dependent).
    assert err_fast.sum() > 5 * err.sum()


def test_checkpoint_resume_misaligned_chunk_boundary(tmp_path):
    """A resume whose chunking straddles the checkpoint boundary
    (the interrupted run's last chunk was truncated by `stop`) must
    not double-count the already-processed frames."""

    from mdhelper_tpu.analysis.structure import (
        RadialDistributionFunction,
    )

    u = make_universe(n_frames=10, n_atoms=16)
    ckpt = str(tmp_path / "rdf_misaligned.npz")

    def make():
        a = RadialDistributionFunction(
            u.atoms, n_bins=12, range=(0.0, 4.0), exclusion=(1, 1),
            verbose=False,
        )
        a._chunk_bytes = 3 * 16 * 3 * 8  # 3 frames per chunk
        return a

    full = make().run()
    # stop=5 is NOT a multiple of the 3-frame chunk: the resumed
    # stream's second chunk (frames 3-5) straddles the boundary.
    make().run(stop=5, checkpoint=ckpt)
    resumed = make().run(checkpoint=ckpt)
    np.testing.assert_array_equal(
        resumed.results.counts, full.results.counts
    )


def test_checkpoint_rejected_for_unregistered_stores(tmp_path):
    """Store-type analyses whose host buffers are NOT registered for
    checkpointing must refuse BEFORE streaming — a carry-only
    checkpoint would corrupt the host store on resume."""

    from mdhelper_tpu.analysis.polymer import RouseModes

    u = make_universe(n_frames=6, n_atoms=16)
    rm = RouseModes(
        u.atoms, n_chains=4, n_monomers=4, n_modes=2, verbose=False
    )
    with pytest.raises(ValueError, match="not registered"):
        rm.run(checkpoint=str(tmp_path / "state.npz"))


def test_checkpoint_resume_store_type_onsager(tmp_path):
    """A killed Onsager run (store-type: per-frame entity positions;
    sequential unwrap carry) resumes mid-stream bit-exactly."""

    from mdhelper_tpu.analysis.transport import Onsager

    u = make_universe(n_frames=10, n_atoms=16)
    ckpt = str(tmp_path / "onsager.npz")

    def make():
        a = Onsager(u.atoms, temperature=300, unwrap=True,
                    verbose=False)
        a._chunk_bytes = 2 * 16 * 3 * 8  # 2 frames per chunk
        return a

    full = make().run()
    make().run(stop=4, checkpoint=ckpt)  # "killed" after 4 frames
    resumed = make().run(checkpoint=ckpt)
    np.testing.assert_allclose(
        resumed.results.msd_self, full.results.msd_self, rtol=1e-12
    )


def test_checkpoint_resume_store_type_new_classes(tmp_path):
    """Cluster (per-frame series) and H-bond (lifetime existence
    buffer) analyses resume from a mid-stream checkpoint."""

    from mdhelper_tpu.analysis.cluster import ClusterSizeDistribution
    from mdhelper_tpu.analysis.hbonds import HydrogenBondAnalysis
    from mdhelper_tpu.core.universe import Universe

    local = np.random.default_rng(41)
    box, n_mol, F = 12.0, 8, 10
    n = 3 * n_mol
    pos = np.empty((F, n, 3))
    names, bonds = [], []
    for m in range(n_mol):
        o = 3 * m
        names += ["O", "H1", "H2"]
        bonds += [(o, o + 1), (o, o + 2)]
    for f in range(F):
        centers = local.random((n_mol, 3)) * box
        for m in range(n_mol):
            o = 3 * m
            pos[f, o] = centers[m]
            for h in (o + 1, o + 2):
                d = local.standard_normal(3)
                d /= np.linalg.norm(d)
                pos[f, h] = centers[m] + 0.96 * d
    pos %= box
    u = Universe.from_arrays(
        pos, np.array([box] * 3),
        names=np.array(names, dtype=object),
        resindices=np.repeat(np.arange(n_mol), 3),
        bonds=np.asarray(bonds),
    )

    ckpt = str(tmp_path / "cluster.npz")

    def cl():
        a = ClusterSizeDistribution(
            u.atoms, 3.0, "residues", verbose=False
        )
        a._chunk_bytes = 3 * n * 3 * 8  # 3 frames per chunk
        return a

    full = cl().run()
    cl().run(stop=5, checkpoint=ckpt)
    resumed = cl().run(checkpoint=ckpt)
    np.testing.assert_array_equal(
        resumed.results.size_counts, full.results.size_counts
    )
    np.testing.assert_array_equal(
        resumed.results.n_clusters, full.results.n_clusters
    )
    np.testing.assert_array_equal(
        resumed.results.largest, full.results.largest
    )

    ckpt = str(tmp_path / "hbonds.npz")

    def hb():
        a = HydrogenBondAnalysis(
            u, hydrogens_sel="name H*", acceptors_sel="name O*",
            lifetimes=True, verbose=False,
        )
        a._chunk_bytes = 3 * n * 3 * 8
        return a

    full = hb().run()
    hb().run(stop=5, checkpoint=ckpt)
    resumed = hb().run(checkpoint=ckpt)
    np.testing.assert_array_equal(
        resumed.results.counts, full.results.counts
    )
    np.testing.assert_allclose(
        resumed.results.occupancies, full.results.occupancies
    )
    np.testing.assert_allclose(
        resumed.results.lifetime, full.results.lifetime, rtol=1e-12
    )
    np.testing.assert_allclose(
        resumed.results.survival, full.results.survival, rtol=1e-12
    )


def test_checkpoint_resume_store_type_more_classes(tmp_path):
    """DipoleMoment (unwrap scan + results stores), Gyradius
    (axis-1 stores), and the time-FFT ISF (private rho buffer) all
    resume from a mid-stream checkpoint."""

    from mdhelper_tpu.analysis.electrostatics import DipoleMoment
    from mdhelper_tpu.analysis.polymer import Gyradius
    from mdhelper_tpu.analysis.structure import (
        IntermediateScatteringFunction,
    )

    u = make_universe(n_frames=9, n_atoms=16)

    def resume_equal(make, keys, ckpt, stop=5):
        full = make().run()
        make().run(stop=stop, checkpoint=ckpt)
        resumed = make().run(checkpoint=ckpt)
        for key in keys:
            np.testing.assert_allclose(
                np.asarray(resumed.results[key], dtype=float),
                np.asarray(full.results[key], dtype=float),
                rtol=1e-10,
                err_msg=key,
            )

    def dip():
        a = DipoleMoment(u.atoms, unwrap=True, verbose=False)
        a._chunk_bytes = 2 * 16 * 3 * 8
        return a

    resume_equal(
        dip, ("dipoles", "volumes"),
        str(tmp_path / "dip.npz"),
    )

    def gyr():
        a = Gyradius(
            u.atoms, n_chains=4, n_monomers=4, verbose=False
        )
        a._chunk_bytes = 2 * 16 * 3 * 8
        return a

    # Gyradius stores time on axis 1, so extension-resume is
    # (correctly) rejected; the supported flow is kill -> resume over
    # the SAME selection.
    full = gyr().run()
    ckpt = str(tmp_path / "gyr.npz")
    killed = gyr()
    real = type(killed)._batched_update
    calls = {"n": 0}

    def dying(self, carry, batch):
        calls["n"] += 1
        if calls["n"] == 3:
            raise KeyboardInterrupt
        return real(self, carry, batch)

    type(killed)._batched_update = dying
    try:
        with pytest.raises(KeyboardInterrupt):
            killed.run(checkpoint=ckpt)
    finally:
        type(killed)._batched_update = real
    resumed = gyr().run(checkpoint=ckpt)
    np.testing.assert_allclose(
        resumed.results.gyradii, full.results.gyradii, rtol=1e-12
    )

    def isf():
        a = IntermediateScatteringFunction(
            u.atoms, n_points=2, sort=False, unique=False,
            fft=True, verbose=False,
        )
        a._chunk_bytes = 2 * 16 * 3 * 8
        return a

    resume_equal(
        isf, ("cisf",), str(tmp_path / "isf.npz")
    )


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    """Resuming a store-type checkpoint into an incompatible frame
    selection fails the shape check instead of corrupting buffers."""

    from mdhelper_tpu.analysis.cluster import ClusterSizeDistribution

    u = make_universe(n_frames=8, n_atoms=12)
    ckpt = str(tmp_path / "cluster.npz")
    ClusterSizeDistribution(u.atoms, 2.0, verbose=False).run(
        stop=6, checkpoint=ckpt
    )
    short = ClusterSizeDistribution(u.atoms, 2.0, verbose=False)
    with pytest.raises(ValueError, match="incompatible"):
        short.run(stop=3, checkpoint=ckpt)


def test_prefetch_preserves_order_and_results(monkeypatch):
    """The depth-1 batch prefetcher must hand chunks to sequential
    (order-dependent) analyses in frame order and change nothing
    numerically."""

    from mdhelper_tpu.analysis.structure import (
        IntermediateScatteringFunction,
    )

    u = make_universe()

    def run(prefetch):
        monkeypatch.setenv("MDTPU_PREFETCH", prefetch)
        isf = IntermediateScatteringFunction(
            u.atoms, n_points=3, fft=False, incoherent=True,
            unique=False, sort=False, verbose=False,
        )
        # Tiny chunks exercise several prefetched handoffs.
        isf._chunk_bytes = 2 * u.atoms.n_atoms * 3 * 8
        isf.run()
        return isf.results

    off = run("0")
    on = run("1")
    np.testing.assert_array_equal(off.cisf, on.cisf)
    np.testing.assert_array_equal(off.iisf, on.iisf)


def test_selection_fuzz_random_expressions():
    """Differential fuzz: random boolean expression trees evaluated
    by select_atoms must match a direct mask-algebra oracle."""

    n = 40
    r = np.random.default_rng(123)
    types = r.choice(["A", "B", "CX", "H1", "H2"], n)
    masses = r.choice([1.0, 12.0, 16.0], n)
    charges = r.choice([-1.0, 0.0, 1.0], n)
    resindices = np.sort(r.integers(0, 8, n))
    u = Universe.from_arrays(
        r.random((1, n, 3)) * 10.0,
        np.array([10.0, 10.0, 10.0]),
        types=np.asarray(types, dtype=object),
        masses=masses,
        charges=charges,
        resindices=resindices,
    )
    resids = resindices + 1

    leaves = [
        ("type A", np.isin(types, ["A"])),
        ("type A CX", np.isin(types, ["A", "CX"])),
        ("type H*", np.isin(types, ["H1", "H2"])),
        ("name ZZZ", np.zeros(n, dtype=bool)),
        ("charged", charges != 0),
        ("mass > 10", masses > 10),
        ("charge <= 0", charges <= 0),
        ("resid 2:4", (resids >= 2) & (resids <= 4)),
        ("index 0 5 7", np.isin(np.arange(n), [0, 5, 7])),
        ("all", np.ones(n, dtype=bool)),
        ("none", np.zeros(n, dtype=bool)),
    ]

    def build(depth):
        if depth == 0 or r.random() < 0.3:
            return leaves[r.integers(len(leaves))]
        kind = r.integers(3)
        if kind == 0:
            expr, mask = build(depth - 1)
            return f"not ({expr})", ~mask
        a_expr, a_mask = build(depth - 1)
        b_expr, b_mask = build(depth - 1)
        if kind == 1:
            return f"({a_expr}) and ({b_expr})", a_mask & b_mask
        return f"({a_expr}) or ({b_expr})", a_mask | b_mask

    for _ in range(200):
        expr, mask = build(3)
        got = u.select_atoms(expr).ix
        np.testing.assert_array_equal(
            got, np.flatnonzero(mask), err_msg=expr
        )


def test_checkpoint_resume_parallel(tmp_path):
    """checkpoint= composes with parallel=True (sharded stream):
    carry and store analyses both resume bit-exactly."""

    from mdhelper_tpu.analysis.cluster import ClusterSizeDistribution
    from mdhelper_tpu.analysis.structure import (
        RadialDistributionFunction,
    )

    u = make_universe(n_frames=16, n_atoms=12)

    def rdf():
        a = RadialDistributionFunction(
            u.atoms, n_bins=10, range=(0.0, 4.0), exclusion=(1, 1),
            parallel=True, verbose=False,
        )
        a._chunk_bytes = 8 * 12 * 3 * 8  # one shard-multiple chunk
        return a

    ckpt = str(tmp_path / "rdf_par.npz")
    full = rdf().run()
    rdf().run(stop=8, checkpoint=ckpt)
    resumed = rdf().run(checkpoint=ckpt)
    np.testing.assert_array_equal(
        resumed.results.counts, full.results.counts
    )

    def cl():
        a = ClusterSizeDistribution(
            u.atoms, 2.0, parallel=True, verbose=False
        )
        a._chunk_bytes = 8 * 12 * 3 * 8
        return a

    ckpt = str(tmp_path / "cl_par.npz")
    full = cl().run()
    cl().run(stop=8, checkpoint=ckpt)
    resumed = cl().run(checkpoint=ckpt)
    np.testing.assert_array_equal(
        resumed.results.size_counts, full.results.size_counts
    )
    np.testing.assert_array_equal(
        resumed.results.n_clusters, full.results.n_clusters
    )


def test_atomgroup_reductions():
    u = make_universe(n_frames=2, n_atoms=8)
    ag = u.atoms
    np.testing.assert_allclose(
        ag.center_of_geometry(), ag.positions.mean(axis=0)
    )
    m = ag.masses
    com = ag.center_of_mass()
    rg = np.sqrt(
        (m * ((ag.positions - com) ** 2).sum(axis=1)).sum() / m.sum()
    )
    np.testing.assert_allclose(ag.radius_of_gyration(), rg)
    # consistency with the algorithm-layer function
    from mdhelper_tpu.algorithm.molecule import radius_of_gyration

    np.testing.assert_allclose(
        ag.radius_of_gyration(),
        float(np.asarray(radius_of_gyration(ag))),
        rtol=1e-10,
    )
