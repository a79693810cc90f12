"""Tests for mdhelper_tpu.analysis.structure (parity:
/root/reference/tests/test_analysis_structure.py).

The reference validates the RDF against MDAnalysis InterRDF; here the
oracle is `oracle_rdf`, an independent brute-force NumPy implementation
of the same definition (min-image distances + np.histogram + shell
normalization).
"""

import numpy as np
import pytest

from mdhelper_tpu.analysis import structure
from mdhelper_tpu.core import Universe

rng = np.random.default_rng(13)

BOX = 10.0
N_FRAMES = 6
N1, N2 = 40, 60


def oracle_histogram(p1, p2, n_bins, r_range, box, exclusion=None):
    """Brute-force min-image histogram (independent of the library)."""

    delta = p1[:, None, :] - p2[None, :, :]
    delta -= box * np.round(delta / box)
    dist = np.sqrt((delta**2).sum(-1))
    if exclusion is not None:
        i = np.arange(len(p1))[:, None] // exclusion[0]
        j = np.arange(len(p2))[None, :] // exclusion[1]
        dist = dist[i != j]
    return np.histogram(dist.ravel(), bins=n_bins, range=r_range)[0]


def oracle_rdf(traj1, traj2, n_bins, r_range, box, exclusion=None):
    counts = np.zeros(n_bins)
    for p1, p2 in zip(traj1, traj2):
        counts += oracle_histogram(p1, p2, n_bins, r_range, box, exclusion)
    edges = np.linspace(*r_range, n_bins + 1)
    shell = 4 * np.pi * np.diff(edges**3) / 3
    volume = box**3
    n2 = traj2.shape[1] - (exclusion[1] if exclusion else 0)
    return counts / (
        len(traj1) * shell * traj1.shape[1] * n2 / volume
    )


@pytest.fixture(scope="module")
def universe():
    positions = rng.random((N_FRAMES, N1 + N2, 3)) * BOX
    return Universe.from_arrays(
        positions,
        np.array([BOX, BOX, BOX]),
        types=np.array(["A"] * N1 + ["B"] * N2, dtype=object),
        resindices=np.concatenate(
            (np.repeat(np.arange(N1 // 2), 2), N1 + np.arange(N2))
        ),
        masses=np.concatenate((np.full(N1, 2.0), np.full(N2, 3.0))),
    )


def test_radial_histogram_function(universe):
    ag1 = universe.select_atoms("type A")
    ag2 = universe.select_atoms("type B")
    universe.trajectory[0]
    counts = structure.radial_histogram(
        ag1.positions, ag2.positions, 75, (0.0, 5.0),
        np.array([BOX, BOX, BOX, 90, 90, 90]),
    )
    ref = oracle_histogram(
        ag1.positions, ag2.positions, 75, (0.0, 5.0), BOX
    )
    np.testing.assert_array_equal(counts, ref)


def test_radial_histogram_exclusion(universe):
    ag1 = universe.select_atoms("type A")
    universe.trajectory[0]
    counts = structure.radial_histogram(
        ag1.positions, ag1.positions, 50, (0.0, 5.0),
        np.array([BOX, BOX, BOX]), exclusion=(1, 1),
    )
    ref = oracle_histogram(
        ag1.positions, ag1.positions, 50, (0.0, 5.0), BOX, (1, 1)
    )
    np.testing.assert_array_equal(counts, ref)


def test_radial_fourier_transform_analytic():
    # FT of exp(-a r)/r is 4 pi / (a^2 + q^2).
    r = np.linspace(1e-6, 60, 20_000)
    a = 1.5
    f = np.exp(-a * r) / r
    q = np.linspace(0.5, 4, 8)
    rft = structure.radial_fourier_transform(r, f, q)
    assert np.allclose(rft, 4 * np.pi / (a**2 + q**2), rtol=1e-4)


def test_hankel_transform_analytic():
    # Hankel transform of exp(-a r): 2 pi a / (a^2 + q^2)^(3/2).
    r = np.linspace(1e-6, 80, 40_000)
    a = 1.2
    q = np.linspace(0.5, 3, 6)
    ht = structure.zeroth_order_hankel_transform(r, np.exp(-a * r), q)
    assert np.allclose(ht, 2 * np.pi * a / (a**2 + q**2) ** 1.5,
                       rtol=1e-4)


def test_rdf_cross_group(universe):
    ag1 = universe.select_atoms("type A")
    ag2 = universe.select_atoms("type B")
    rdf = structure.RadialDistributionFunction(
        ag1, ag2, n_bins=60, range=(0.0, 4.5), verbose=False
    ).run()
    traj = universe.trajectory._positions
    ref = oracle_rdf(
        traj[:, :N1], traj[:, N1:], 60, (0.0, 4.5), BOX
    )
    assert np.allclose(rdf.results.rdf, ref)
    # An ideal-gas (uniform random) RDF should hover around 1.
    assert abs(np.nanmean(rdf.results.rdf[10:]) - 1) < 0.2


def test_rdf_self_with_exclusion(universe):
    ag1 = universe.select_atoms("type A")
    rdf = structure.RadialDistributionFunction(
        ag1, n_bins=40, range=(0.0, 4.0), exclusion=(1, 1), verbose=False
    ).run()
    traj = universe.trajectory._positions
    ref = oracle_rdf(
        traj[:, :N1], traj[:, :N1], 40, (0.0, 4.0), BOX, (1, 1)
    )
    assert np.allclose(rdf.results.rdf, ref)


def test_rdf_serial_parallel_equal(universe):
    ag1 = universe.select_atoms("type A")
    ag2 = universe.select_atoms("type B")
    serial = structure.RadialDistributionFunction(
        ag1, ag2, n_bins=50, range=(0.0, 4.0), verbose=False,
        parallel=False,
    ).run()
    parallel = structure.RadialDistributionFunction(
        ag1, ag2, n_bins=50, range=(0.0, 4.0), verbose=False,
        parallel=True,
    ).run()
    np.testing.assert_array_equal(
        serial.results.counts, parallel.results.counts
    )
    assert np.allclose(serial.results.rdf, parallel.results.rdf)


def test_rdf_norms(universe):
    ag1 = universe.select_atoms("type A")
    ag2 = universe.select_atoms("type B")
    kwargs = dict(n_bins=30, range=(0.5, 4.0), verbose=False)
    counts = structure.RadialDistributionFunction(
        ag1, ag2, norm=None, **kwargs
    ).run()
    density = structure.RadialDistributionFunction(
        ag1, ag2, norm="density", **kwargs
    ).run()
    edges = counts.results.edges
    shell = 4 * np.pi * np.diff(edges**3) / 3
    # norm=None divides by n_frames only (reference structure.py:847);
    # norm="density" additionally divides by the shell volumes.
    assert np.allclose(density.results.rdf, counts.results.rdf / shell)
    # _get_rdf reconstructs the proper RDF from raw counts.
    rdf = structure.RadialDistributionFunction(
        ag1, ag2, **kwargs
    ).run()
    assert np.allclose(counts._get_rdf(), rdf.results.rdf)


def test_rdf_drop_axis(universe):
    """2-D RDF: distances computed without the dropped axis."""

    ag1 = universe.select_atoms("type A")
    rdf = structure.RadialDistributionFunction(
        ag1, n_bins=30, range=(0.0, 4.0), drop_axis="z",
        exclusion=(1, 1), verbose=False,
    ).run()
    traj = universe.trajectory._positions[:, :N1].copy()
    traj[:, :, 2] = 0.0
    counts = np.zeros(30)
    for p in traj:
        counts += oracle_histogram(p, p, 30, (0.0, 4.0),
                                   np.array([BOX, BOX, BOX]), (1, 1))
    edges = np.linspace(0, 4, 31)
    shell = np.pi * np.diff(edges**2)
    area = BOX * BOX
    ref = counts / (
        N_FRAMES * shell * N1 * (N1 - 1) / area
    )
    assert np.allclose(rdf.results.rdf, ref)


def test_rdf_com_grouping(universe):
    """residues grouping uses centers of mass."""

    ag1 = universe.select_atoms("type A")  # residues of 2 atoms each
    rdf = structure.RadialDistributionFunction(
        ag1, groupings="residues", n_bins=25, range=(0.0, 4.0),
        exclusion=(1, 1), verbose=False,
    ).run()
    traj = universe.trajectory._positions[:, :N1]
    masses = universe.atoms.masses[:N1]
    pair_masses = masses[:2]
    coms = (
        traj.reshape(N_FRAMES, N1 // 2, 2, 3)
        * pair_masses[None, None, :, None]
    ).sum(axis=2) / pair_masses.sum()
    counts = np.zeros(25)
    for p in coms:
        counts += oracle_histogram(
            p, p, 25, (0.0, 4.0), BOX, (1, 1)
        )
    edges = np.linspace(0, 4, 26)
    shell = 4 * np.pi * np.diff(edges**3) / 3
    n_g = N1 // 2
    ref = counts / (N_FRAMES * shell * n_g * (n_g - 1) / BOX**3)
    assert np.allclose(rdf.results.rdf, ref)


def test_rdf_postprocessing(universe):
    ag1 = universe.select_atoms("type A")
    ag2 = universe.select_atoms("type B")
    rdf = structure.RadialDistributionFunction(
        ag1, ag2, n_bins=50, range=(0.05, 4.0), verbose=False
    ).run()
    rho = N2 / BOX**3
    rdf.calculate_structure_factor(rho)
    assert rdf.results.ssf.shape == rdf.results.wavenumbers.shape
    rdf.calculate_pmf(300.0)
    kbt = 8.31446261815324e-3 * 300
    expected = -kbt * np.log(rdf.results.rdf)
    mask = np.isfinite(expected)
    assert np.allclose(rdf.results.pmf[mask], expected[mask])

    # reduced mode: plain-float kT is the documented usage (the
    # reference's inverted unit check rejects it; not replicated)
    red = structure.RadialDistributionFunction(
        ag1, ag2, n_bins=50, range=(0.05, 4.0), reduced=True,
        verbose=False,
    ).run()
    red.calculate_pmf(1.5)
    expected_red = -1.5 * np.log(red.results.rdf)
    mask = np.isfinite(expected_red)
    assert np.allclose(red.results.pmf[mask], expected_red[mask])
    import pytest as _pytest

    from mdhelper_tpu import Q_ as _Q
    with _pytest.raises(ValueError, match="units"):
        red.calculate_pmf(_Q(300.0, "kelvin"))


def test_coordination_numbers_synthetic():
    bins = np.linspace(0.05, 10, 400)
    # g(r) with a clear first peak at 2 and minimum at 3.
    rdf = 1 + 2 * np.exp(-((bins - 2) ** 2)) - np.exp(
        -((bins - 3) ** 2) / 0.1
    )
    coord = structure.calculate_coordination_numbers(
        bins, rdf, rho=0.5, n_coord_nums=2
    )
    assert np.isfinite(coord[0]) and coord[0] > 0


def test_structure_factor_formalisms():
    r = np.linspace(0.05, 8, 500)
    g = 1 + np.exp(-((r - 1.5) ** 2) * 4)
    q, s_fz = structure.calculate_structure_factor(r, g, False, 0.4,
                                                   0.5, 0.5)
    _, s_al = structure.calculate_structure_factor(
        r, g, False, 0.4, 0.5, 0.5, formalism="AL"
    )
    _, s_gen = structure.calculate_structure_factor(
        r, g, False, 0.4, 0.5, 0.5, formalism="general"
    )
    # Relationships between the formalisms.
    base = s_fz - 1
    assert np.allclose(s_al - 1, np.sqrt(0.25) * base)
    assert np.allclose(s_gen - 1, 0.25 * base)
    with pytest.raises(ValueError):
        structure.calculate_structure_factor(
            r, g, False, 0.4, 0.5, 0.5, formalism="XX"
        )


def test_rdf_tiled_kernel_matches_direct():
    """Force the tiled (scan) code path with a small tile size."""

    import jax.numpy as jnp

    from mdhelper_tpu.ops.histogram import radial_histogram_frame

    p1 = rng.random((37, 3)) * BOX
    p2 = rng.random((53, 3)) * BOX
    edges = jnp.linspace(0.0, 4.0, 41)
    box = jnp.array([BOX, BOX, BOX])
    direct = radial_histogram_frame(
        jnp.asarray(p1), jnp.asarray(p2), box, edges
    )
    tiled = radial_histogram_frame(
        jnp.asarray(p1), jnp.asarray(p2), box, edges, tile=16
    )
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(tiled))
    ref = oracle_histogram(p1, p2, 40, (0.0, 4.0), BOX)
    np.testing.assert_array_equal(np.asarray(direct).astype(int), ref)


def test_unique_wavenumber_grouping_scales():
    """Concluding a 64^3-grid run must be a segment reduction, not an
    O(n_unique * n_q) isclose sweep (<1 s at 262k wavevectors)."""

    import time

    from mdhelper_tpu.analysis.structure import (
        group_mean_last_axis,
        unique_wavenumber_groups,
    )

    local_rng = np.random.default_rng(3)
    n = np.stack(
        np.meshgrid(*[np.arange(64)] * 3), axis=-1
    ).reshape(-1, 3)
    wavenumbers = np.linalg.norm(2 * np.pi * n / 20.0, axis=1)
    values = local_rng.random((3, len(wavenumbers)))

    t0 = time.perf_counter()
    unique, group = unique_wavenumber_groups(wavenumbers)
    out = group_mean_last_axis(values, group, len(unique))
    elapsed = time.perf_counter() - t0
    assert elapsed < 1.0

    for qi in local_rng.choice(len(unique), 10, replace=False):
        ref = values[:, np.isclose(unique[qi], wavenumbers)].mean(axis=1)
        np.testing.assert_allclose(out[:, qi], ref, rtol=1e-12)


# -- triclinic boxes ---------------------------------------------------------

TRICLINIC_DIMS = np.array([11.0, 12.0, 13.0, 75.0, 85.0, 100.0])


def _oracle_box_matrix(dims):
    """Independent lower-triangular box-matrix construction."""

    a, b, c = dims[:3]
    al, be, ga = np.deg2rad(dims[3:6])
    bx, by = b * np.cos(ga), b * np.sin(ga)
    cx = c * np.cos(be)
    cy = c * (np.cos(al) - np.cos(be) * np.cos(ga)) / np.sin(ga)
    cz = np.sqrt(c**2 - cx**2 - cy**2)
    return np.array([[a, 0, 0], [bx, by, 0], [cx, cy, cz]])


def oracle_triclinic_histogram(p1, p2, n_bins, r_range, dims,
                               exclusion=None):
    """Brute-force min-image over all 27 images of the reduced vector."""

    h = _oracle_box_matrix(dims)
    delta = p1[:, None, :] - p2[None, :, :]
    frac = delta @ np.linalg.inv(h)
    frac -= np.round(frac)
    base = frac @ h
    d2 = np.full(base.shape[:2], np.inf)
    for sx in (-1, 0, 1):
        for sy in (-1, 0, 1):
            for sz in (-1, 0, 1):
                cand = base + np.array([sx, sy, sz]) @ h
                d2 = np.minimum(d2, (cand**2).sum(-1))
    dist = np.sqrt(d2)
    if exclusion is not None:
        i = np.arange(len(p1))[:, None] // exclusion[0]
        j = np.arange(len(p2))[None, :] // exclusion[1]
        dist = dist[i != j]
    return np.histogram(dist.ravel(), bins=n_bins, range=r_range)[0]


def test_radial_histogram_triclinic():
    local_rng = np.random.default_rng(5)
    h = _oracle_box_matrix(TRICLINIC_DIMS)
    p1 = local_rng.random((50, 3)) @ h
    p2 = local_rng.random((70, 3)) @ h
    counts = structure.radial_histogram(
        p1, p2, 40, (0.0, 4.5), TRICLINIC_DIMS
    )
    ref = oracle_triclinic_histogram(p1, p2, 40, (0.0, 4.5),
                                     TRICLINIC_DIMS)
    np.testing.assert_array_equal(counts, ref)


def test_rdf_class_triclinic():
    local_rng = np.random.default_rng(6)
    h = _oracle_box_matrix(TRICLINIC_DIMS)
    n_frames, n = 4, 60
    positions = local_rng.random((n_frames, n, 3)) @ h
    u = Universe.from_arrays(
        positions, TRICLINIC_DIMS,
        types=np.array(["A"] * n, dtype=object),
        masses=np.ones(n),
    )
    ag = u.select_atoms("type A")
    rdf = structure.RadialDistributionFunction(
        ag, n_bins=40, range=(0.0, 4.5), exclusion=(1, 1),
        verbose=False,
    ).run()
    ref = np.zeros(40)
    for f in range(n_frames):
        ref += oracle_triclinic_histogram(
            positions[f], positions[f], 40, (0.0, 4.5),
            TRICLINIC_DIMS, exclusion=(1, 1),
        )
    np.testing.assert_array_equal(rdf.results.counts, ref)
    # Normalization uses the true triclinic cell volume det(H).
    vol = np.linalg.det(_oracle_box_matrix(TRICLINIC_DIMS))
    edges = np.linspace(0.0, 4.5, 41)
    shell = 4 * np.pi * np.diff(edges**3) / 3
    expected = ref / (n_frames * shell * n * (n - 1) / vol)
    np.testing.assert_allclose(rdf.results.rdf, expected, rtol=1e-10)


def test_rdf_triclinic_rejects_drop_axis():
    u = Universe.from_arrays(
        np.zeros((1, 4, 3)), TRICLINIC_DIMS,
        types=np.array(["A"] * 4, dtype=object), masses=np.ones(4),
    )
    with pytest.raises(ValueError, match="orthorhombic"):
        structure.RadialDistributionFunction(
            u.select_atoms("type A"), drop_axis="z"
        )


def test_xla_exact_binning_on_f32_streams(universe):
    """The XLA fallback sweep with float32 streams (the TPU
    configuration) must produce the same integer counts as float64
    binning — double-float exact bin assignment
    (`ops/histogram._exact_bin_indices`), including a range starting
    above zero and a molecule exclusion with e0 != e1 (the cases that
    cannot ride the Pallas cell kernel)."""

    import jax.numpy as jnp

    from mdhelper_tpu.ops.histogram import radial_histogram_frame

    rng2 = np.random.default_rng(77)
    n, n_bins = 700, 48
    pos = (rng2.random((n, 3)) * BOX).astype(np.float32)
    edges = np.linspace(0.7, 4.1, n_bins + 1)
    for exclusion in (None, (3, 5)):
        counts = np.asarray(
            radial_histogram_frame(
                jnp.asarray(pos),
                jnp.asarray(pos),
                jnp.asarray(np.full(3, BOX, np.float32)),
                jnp.asarray(edges),
                exclusion=exclusion,
                precision="exact",
            )
        ).astype(int)
        p64 = pos.astype(np.float64)
        d = p64[:, None] - p64[None]
        d -= BOX * np.round(d / BOX)
        dist = np.sqrt((d**2).sum(-1))
        if exclusion is not None:
            e0, e1 = exclusion
            i = np.arange(n)
            dist[(i[:, None] // e0) == (i[None, :] // e1)] = np.inf
        oracle = np.histogram(dist, bins=edges)[0]
        np.testing.assert_array_equal(counts, oracle)


def test_xla_exact_binning_triclinic_f32_streams():
    """Triclinic exact binning: float32 streams through the
    27-candidate double-float image search
    (`ops/histogram._exact_d2_triclinic`) must reproduce a float64
    oracle (evaluated over the same float32 box matrix) bit-exactly,
    including pairs engineered to straddle bin edges within one
    float32 ulp."""

    import jax.numpy as jnp

    from mdhelper_tpu.ops.histogram import radial_histogram_frame

    h_mat = _oracle_box_matrix(TRICLINIC_DIMS).astype(np.float32)
    rng2 = np.random.default_rng(99)
    n_bins = 16
    edges = np.linspace(0.0, 4.0, n_bins + 1)  # h = 0.25, f32-exact

    pos1 = (rng2.random((300, 3)) @ h_mat).astype(np.float32)
    # Edge-straddling partners: displace along the first box vector
    # (x-axis) by exactly a bin boundary (1.25), one f32 ulp below it,
    # and one above — the fast f32 path can misbin these; the exact
    # path may not.
    seps = np.float32(
        [1.25, np.nextafter(1.25, 0, dtype=np.float32),
         np.nextafter(1.25, 2, dtype=np.float32)]
    )
    anchors = pos1[:90]
    partners = np.concatenate(
        [anchors[30 * i:30 * (i + 1)] + np.array([s, 0, 0], np.float32)
         for i, s in enumerate(seps)]
    ).astype(np.float32)
    pos2 = np.concatenate(
        ((rng2.random((210, 3)) @ h_mat).astype(np.float32), partners)
    )

    counts = np.asarray(
        radial_histogram_frame(
            jnp.asarray(pos1),
            jnp.asarray(pos2),
            jnp.asarray(h_mat),
            jnp.asarray(edges),
            precision="exact",
        )
    ).astype(int)

    # f64 oracle over the same f32 box matrix / f32 positions.
    h64 = h_mat.astype(np.float64)
    delta = pos1.astype(np.float64)[:, None] - pos2.astype(np.float64)
    frac = delta @ np.linalg.inv(h64)
    frac -= np.round(frac)
    base = frac @ h64
    d2 = np.full(base.shape[:2], np.inf)
    for sx in (-1, 0, 1):
        for sy in (-1, 0, 1):
            for sz in (-1, 0, 1):
                cand = base + np.array([sx, sy, sz], float) @ h64
                d2 = np.minimum(d2, (cand**2).sum(-1))
    oracle = np.histogram(np.sqrt(d2), bins=edges)[0]
    np.testing.assert_array_equal(counts, oracle)


def test_rdf_class_triclinic_exact_f32():
    """RadialDistributionFunction with float32 streams (the TPU
    configuration forced via `_coord_dtype`) on a triclinic box:
    integer counts must match the float64 oracle bit-exactly — the
    `precision` resolution no longer special-cases triclinic cells."""

    local_rng = np.random.default_rng(11)
    h_mat = _oracle_box_matrix(TRICLINIC_DIMS)
    n_frames, n = 3, 80
    positions = (local_rng.random((n_frames, n, 3)) @ h_mat).astype(
        np.float32
    )
    u = Universe.from_arrays(
        positions, TRICLINIC_DIMS,
        types=np.array(["A"] * n, dtype=object),
        masses=np.ones(n),
    )
    rdf = structure.RadialDistributionFunction(
        u.select_atoms("type A"), n_bins=40, range=(0.0, 4.5),
        exclusion=(1, 1),
    )
    rdf._coord_dtype = np.float32
    rdf.run()

    # Oracle: f64 min-image over the f32 box matrix the kernel binds
    # (the streamed f64 box parameters -> f64 matrix -> f32 cast).
    import jax.numpy as jnp

    from mdhelper_tpu.algorithm.topology import triclinic_matrices

    h64 = np.asarray(
        triclinic_matrices(TRICLINIC_DIMS.astype(np.float64))
    ).astype(np.float32).astype(np.float64)
    ref = np.zeros(40)
    for f in range(n_frames):
        p = positions[f].astype(np.float64)
        delta = p[:, None] - p[None]
        frac = delta @ np.linalg.inv(h64)
        frac -= np.round(frac)
        base = frac @ h64
        d2 = np.full(base.shape[:2], np.inf)
        for sx in (-1, 0, 1):
            for sy in (-1, 0, 1):
                for sz in (-1, 0, 1):
                    cand = base + np.array([sx, sy, sz], float) @ h64
                    d2 = np.minimum(d2, (cand**2).sum(-1))
        dist = np.sqrt(d2)
        np.fill_diagonal(dist, np.inf)
        ref += np.histogram(
            dist, bins=np.linspace(0.0, 4.5, 41)
        )[0]
    np.testing.assert_array_equal(rdf.results.counts, ref)


def test_boxless_universe_rejected_cleanly():
    """Box-requiring analyses raise a clear error for zero-dimension
    universes instead of silently returning NaNs (regression: zero
    boxes were classified triclinic and inverted singular
    matrices)."""

    local_rng = np.random.default_rng(59)
    pos = local_rng.random((2, 8, 3)) * 10
    u = Universe.from_arrays(
        pos, None, types=np.array(["A"] * 8, dtype=object)
    )
    with pytest.raises(ValueError, match="periodic box"):
        structure.RadialDistributionFunction(
            u.atoms, n_bins=8, range=(0.0, 3.0), verbose=False
        )
    with pytest.raises(ValueError, match="box"):
        structure.StructureFactor(u.atoms, n_points=2, verbose=False)
    with pytest.raises(ValueError, match="periodic box"):
        structure.VanHoveFunction(
            u.atoms, n_bins=8, range=(0.0, 3.0), verbose=False
        )
    # explicit wavevectors keep box-less S(q) possible
    sf = structure.StructureFactor(
        u.atoms, wavevectors=np.array([[0.5, 0.0, 0.0]]),
        sort=False, unique=False, verbose=False,
    )
    assert sf is not None
