"""Tests for mdhelper_tpu.analysis.profile (parity:
/root/reference/tests/test_analysis_profile.py, with NumPy histogram
oracles instead of MDAnalysis LinearDensity)."""

import numpy as np
import pytest

from mdhelper_tpu.analysis import profile
from mdhelper_tpu.core import Universe

rng = np.random.default_rng(41)

T, NA, NB = 8, 30, 20
N = NA + NB
DIMS = np.array([10.0, 12.0, 14.0])


@pytest.fixture(scope="module")
def universe():
    positions = rng.random((T, N, 3)) * DIMS
    return Universe.from_arrays(
        positions,
        DIMS,
        types=np.array(["A"] * NA + ["B"] * NB, dtype=object),
        charges=np.array([1.0] * NA + [-1.0] * NB),
        dt=1.0,
    )


def oracle_density(traj, axis, n_bins, length, volume, n_frames):
    counts = np.zeros(n_bins)
    for pos in traj:
        counts += np.histogram(pos[:, axis], n_bins, (0, length))[0]
    return counts * n_bins / (volume * n_frames)


def test_density_profile_all_axes(universe):
    ag_a = universe.select_atoms("type A")
    ag_b = universe.select_atoms("type B")
    dp = profile.DensityProfile(
        [ag_a, ag_b], axes="xyz", n_bins=20, verbose=False
    ).run()
    traj = universe.trajectory._positions
    volume = DIMS.prod()
    for a in range(3):
        ref_a = oracle_density(traj[:, :NA], a, 20, DIMS[a], volume, T)
        ref_b = oracle_density(traj[:, NA:], a, 20, DIMS[a], volume, T)
        assert np.allclose(dp.results.number_densities[a][0], ref_a)
        assert np.allclose(dp.results.number_densities[a][1], ref_b)
        # Charge density = sum_g q_g n_g.
        assert np.allclose(
            dp.results.charge_densities[a], ref_a - ref_b
        )
        # Bin centers.
        width = DIMS[a] / 20
        assert np.allclose(
            dp.results.bins[a],
            np.linspace(width / 2, DIMS[a] - width / 2, 20),
        )
    # Density integrates to N/V.
    total = dp.results.number_densities[0].sum(axis=0)
    assert np.isclose(total.mean(), N / volume, rtol=1e-6)


def test_density_profile_serial_parallel_equal(universe):
    ag = universe.atoms
    serial = profile.DensityProfile(
        ag, axes="z", n_bins=25, verbose=False, parallel=False
    ).run()
    parallel = profile.DensityProfile(
        ag, axes="z", n_bins=25, verbose=False, parallel=True
    ).run()
    assert np.allclose(
        serial.results.number_densities[0],
        parallel.results.number_densities[0],
    )


def test_density_profile_time_resolved(universe):
    ag = universe.select_atoms("type A")
    dp = profile.DensityProfile(
        ag, axes="x", n_bins=10, average=False, verbose=False
    ).run()
    assert dp.results.number_densities[0].shape == (1, T, 10)
    traj = universe.trajectory._positions[:, :NA]
    volume = DIMS.prod()
    frame3 = (
        np.histogram(traj[3][:, 0], 10, (0, DIMS[0]))[0] * 10 / volume
    )
    assert np.allclose(dp.results.number_densities[0][0, 3], frame3)
    assert np.allclose(dp.results.times, np.arange(T))


def test_density_profile_recenter():
    """Recentring shifts the group COM to the box center each frame."""

    # A block of atoms drifting along z; recentering pins it.
    base = rng.random((1, 20, 3)) * 4 + 1
    drift = np.linspace(0, 5, T)[:, None, None] * np.array([0, 0, 1.0])
    traj = base + drift
    u = Universe.from_arrays(traj, DIMS, dt=1.0)
    dp = profile.DensityProfile(
        u.atoms, axes="z", n_bins=28, recenter=0, verbose=False
    ).run()
    # Equivalent manual pipeline.
    counts = np.zeros(28)
    for pos in traj:
        com = pos.mean(axis=0)
        shifted = pos - (com - DIMS / 2)
        shifted -= np.floor(shifted / DIMS) * DIMS
        counts += np.histogram(shifted[:, 2], 28, (0, DIMS[2]))[0]
    ref = counts * 28 / (DIMS.prod() * T)
    assert np.allclose(dp.results.number_densities[0][0], ref)


def test_density_profile_recenter_serial_parallel_equal():
    """parallel=True + recenter: the host pre-pass precomputes the
    per-frame COM shifts (reference ``profile.py:703-739``), so the
    frame-sharded run matches the serial unwrap scan — including
    boundary crossings of the recenter group."""

    n = 24
    base = rng.random((1, n, 3)) * 4 + 1
    # Drift far enough along z to wrap several times.
    drift = (
        np.linspace(0, 3.5 * DIMS[2], T)[:, None, None]
        * np.array([0, 0, 1.0])
    )
    traj = (base + drift) % DIMS
    u = Universe.from_arrays(traj, DIMS, dt=1.0)
    serial = profile.DensityProfile(
        u.atoms, axes="z", n_bins=23, recenter=0, verbose=False,
        parallel=False,
    ).run()
    u2 = Universe.from_arrays(traj, DIMS, dt=1.0)
    par = profile.DensityProfile(
        u2.atoms, axes="z", n_bins=23, recenter=0, verbose=False,
        parallel=True,
    ).run()
    assert np.allclose(
        serial.results.number_densities[0],
        par.results.number_densities[0],
    )
    # And both match the manual unwrap/shift/wrap pipeline.
    counts = np.zeros(23)
    prev = traj[0].copy()
    images = np.zeros_like(prev)
    for pos in traj:
        delta = pos - prev
        images -= np.where(
            np.abs(delta) >= DIMS / 2, np.sign(delta), 0.0
        )
        prev = pos.copy()
        unwrapped = pos + images * DIMS
        com = unwrapped.mean(axis=0)
        shifted = unwrapped - (com - DIMS / 2)
        shifted -= np.floor(shifted / DIMS) * DIMS
        counts += np.histogram(shifted[:, 2], 23, (0, DIMS[2]))[0]
    ref = counts * 23 / (DIMS.prod() * T)
    assert np.allclose(serial.results.number_densities[0][0], ref)
    assert np.allclose(par.results.number_densities[0][0], ref)


def test_potential_profile_integral_analytic():
    """Sinusoidal charge density has an analytic potential."""

    n_bins = 4000
    L = 20.0
    z = np.linspace(L / (2 * n_bins), L - L / (2 * n_bins), n_bins)
    k = 2 * np.pi / L
    rho = np.cos(k * z)
    # sigma_q completes the first integral to sin(kz)/k exactly.
    phi = profile.calculate_potential_profile(
        z, rho, L, sigma_q=np.sin(k * z[0]) / k, method="integral",
        reduced=True,
    )
    # Poisson (reduced): phi'' = -4 pi rho -> phi = 4 pi cos(kz)/k^2 + c.
    ref = 4 * np.pi * np.cos(k * z) / k**2
    assert np.allclose(phi - phi[0], ref - ref[0], atol=1e-3)


def test_potential_profile_matrix_matches_integral():
    n_bins = 800
    L = 10.0
    z = np.linspace(L / (2 * n_bins), L - L / (2 * n_bins), n_bins)
    rho = np.exp(-((z - 3) ** 2)) - np.exp(-((z - 7) ** 2))
    integral = profile.calculate_potential_profile(
        z, rho, L, sigma_q=0.0, method="integral", reduced=True
    )
    matrix = profile.calculate_potential_profile(
        z, rho, L, sigma_q=0.0, method="matrix", reduced=True
    )
    assert np.allclose(integral, matrix, atol=5e-2 * np.abs(
        integral
    ).max())


def test_potential_profile_validation():
    z = np.linspace(0, 10, 50)
    with pytest.raises(ValueError):
        profile.calculate_potential_profile(z, z[:10], 10.0)
    with pytest.raises(ValueError):
        profile.calculate_potential_profile(
            z, np.zeros(50), 10.0, method="matrix"
        )


def test_density_profile_potential_pipeline(universe):
    dp = profile.DensityProfile(
        [universe.select_atoms("type A"),
         universe.select_atoms("type B")],
        axes="z",
        n_bins=30,
        verbose=False,
    ).run()
    dp.calculate_potential_profile(
        dielectric=1.0, axis="z", sigma_q=0.0
    )
    assert dp.results.potentials[0].shape == (30,)


def test_density_profile_parallel_store_per_frame(universe):
    """Per-frame (average=False) profiles under frame sharding: the
    store absorbs sharded extras one chunk late (base async queue) and
    must still land frames in order, equal to the serial run."""

    ag = universe.atoms
    serial = profile.DensityProfile(
        ag, axes="y", n_bins=12, average=False, verbose=False
    ).run()
    parallel = profile.DensityProfile(
        ag, axes="y", n_bins=12, average=False, verbose=False,
        parallel=True,
    ).run()
    np.testing.assert_allclose(
        np.asarray(serial.results.number_densities[0]),
        np.asarray(parallel.results.number_densities[0]),
        rtol=1e-12,
    )


# -- host pipeline ---------------------------------------------------------
# On tunnel-attached TPUs DensityProfile runs host-side (per-frame
# numpy histograms, host unwrap for recentering); forced on via
# MDTPU_HOST_PIPELINE it must reproduce the device path across
# averaged/time-resolved modes, groupings, and the recenter carry.


def _host_device_pair(make, monkeypatch, n_atoms, chunk_frames=3):
    results = []
    for knob in ("0", "1"):
        monkeypatch.setenv("MDTPU_HOST_PIPELINE", knob)
        analysis = make()
        analysis._chunk_bytes = chunk_frames * n_atoms * 3 * 8
        analysis.run()
        results.append(analysis)
    monkeypatch.delenv("MDTPU_HOST_PIPELINE")
    device, host = results
    assert not device._host_pipeline
    assert host._host_pipeline
    return device, host


def test_density_profile_host_pipeline(universe, monkeypatch):
    device, host = _host_device_pair(
        lambda: profile.DensityProfile(
            [universe.select_atoms("type A"),
             universe.select_atoms("type B")],
            axes="xz",
            n_bins=16,
            verbose=False,
        ),
        monkeypatch,
        N,
    )
    for a in range(2):
        np.testing.assert_allclose(
            np.asarray(device.results.number_densities[a]),
            np.asarray(host.results.number_densities[a]),
            rtol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(device.results.charge_densities[a]),
            np.asarray(host.results.charge_densities[a]),
            rtol=1e-10,
        )


def test_density_profile_host_pipeline_time_resolved(
    universe, monkeypatch
):
    device, host = _host_device_pair(
        lambda: profile.DensityProfile(
            universe.select_atoms("type A"),
            axes="y",
            n_bins=10,
            average=False,
            verbose=False,
        ),
        monkeypatch,
        N,
    )
    np.testing.assert_allclose(
        np.asarray(device.results.number_densities[0]),
        np.asarray(host.results.number_densities[0]),
        rtol=1e-10,
    )


def test_density_profile_host_pipeline_recenter(monkeypatch):
    base = rng.random((1, 20, 3)) * 4 + 1
    drift = (
        np.linspace(0, 5, T)[:, None, None] * np.array([0, 0, 1.0])
    )
    u = Universe.from_arrays(base + drift, DIMS, dt=1.0)
    device, host = _host_device_pair(
        lambda: profile.DensityProfile(
            u.atoms, axes="z", n_bins=28, recenter=0, verbose=False
        ),
        monkeypatch,
        20,
    )
    np.testing.assert_allclose(
        np.asarray(device.results.number_densities[0]),
        np.asarray(host.results.number_densities[0]),
        rtol=1e-8,
    )


def test_density_profile_host_pipeline_residue_coms(monkeypatch):
    n_res, per = 12, 3
    n = n_res * per
    traj = rng.random((T, n, 3)) * DIMS
    u = Universe.from_arrays(
        traj,
        DIMS,
        masses=np.tile(np.linspace(1.0, 2.0, per), n_res),
        resindices=np.repeat(np.arange(n_res), per),
        dt=1.0,
    )
    device, host = _host_device_pair(
        lambda: profile.DensityProfile(
            u.atoms,
            groupings="residues",
            axes="y",
            n_bins=14,
            verbose=False,
        ),
        monkeypatch,
        n,
    )
    np.testing.assert_allclose(
        np.asarray(device.results.number_densities[0]),
        np.asarray(host.results.number_densities[0]),
        rtol=1e-10,
    )


# -- RadialDensityProfile (beyond reference) ---------------------------------


def test_radial_density_profile_spherical_oracle():
    from mdhelper_tpu.analysis.profile import RadialDensityProfile
    from mdhelper_tpu.core.universe import Universe

    r = np.random.default_rng(11)
    n, F, L = 60, 5, 12.0
    pos = r.random((F, n, 3)) * L
    box = np.array([L] * 3)
    u = Universe.from_arrays(
        pos, box,
        charges=np.ones(n),
        types=np.array(["A"] * n, dtype=object),
    )
    center = np.array([3.0, 4.0, 5.0])
    prof = RadialDensityProfile(
        u.atoms, center, n_bins=16, range=(0.0, 5.0), verbose=False
    ).run()

    # Oracle: minimum-image distances to the fixed point.
    counts = np.zeros(16)
    for f in range(F):
        d = pos[f] - center
        d -= box * np.round(d / box)
        counts += np.histogram(
            np.linalg.norm(d, axis=1),
            bins=prof.results.edges,
        )[0]
    np.testing.assert_array_equal(prof.results.counts[0], counts)
    shell = 4 * np.pi * np.diff(prof.results.edges**3) / 3
    np.testing.assert_allclose(
        prof.results.number_densities[0], counts / (F * shell),
        rtol=1e-12,
    )
    # uniform unit charges -> charge density equals number density
    np.testing.assert_allclose(
        prof.results.charge_densities,
        prof.results.number_densities[0],
        rtol=1e-12,
    )
    # The sphere bulk density approaches N/V for r in range.
    total = (counts / (F * shell))[4:].mean()
    assert abs(total - n / L**3) / (n / L**3) < 0.5


def test_radial_density_profile_cylindrical_and_com_center():
    from mdhelper_tpu.analysis.profile import RadialDensityProfile
    from mdhelper_tpu.core.universe import Universe

    r = np.random.default_rng(12)
    n, F, L = 40, 4, 10.0
    pos = r.random((F, n, 3)) * L
    # Compact center group near the middle (no PBC straddle).
    pos[:, :4] = L / 2 + r.random((F, 4, 3))
    box = np.array([L] * 3)
    u = Universe.from_arrays(
        pos, box,
        masses=np.ones(n),
        charges=np.zeros(n),
        types=np.array(["C"] * 4 + ["A"] * (n - 4), dtype=object),
    )
    center_group = u.select_atoms("type C")
    shell_group = u.select_atoms("type A")
    prof = RadialDensityProfile(
        shell_group, center_group, n_bins=10, range=(0.0, 4.0),
        geometry="cylindrical", axis="z", verbose=False,
    ).run()

    counts = np.zeros(10)
    for f in range(F):
        com = pos[f, :4].mean(axis=0)
        d = pos[f, 4:] - com
        d -= box * np.round(d / box)
        counts += np.histogram(
            np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2),
            bins=prof.results.edges,
        )[0]
    np.testing.assert_array_equal(prof.results.counts[0], counts)
    shell = np.pi * np.diff(prof.results.edges**2) * L
    np.testing.assert_allclose(
        prof.results.number_densities[0], counts / (F * shell),
        rtol=1e-12,
    )


def test_radial_density_profile_parallel_and_validation():
    import pytest as _pytest

    from mdhelper_tpu.analysis.profile import RadialDensityProfile
    from mdhelper_tpu.core.universe import Universe

    r = np.random.default_rng(13)
    n, F, L = 24, 8, 8.0
    pos = r.random((F, n, 3)) * L
    u = Universe.from_arrays(
        pos, np.array([L] * 3), charges=np.ones(n),
        types=np.array(["A"] * n, dtype=object),
    )
    serial = RadialDensityProfile(
        u.atoms, [4.0, 4.0, 4.0], n_bins=12, range=(0.0, 3.9),
        verbose=False,
    ).run()
    sharded = RadialDensityProfile(
        u.atoms, [4.0, 4.0, 4.0], n_bins=12, range=(0.0, 3.9),
        parallel=True, verbose=False,
    ).run()
    np.testing.assert_array_equal(
        serial.results.counts, sharded.results.counts
    )
    with _pytest.raises(ValueError):
        RadialDensityProfile(u.atoms, [1.0, 2.0], verbose=False)
    with _pytest.raises(ValueError):
        RadialDensityProfile(
            u.atoms, [1.0, 2.0, 3.0], geometry="torus",
            verbose=False,
        )


def test_density_map_2d_oracle():
    """DensityMap2D vs per-frame np.histogram2d; charge map; COM
    grouping; parallel bit-equality; validation."""

    from mdhelper_tpu.analysis.profile import DensityMap2D
    from mdhelper_tpu.core.universe import Universe

    local = np.random.default_rng(61)
    box = np.array([8.0, 10.0, 12.0])
    T, n = 6, 60
    pos = local.random((T, n, 3)) * box
    charges = np.tile([1.0, -1.0], n // 2)
    u = Universe.from_arrays(
        pos, box,
        types=np.array(["A", "B"] * (n // 2), dtype=object),
        charges=charges,
        masses=np.ones(n),
        resindices=np.repeat(np.arange(n // 2), 2),
    )
    cation = u.select_atoms("type A")
    anion = u.select_atoms("type B")
    dm = DensityMap2D(
        [cation, anion], axes="xz", n_bins=(16, 24), verbose=False
    ).run()

    for gi, ag in enumerate((cation, anion)):
        ref = np.zeros((16, 24))
        for f in range(T):
            p = pos[f, ag.ix][:, [0, 2]]
            ref += np.histogram2d(
                p[:, 0], p[:, 1], bins=(16, 24),
                range=((0, box[0]), (0, box[2])),
            )[0]
        np.testing.assert_array_equal(dm.results.counts[gi], ref)
        # density normalization: sum * bin volume = N_entities
        volume = (box[0] / 16) * (box[2] / 24) * box[1]
        np.testing.assert_allclose(
            dm.results.number_densities[gi].sum() * volume,
            ag.n_atoms,
            rtol=1e-12,
        )
    # auto-detected uniform group charges -> charge map
    np.testing.assert_allclose(
        dm.results.charge_densities,
        dm.results.number_densities[0]
        - dm.results.number_densities[1],
        rtol=1e-12,
    )

    # residues grouping: COMs of wrapped dimer pairs
    dr = DensityMap2D(
        u.atoms, "residues", axes="xy", n_bins=8, verbose=False
    ).run()
    ref = np.zeros((8, 8))
    for f in range(T):
        com = pos[f].reshape(-1, 2, 3).mean(axis=1) % box
        ref += np.histogram2d(
            com[:, 0], com[:, 1], bins=(8, 8),
            range=((0, box[0]), (0, box[1])),
        )[0]
    np.testing.assert_array_equal(dr.results.counts[0], ref)

    par = DensityMap2D(
        [cation, anion], axes="xz", n_bins=(16, 24),
        parallel=True, verbose=False,
    ).run()
    np.testing.assert_array_equal(
        par.results.counts, dm.results.counts
    )

    with pytest.raises(ValueError):
        DensityMap2D(u.atoms, axes="zz", verbose=False)
    with pytest.raises(ValueError):
        DensityMap2D(u.atoms, n_bins=0, verbose=False)
    tric = Universe.from_arrays(
        pos, np.array([8, 10, 12, 80, 85, 95.0]),
        types=np.array(["A"] * n, dtype=object),
    )
    with pytest.raises(ValueError, match="orthorhombic"):
        DensityMap2D(tric.atoms, verbose=False)


def test_density_profile_pmf(universe):
    from mdhelper_tpu import ureg
    from mdhelper_tpu.analysis.profile import DensityProfile

    ag_a = universe.select_atoms("type A")
    ag_b = universe.select_atoms("type B")
    prof = DensityProfile(
        [ag_a, ag_b], axes="z", n_bins=10, verbose=False
    ).run()
    prof.calculate_pmf(300.0)
    dens = np.asarray(prof.results.number_densities[0])
    kbt = (
        ureg.avogadro_constant * ureg.boltzmann_constant * 300.0
        * ureg.kelvin
    ).m_as(ureg.kilojoule / ureg.mole)
    with np.errstate(divide="ignore"):
        oracle = -kbt * np.log(
            dens / dens.mean(axis=-1, keepdims=True)
        )
    np.testing.assert_allclose(prof.results.pmf[0], oracle)
    assert prof.results.units["results.pmf"] == (
        ureg.kilojoule / ureg.mole
    )

    # explicit references + Boltzmann-inversion consistency: a bin
    # at exactly the reference density has zero PMF
    ref = dens[:, 3]
    prof.calculate_pmf(300.0, reference_densities=ref)
    np.testing.assert_allclose(
        np.stack([p[i] for p, i in zip(prof.results.pmf[0], [3, 3])]),
        0.0, atol=1e-12,
    )
    with pytest.raises(ValueError, match="one value per group"):
        prof.calculate_pmf(300.0, reference_densities=np.ones(5))

    # time-resolved densities average over frames first
    tr = DensityProfile(
        [ag_a, ag_b], axes="z", n_bins=10, average=False,
        verbose=False,
    ).run()
    tr.calculate_pmf(300.0)
    np.testing.assert_allclose(tr.results.pmf[0], oracle, atol=1e-9)

    # reduced: bare kT scale, no unit entry
    red = DensityProfile(
        [ag_a, ag_b], axes="z", n_bins=10, reduced=True,
        verbose=False,
    ).run()
    red.calculate_pmf(1.5)
    np.testing.assert_allclose(
        red.results.pmf[0], oracle * 1.5 / kbt, atol=1e-9
    )
    assert "results.pmf" not in red.results.units


def test_radial_density_profile_pmf():
    from mdhelper_tpu import ureg
    from mdhelper_tpu.analysis.profile import RadialDensityProfile
    from mdhelper_tpu.core.universe import Universe

    r = np.random.default_rng(12)
    n, F, L = 80, 4, 12.0
    pos = r.random((F, n, 3)) * L
    u = Universe.from_arrays(
        pos, np.array([L] * 3),
        types=np.array(["A"] * n, dtype=object),
    )
    prof = RadialDensityProfile(
        u.atoms, np.array([6.0, 6.0, 6.0]), n_bins=16,
        range=(0.0, 5.0), verbose=False,
    ).run()
    prof.calculate_pmf(300.0)
    dens = np.asarray(prof.results.number_densities)
    kbt = (
        ureg.avogadro_constant * ureg.boltzmann_constant * 300.0
        * ureg.kelvin
    ).m_as(ureg.kilojoule / ureg.mole)
    ref = dens[:, -4:].mean(axis=-1, keepdims=True)  # outer quarter
    with np.errstate(divide="ignore"):
        oracle = -kbt * np.log(dens / ref)
    np.testing.assert_allclose(prof.results.pmf, oracle)


def test_density_map_3d_oracle():
    """DensityMap3D vs per-frame np.histogramdd; charge field; COM
    grouping; point blocking; parallel bit-equality; validation."""

    from mdhelper_tpu.analysis.profile import DensityMap3D
    from mdhelper_tpu.core.universe import Universe

    local = np.random.default_rng(67)
    box = np.array([8.0, 10.0, 12.0])
    T, n = 5, 64
    pos = local.random((T, n, 3)) * box
    charges = np.tile([1.0, -1.0], n // 2)
    u = Universe.from_arrays(
        pos, box,
        types=np.array(["A", "B"] * (n // 2), dtype=object),
        charges=charges,
        masses=np.ones(n),
        resindices=np.repeat(np.arange(n // 2), 2),
    )
    cation = u.select_atoms("type A")
    anion = u.select_atoms("type B")
    dm = DensityMap3D(
        [cation, anion], n_bins=(6, 8, 10), verbose=False
    ).run()

    rng_edges = [(0, box[a]) for a in range(3)]
    for gi, ag in enumerate((cation, anion)):
        ref = np.zeros((6, 8, 10))
        for f in range(T):
            ref += np.histogramdd(
                pos[f, ag.ix], bins=(6, 8, 10), range=rng_edges
            )[0]
        np.testing.assert_array_equal(dm.results.counts[gi], ref)
        voxel = (box[0] / 6) * (box[1] / 8) * (box[2] / 10)
        np.testing.assert_allclose(
            dm.results.number_densities[gi].sum() * voxel,
            ag.n_atoms,
            rtol=1e-12,
        )
    np.testing.assert_allclose(
        dm.results.charge_densities,
        dm.results.number_densities[0]
        - dm.results.number_densities[1],
        rtol=1e-12,
    )

    # point blocking: a block smaller than N must bin identically
    from mdhelper_tpu.ops.profiles import volume_histogram_batch
    import jax.numpy as jnp

    edges = [np.linspace(0, box[a], b + 1)
             for a, b in enumerate((6, 8, 10))]
    full = volume_histogram_batch(
        jnp.asarray(pos), jnp.ones(T),
        *[jnp.asarray(e) for e in edges],
    )
    small = volume_histogram_batch(
        jnp.asarray(pos), jnp.ones(T),
        *[jnp.asarray(e) for e in edges], block=16,
    )
    np.testing.assert_array_equal(
        np.asarray(full), np.asarray(small)
    )

    # residues grouping: COMs of wrapped dimer pairs
    dr = DensityMap3D(
        u.atoms, "residues", n_bins=4, verbose=False
    ).run()
    ref = np.zeros((4, 4, 4))
    for f in range(T):
        com = pos[f].reshape(-1, 2, 3).mean(axis=1) % box
        ref += np.histogramdd(com, bins=(4, 4, 4),
                              range=rng_edges)[0]
    np.testing.assert_array_equal(dr.results.counts[0], ref)

    par = DensityMap3D(
        [cation, anion], n_bins=(6, 8, 10),
        parallel=True, verbose=False,
    ).run()
    np.testing.assert_array_equal(
        par.results.counts, dm.results.counts
    )

    with pytest.raises(ValueError):
        DensityMap3D(u.atoms, n_bins=(4, 4), verbose=False)
    tric = Universe.from_arrays(
        pos, np.array([8, 10, 12, 80, 85, 95.0]),
        types=np.array(["A"] * n, dtype=object),
    )
    with pytest.raises(ValueError, match="orthorhombic"):
        DensityMap3D(tric.atoms, verbose=False)
