"""Execute the docs/cookbook.md recipes at miniature scale — the
documented user workflows must actually run (API names, kwargs,
results keys)."""

import pytest
import numpy as np

from mdhelper_tpu.core import Universe

rng = np.random.default_rng(77)
BOX = 10.0
N_FRAMES, N = 6, 48


def make_universe():
    positions = rng.random((N_FRAMES, N, 3)) * BOX
    return Universe.from_arrays(
        positions,
        np.array([BOX] * 3),
        types=np.array(["A", "B"] * (N // 2), dtype=object),
        charges=np.tile([1.0, -1.0], N // 2),
        masses=np.tile([22.99, 35.45], N // 2),
        dt=0.5,
    )


def test_cookbook_selections():
    u = make_universe()
    assert u.select_atoms("type A and charge > 0").n_atoms == N // 2
    assert u.select_atoms("mass > 12").n_atoms == N
    assert u.select_atoms(
        "(type A or type B) and not resid 1:10"
    ).n_atoms == N - 10
    assert u.select_atoms("not type B*").n_atoms == N // 2
    slab = u.select_atoms("prop z > 2 and prop z < 8")
    assert np.all(
        (slab.positions[:, 2] > 2) & (slab.positions[:, 2] < 8)
    )
    sphere = u.select_atoms("point 5 5 5 4.0")
    near = u.select_atoms("around 3.5 type B")
    zone = u.select_atoms("sphzone 4.0 type A")
    for g in (sphere, near, zone):
        assert 0 <= g.n_atoms <= N


def test_cookbook_rdf():
    from mdhelper_tpu.analysis.structure import (
        RadialDistributionFunction,
    )

    u = make_universe()
    rdf = RadialDistributionFunction(
        u.select_atoms("type A"), u.select_atoms("type B"),
        n_bins=24, range=(0.0, 4.0), exclusion=(1, 1), verbose=False,
    ).run()
    r, g = rdf.results.bins, rdf.results.rdf
    assert r.shape == g.shape == (24,)
    rdf.calculate_pmf(temperature=300)
    rdf.calculate_coordination_numbers(rho=0.8)
    assert rdf.results.pmf.shape == (24,)


def test_cookbook_sq_isf():
    from mdhelper_tpu.analysis.structure import (
        IntermediateScatteringFunction,
        StructureFactor,
    )

    u = make_universe()
    sq = StructureFactor(u.atoms, n_points=4, verbose=False).run()
    assert len(sq.results.wavenumbers) == len(sq.results.ssf[0]) or (
        sq.results.ssf.ndim == 1
    )
    isf = IntermediateScatteringFunction(
        u.atoms, n_points=3, n_lags=4, incoherent=True,
        verbose=False,
    ).run()
    assert isf.results.cisf is not None
    assert isf.results.iisf is not None


def test_cookbook_vanhove():
    from mdhelper_tpu.analysis.structure import VanHoveFunction

    u = make_universe()
    vh = VanHoveFunction(
        u.atoms, n_bins=16, range=(0.0, 4.0), n_lags=4, lags="log",
        verbose=False,
    ).run()
    assert vh.results.gs.shape == vh.results.gd.shape
    assert vh.results.gs.shape[1] == 16
    assert vh.results.times.shape[0] == vh.results.gs.shape[0]


def test_cookbook_onsager():
    from mdhelper_tpu.analysis.transport import Onsager

    u = make_universe()
    onsager = Onsager(
        [u.select_atoms("charge > 0"), u.select_atoms("charge < 0")],
        temperature=300, unwrap=True, fft=True, verbose=False,
    ).run()
    onsager.calculate_transport_coefficients()
    onsager.calculate_conductivity()
    assert onsager.results.conductivities is not None


def test_cookbook_profile():
    from mdhelper_tpu.analysis.profile import DensityProfile

    u = make_universe()
    prof = DensityProfile(
        [u.select_atoms("charge > 0"), u.select_atoms("charge < 0")],
        axes="z", n_bins=32, verbose=False,
    ).run()
    prof.calculate_potential_profile(dielectric=78.0, axis="z")
    assert prof.results.potentials is not None


def test_cookbook_polymer():
    from mdhelper_tpu.analysis.polymer import (
        EndToEndVector,
        Gyradius,
        RouseModes,
    )

    u = make_universe()
    kwargs = dict(n_chains=8, n_monomers=6, verbose=False)
    rg = Gyradius(u.atoms, **kwargs).run()
    assert rg.results.gyradii.shape[-1] == N_FRAMES
    EndToEndVector(u.atoms, **kwargs).run()
    RouseModes(u.atoms, n_modes=3, **kwargs).run()

    from mdhelper_tpu.analysis.polymer import (
        MeanSquareInternalDistance,
    )

    msid = MeanSquareInternalDistance(u.atoms, **kwargs).run()
    s = msid.results.separations[0]
    plateau = msid.results.msid[0] / s
    assert plateau.shape == (5,) and (plateau > 0).all()


def test_cookbook_run_together_and_save(tmp_path):
    from mdhelper_tpu.analysis.multi import run_together
    from mdhelper_tpu.analysis.structure import (
        RadialDistributionFunction,
        StructureFactor,
    )
    from mdhelper_tpu.analysis.transport import Onsager

    u = make_universe()
    rdf = RadialDistributionFunction(
        u.atoms, n_bins=16, range=(0.0, 4.0), exclusion=(1, 1),
        verbose=False,
    )
    sq = StructureFactor(u.atoms, n_points=3, verbose=False)
    onsager = Onsager(u.atoms, temperature=300, verbose=False)
    run_together([rdf, sq, onsager])
    assert rdf.results.rdf is not None
    assert sq.results.ssf is not None
    assert onsager.results.msd_self is not None
    rdf.save(str(tmp_path / "rdf_results"))
    assert (tmp_path / "rdf_results.npz").exists()


def test_cookbook_checkpoint(tmp_path):
    from mdhelper_tpu.analysis.structure import (
        RadialDistributionFunction,
    )

    u = make_universe()
    rdf = RadialDistributionFunction(
        u.atoms, n_bins=16, range=(0.0, 4.0), exclusion=(1, 1),
        verbose=False,
    )
    rdf.run(checkpoint=str(tmp_path / "state.npz"))
    assert rdf.results.rdf is not None


def test_cookbook_bonded():
    from mdhelper_tpu.analysis.bonded import (
        BondAngleDistribution,
        BondLengthDistribution,
        DihedralDistribution,
    )

    u = make_universe()
    bonds = np.array([(i, i + 1) for i in range(0, N - 1)])
    bl = BondLengthDistribution(
        u.atoms, n_bins=20, range=(0.0, 6.0), bonds=bonds,
        verbose=False,
    ).run()
    assert bl.results.counts.sum() > 0 and bl.results.mean > 0
    ba = BondAngleDistribution(
        u.atoms, n_bins=18,
        angles=np.array([(i, i + 1, i + 2) for i in range(N - 2)]),
        verbose=False,
    ).run()
    widths = np.diff(ba.results.edges)
    assert abs((ba.results.probability * widths).sum() - 1.0) < 1e-9
    phi = DihedralDistribution(
        u.atoms,
        dihedrals=np.array(
            [(i, i + 1, i + 2, i + 3) for i in range(N - 3)]
        ),
        verbose=False,
    ).run()
    assert phi.results.counts.sum() == (N - 3) * N_FRAMES


def test_cookbook_cluster_hbonds_orientation():
    from mdhelper_tpu.analysis.cluster import ClusterSizeDistribution
    from mdhelper_tpu.analysis.hbonds import HydrogenBondAnalysis
    from mdhelper_tpu.analysis.orientation import (
        NematicOrderParameter,
    )

    u = make_universe()
    cs = ClusterSizeDistribution(u.atoms, cutoff=2.5,
                                 verbose=False).run()
    assert cs.results.size_counts.sum() == cs.results.n_clusters.sum()
    assert cs.results.weight_average >= cs.results.number_average > 0

    # the generic fixture has no names/bonds: build a tiny HB system
    pos = np.array(
        [[[2.0, 2, 2], [2.96, 2, 2], [1.7, 2.9, 2], [4.8, 2, 2]]]
    )
    w = Universe.from_arrays(
        pos, np.array([BOX] * 3),
        names=np.array(["O", "H1", "H2", "O"], dtype=object),
        bonds=np.array([(0, 1), (0, 2)]),
    )
    hb = HydrogenBondAnalysis(
        w, hydrogens_sel="name H*", acceptors_sel="name O* N*",
        pair_counts=True, lifetimes=True, verbose=False,
    ).run()
    assert hb.results.counts[0] == 1
    assert hb.results.lifetime[0] == 1.0

    nop = NematicOrderParameter(
        u.select_atoms("type A"), u.select_atoms("type B"),
        acf=True, verbose=False,
    ).run()
    assert nop.results.Q.shape == (N_FRAMES, 3, 3)
    assert -0.5 <= nop.results.P2_mean <= 1.0
    assert abs(nop.results.C2[0] - 1.0) < 1e-9


def test_cookbook_density_map_and_green_kubo():
    from mdhelper_tpu.analysis.profile import DensityMap2D
    from mdhelper_tpu.analysis.thermodynamics import (
        calculate_shear_viscosity,
        calculate_thermal_conductivity,
    )

    u = make_universe()
    dm = DensityMap2D(
        [u.select_atoms("type A"), u.select_atoms("type B")],
        axes="xz", n_bins=12, verbose=False,
    ).run()
    assert dm.results.number_densities.shape == (2, 12, 12)
    assert dm.results.charge_densities is not None

    series = rng.standard_normal((4000, 3))
    eta = calculate_shear_viscosity(series, 1e4, 300.0, 0.01)
    assert eta.viscosity >= 0 and len(eta.running_viscosity) == 4000
    lam = calculate_thermal_conductivity(
        series * 0.01, 1e4, 300.0, 0.01
    )
    assert len(lam.running_conductivity) == 4000


def test_cookbook_weighted_sq_and_dielectric():
    from mdhelper_tpu.analysis.electrostatics import (
        DipoleMoment,
        calculate_dielectric_spectrum,
    )
    from mdhelper_tpu.analysis.structure import StructureFactor

    u = make_universe()
    partial = StructureFactor(
        [u.select_atoms("type A"), u.select_atoms("type B")],
        mode="partial", n_points=2, verbose=False,
    ).run()
    w = partial.calculate_weighted_sum([5.803, -3.739])
    assert w.shape == partial.results.wavenumbers.shape

    dm = DipoleMoment(u.atoms, verbose=False).run()
    spec = calculate_dielectric_spectrum(
        dm.results.dipoles[:, 0], 300.0,
        float(dm.results.volumes.mean()), dt=0.5,
    )
    assert spec.epsilon.shape == spec.frequencies.shape
    assert np.isfinite(spec.epsilon).all()


def test_cookbook_dynamic_structure_factor():
    from mdhelper_tpu.analysis.structure import (
        IntermediateScatteringFunction,
    )

    u = make_universe()
    isf = IntermediateScatteringFunction(
        u.atoms, n_points=3, incoherent=True, verbose=False
    ).run()
    isf.calculate_dynamic_structure_factor(window="hann")
    assert isf.results.angular_frequencies[0] == 0.0
    assert isf.results.dsf.shape[0] == len(
        isf.results.angular_frequencies
    )
    assert isf.results.idsf.shape == isf.results.dsf.shape[:1] + (
        1,
        isf.results.dsf.shape[2],
    )


def test_cookbook_einstein_helfand():
    from mdhelper_tpu.analysis.thermodynamics import (
        calculate_shear_viscosity,
    )

    p = rng.standard_normal((4000, 3))
    eta = calculate_shear_viscosity(
        p, 1000.0, 300.0, 0.01,
        method="einstein", fit_interval=(0.01, 0.1),
    )
    assert eta.helfand_msd.shape == (4000,)
    assert np.isfinite(eta.viscosity)
    assert "helfand_msd" in eta.units


def test_cookbook_pca_tica():
    from mdhelper_tpu.analysis.rmsd import (
        PrincipalComponentAnalysis,
        TICA,
    )

    u = make_universe()
    pca = PrincipalComponentAnalysis(u.atoms, verbose=False).run()
    assert pca.transform(n_components=2).shape == (N_FRAMES, 2)
    tica = TICA(u.atoms, lag=2, verbose=False).run()
    assert tica.results.eigenvalues.shape == (tica.results.rank,)
    assert tica.results.timescales.shape == (tica.results.rank,)
    slow = tica.transform(n_components=2)
    assert slow.shape == (N_FRAMES, 2)


def test_cookbook_free_energy():
    from mdhelper_tpu.analysis.free_energy import (
        UmbrellaSampling,
        bar,
        mbar,
    )

    # Harmonic umbrella windows over a flat landscape (exactly
    # samplable); the recipe's call shapes must run as documented.
    fe_rng = np.random.default_rng(31)
    centers = np.linspace(-1.0, 1.0, 7)
    kappa = 30.0
    series = [
        fe_rng.normal(c, np.sqrt(1.0 / kappa), size=800)
        for c in centers
    ]
    us = UmbrellaSampling(
        series, centers, kappa, temperature=1.0, reduced=True,
    ).run(n_bins=20, range=(-1.2, 1.2))
    assert us.results.pmf.shape == (20,)
    assert us.results.bin_centers.shape == (20,)
    assert us.results.pmf_uncertainties.shape == (20,)
    ok = np.isfinite(us.results.pmf)
    assert np.nanmax(us.results.pmf[ok]) < 0.5  # flat landscape

    # Standalone estimators: two shifted harmonic states.
    x0 = fe_rng.normal(0.0, 1.0, 4000)
    x1 = fe_rng.normal(0.5, 1.0, 4000)
    u0 = lambda x: 0.5 * x**2  # noqa: E731
    u1 = lambda x: 0.5 * (x - 0.5) ** 2  # noqa: E731
    df = bar(u1(x0) - u0(x0), u0(x1) - u1(x1))
    assert abs(df) < 0.05  # equal widths: Delta f = 0

    x_n = np.concatenate([x0, x1])
    sol = mbar(
        np.stack([u0(x_n), u1(x_n)]), [x0.size, x1.size]
    )
    assert sol.free_energies[1] == pytest.approx(df, abs=1e-6)
    assert sol.uncertainties[1] > 0


def test_cookbook_interface():
    """'Instantaneous interfaces (Willard-Chandler)' recipe."""
    from mdhelper_tpu.analysis.interface import (
        WillardChandlerInterface,
    )

    slab = rng.random((N_FRAMES, 400, 3)) * np.array(
        [BOX, BOX, 6.0]
    ) + np.array([0.0, 0.0, 2.0])
    u = Universe.from_arrays(slab, np.array([BOX] * 3), dt=0.5)
    wc = WillardChandlerInterface(
        u.atoms, axis="z", xi=1.5, n_cells=16, verbose=False
    ).run()
    assert wc.results.heights.shape[:2] == (2, N_FRAMES)
    assert wc.results.mean_heights.shape == (2, N_FRAMES)
    assert wc.results.interface_width.shape == (2,)
    assert wc.results.density_field.shape == (16, 16, 16)
    wc.calculate_spectrum()
    wc.calculate_surface_tension(300.0)
    assert wc.results.surface_tension.shape == (2,)
    assert np.isfinite(wc.results.surface_tension).all()


def test_cookbook_intrinsic_profile():
    """'Intrinsic (interface-relative) density profiles' recipe."""
    from mdhelper_tpu.analysis.interface import (
        IntrinsicDensityProfile,
    )

    n_w, n_i = 300, 60
    slab = rng.random((N_FRAMES, n_w + 2 * n_i, 3)) * np.array(
        [BOX, BOX, 6.0]
    ) + np.array([0.0, 0.0, 2.0])
    u = Universe.from_arrays(
        slab, np.array([BOX] * 3),
        charges=np.concatenate(
            (np.zeros(n_w), np.ones(n_i), -np.ones(n_i))
        ),
        dt=0.5,
    )
    water = u.atoms[:n_w]
    idp = IntrinsicDensityProfile(
        water, [u.atoms[n_w:n_w + n_i], u.atoms[n_w + n_i:]],
        xi=1.5, n_cells=16, n_bins=32, range=(-3.0, 3.0),
        verbose=False,
    ).run()
    assert idp.results.number_densities.shape == (2, 32)
    assert idp.results.charge_densities.shape == (32,)
    idp.calculate_pmf(300.0)
    assert idp.results.pmf.shape == (2, 32)


def test_cookbook_ion_pairing():
    from mdhelper_tpu.analysis.pairing import IonPairAnalysis

    u = make_universe()
    cations = u.select_atoms("charge > 0")
    anions = u.select_atoms("charge < 0")
    ipa = IonPairAnalysis(
        cations, anions, cutoff=3.4, lifetimes=True, verbose=False
    ).run()
    assert ipa.results.counts.shape == (N_FRAMES,)
    assert ipa.results.free_fractions.shape == (N_FRAMES, 2)
    assert len(ipa.results.coordination[0]) == N // 2
    assert ipa.results.lifetime[0] == pytest.approx(1.0)
    IonPairAnalysis(
        cations, anions, 3.4, ("atoms", "atoms"), verbose=False
    ).run()


def test_cookbook_charge_ssf_screening():
    from mdhelper_tpu.analysis.structure import StructureFactor

    u = make_universe()
    partial = StructureFactor(
        [u.select_atoms("charge > 0"), u.select_atoms("charge < 0")],
        mode="partial", n_points=4, sort=True, unique=True,
        verbose=False,
    ).run()
    partial.calculate_charge_structure_factor()
    assert partial.results.charge_ssf.shape == (
        len(partial.results.wavenumbers),
    )
    # fit machinery on a synthetic Debye curve over the class grid
    q = partial.results.wavenumbers
    partial.results.charge_ssf = q**2 / (q**2 + 0.5**2)
    lam = partial.calculate_screening_length(q_max=float(q.max()))
    assert lam == pytest.approx(2.0, rel=1e-5)


def test_cookbook_ionicity():
    from mdhelper_tpu.analysis.transport import Onsager

    u = make_universe()
    onsager = Onsager(
        [u.select_atoms("charge > 0"), u.select_atoms("charge < 0")],
        temperature=300, unwrap=True, fft=True, verbose=False,
    ).run()
    onsager.calculate_transport_coefficients(
        start=1, stop=5, scale="linear"
    )
    onsager.calculate_ionicity()
    assert onsager.results.ionicity.shape == (1,)
    assert np.allclose(
        onsager.results.haven_ratios * onsager.results.ionicity, 1.0
    )


def test_cookbook_density_map_3d_and_guinier():
    from mdhelper_tpu.analysis.polymer import (
        SingleChainStructureFactor,
    )
    from mdhelper_tpu.analysis.profile import DensityMap3D

    u = make_universe()
    sdf = DensityMap3D(
        [u.select_atoms("type A")], n_bins=8, verbose=False
    ).run()
    assert sdf.results.number_densities.shape == (1, 8, 8, 8)

    # The Guinier fit needs real chain structure (the shared
    # uniform-gas fixture has no S(q) decay for some rng states):
    # compact Gaussian blobs from an order-independent local rng.
    local = np.random.default_rng(7)
    n_chains, n_monomers = 8, 6
    centers = local.uniform(2, 8, (N_FRAMES, n_chains, 1, 3))
    offsets = local.normal(
        0.0, 0.6, (N_FRAMES, n_chains, n_monomers, 3)
    )
    chain_pos = (centers + offsets).reshape(
        N_FRAMES, n_chains * n_monomers, 3
    ) % BOX
    u_chains = Universe.from_arrays(
        chain_pos,
        np.array([BOX] * 3),
        types=np.array(
            ["A"] * (n_chains * n_monomers), dtype=object
        ),
        dt=0.5,
    )
    scsf = SingleChainStructureFactor(
        u_chains.atoms, n_chains=n_chains, n_monomers=n_monomers,
        n_points=4, verbose=False,
    ).run()
    rg = scsf.calculate_guinier_radius()
    assert rg > 0


def test_cookbook_flow_profile():
    from mdhelper_tpu.analysis.flow import FlowProfile

    local = np.random.default_rng(11)
    pos = local.uniform(0, BOX, (N_FRAMES, N, 3))
    vel = local.standard_normal((N_FRAMES, N, 3))
    u = Universe.from_arrays(
        pos, np.array([BOX] * 3),
        types=np.array(["A", "B"] * (N // 2), dtype=object),
        masses=np.tile([22.99, 35.45], N // 2),
        velocities=vel, dt=0.5,
    )
    prof = FlowProfile(
        u.atoms, axis="z", n_bins=10, verbose=False
    ).run()
    assert prof.results.velocity.shape == (10, 3)
    occupied = prof.results.counts > 3
    assert np.all(prof.results.temperature[occupied] > 0)
    assert np.all(prof.results.mass_density >= 0)


def test_cookbook_orientation_profile():
    from mdhelper_tpu.analysis.orientation import OrientationProfile

    u = make_universe()
    prof = OrientationProfile(
        u.select_atoms("type A"), u.select_atoms("type B"),
        axis="z", n_bins=10, verbose=False,
    ).run()
    assert prof.results.p1.shape == (10,)
    occ = prof.results.counts > 0
    assert np.all(np.abs(prof.results.p1[occ]) <= 1 + 1e-9)
