"""Fused multi-analysis streaming (`analysis.multi.run_together`):
one trajectory pass, one jitted update, results identical to separate
`run()` calls."""

import numpy as np
import pytest

from mdhelper_tpu.analysis import run_together
from mdhelper_tpu.analysis.structure import (
    RadialDistributionFunction,
    StructureFactor,
)
from mdhelper_tpu.analysis.transport import Onsager
from mdhelper_tpu.core import Universe

rng = np.random.default_rng(17)
BOX, T, N = 12.0, 9, 80


@pytest.fixture()
def universe():
    walk = np.cumsum(rng.standard_normal((T, N, 3)) * 0.2, axis=0)
    positions = (walk + BOX / 2) % BOX
    return Universe.from_arrays(
        positions, np.array([BOX] * 3), dt=1.0,
        types=np.array(["A"] * N, dtype=object),
    )


def _make(universe):
    return [
        RadialDistributionFunction(
            universe.atoms, n_bins=32, range=(0.0, 3.5),
            exclusion=(1, 1), verbose=False,
        ),
        StructureFactor(
            universe.atoms, n_points=4, unique=False, sort=False,
            verbose=False,
        ),
        Onsager(universe.atoms, temperature=300, unwrap=True,
                verbose=False),
    ]


def test_fused_matches_separate_runs(universe):
    separate = _make(universe)
    for a in separate:
        a.run()
    fused = _make(universe)
    run_together(fused)

    np.testing.assert_array_equal(
        fused[0].results.counts, separate[0].results.counts
    )
    np.testing.assert_allclose(
        fused[1].results.ssf, separate[1].results.ssf, rtol=1e-12
    )
    np.testing.assert_allclose(
        fused[2].results.msd_self, separate[2].results.msd_self,
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        fused[2].results.msd_cross, separate[2].results.msd_cross,
        rtol=1e-10,
    )


def test_fused_frame_selection(universe):
    separate = _make(universe)[:2]
    for a in separate:
        a.run(start=2, stop=8, step=2)
    fused = _make(universe)[:2]
    run_together(fused, start=2, stop=8, step=2)
    np.testing.assert_array_equal(
        fused[0].results.counts, separate[0].results.counts
    )
    np.testing.assert_allclose(
        fused[1].results.ssf, separate[1].results.ssf, rtol=1e-12
    )


def test_fused_rejects_mixed_trajectories(universe):
    other = Universe.from_arrays(
        rng.random((3, N, 3)) * BOX, np.array([BOX] * 3)
    )
    a = RadialDistributionFunction(
        universe.atoms, n_bins=8, range=(0.0, 3.0), verbose=False
    )
    b = RadialDistributionFunction(
        other.atoms, n_bins=8, range=(0.0, 3.0), verbose=False
    )
    with pytest.raises(ValueError):
        run_together([a, b])


def test_fused_store_type_analyses(universe):
    """Store-type analyses (per-frame host results) fuse through the
    _update/_store_chunk protocol: DipoleMoment and Gyradius match
    their separate runs bit-for-bit."""

    from mdhelper_tpu.analysis.electrostatics import DipoleMoment
    from mdhelper_tpu.analysis.polymer import Gyradius

    universe._topology.charges = rng.standard_normal(N)

    def make():
        return [
            DipoleMoment(universe.atoms, average=False, verbose=False),
            Gyradius(
                universe.atoms, n_chains=8, n_monomers=10,
                verbose=False,
            ),
        ]

    separate = make()
    for a in separate:
        a.run()
    fused = make()
    run_together(fused)
    # The fused program is a different XLA compilation, so float ops
    # may reassociate at the last-ulp level.
    np.testing.assert_allclose(
        fused[0].results.dipoles, separate[0].results.dipoles,
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        fused[0].results.volumes, separate[0].results.volumes,
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        fused[1].results.gyradii, separate[1].results.gyradii,
        rtol=1e-12,
    )


def test_fused_density_profile_recenter(universe):
    """DensityProfile's recenter mode (unwrap-state carry + host-side
    count accumulation) fuses correctly."""

    from mdhelper_tpu.analysis.profile import DensityProfile

    def make():
        return DensityProfile(
            universe.atoms, axes="z", n_bins=16,
            recenter=(0, BOX / 2), verbose=False,
        )

    separate = make()
    separate.run()
    fused = make()
    run_together([fused])
    np.testing.assert_allclose(
        fused.results.number_densities[0],
        separate.results.number_densities[0],
        rtol=1e-12,
    )


def test_fused_isf_with_rdf(universe):
    """The sequential ISF (lag ring buffer scan) fuses with other
    carry analyses and matches its standalone run exactly."""

    from mdhelper_tpu.analysis.structure import (
        IntermediateScatteringFunction,
        RadialDistributionFunction,
    )

    def make_isf():
        return IntermediateScatteringFunction(
            universe.atoms, n_points=3, n_lags=3, incoherent=True,
            verbose=False,
        )

    solo = make_isf().run()
    fused_isf = make_isf()
    rdf = RadialDistributionFunction(
        universe.atoms, n_bins=12, range=(0.0, 4.0),
        exclusion=(1, 1), verbose=False,
    )
    run_together([rdf, fused_isf])
    np.testing.assert_allclose(
        solo.results.cisf, fused_isf.results.cisf, rtol=1e-12
    )
    np.testing.assert_allclose(
        solo.results.iisf, fused_isf.results.iisf, rtol=1e-12
    )


def test_fused_profile_axis_subset(universe):
    """DensityProfile streams only its profiled axes standalone; in
    fused mode the shared full-width stream must be column-gathered
    identically (a z-profile reading x columns would be silently
    wrong)."""

    from mdhelper_tpu.analysis.profile import DensityProfile
    from mdhelper_tpu.analysis.structure import (
        RadialDistributionFunction,
    )

    def make_prof():
        return DensityProfile(
            universe.atoms, axes="z", n_bins=20, verbose=False
        )

    solo = make_prof().run()
    fused_prof = make_prof()
    rdf = RadialDistributionFunction(
        universe.atoms, n_bins=8, range=(0.0, 3.0),
        exclusion=(1, 1), verbose=False,
    )
    run_together([rdf, fused_prof])
    np.testing.assert_allclose(
        np.asarray(solo.results.number_densities[0]),
        np.asarray(fused_prof.results.number_densities[0]),
        rtol=1e-12,
    )


def test_fused_host_pipeline_onsager(universe, monkeypatch):
    """A host-pipeline Onsager rides the fused stream through
    `batch.host_positions` (its device half is a no-op) and matches
    the device-path separate run."""

    separate = _make(universe)
    for a in separate:
        a.run()

    monkeypatch.setenv("MDTPU_HOST_PIPELINE", "1")
    fused = _make(universe)
    run_together(fused)
    monkeypatch.delenv("MDTPU_HOST_PIPELINE")

    assert fused[2]._host_pipeline
    assert not separate[2]._host_pipeline
    # RDF/S(q) are unaffected (device path); Onsager ran host-side.
    np.testing.assert_array_equal(
        fused[0].results.counts, separate[0].results.counts
    )
    np.testing.assert_allclose(
        fused[1].results.ssf, separate[1].results.ssf, rtol=1e-12
    )
    np.testing.assert_allclose(
        fused[2].results.msd_self, separate[2].results.msd_self,
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        fused[2].results.msd_cross, separate[2].results.msd_cross,
        rtol=1e-10,
    )


def test_fused_parallel_matches_serial(universe):
    """run_together(parallel=True) shards the fused stream's frame
    axis over the 8-device mesh; results match the serial fused pass
    (RDF counts bit-equal)."""

    from mdhelper_tpu.analysis.profile import DensityProfile

    def make():
        return [
            RadialDistributionFunction(
                universe.atoms, n_bins=32, range=(0.0, 3.5),
                exclusion=(1, 1), verbose=False,
            ),
            StructureFactor(
                universe.atoms, n_points=4, unique=False, sort=False,
                verbose=False,
            ),
            DensityProfile(
                universe.atoms, axes="z", n_bins=16, verbose=False
            ),
        ]

    serial = make()
    run_together(serial)
    sharded = make()
    run_together(sharded, parallel=True)

    np.testing.assert_array_equal(
        serial[0].results.counts, sharded[0].results.counts
    )
    np.testing.assert_allclose(
        serial[1].results.ssf, sharded[1].results.ssf, rtol=1e-12
    )
    np.testing.assert_allclose(
        serial[2].results.number_densities,
        sharded[2].results.number_densities, rtol=1e-12,
    )


def test_fused_parallel_rejects_sequential(universe):
    analyses = [
        RadialDistributionFunction(
            universe.atoms, n_bins=8, range=(0.0, 3.0),
            verbose=False,
        ),
        Onsager(universe.atoms, temperature=300, unwrap=True,
                verbose=False),
    ]
    with pytest.raises(ValueError, match="order-dependent"):
        run_together(analyses, parallel=True)


def test_fused_vanhove_rides_the_stream(universe):
    from mdhelper_tpu.analysis.structure import VanHoveFunction

    def make():
        return [
            RadialDistributionFunction(
                universe.atoms, n_bins=16, range=(0.0, 3.5),
                exclusion=(1, 1), verbose=False,
            ),
            VanHoveFunction(
                universe.atoms, n_bins=16, range=(0.0, 3.5),
                n_lags=4, verbose=False,
            ),
        ]

    separate = make()
    for a in separate:
        a.run()
    fused = make()
    run_together(fused)
    np.testing.assert_array_equal(
        fused[0].results.counts, separate[0].results.counts
    )
    np.testing.assert_array_equal(
        fused[1].results.counts_self, separate[1].results.counts_self
    )
    np.testing.assert_array_equal(
        fused[1].results.counts_distinct,
        separate[1].results.counts_distinct,
    )
    np.testing.assert_allclose(
        fused[1].results.msd, separate[1].results.msd, rtol=1e-12
    )


def test_fused_order_rmsd_overlap_ride_the_stream(universe):
    """The round-3 additions (Steinhardt order, RMSD superposition,
    overlap/chi4 ring) fold into one fused pass bit-identically."""
    from mdhelper_tpu.analysis.dynamics import OverlapFunction
    from mdhelper_tpu.analysis.rmsd import RMSD
    from mdhelper_tpu.analysis.steinhardt import (
        SteinhardtOrderParameter,
    )

    def make():
        return [
            SteinhardtOrderParameter(
                universe.atoms, 2.2, (4, 6), wl=True,
                verbose=False,
            ),
            RMSD(universe.atoms, verbose=False),
            OverlapFunction(universe.atoms, 0.8, verbose=False),
        ]

    separate = make()
    for a in separate:
        a.run()
    fused = make()
    run_together(fused)
    np.testing.assert_allclose(
        fused[0].results.ql, separate[0].results.ql, atol=1e-12
    )
    np.testing.assert_allclose(
        fused[0].results.wl, separate[0].results.wl, atol=1e-12
    )
    np.testing.assert_allclose(
        fused[1].results.rmsd, separate[1].results.rmsd,
        atol=1e-12,
    )
    np.testing.assert_allclose(
        fused[2].results.Q, separate[2].results.Q, atol=1e-12
    )
    np.testing.assert_allclose(
        fused[2].results.chi4, separate[2].results.chi4,
        atol=1e-12,
    )


def test_fused_radial_profile_rides_the_stream(universe):
    from mdhelper_tpu.analysis.profile import RadialDensityProfile

    def make():
        return [
            RadialDistributionFunction(
                universe.atoms, n_bins=16, range=(0.0, 3.5),
                exclusion=(1, 1), verbose=False,
            ),
            RadialDensityProfile(
                universe.atoms, [6.0, 6.0, 6.0], n_bins=12,
                range=(0.0, 4.0), verbose=False,
            ),
        ]

    separate = make()
    for a in separate:
        a.run()
    fused = make()
    run_together(fused)
    np.testing.assert_array_equal(
        fused[0].results.counts, separate[0].results.counts
    )
    np.testing.assert_array_equal(
        fused[1].results.counts, separate[1].results.counts
    )
    np.testing.assert_allclose(
        fused[1].results.number_densities,
        separate[1].results.number_densities,
        rtol=1e-12,
    )


def test_fused_cluster_hbonds_orientation():
    """The round-3 beyond-reference trio (clustering, hydrogen bonds,
    nematic order) fuses into one pass with bit-identical results."""

    from mdhelper_tpu.analysis.cluster import ClusterSizeDistribution
    from mdhelper_tpu.analysis.hbonds import HydrogenBondAnalysis
    from mdhelper_tpu.analysis.orientation import NematicOrderParameter

    local = np.random.default_rng(29)
    box, n_mol, F = 14.0, 12, 6
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
        pos, np.array([box] * 3), dt=1.0,
        names=np.array(names, dtype=object),
        types=np.array(["O", "H", "H"] * n_mol, dtype=object),
        resindices=np.repeat(np.arange(n_mol), 3),
        bonds=np.asarray(bonds),
    )

    def make():
        return [
            ClusterSizeDistribution(
                u.atoms, 3.2, "residues", verbose=False
            ),
            HydrogenBondAnalysis(
                u, hydrogens_sel="name H*", acceptors_sel="name O*",
                pair_counts=True, lifetimes=True, verbose=False,
            ),
            NematicOrderParameter(
                u.select_atoms("name H1"), u.select_atoms("name H2"),
                acf=True, verbose=False,
            ),
        ]

    separate = make()
    for a in separate:
        a.run()
    fused = make()
    run_together(fused)

    np.testing.assert_array_equal(
        fused[0].results.size_counts, separate[0].results.size_counts
    )
    np.testing.assert_array_equal(
        fused[0].results.n_clusters, separate[0].results.n_clusters
    )
    np.testing.assert_array_equal(
        fused[1].results.counts, separate[1].results.counts
    )
    np.testing.assert_array_equal(
        fused[1].results.pair_counts, separate[1].results.pair_counts
    )
    np.testing.assert_allclose(
        fused[1].results.lifetime, separate[1].results.lifetime,
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        fused[2].results.Q, separate[2].results.Q, rtol=1e-12
    )
    np.testing.assert_allclose(
        fused[2].results.C2, separate[2].results.C2, rtol=1e-12
    )


def test_fused_payload_rules(universe):
    """Mixed position/velocity payloads refuse to fuse; an all-
    velocity fused pass streams the velocity payload correctly."""

    from mdhelper_tpu.analysis.dynamics import VelocityAutocorrelation

    local = np.random.default_rng(31)
    v = local.standard_normal((T, N, 3))
    pos = local.random((T, N, 3)) * BOX
    u = Universe.from_arrays(
        pos, np.array([BOX] * 3), dt=1.0,
        types=np.array(["A"] * N, dtype=object),
        velocities=v,
    )
    vacf = VelocityAutocorrelation(u.atoms, verbose=False)
    rdf = RadialDistributionFunction(
        u.atoms, n_bins=16, range=(0.0, 3.5), exclusion=(1, 1),
        verbose=False,
    )
    with pytest.raises(ValueError, match="payload"):
        run_together([rdf, vacf])

    # all-velocity fused pass == standalone
    alone = VelocityAutocorrelation(u.atoms, verbose=False).run()
    half = VelocityAutocorrelation(
        u.select_atoms("index 0:39"), verbose=False
    )
    fused_list = [VelocityAutocorrelation(u.atoms, verbose=False),
                  half]
    run_together(fused_list)
    np.testing.assert_allclose(
        fused_list[0].results.vacf, alone.results.vacf, rtol=1e-12
    )


def test_fused_checkpoint_resume(universe, tmp_path):
    """run_together(checkpoint=) persists every carry + registered
    store and resumes, including across a straddling chunk
    boundary."""

    from mdhelper_tpu.analysis.cluster import ClusterSizeDistribution

    ckpt = str(tmp_path / "fused.npz")

    def make():
        pair = [
            RadialDistributionFunction(
                universe.atoms, n_bins=16, range=(0.0, 3.5),
                exclusion=(1, 1), verbose=False,
            ),
            ClusterSizeDistribution(
                universe.atoms, 2.0, verbose=False
            ),
        ]
        for a in pair:
            a._chunk_bytes = 2 * N * 3 * 8  # 2 frames per chunk
        return pair

    full = make()
    run_together(full)

    partial = make()
    # T=9 frames; stop=5 straddles the 2-frame chunking on resume
    run_together(partial, stop=5, checkpoint=ckpt)
    resumed = make()
    run_together(resumed, checkpoint=ckpt)

    np.testing.assert_array_equal(
        resumed[0].results.counts, full[0].results.counts
    )
    np.testing.assert_array_equal(
        resumed[1].results.size_counts, full[1].results.size_counts
    )
    np.testing.assert_array_equal(
        resumed[1].results.n_clusters, full[1].results.n_clusters
    )


def test_fused_checkpoint_rejects_unregistered(universe, tmp_path):
    from mdhelper_tpu.analysis.polymer import RouseModes

    rm = RouseModes(
        universe.atoms, n_chains=8, n_monomers=10, n_modes=2,
        verbose=False,
    )
    with pytest.raises(ValueError, match="not registered"):
        run_together([rm], checkpoint=str(tmp_path / "x.npz"))


def test_fused_tica_rides_the_stream(universe):
    """TICA's lag-ring scan carry hands off identically inside a
    fused pass (the ISF-ring pattern under run_together)."""

    from mdhelper_tpu.analysis.rmsd import TICA

    fused_tica = TICA(universe.atoms, lag=2, verbose=False)
    fused_rdf = RadialDistributionFunction(
        universe.atoms, n_bins=16, range=(0.0, 3.0), verbose=False
    )
    run_together([fused_rdf, fused_tica])
    solo = TICA(universe.atoms, lag=2, verbose=False).run()
    np.testing.assert_allclose(
        fused_tica.results.eigenvalues, solo.results.eigenvalues,
        atol=1e-9,
    )
    np.testing.assert_allclose(
        fused_tica.results.mean_positions,
        solo.results.mean_positions, atol=1e-9,
    )
