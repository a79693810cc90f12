"""Sharding-mode equality: the same trajectory analyzed serially,
frame-sharded (data parallel), atom-sharded (ring pass over ppermute)
and wavevector-sharded (tensor-parallel style) must agree — the
TPU-native analog of the reference's serial-vs-parallel consistency
tests (`/root/reference/tests/test_analysis_structure.py:73-84`).
Runs on 8 virtual CPU devices (conftest.py)."""

import numpy as np
import pytest

from mdhelper_tpu.analysis import structure
from mdhelper_tpu.core import Universe

rng = np.random.default_rng(7)

BOX = 12.0
N_FRAMES = 5
N = 83  # deliberately not a multiple of 8: exercises atom padding


@pytest.fixture(scope="module")
def universe():
    positions = rng.random((N_FRAMES, N, 3)) * BOX
    return Universe.from_arrays(
        positions,
        np.array([BOX, BOX, BOX]),
        types=np.array(["A"] * N, dtype=object),
        masses=np.full(N, 1.0),
    )


def _rdf(universe, **kwargs):
    ag = universe.select_atoms("type A")
    return structure.RadialDistributionFunction(
        ag, n_bins=64, range=(0.0, 5.5), exclusion=(1, 1),
        verbose=False, **kwargs,
    ).run()


def test_rdf_shardings_bit_equal(universe):
    serial = _rdf(universe)
    frames = _rdf(universe, shard="frames")
    atoms = _rdf(universe, shard="atoms")
    # Counts are integer-valued f64 sums: exactly representable, so
    # every summation order gives the identical result.
    np.testing.assert_array_equal(
        serial.results.counts, frames.results.counts
    )
    np.testing.assert_array_equal(
        serial.results.counts, atoms.results.counts
    )
    np.testing.assert_allclose(
        serial.results.rdf, atoms.results.rdf, rtol=1e-12
    )


def test_rdf_shard_atoms_drop_axis(universe):
    ag = universe.select_atoms("type A")
    kwargs = dict(
        n_bins=32, range=(0.0, 4.0), exclusion=(1, 1),
        drop_axis="z", verbose=False,
    )
    serial = structure.RadialDistributionFunction(ag, **kwargs).run()
    atoms = structure.RadialDistributionFunction(
        ag, shard="atoms", **kwargs
    ).run()
    np.testing.assert_array_equal(
        serial.results.counts, atoms.results.counts
    )


def test_rdf_shard_validation(universe):
    ag = universe.select_atoms("type A")
    with pytest.raises(ValueError, match="Invalid shard"):
        structure.RadialDistributionFunction(ag, shard="bogus")


def test_rdf_shard_atoms_cross_group(universe):
    """Cross-group atom sharding: the i side holds group-1 shards
    fixed while group-2 shards rotate; counts must equal the serial
    cross-RDF bit-for-bit (83 atoms split 30/53 over 8 devices —
    both sides exercise padding)."""

    half = universe.atoms[:30]
    other = universe.atoms[30:]
    kwargs = dict(
        n_bins=48, range=(0.0, 5.0), verbose=False,
    )
    serial = structure.RadialDistributionFunction(
        half, other, **kwargs
    ).run()
    ring = structure.RadialDistributionFunction(
        half, other, shard="atoms", **kwargs
    ).run()
    np.testing.assert_array_equal(
        serial.results.counts, ring.results.counts
    )
    np.testing.assert_allclose(
        serial.results.rdf, ring.results.rdf, rtol=1e-12
    )
    # And with a cross-group molecule exclusion.
    serial_ex = structure.RadialDistributionFunction(
        half, other, exclusion=(2, 3), **kwargs
    ).run()
    ring_ex = structure.RadialDistributionFunction(
        half, other, exclusion=(2, 3), shard="atoms", **kwargs
    ).run()
    np.testing.assert_array_equal(
        serial_ex.results.counts, ring_ex.results.counts
    )


def _sf(universe, **kwargs):
    ag = universe.select_atoms("type A")
    kwargs = {"sort": True, "unique": True, **kwargs}
    return structure.StructureFactor(
        ag, n_points=5, verbose=False, **kwargs
    ).run()


def test_sf_shardings_agree(universe):
    serial = _sf(universe)
    frames = _sf(universe, shard="frames")
    qshard = _sf(universe, shard="q")
    np.testing.assert_allclose(
        serial.results.ssf, frames.results.ssf, rtol=1e-12
    )
    np.testing.assert_allclose(
        serial.results.ssf, qshard.results.ssf, rtol=1e-12
    )
    np.testing.assert_array_equal(
        serial.results.wavenumbers, qshard.results.wavenumbers
    )


def test_sf_q_shard_unsorted_raw(universe):
    """The q-padding must not leak into raw (unique=False, sort=False)
    output."""

    serial = _sf(universe, sort=False, unique=False)
    qshard = _sf(universe, sort=False, unique=False, shard="q")
    assert qshard.results.ssf.shape == serial.results.ssf.shape
    np.testing.assert_allclose(
        serial.results.ssf, qshard.results.ssf, rtol=1e-12
    )


def test_sf_partial_q_shard(universe):
    ag = universe.select_atoms("type A")
    a, b = ag[: N // 3], ag[N // 3:]
    serial = structure.StructureFactor(
        [a, b], mode="partial", n_points=4, verbose=False
    ).run()
    qshard = structure.StructureFactor(
        [a, b], mode="partial", n_points=4, shard="q", verbose=False
    ).run()
    np.testing.assert_allclose(
        serial.results.ssf, qshard.results.ssf, rtol=1e-12
    )


def test_sf_shard_validation(universe):
    ag = universe.select_atoms("type A")
    with pytest.raises(ValueError, match="Invalid shard"):
        structure.StructureFactor(ag, shard="atoms")
    with pytest.raises(ValueError, match="mesh"):
        structure.StructureFactor(ag, shard="q", method="mesh")
