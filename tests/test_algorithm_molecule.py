"""Tests for mdhelper_tpu.algorithm.molecule (parity:
/root/reference/tests/test_algorithm_molecule.py, with direct NumPy
oracles instead of MDAnalysis)."""

import numpy as np
import pytest

from mdhelper_tpu.algorithm import molecule

rng = np.random.default_rng(3)

N_GROUPS, N_PER = 6, 10
masses = rng.random((N_GROUPS, N_PER)) + 0.5
positions = rng.random((N_GROUPS, N_PER, 3)) * 20


def oracle_com(m, p):
    return (m[:, None] * p).sum(axis=0) / m.sum()


def oracle_rg(m, p, components=False):
    com = oracle_com(m, p)
    d2 = (p - com) ** 2
    if components:
        total = d2.sum(axis=1, keepdims=True)
        return np.sqrt((m[:, None] * (total - d2)).sum(axis=0) / m.sum())
    return np.sqrt((m[:, None] * d2).sum() / m.sum())


def test_center_of_mass_invalid_grouping():
    with pytest.raises(ValueError):
        molecule.center_of_mass(grouping="molecules")
    with pytest.raises(ValueError):
        molecule.center_of_mass()  # no group, no arrays


def test_center_of_mass_overall():
    com = molecule.center_of_mass(
        masses=masses[0], positions=positions[0]
    )
    assert np.allclose(com, oracle_com(masses[0], positions[0]))


def test_center_of_mass_grouped():
    com = molecule.center_of_mass(masses=masses, positions=positions)
    ref = np.stack([oracle_com(m, p) for m, p in zip(masses, positions)])
    assert np.allclose(com, ref)
    # Flat arrays + n_groups reshaping.
    com2 = molecule.center_of_mass(
        masses=masses.ravel(),
        positions=positions.reshape(-1, 3),
        n_groups=N_GROUPS,
    )
    assert np.allclose(com2, ref)


def test_center_of_mass_ragged():
    ragged_m = [masses[0, :4], masses[1, :7]]
    ragged_p = [positions[0, :4], positions[1, :7]]
    com = molecule.center_of_mass(masses=ragged_m, positions=ragged_p)
    ref = np.stack(
        [oracle_com(m, p) for m, p in zip(ragged_m, ragged_p)]
    )
    assert np.allclose(com, ref)


def test_radius_of_gyration_overall():
    rg = molecule.radius_of_gyration(
        masses=masses[0], positions=positions[0]
    )
    assert np.isclose(float(rg), oracle_rg(masses[0], positions[0]))


def test_radius_of_gyration_components():
    rg = molecule.radius_of_gyration(
        masses=masses[0], positions=positions[0], components=True
    )
    assert np.allclose(
        rg, oracle_rg(masses[0], positions[0], components=True)
    )


def test_radius_of_gyration_grouped():
    rg = molecule.radius_of_gyration(
        masses=masses, positions=positions, n_groups=N_GROUPS
    )
    ref = np.array(
        [oracle_rg(m, p) for m, p in zip(masses, positions)]
    )
    assert np.allclose(rg, ref)
    rgc = molecule.radius_of_gyration(
        masses=masses,
        positions=positions,
        n_groups=N_GROUPS,
        components=True,
    )
    refc = np.stack(
        [oracle_rg(m, p, components=True)
         for m, p in zip(masses, positions)]
    )
    assert np.allclose(rgc, refc)


def test_radius_of_gyration_ragged():
    ragged_m = [masses[0, :4], masses[1, :7]]
    ragged_p = [positions[0, :4], positions[1, :7]]
    rg = molecule.radius_of_gyration(masses=ragged_m, positions=ragged_p)
    ref = np.array(
        [oracle_rg(np.asarray(m), np.asarray(p))
         for m, p in zip(ragged_m, ragged_p)]
    )
    assert np.allclose(rg, ref)
    rgc = molecule.radius_of_gyration(
        masses=ragged_m, positions=ragged_p, components=True
    )
    refc = np.stack(
        [oracle_rg(np.asarray(m), np.asarray(p), components=True)
         for m, p in zip(ragged_m, ragged_p)]
    )
    assert np.allclose(rgc, refc)


def test_jax_input():
    import jax.numpy as jnp

    com = molecule.center_of_mass(
        masses=jnp.asarray(masses[0]), positions=jnp.asarray(positions[0])
    )
    assert np.allclose(
        np.asarray(com), oracle_com(masses[0], positions[0])
    )
