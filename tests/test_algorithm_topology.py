"""Tests for mdhelper_tpu.algorithm.topology (parity:
/root/reference/tests/test_algorithm_topology.py)."""

import numpy as np
import pytest

from mdhelper_tpu.algorithm import topology

rng = np.random.default_rng(11)


def test_create_atoms_errors():
    dims = np.array([10.0, 10.0, 10.0])
    with pytest.raises(ValueError):
        topology.create_atoms(dims)  # N missing
    with pytest.raises(ValueError):
        topology.create_atoms(dims, N=10.5)
    with pytest.raises(ValueError):
        topology.create_atoms(dims, N=10, N_p=0)
    with pytest.raises(ValueError):
        topology.create_atoms(dims, N=10, N_p=3)  # not divisible


def test_create_atoms_random_melt():
    dims = np.array([8.0, 9.0, 10.0])
    pos = topology.create_atoms(dims, N=500)
    assert pos.shape == (500, 3)
    assert (pos >= 0).all() and (pos <= dims).all()


def test_create_atoms_polymers():
    dims = np.array([10.0, 10.0, 10.0])
    pos, bonds, angles, dihedrals = topology.create_atoms(
        dims, N=64, N_p=8, length=0.5, bonds=True, angles=True,
        dihedrals=True, wrap=True,
    )
    assert pos.shape == (64, 3)
    assert bonds.shape == (8 * 7, 2)
    assert angles.shape == (8 * 6, 3)
    assert dihedrals.shape == (8 * 5, 4)
    # Bond lengths equal the random-walk step (before wrapping, chains
    # are replicas; check an interior unwrapped chain's first bond).
    assert (pos >= 0).all() and (pos <= dims + 1e-9).all()
    # No bond crosses chain boundaries.
    assert (bonds[:, 0] // 8 == bonds[:, 1] // 8).all()


def test_create_atoms_lattices():
    dims = np.array([5.0, 5.0, 5.0])
    for lattice in ("cubic", "fcc", "hcp", "honeycomb"):
        pos, real_dims = topology.create_atoms(
            dims, lattice=lattice, length=1.0
        )
        assert pos.ndim == 2 and pos.shape[1] == 3
        assert len(pos) > 0
        assert (pos <= dims[None] + 1e-9).all()

    # Flexible z=0 slab (wall) for the honeycomb lattice.
    pos, real_dims = topology.create_atoms(
        np.array([5.0, 5.0, 0.0]), lattice="honeycomb", length=0.5,
        flexible=True,
    )
    assert np.allclose(pos[:, 2], 0)
    assert real_dims[2] == 0


def test_wrap():
    dims = np.array([10.0, 10.0, 10.0])
    pos = np.array([[-1.0, 5.0, 11.0], [3.0, -12.0, 25.0]])
    wrapped = topology.wrap(pos, dims, in_place=False)
    assert np.allclose(wrapped, [[9.0, 5.0, 1.0], [3.0, 8.0, 5.0]])
    # In-place for NumPy.
    pos2 = pos.copy()
    assert topology.wrap(pos2, dims) is None
    assert np.allclose(pos2, wrapped)
    # Exactly on the upper boundary stays put (reference semantics).
    edge = np.array([[10.0, 0.0, 10.0]])
    assert np.allclose(
        topology.wrap(edge, dims, in_place=False), edge
    )
    # JAX arrays round-trip.
    import jax.numpy as jnp

    jwrapped = topology.wrap(jnp.asarray(pos), jnp.asarray(dims))
    assert np.allclose(np.asarray(jwrapped), wrapped)


def test_unwrap():
    dims = np.array([10.0, 10.0, 10.0])
    # Particle moves +0.2 per frame, wraps at the boundary.
    true_traj = np.cumsum(np.full((60, 1, 3), 0.2), axis=0)
    wrapped_traj = true_traj - np.floor(true_traj / dims) * dims

    pos_old = wrapped_traj[0].copy()
    images = np.zeros((1, 3), dtype=int)
    unwrapped = [wrapped_traj[0].copy()]
    for frame in wrapped_traj[1:]:
        pos = frame.copy()
        topology.unwrap(pos, pos_old, dims, images=images)
        unwrapped.append(pos)
    assert np.allclose(np.stack(unwrapped), true_traj)


def test_unwrap_out_of_place_and_jax():
    import jax.numpy as jnp

    dims = np.array([10.0, 10.0, 10.0])
    old = np.array([[9.5, 5.0, 0.2]])
    new = np.array([[0.2, 5.1, 9.9]])  # crossed +x and -z boundaries
    pos, pos_old, images = topology.unwrap(
        new.copy(), old.copy(), dims, in_place=False
    )
    assert np.allclose(pos, [[10.2, 5.1, -0.1]])
    assert np.array_equal(images, [[1, 0, -1]])

    jpos, jold, jimages = topology.unwrap(
        jnp.asarray(new), jnp.asarray(old), jnp.asarray(dims)
    )
    assert np.allclose(np.asarray(jpos), pos)
    assert np.array_equal(np.asarray(jimages), images)


def test_minimize_vectors_orthorhombic():
    dims = np.array([10.0, 8.0, 6.0])
    vecs = np.array([[9.0, -7.0, 2.0], [4.9, 4.1, -3.1]])
    out = topology.minimize_vectors(vecs, dims)
    assert np.allclose(out, [[-1.0, 1.0, 2.0], [4.9, -3.9, 2.9]])


def test_minimize_vectors_triclinic():
    dims = np.array([10.0, 10.0, 10.0, 70.0, 80.0, 95.0])
    box = topology.triclinic_vectors(dims)
    vec = np.array([0.3, 0.4, 0.2]) @ box
    # Shift by whole box vectors; minimize must recover the original.
    shifted = vec + 2 * box[0] - box[1] + box[2]
    assert np.allclose(
        topology.minimize_vectors(shifted, dims), vec, atol=1e-9
    )


def test_unwrap_edge_positions():
    dims = np.array([10.0, 10.0, 10.0])
    # A 3-atom molecule straddling the +x boundary: atoms at 9.5, 0.2
    # (=10.2), 0.9 (=10.9).
    positions = np.array(
        [[9.5, 5.0, 5.0], [0.2, 5.0, 5.0], [0.9, 5.0, 5.0]]
    )
    bonds = np.array([[0, 1], [1, 2]])
    masses = np.ones(3)
    out = topology.unwrap_edge(
        positions=positions, bonds=bonds, dimensions=dims, masses=masses
    )
    # Made whole: consecutive gaps of 0.7 in x...
    assert np.allclose(np.diff(out[:, 0]), 0.7)
    # ...and the center of mass is wrapped into the box.
    com = out.mean(axis=0)
    assert (com >= 0).all() and (com <= dims).all()


def test_unwrap_edge_warns_without_masses():
    dims = np.array([10.0, 10.0, 10.0])
    positions = np.array([[9.5, 5.0, 5.0], [0.2, 5.0, 5.0]])
    bonds = np.array([[0, 1]])
    with pytest.warns(UserWarning):
        topology.unwrap_edge(
            positions=positions, bonds=bonds, dimensions=dims
        )


def test_unwrap_edge_errors():
    with pytest.raises(ValueError):
        topology.unwrap_edge()
    with pytest.raises(ValueError):
        topology.unwrap_edge(positions=np.zeros((2, 3)))
    with pytest.raises(ValueError):
        topology.unwrap_edge(
            positions=np.zeros((2, 3)), bonds=np.array([[0, 1]])
        )


def test_guess_bonds():
    """Distance-criterion bond guessing: water finds exactly the O-H
    pairs (no H-H), PBC folds across the boundary, and unknown
    labels error unless overridden."""

    from mdhelper_tpu.algorithm.topology import guess_bonds

    # one water: O-H 0.96 < 0.55*(1.10+1.52); H-H ~1.51 > 0.55*2.20
    pos = np.array(
        [
            [5.0, 5.0, 5.0],
            [5.96, 5.0, 5.0],
            [4.76, 5.93, 5.0],
        ]
    )
    bonds = guess_bonds(["O", "H1", "H2"], pos)
    np.testing.assert_array_equal(bonds, [[0, 1], [0, 2]])

    # periodic: the H sits across the face from its O
    box = np.array([10.0, 10.0, 10.0])
    pos = np.array([[9.8, 5.0, 5.0], [0.3, 5.0, 5.0]])
    np.testing.assert_array_equal(
        guess_bonds(["O", "H"], pos, box), [[0, 1]]
    )
    assert len(guess_bonds(["O", "H"], pos)) == 0  # no box, no bond

    # name resolution follows the mass-guesser convention:
    # leading-organic wins ("CL1" resolves to carbon), and user
    # overrides are matched longest-first BEFORE that rule
    pos = np.array([[0.0, 0, 0], [1.9, 0, 0]])
    assert len(guess_bonds(["CL1", "CL2"], pos)) == 0  # carbon radii
    assert len(
        guess_bonds(["CL1", "CL2"], pos, vdwradii={"CL": 1.75})
    ) == 1
    with pytest.raises(ValueError, match="radius"):
        guess_bonds(["Xx", "O"], pos)
    assert len(
        guess_bonds(["Xx", "O"], pos, vdwradii={"XX": 2.2})
    ) == 1
    # protein-style names: CA is an alpha-carbon, HE1 a hydrogen
    ca_h = np.array([[0.0, 0, 0], [1.0, 0, 0]])
    assert len(guess_bonds(["CA", "HE1"], ca_h)) == 1

    # tiny negative coordinates survive the periodic wrap (x % L can
    # land exactly on L)
    pos = np.array([[-1e-17, 5.0, 5.0], [0.96, 5.0, 5.0]])
    np.testing.assert_array_equal(
        guess_bonds(["O", "H"], pos, np.array([10.0] * 3)), [[0, 1]]
    )

    # Universe integration: guessed bonds drive the bonded analyses
    from mdhelper_tpu.analysis.bonded import BondLengthDistribution
    from mdhelper_tpu.core.universe import Universe

    r = np.random.default_rng(83)
    n_mol, F, L = 5, 3, 20.0
    traj = np.empty((F, 3 * n_mol, 3))
    names = []
    for m in range(n_mol):
        names += ["O", "H1", "H2"]
    for f in range(F):
        centers = np.array(
            [[2.0 + 3.8 * m, 6.0, 6.0] for m in range(n_mol)]
        )
        for m in range(n_mol):
            o = 3 * m
            traj[f, o] = centers[m]
            d1 = r.standard_normal(3)
            d1 /= np.linalg.norm(d1)
            traj[f, o + 1] = centers[m] + 0.96 * d1
            # keep H2 away from H1 so only O-H pairs qualify
            d2 = -d1 + 0.3 * r.standard_normal(3)
            d2 /= np.linalg.norm(d2)
            traj[f, o + 2] = centers[m] + 0.96 * d2
    u = Universe.from_arrays(
        traj % L, np.array([L] * 3),
        names=np.array(names, dtype=object),
    )
    guessed = u.guess_bonds()
    assert len(guessed) == 2 * n_mol
    bl = BondLengthDistribution(
        u.atoms, n_bins=20, range=(0.8, 1.1), verbose=False
    ).run()
    assert bl.results.counts.sum() == 2 * n_mol * F
    np.testing.assert_allclose(bl.results.mean, 0.96, atol=1e-6)


def test_guess_bonds_boxless_xyz_pipeline(tmp_path):
    """Box-less XYZ (zero dimensions) -> guess_bonds ->
    HydrogenBondAnalysis: aperiodic systems must not fold through a
    zero-length box (regression: zero boxes were treated as
    triclinic/periodic and produced NaN memberships)."""

    from mdhelper_tpu.analysis.hbonds import HydrogenBondAnalysis
    from mdhelper_tpu.core.universe import Universe

    n_mol = 5
    lines = []
    for _ in range(2):
        lines.append(f"{3 * n_mol}")
        lines.append("water chain")
        for m in range(n_mol):
            ox = 5.0 + 2.8 * m
            lines.append(f"O  {ox:.4f} 10.0 10.0")
            lines.append(f"H  {ox + 0.96:.4f} 10.0 10.0")
            lines.append(f"H  {ox - 0.3:.4f} 10.9 10.0")
    path = str(tmp_path / "chain.xyz")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")

    u = Universe.from_files(path)
    assert len(u.guess_bonds()) == 2 * n_mol
    hba = HydrogenBondAnalysis(
        u, hydrogens_sel="name H*", acceptors_sel="name O*",
        verbose=False,
    ).run()
    np.testing.assert_array_equal(
        hba.results.counts, [n_mol - 1] * 2
    )
