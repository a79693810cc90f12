"""Structure writers (PDB/GRO/XYZ) round-trip through this package's
own readers — the write-side complement the reference gets from
MDAnalysis (`u.atoms.write(...)`)."""

import numpy as np
import pytest

from mdhelper_tpu.core.universe import Universe
from mdhelper_tpu.io.structure_writers import (
    write_gro,
    write_pdb,
    write_xyz,
)
from mdhelper_tpu.io.topology_files import read_gro, read_pdb

rng = np.random.default_rng(13)


def _universe(n=9, n_frames=3, box=12.0):
    pos = rng.random((n_frames, n, 3)) * box
    return Universe.from_arrays(
        pos,
        np.array([box] * 3),
        masses=np.ones(n),
        charges=np.zeros(n),
        types=np.array(["C", "O", "N"] * (n // 3), dtype=object),
        names=np.array(
            ["CA", "OW1", "N", "CB", "OW2", "NZ", "CG", "OW3", "NH"],
            dtype=object,
        )[:n],
        resnames=np.array(["ALA", "SOL", "LYS"] * (n // 3),
                          dtype=object),
        resindices=np.repeat(np.arange(3), 3)[:n],
        segindices=np.zeros(n, int),
    ), pos


def test_pdb_round_trip():
    u, pos = _universe()
    u.atoms.write("/tmp/mdtpu_rt.pdb")
    data = read_pdb("/tmp/mdtpu_rt.pdb")
    assert data["n_atoms"] == 9
    np.testing.assert_allclose(
        data["positions"], pos[0], atol=5e-4
    )
    np.testing.assert_array_equal(data["names"], u.atoms.names)
    np.testing.assert_array_equal(
        data["resnames"], u.atoms.resnames
    )
    np.testing.assert_allclose(
        data["dimensions"], [12, 12, 12, 90, 90, 90], atol=1e-3
    )


def test_pdb_multi_model_trajectory():
    u, pos = _universe()
    write_pdb(
        "/tmp/mdtpu_models.pdb",
        pos,
        names=u.atoms.names,
        resnames=u.atoms.resnames,
        dimensions=u.dimensions,
    )
    data = read_pdb("/tmp/mdtpu_models.pdb")
    assert data["trajectory"].shape == pos.shape
    np.testing.assert_allclose(data["trajectory"], pos, atol=5e-4)
    # And the Universe entry point reads it back as a trajectory.
    u2 = Universe.from_files("/tmp/mdtpu_models.pdb")
    assert u2.trajectory.n_frames == 3


def test_gro_round_trip():
    u, pos = _universe()
    u.atoms.write("/tmp/mdtpu_rt.gro")
    data = read_gro("/tmp/mdtpu_rt.gro")
    assert data["n_atoms"] == 9
    # .gro stores nm with 3 decimals: 0.01 A resolution.
    np.testing.assert_allclose(
        data["positions"], pos[0], atol=5.1e-3
    )
    np.testing.assert_array_equal(data["names"], u.atoms.names)
    np.testing.assert_allclose(
        data["dimensions"], [12, 12, 12, 90, 90, 90], atol=1e-3
    )


def test_gro_triclinic_box_and_velocities():
    n = 4
    pos = rng.random((n, 3)) * 5.0
    vel = rng.standard_normal((n, 3))
    dims = np.array([8.0, 7.0, 6.0, 80.0, 95.0, 100.0])
    write_gro(
        "/tmp/mdtpu_tric.gro", pos, dimensions=dims,
        velocities=vel,
    )
    data = read_gro("/tmp/mdtpu_tric.gro")
    np.testing.assert_allclose(data["dimensions"], dims, atol=2e-2)
    np.testing.assert_allclose(data["positions"], pos, atol=5.1e-3)


def test_xyz_round_trip_through_universe():
    u, pos = _universe()
    write_xyz("/tmp/mdtpu_rt.xyz", pos, symbols=u.atoms.types)
    u2 = Universe.from_files("/tmp/mdtpu_rt.xyz")
    assert u2.trajectory.n_frames == 3
    frames, _ = u2.trajectory.read_frames(np.arange(3))
    np.testing.assert_allclose(frames, pos, atol=1e-7)
    np.testing.assert_array_equal(u2.atoms.types, u.atoms.types)


def test_write_dispatch_errors():
    u, _ = _universe()
    with pytest.raises(ValueError):
        u.atoms.write("/tmp/mdtpu_rt.mol2")


def test_gro_multi_frame_round_trip_through_universe():
    u, pos = _universe()
    write_gro(
        "/tmp/mdtpu_traj.gro", pos,
        names=u.atoms.names, resnames=u.atoms.resnames,
        dimensions=u.dimensions,
    )
    u2 = Universe.from_files("/tmp/mdtpu_traj.gro")
    assert u2.trajectory.n_frames == 3
    frames, dims = u2.trajectory.read_frames(np.arange(3))
    np.testing.assert_allclose(frames, pos, atol=5.1e-3)
    np.testing.assert_allclose(dims[0][:3], 12.0, atol=1e-3)
