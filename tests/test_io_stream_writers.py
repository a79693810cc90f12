"""Streaming trajectory writers (DCDWriter/XTCWriter/TRRWriter +
open_trajectory_writer): frame-at-a-time appends must produce
byte-identical files to the whole-array write_* functions and round-
trip through the readers."""

import numpy as np
import pytest

from mdhelper_tpu.io import open_trajectory_writer
from mdhelper_tpu.io.dcd import read_dcd, write_dcd
from mdhelper_tpu.io.trr import read_trr, write_trr
from mdhelper_tpu.io.xtc import write_xtc

rng = np.random.default_rng(23)
F, N = 5, 37


def _traj():
    return rng.random((F, N, 3)) * 4.0


def test_dcd_stream_matches_batch(tmp_path):
    pos = _traj()
    cells = np.tile([4.0, 4.0, 4.0, 90.0, 90.0, 90.0], (F, 1))
    batch, stream = tmp_path / "b.dcd", tmp_path / "s.dcd"
    write_dcd(str(batch), pos, cells)
    with open_trajectory_writer(str(stream), n_atoms=N) as w:
        for f in range(F):
            w.write(pos[f], cells[f])
    assert batch.read_bytes() == stream.read_bytes()
    out, out_cells, header = read_dcd(str(stream))
    np.testing.assert_allclose(out, pos, atol=1e-6)
    np.testing.assert_allclose(out_cells, cells, atol=1e-6)
    assert header["has_unitcell"]


def test_dcd_stream_no_cell_and_mismatch(tmp_path):
    pos = _traj()
    batch, stream = tmp_path / "b.dcd", tmp_path / "s.dcd"
    write_dcd(str(batch), pos)
    with open_trajectory_writer(str(stream), n_atoms=N) as w:
        for f in range(F):
            w.write(pos[f])
    assert batch.read_bytes() == stream.read_bytes()

    with open_trajectory_writer(str(stream), n_atoms=N) as w:
        w.write(pos[0])
        with pytest.raises(ValueError):
            w.write(pos[1], [4, 4, 4, 90, 90, 90])


def test_xtc_stream_matches_batch(tmp_path):
    pos = _traj()
    box = np.eye(3) * 4.0
    boxes = np.tile(box, (F, 1, 1))
    batch, stream = tmp_path / "b.xtc", tmp_path / "s.xtc"
    write_xtc(str(batch), pos, boxes, dt=2.0)
    with open_trajectory_writer(str(stream), dt=2.0) as w:
        for f in range(F):
            w.write(pos[f], box)
    assert batch.read_bytes() == stream.read_bytes()


def test_trr_stream_matches_batch(tmp_path):
    pos = _traj()
    vel = rng.standard_normal((F, N, 3))
    box = np.eye(3) * 4.0
    batch, stream = tmp_path / "b.trr", tmp_path / "s.trr"
    write_trr(
        str(batch), pos, np.tile(box, (F, 1, 1)),
        velocities=vel, double=True,
    )
    with open_trajectory_writer(str(stream), double=True) as w:
        for f in range(F):
            w.write(pos[f], box, velocities=vel[f])
    assert batch.read_bytes() == stream.read_bytes()
    out, boxes_out, steps, times = read_trr(str(stream))
    np.testing.assert_allclose(out, pos)
    np.testing.assert_allclose(
        boxes_out, np.tile(box, (F, 1, 1))
    )
    np.testing.assert_array_equal(steps, np.arange(F))


def test_writer_dispatch_errors(tmp_path):
    with pytest.raises(ValueError):
        open_trajectory_writer(str(tmp_path / "x.dcd"))  # n_atoms
    with pytest.raises(ValueError):
        open_trajectory_writer(str(tmp_path / "x.pdb"))


def test_xtc_trr_atom_count_validation(tmp_path):
    pos = _traj()
    for ext in ("xtc", "trr"):
        path = str(tmp_path / f"v.{ext}")
        with open_trajectory_writer(path, n_atoms=N) as w:
            w.write(pos[0])
            with pytest.raises(ValueError):
                w.write(pos[1, : N - 1])
        # Count inferred from the first frame when not given.
        with open_trajectory_writer(path) as w:
            w.write(pos[0])
            with pytest.raises(ValueError):
                w.write(pos[1, : N - 1])


def test_dump_writer_dispatch(tmp_path):
    from mdhelper_tpu.io.lammps_dump import read_lammps_dump

    pos = _traj()
    path = str(tmp_path / "s.lammpstrj")
    with open_trajectory_writer(path) as w:
        for f in range(F):
            w.write(pos[f], [4.0, 4.0, 4.0])
    frames, boxes, steps = read_lammps_dump(path)
    np.testing.assert_allclose(frames, pos, rtol=1e-9)
    np.testing.assert_array_equal(steps, np.arange(F))
