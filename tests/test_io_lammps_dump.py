"""LAMMPS dump reader: column layouts (wrapped/scaled/unwrapped,
image flags), triclinic bounds inversion, unsorted ids, gzip, and
analysis integration."""

import gzip

import numpy as np
import pytest

from mdhelper_tpu.core.trajectory import (
    LAMMPSDumpReader,
    open_trajectory,
)
from mdhelper_tpu.io.lammps_dump import LAMMPSDumpFile, read_lammps_dump

rng = np.random.default_rng(5)


def _dump_text(
    frames,
    box,
    *,
    columns="id type x y z",
    scaled=False,
    shuffle=False,
    images=None,
    tilt=None,
):
    """Serialize (F, N, 3) wrapped coordinates as a dump string."""

    out = []
    n_atoms = frames.shape[1]
    for f, pos in enumerate(frames):
        out += ["ITEM: TIMESTEP", str(100 * f)]
        out += ["ITEM: NUMBER OF ATOMS", str(n_atoms)]
        if tilt is None:
            out += [
                "ITEM: BOX BOUNDS pp pp pp",
                f"0.0 {box[0]}",
                f"0.0 {box[1]}",
                f"0.0 {box[2]}",
            ]
        else:
            xy, xz, yz = tilt
            xlo_b = 0.0 + min(0.0, xy, xz, xy + xz)
            xhi_b = box[0] + max(0.0, xy, xz, xy + xz)
            ylo_b = 0.0 + min(0.0, yz)
            yhi_b = box[1] + max(0.0, yz)
            out += [
                "ITEM: BOX BOUNDS xy xz yz pp pp pp",
                f"{xlo_b} {xhi_b} {xy}",
                f"{ylo_b} {yhi_b} {xz}",
                f"0.0 {box[2]} {yz}",
            ]
        out.append(f"ITEM: ATOMS {columns}")
        order = (
            rng.permutation(n_atoms) if shuffle else np.arange(n_atoms)
        )
        for i in order:
            row = [str(i + 1), "1"]
            xyz = pos[i] / box if scaled else pos[i]
            row += [f"{v:.10g}" for v in xyz]
            if images is not None:
                row += [str(int(v)) for v in images[f, i]]
            out.append(" ".join(row))
    return "\n".join(out) + "\n"


def test_dump_basic_and_sorting(tmp_path):
    box = np.array([10.0, 11.0, 12.0])
    frames = rng.random((3, 20, 3)) * box
    path = tmp_path / "traj.lammpstrj"
    path.write_text(_dump_text(frames, box, shuffle=True))

    pos, dims, steps = read_lammps_dump(str(path))
    np.testing.assert_allclose(pos, frames, atol=1e-8)
    np.testing.assert_allclose(
        dims, np.tile([*box, 90, 90, 90], (3, 1))
    )
    np.testing.assert_array_equal(steps, [0, 100, 200])


def test_dump_scaled_and_unwrapped(tmp_path):
    box = np.array([8.0, 8.0, 8.0])
    frames = rng.random((2, 15, 3)) * box
    scaled_path = tmp_path / "scaled.dump"
    scaled_path.write_text(
        _dump_text(
            frames, box, columns="id type xs ys zs", scaled=True
        )
    )
    pos, _, _ = read_lammps_dump(str(scaled_path))
    np.testing.assert_allclose(pos, frames, atol=1e-7)

    # Image flags unwrap: xu = x + i * L.
    images = rng.integers(-2, 3, size=(2, 15, 3))
    img_path = tmp_path / "images.dump"
    img_path.write_text(
        _dump_text(
            frames, box, columns="id type x y z ix iy iz",
            images=images,
        )
    )
    pos, _, _ = read_lammps_dump(str(img_path))
    np.testing.assert_allclose(
        pos, frames + images * box, atol=1e-8
    )


def test_dump_triclinic_bounds_inversion(tmp_path):
    box = np.array([10.0, 9.0, 8.0])
    tilt = (2.0, -1.0, 1.5)  # xy, xz, yz
    frames = rng.random((2, 10, 3)) * box
    path = tmp_path / "tri.dump"
    path.write_text(_dump_text(frames, box, tilt=tilt))
    _, dims, _ = read_lammps_dump(str(path))
    xy, xz, yz = tilt
    h = np.array([[box[0], 0, 0], [xy, box[1], 0], [xz, yz, box[2]]])
    lengths = np.linalg.norm(h, axis=1)
    np.testing.assert_allclose(dims[0, :3], lengths)
    gamma = np.degrees(np.arccos(xy / lengths[1]))
    beta = np.degrees(np.arccos(xz / lengths[2]))
    alpha = np.degrees(
        np.arccos((xy * xz + box[1] * yz) / (lengths[1] * lengths[2]))
    )
    np.testing.assert_allclose(dims[0, 3:], [alpha, beta, gamma])


def test_dump_gzip_and_reader(tmp_path):
    box = np.array([6.0, 6.0, 6.0])
    frames = rng.random((4, 12, 3)) * box
    path = tmp_path / "traj.lammpstrj.gz"
    with gzip.open(path, "wt") as fh:
        fh.write(_dump_text(frames, box))

    reader = open_trajectory(str(path), dt=0.001)
    assert isinstance(reader, LAMMPSDumpReader)
    assert reader.n_frames == 4 and reader.n_atoms == 12
    # dt applies per STEP (steps are 0, 100, 200, ...).
    assert np.isclose(reader.times[1], 0.1)
    np.testing.assert_allclose(
        reader[2].positions, frames[2], atol=1e-8
    )
    batch, dims = reader.read_frames([1, 3])
    np.testing.assert_allclose(batch[1], frames[3], atol=1e-8)


def test_dump_rdf_integration(tmp_path):
    from mdhelper_tpu.analysis.structure import (
        RadialDistributionFunction,
    )
    from mdhelper_tpu.core.universe import Topology, Universe

    box = np.array([9.0, 9.0, 9.0])
    frames = rng.random((3, 40, 3)) * box
    path = tmp_path / "rdf.lammpstrj"
    path.write_text(_dump_text(frames, box))
    u_file = Universe(Topology(40), open_trajectory(str(path)))
    u_arr = Universe.from_arrays(frames, np.array([*box, 90, 90, 90]))
    kwargs = dict(
        n_bins=16, range=(0.0, 4.0), exclusion=(1, 1), verbose=False
    )
    c1 = RadialDistributionFunction(u_file.atoms, **kwargs).run()
    c2 = RadialDistributionFunction(u_arr.atoms, **kwargs).run()
    np.testing.assert_allclose(
        c1.results.counts, c2.results.counts, atol=2
    )


def test_dump_errors(tmp_path):
    path = tmp_path / "bad.dump"
    path.write_text("ITEM: WRONG\n")
    with pytest.raises(ValueError, match="TIMESTEP"):
        LAMMPSDumpFile(str(path))


def test_xyz_reader(tmp_path):
    from mdhelper_tpu.core.trajectory import XYZReader

    coords = rng.random((3, 4, 3)) * 8
    lines = []
    for frame in coords:
        lines.append("4")
        lines.append("comment")
        for sym, row in zip(("C", "H", "H", "O"), frame):
            lines.append(
                f"{sym} {row[0]:.8f} {row[1]:.8f} {row[2]:.8f}"
            )
    path = tmp_path / "traj.xyz"
    path.write_text("\n".join(lines) + "\n")

    r = open_trajectory(str(path), dt=0.5)
    assert isinstance(r, XYZReader)
    assert r.n_frames == 3 and r.n_atoms == 4
    assert list(r.symbols) == ["C", "H", "H", "O"]
    np.testing.assert_allclose(r[1].positions, coords[1], atol=1e-7)
    assert np.isclose(r[2].time, 1.0)


def test_universe_from_xyz(tmp_path):
    from mdhelper_tpu.core.universe import Universe

    coords = rng.random((2, 3, 3)) * 5
    lines = []
    for frame in coords:
        lines.append("3")
        lines.append("water-ish")
        for sym, row in zip(("O", "H", "H"), frame):
            lines.append(
                f"{sym} {row[0]:.6f} {row[1]:.6f} {row[2]:.6f}"
            )
    path = tmp_path / "mol.xyz"
    path.write_text("\n".join(lines) + "\n")

    u = Universe.from_files(str(path))
    assert u.trajectory.n_frames == 2
    assert u.select_atoms("type H").n_atoms == 2
    np.testing.assert_allclose(
        u.atoms.masses, [15.999, 1.008, 1.008]
    )


def test_dump_writer_round_trip(tmp_path):
    """write_lammps_dump -> read_lammps_dump round trip, orthorhombic
    and triclinic boxes, gz streaming."""

    from mdhelper_tpu.io.lammps_dump import (
        LAMMPSDumpWriter,
        read_lammps_dump,
        write_lammps_dump,
    )

    r = np.random.default_rng(3)
    F, N = 4, 17
    dims = np.array([8.0, 7.0, 6.0, 90.0, 90.0, 90.0])
    pos = r.random((F, N, 3)) * dims[:3]
    path = str(tmp_path / "t.dump")
    write_lammps_dump(path, pos, dims, steps=np.arange(0, 40, 10))
    frames, boxes, steps = read_lammps_dump(path)
    np.testing.assert_allclose(frames, pos, rtol=1e-9)
    np.testing.assert_allclose(boxes[0], dims, atol=1e-9)
    np.testing.assert_array_equal(steps, [0, 10, 20, 30])

    # Triclinic: dimensions survive the bounding-box extension.
    from mdhelper_tpu.algorithm.topology import triclinic_matrices

    dims6 = np.array([8.0, 7.0, 6.0, 80.0, 95.0, 100.0])
    mat = np.asarray(triclinic_matrices(dims6))
    tpos = r.random((2, N, 3)) @ mat
    tpath = str(tmp_path / "tric.dump.gz")
    with LAMMPSDumpWriter(tpath) as w:
        for f in range(2):
            w.write(tpos[f], dims6)
    tframes, tboxes, _ = read_lammps_dump(tpath)
    np.testing.assert_allclose(tframes, tpos, rtol=1e-8)
    np.testing.assert_allclose(tboxes[0], dims6, atol=1e-7)
