"""Tests for the NetCDF-3 codec, the AMBER NetCDFFile layer and the
NetCDF trajectory reader (parity:
/root/reference/tests/test_openmm_file_reporter.py, minus the live
OpenMM simulation which is unavailable here)."""

import numpy as np
import pytest

from mdhelper_tpu.core import NetCDFReader, Universe
from mdhelper_tpu.io.netcdf3 import Dataset
from mdhelper_tpu.openmm.file import NetCDFFile

rng = np.random.default_rng(61)


def test_codec_roundtrip_64bit(tmp_path):
    path = str(tmp_path / "traj.nc")
    ds = Dataset(path, "w", format="NETCDF3_64BIT_OFFSET")
    ds.Conventions = "AMBER"
    ds.history = "created by tests"
    ds.createDimension("frame", None)
    ds.createDimension("atom", 7)
    ds.createDimension("spatial", 3)
    coords = ds.createVariable(
        "coordinates", "f", ("frame", "atom", "spatial")
    )
    coords.units = "angstrom"
    time = ds.createVariable("time", "d", ("frame",))
    fixed = ds.createVariable("masses", "d", ("atom",))
    fixed[:] = np.arange(7.0)
    data = rng.random((5, 7, 3)).astype(np.float32)
    for i in range(5):
        coords[i] = data[i]
        time[i] = 0.25 * i
    ds.close()

    rd = Dataset(path, "r")
    assert rd.Conventions == "AMBER"
    assert rd.dimensions["frame"].size == 5
    assert np.allclose(rd.variables["coordinates"][:], data)
    assert np.allclose(rd.variables["time"][:], 0.25 * np.arange(5))
    assert np.allclose(rd.variables["masses"][:], np.arange(7.0))
    assert rd.variables["coordinates"].units == "angstrom"
    # Partial reads.
    assert np.allclose(rd.variables["coordinates"][2], data[2])
    assert np.allclose(
        rd.variables["coordinates"][[0, 3]], data[[0, 3]]
    )


def test_codec_classic_and_numeric_attrs(tmp_path):
    path = str(tmp_path / "c.nc")
    ds = Dataset(path, "w", format="NETCDF3_CLASSIC")
    ds.createDimension("x", 4)
    v = ds.createVariable("v", "i", ("x",))
    v.scale_factor = 2.5
    v.flags = np.array([1, 2, 3], dtype=np.int32)
    v[:] = [10, 20, 30, 40]
    ds.close()
    rd = Dataset(path, "r")
    assert rd._version == 1
    assert np.allclose(float(rd.variables["v"].scale_factor), 2.5)
    assert np.array_equal(rd.variables["v"].flags, [1, 2, 3])
    assert np.array_equal(rd.variables["v"][:], [10, 20, 30, 40])


def test_netcdffile_trajectory_roundtrip(tmp_path):
    path = str(tmp_path / "amber")
    out = NetCDFFile(path, "w")
    out.write_header(N=6, cell=True, velocities=True, forces=True)
    coords = rng.random((3, 6, 3)) * 10
    vels = rng.random((3, 6, 3))
    frcs = rng.random((3, 6, 3))
    for i in range(3):
        out.write_model(
            float(i),
            coords[i],
            vels[i],
            frcs[i],
            np.array([10.0, 11.0, 12.0]),
            np.array([90.0, 90.0, 90.0]),
        )
    out._nc.close()

    traj = NetCDFFile(path + ".nc", "r")
    assert traj.get_num_frames() == 3
    assert traj.get_num_atoms() == 6
    assert np.allclose(traj.get_times(units=False), [0, 1, 2])
    assert np.allclose(
        traj.get_positions(units=False), coords, atol=1e-6
    )
    assert np.allclose(
        traj.get_velocities(units=False), vels, atol=1e-6
    )
    assert np.allclose(traj.get_forces(units=False), frcs, atol=1e-6)
    lengths, angles = traj.get_dimensions(units=False)
    assert np.allclose(lengths, [10, 11, 12])
    assert np.allclose(angles, 90)
    # Unit-tagged getters return Quantity objects.
    times_q = traj.get_times()
    assert np.allclose(times_q.m_as("picosecond"), [0, 1, 2])
    # AMBER convention metadata.
    assert traj._nc.Conventions == "AMBER"
    assert traj._nc.ConventionVersion == "1.0"
    assert float(traj._nc.variables["velocities"].scale_factor) == (
        20.455
    )


def test_netcdffile_static_write_model(tmp_path):
    path = str(tmp_path / "static")
    coords = rng.random((4, 3)) * 5
    nc = NetCDFFile.write_model(path, 0.5, coords)
    nc.write_model(1.0, coords + 1)
    nc._nc.close()
    traj = NetCDFFile(path + ".nc", "r")
    assert traj.get_num_frames() == 2
    assert np.allclose(
        traj.get_positions(units=False)[1], coords + 1, atol=1e-6
    )


def test_netcdffile_missing_optionals_warn(tmp_path):
    path = str(tmp_path / "min")
    out = NetCDFFile(path, "w")
    out.write_header(N=2, cell=False, velocities=False, forces=False)
    out.write_model(0.0, rng.random((2, 3)))
    out._nc.close()
    traj = NetCDFFile(path + ".nc", "r")
    with pytest.warns(UserWarning):
        assert traj.get_velocities() is None
    with pytest.warns(UserWarning):
        assert traj.get_forces() is None


def test_netcdf_trajectory_reader_universe(tmp_path):
    path = str(tmp_path / "u")
    coords = rng.random((6, 8, 3)) * 10
    out = NetCDFFile(path, "w")
    out.write_header(N=8, cell=True, velocities=False, forces=False)
    for i in range(6):
        out.write_model(
            0.5 * i, coords[i], None, None,
            np.array([10.0, 10.0, 10.0]), np.array([90.0, 90.0, 90.0]),
        )
    out._nc.close()

    reader = NetCDFReader(path + ".nc")
    assert reader.n_frames == 6 and reader.n_atoms == 8
    assert np.isclose(reader.dt, 0.5)
    frame = reader[2]
    assert np.allclose(frame.positions, coords[2], atol=1e-6)
    assert np.allclose(frame.dimensions, [10, 10, 10, 90, 90, 90])

    # Full pipeline: Universe over a NetCDF trajectory -> RDF runs.
    from mdhelper_tpu.analysis.structure import (
        RadialDistributionFunction,
    )
    from mdhelper_tpu.core import Topology

    u = Universe(Topology(8), reader)
    rdf = RadialDistributionFunction(
        u.atoms, n_bins=10, range=(0.0, 4.0), exclusion=(1, 1),
        verbose=False,
    ).run()
    assert rdf.results.counts.sum() > 0
