"""PSF/PDB/GRO topology parsers and Universe.from_files — the
MDAnalysis-style two-file construction the reference's users write
(PSF/DCD and TPR/XTC pairs,
`/root/reference/tests/test_analysis_structure.py:57-66`)."""

import numpy as np
import pytest

from mdhelper_tpu.core.universe import Universe
from mdhelper_tpu.io.topology_files import (
    read_gro,
    read_pdb,
    read_psf,
    read_topology_file,
)

PSF_TEXT = """PSF CMAP

       2 !NTITLE
 REMARKS test fixture
 REMARKS two waters

       6 !NATOM
       1 WAT  1    TIP3 OH2  OT    -0.834000       15.9994           0
       2 WAT  1    TIP3 H1   HT     0.417000        1.0080           0
       3 WAT  1    TIP3 H2   HT     0.417000        1.0080           0
       4 WAT  2    TIP3 OH2  OT    -0.834000       15.9994           0
       5 WAT  2    TIP3 H1   HT     0.417000        1.0080           0
       6 WAT  2    TIP3 H2   HT     0.417000        1.0080           0

       4 !NBOND: bonds
       1       2       1       3       4       5
       4       6

       0 !NTHETA: angles

"""

PDB_TEXT = """\
CRYST1   20.000   21.000   22.000  90.00  90.00  90.00 P 1           1
ATOM      1  N   ALA A   1       1.000   2.000   3.000  1.00  0.00           N
ATOM      2  CA  ALA A   1       2.500   2.000   3.000  1.00  0.00           C
ATOM      3  C   ALA A   1       3.200   3.300   3.000  1.00  0.00           C
ATOM      4  O   ALA A   1       2.600   4.400   3.000  1.00  0.00           O
HETATM    5  O   HOH B   2      10.000  10.000  10.000  1.00  0.00           O
CONECT    1    2
CONECT    2    3
CONECT    3    4    2
END
"""

GRO_TEXT = """Two waters
    6
    1SOL     OW    1   0.100   0.200   0.300
    1SOL    HW1    2   0.190   0.200   0.300
    1SOL    HW2    3   0.100   0.290   0.300
    2SOL     OW    4   0.500   0.500   0.500
    2SOL    HW1    5   0.590   0.500   0.500
    2SOL    HW2    6   0.500   0.590   0.500
   2.00000   2.10000   2.20000
"""


def test_read_psf(tmp_path):
    path = tmp_path / "wat.psf"
    path.write_text(PSF_TEXT)
    top = read_psf(str(path))
    assert top["n_atoms"] == 6
    assert list(top["names"]) == ["OH2", "H1", "H2"] * 2
    assert list(top["types"]) == ["OT", "HT", "HT"] * 2
    np.testing.assert_allclose(
        top["charges"], [-0.834, 0.417, 0.417] * 2
    )
    np.testing.assert_allclose(
        top["masses"], [15.9994, 1.008, 1.008] * 2
    )
    np.testing.assert_array_equal(top["resids"], [1, 1, 1, 2, 2, 2])
    np.testing.assert_array_equal(
        top["resindices"], [0, 0, 0, 1, 1, 1]
    )
    np.testing.assert_array_equal(
        top["bonds"], [[0, 1], [0, 2], [3, 4], [3, 5]]
    )


def test_read_pdb(tmp_path):
    path = tmp_path / "ala.pdb"
    path.write_text(PDB_TEXT)
    top = read_pdb(str(path))
    assert top["n_atoms"] == 5
    assert list(top["names"]) == ["N", "CA", "C", "O", "O"]
    assert list(top["types"]) == ["N", "C", "C", "O", "O"]
    # Masses from the element column: CA is a carbon here.
    np.testing.assert_allclose(
        top["masses"], [14.007, 12.011, 12.011, 15.999, 15.999]
    )
    np.testing.assert_array_equal(top["resindices"], [0, 0, 0, 0, 1])
    np.testing.assert_array_equal(top["segindices"], [0, 0, 0, 0, 1])
    # CONECT dedup: 2-3 appears twice.
    np.testing.assert_array_equal(
        top["bonds"], [[0, 1], [1, 2], [2, 3]]
    )
    np.testing.assert_allclose(top["positions"][0], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(
        top["dimensions"], [20, 21, 22, 90, 90, 90]
    )


def test_read_gro(tmp_path):
    path = tmp_path / "wat.gro"
    path.write_text(GRO_TEXT)
    top = read_gro(str(path))
    assert top["n_atoms"] == 6
    assert list(top["names"]) == ["OW", "HW1", "HW2"] * 2
    # nm -> Angstrom.
    np.testing.assert_allclose(top["positions"][0], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(
        top["dimensions"], [20, 21, 22, 90, 90, 90]
    )
    # Name-based mass guessing: OW -> oxygen, HW -> hydrogen.
    np.testing.assert_allclose(
        top["masses"], [15.999, 1.008, 1.008] * 2
    )
    np.testing.assert_array_equal(
        top["resindices"], [0, 0, 0, 1, 1, 1]
    )


def test_universe_from_files_psf_dcd(tmp_path):
    from mdhelper_tpu.io.dcd import write_dcd

    psf = tmp_path / "wat.psf"
    psf.write_text(PSF_TEXT)
    rng = np.random.default_rng(0)
    pos = (rng.random((5, 6, 3)) * 12).astype(np.float32)
    dcd = tmp_path / "wat.dcd"
    write_dcd(dcd, pos, np.array([12.0] * 3 + [90.0] * 3))

    u = Universe.from_files(str(psf), str(dcd))
    assert u.atoms.n_atoms == 6
    assert u.trajectory.n_frames == 5
    np.testing.assert_allclose(
        u.trajectory[2].positions, pos[2], atol=1e-6
    )
    # Topology-driven selections + fragments work end-to-end.
    assert u.select_atoms("charge < 0").n_atoms == 2
    assert len(u.atoms.fragments) == 2
    waters = u.select_atoms("type OT HT")
    assert waters.n_atoms == 6


def test_universe_from_files_gro_only(tmp_path):
    gro = tmp_path / "wat.gro"
    gro.write_text(GRO_TEXT)
    u = Universe.from_files(str(gro))
    assert u.trajectory.n_frames == 1
    np.testing.assert_allclose(
        u.atoms.positions[0], [1.0, 2.0, 3.0]
    )
    np.testing.assert_allclose(
        u.dimensions[:3], [20, 21, 22]
    )


def test_universe_from_files_pdb_xtc(tmp_path):
    from mdhelper_tpu.io.xtc import write_xtc

    pdb = tmp_path / "ala.pdb"
    pdb.write_text(PDB_TEXT)
    pos_nm = np.random.default_rng(1).random((3, 5, 3)).astype(
        np.float32
    )
    xtc = tmp_path / "ala.xtc"
    write_xtc(xtc, pos_nm, np.diag([2.0, 2.1, 2.2]))
    u = Universe.from_files(str(pdb), str(xtc))
    assert u.trajectory.n_frames == 3
    assert u.select_atoms("mass > 13").n_atoms == 3  # N, O, O


def test_universe_from_files_errors(tmp_path):
    psf = tmp_path / "wat.psf"
    psf.write_text(PSF_TEXT)
    with pytest.raises(ValueError, match="no coordinates"):
        Universe.from_files(str(psf))
    with pytest.raises(ValueError, match="Unsupported topology"):
        read_topology_file("top.weird")
    bad = tmp_path / "bad.psf"
    bad.write_text("not a psf")
    with pytest.raises(ValueError, match="not a PSF"):
        read_psf(str(bad))


def test_pdb_multi_model(tmp_path):
    """Multi-MODEL PDBs become a whole trajectory (MDAnalysis
    convention)."""

    base = (
        "CRYST1   10.000   10.000   10.000  90.00  90.00  90.00 P 1\n"
    )
    models = []
    rng_local = np.random.default_rng(3)
    coords = rng_local.random((3, 2, 3)) * 9
    for m in range(3):
        rows = [f"MODEL     {m + 1}"]
        for a in range(2):
            x, y, z = coords[m, a]
            rows.append(
                f"ATOM  {a + 1:>5}  O   HOH A{a + 1:>4}    "
                f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           O"
            )
        rows.append("ENDMDL")
        models.append("\n".join(rows))
    path = tmp_path / "multi.pdb"
    path.write_text(base + "\n".join(models) + "\nEND\n")

    u = Universe.from_files(str(path))
    assert u.trajectory.n_frames == 3
    np.testing.assert_allclose(
        u.trajectory[2].positions, coords[2], atol=1e-3
    )

    bad = base + models[0] + "\nMODEL 2\nATOM      1  O   HOH A   1" \
        "       1.000   1.000   1.000  1.00  0.00           O\n" \
        "ATOM      2  O   HOH A   2       1.000   1.000   1.000" \
        "  1.00  0.00           O\nATOM      3  O   HOH A   3    " \
        "   1.000   1.000   1.000  1.00  0.00           O\nENDMDL\n"
    bad_path = tmp_path / "bad.pdb"
    bad_path.write_text(bad)
    with pytest.raises(ValueError, match="MODEL"):
        read_pdb(str(bad_path))


def test_lammps_data_roundtrip(tmp_path):
    """read_lammps_data inverts lammps.topology.write_data
    (atom_style full)."""

    from mdhelper_tpu.io.topology_files import read_lammps_data
    from mdhelper_tpu.lammps.topology import write_data

    rng_local = np.random.default_rng(9)
    pos_a = rng_local.random((4, 3)) * 10
    pos_b = rng_local.random((6, 3)) * 10
    path = tmp_path / "system.data"
    write_data(
        str(path),
        [pos_a, pos_b],
        dimensions=np.array([10.0, 10.0, 10.0]),
        masses=[12.0, 1.0],
        charges=[0.5, -1.0 / 3.0],
        bonds=[np.array([[1, 2], [3, 4]]), np.array([[5, 6]])],
    )

    top = read_lammps_data(str(path))
    assert top["n_atoms"] == 10
    assert list(top["types"]) == ["1"] * 4 + ["2"] * 6
    np.testing.assert_allclose(
        top["masses"], [12.0] * 4 + [1.0] * 6
    )
    np.testing.assert_allclose(
        top["charges"], [0.5] * 4 + [-1.0 / 3.0] * 6, atol=1e-6
    )
    np.testing.assert_allclose(
        top["positions"], np.concatenate((pos_a, pos_b)), atol=1e-5
    )
    np.testing.assert_allclose(
        top["dimensions"], [10, 10, 10, 90, 90, 90]
    )
    np.testing.assert_array_equal(
        top["bonds"], [[0, 1], [2, 3], [4, 5]]
    )

    # And a Universe builds straight from it (+ dump trajectory).
    u = Universe.from_files(str(path))
    assert u.select_atoms("charge < 0").n_atoms == 6


def test_pdb_trajectory_reader(tmp_path):
    from mdhelper_tpu.core.trajectory import PDBReader, open_trajectory

    base = (
        "CRYST1   10.000   10.000   10.000  90.00  90.00  90.00 P 1\n"
    )
    rng_local = np.random.default_rng(4)
    coords = rng_local.random((2, 3, 3)) * 9
    rows = [base.rstrip("\n")]
    for m in range(2):
        rows.append(f"MODEL     {m + 1}")
        for a in range(3):
            x, y, z = coords[m, a]
            rows.append(
                f"ATOM  {a + 1:>5}  C   LIG A   1    "
                f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           C"
            )
        rows.append("ENDMDL")
    path = tmp_path / "traj.pdb"
    path.write_text("\n".join(rows) + "\nEND\n")

    r = open_trajectory(str(path))
    assert isinstance(r, PDBReader)
    assert r.n_frames == 2 and r.n_atoms == 3
    np.testing.assert_allclose(r[1].positions, coords[1], atol=1e-3)
    np.testing.assert_allclose(
        r[0].dimensions, [10, 10, 10, 90, 90, 90]
    )


GMX_SOL_ITP = """\
; TIP3P water
[ moleculetype ]
SOL  2

[ atoms ]
; nr type resnr residue atom cgnr charge mass
 1  OW   1  SOL  OW  1  -0.834  15.9994
 2  HW   1  SOL  HW1 1   0.417   1.008
 3  HW   1  SOL  HW2 1   0.417   1.008

#ifdef FLEXIBLE
[ bonds ]
1 2 1
1 3 1
#else
[ settles ]
1 1 0.09572 0.15139
#endif
"""

GMX_TOP = """\
; test system
#define _FF_TEST
#include "ions.itp"
#include "sol.itp"
#include "missing_ff.itp"   ; force-field params not shipped

[ system ]
Salt water

[ molecules ]
; name count
SOL  2
NA   1
CL   1
"""

GMX_IONS_ITP = """\
[ atomtypes ]
; name at.num mass charge ptype sigma epsilon
NA  11  22.9898  1.0  A  0.25840  0.41840
CL  17  35.4530 -1.0  A  0.40448  0.62760

[ moleculetype ]
NA  1
[ atoms ]
; ion mass omitted -> falls back to [ atomtypes ]
 1  NA  1  NA  NA  1  1.0
[ moleculetype ]
CL  1
[ atoms ]
 1  CL  1  CL  CL  1  -1.0
"""


def _write_gmx(tmp_path):
    (tmp_path / "sol.itp").write_text(GMX_SOL_ITP)
    (tmp_path / "ions.itp").write_text(GMX_IONS_ITP)
    top = tmp_path / "system.top"
    top.write_text(GMX_TOP)
    return top


def test_read_gmx_top(tmp_path):
    from mdhelper_tpu.io.topology_files import read_gmx_top

    with pytest.warns(UserWarning, match="missing_ff"):
        parsed = read_gmx_top(str(_write_gmx(tmp_path)))
    assert parsed["n_atoms"] == 8
    assert list(parsed["names"]) == [
        "OW", "HW1", "HW2", "OW", "HW1", "HW2", "NA", "CL",
    ]
    np.testing.assert_allclose(
        parsed["charges"],
        [-0.834, 0.417, 0.417, -0.834, 0.417, 0.417, 1.0, -1.0],
    )
    # Water masses from [ atoms ]; ion masses from [ atomtypes ].
    np.testing.assert_allclose(
        parsed["masses"][[0, 6, 7]], [15.9994, 22.9898, 35.453]
    )
    # Rigid (non-FLEXIBLE) branch: settles become the two O-H bonds,
    # offset per molecule instance.
    np.testing.assert_array_equal(
        parsed["bonds"], [[0, 1], [0, 2], [3, 4], [3, 5]]
    )
    # One residue and one segment per molecule instance.
    np.testing.assert_array_equal(
        parsed["resindices"], [0, 0, 0, 1, 1, 1, 2, 3]
    )
    np.testing.assert_array_equal(
        parsed["segindices"], [0, 0, 0, 1, 1, 1, 2, 3]
    )


def test_read_gmx_top_defines(tmp_path):
    from mdhelper_tpu.io.topology_files import read_gmx_top

    top = _write_gmx(tmp_path)
    with pytest.warns(UserWarning, match="missing_ff"):
        parsed = read_gmx_top(str(top), defines=("FLEXIBLE",))
    # FLEXIBLE branch: explicit harmonic bonds, same connectivity.
    np.testing.assert_array_equal(
        parsed["bonds"], [[0, 1], [0, 2], [3, 4], [3, 5]]
    )


def test_read_gmx_bare_itp(tmp_path):
    """A lone .itp (no [ molecules ]) instantiates each moleculetype
    once."""

    from mdhelper_tpu.io.topology_files import read_gmx_top

    path = tmp_path / "sol.itp"
    path.write_text(GMX_SOL_ITP)
    parsed = read_gmx_top(str(path))
    assert parsed["n_atoms"] == 3
    assert list(parsed["types"]) == ["OW", "HW", "HW"]


def test_gmx_undefined_molecule(tmp_path):
    from mdhelper_tpu.io.topology_files import read_gmx_top

    path = tmp_path / "bad.top"
    path.write_text(
        "[ moleculetype ]\nA 1\n[ atoms ]\n1 X 1 A X 1 0.0 1.0\n"
        "[ system ]\nx\n[ molecules ]\nB 3\n"
    )
    with pytest.raises(ValueError, match="no \\[ moleculetype \\]"):
        read_gmx_top(str(path))


def test_universe_from_files_top_xtc(tmp_path):
    """RDF-ready ingestion from a GROMACS (.top, .xtc) pair."""

    from mdhelper_tpu.io.xtc import write_xtc

    top = _write_gmx(tmp_path)
    rng = np.random.default_rng(11)
    pos = rng.random((3, 8, 3)).astype(np.float32) * 2.0
    xtc = tmp_path / "traj.xtc"
    # write_xtc takes nm; positions convert back to Angstrom on read.
    write_xtc(
        str(xtc), pos / 10.0, np.full((3, 3), 0.2), dt=0.002
    )
    with pytest.warns(UserWarning, match="missing_ff"):
        u = Universe.from_files(str(top), str(xtc))
    assert u.atoms.n_atoms == 8
    # resname/segid ride the selection grammar (MDAnalysis-style).
    assert u.select_atoms("resname SOL").n_atoms == 6
    assert u.select_atoms("segid NA CL").n_atoms == 2
    assert u.select_atoms(
        "resname SOL and not name OW"
    ).n_atoms == 4
    frame = u.trajectory[1]
    np.testing.assert_allclose(
        frame.positions, pos[1] * 1.0, atol=2e-3
    )


def test_gro_trajectory_reader(tmp_path):
    """Multi-frame concatenated .gro (gmx trjconv -o traj.gro) reads
    as a trajectory with per-frame boxes, nm -> Angstrom."""

    rng = np.random.default_rng(5)
    pos = rng.random((3, 2, 3)) * 2.0  # nm
    blocks = []
    for f in range(3):
        rows = [
            f"    1SOL     OW    1{pos[f,0,0]:8.3f}{pos[f,0,1]:8.3f}"
            f"{pos[f,0,2]:8.3f}",
            f"    1SOL    HW1    2{pos[f,1,0]:8.3f}{pos[f,1,1]:8.3f}"
            f"{pos[f,1,2]:8.3f}",
        ]
        blocks += [f"frame {f}", "2", *rows,
                   f"   {2.0 + f:.5f}   2.00000   2.00000"]
    path = tmp_path / "traj.gro"
    path.write_text("\n".join(blocks) + "\n")

    from mdhelper_tpu.core.trajectory import open_trajectory

    reader = open_trajectory(str(path), dt=0.5)
    assert reader.n_frames == 3 and reader.n_atoms == 2
    for f in range(3):
        ts = reader[f]
        np.testing.assert_allclose(
            ts.positions, pos[f] * 10.0, atol=5e-3
        )
        np.testing.assert_allclose(
            ts.dimensions, [20.0 + 10 * f, 20, 20, 90, 90, 90]
        )

    # Pairs with a .top topology through Universe.from_files.
    (tmp_path / "sol.itp").write_text(GMX_SOL_ITP)
    top = tmp_path / "m.top"
    top.write_text(
        '#include "sol.itp"\n[ system ]\nx\n[ molecules ]\nSOL 1\n'
    )
    # SOL has 3 atoms but the fixture has 2 -> mismatch must raise.
    with pytest.raises(ValueError, match="atoms"):
        Universe.from_files(str(top), str(path))


def test_gmx_nested_ifdef(tmp_path):
    """#else under a false OUTER branch must stay suppressed, and
    #define inside a taken branch is honored."""

    path = tmp_path / "cond.itp"
    path.write_text(
        """
#define USE_B
[ moleculetype ]
M 1
[ atoms ]
#ifdef MISSING
#ifdef ALSO_MISSING
 1 X 1 M GHOST1 1 0.0 1.0
#else
 1 X 1 M GHOST2 1 0.0 1.0
#endif
#else
 1 X 1 M REAL 1 0.0 1.0
#ifdef USE_B
 2 X 1 M B 1 0.0 1.0
#endif
#endif
"""
    )
    from mdhelper_tpu.io.topology_files import read_gmx_top

    parsed = read_gmx_top(str(path))
    assert list(parsed["names"]) == ["REAL", "B"]


def test_gro_trailing_content(tmp_path):
    """Trailing blank lines / junk after the last frame parse fine;
    leading junk raises a filename-bearing error."""

    from mdhelper_tpu.core.trajectory import GROReader

    body = (
        "t\n2\n"
        "    1SOL     OW    1   0.100   0.200   0.300\n"
        "    1SOL    HW1    2   0.190   0.200   0.300\n"
        "   2.00000   2.00000   2.00000\n"
    )
    ok1 = tmp_path / "a.gro"
    ok1.write_text(body + "\n\n")
    assert GROReader(str(ok1)).n_frames == 1
    ok2 = tmp_path / "b.gro"
    ok2.write_text(body + "END\n")
    assert GROReader(str(ok2)).n_frames == 1
    bad = tmp_path / "c.gro"
    bad.write_text("garbage\nmore garbage\n" + body)
    with pytest.raises(ValueError, match="frame header"):
        GROReader(str(bad))
    # An EMPTY frame title is legal and kept.
    ok3 = tmp_path / "d.gro"
    ok3.write_text("\n" + body[2:])
    assert GROReader(str(ok3)).n_frames == 1


def test_from_files_multiframe_gro(tmp_path):
    """A multi-frame .gro as the only file yields the FULL
    trajectory (not just the first frame)."""

    body = []
    for f in range(3):
        body += [
            f"frame {f}", "1",
            f"    1SOL     OW    1   {0.1 * (f + 1):.3f}   0.200"
            "   0.300",
            "   2.00000   2.00000   2.00000",
        ]
    path = tmp_path / "traj.gro"
    path.write_text("\n".join(body) + "\n")
    u = Universe.from_files(str(path))
    assert u.trajectory.n_frames == 3
    np.testing.assert_allclose(
        [u.trajectory[f].positions[0, 0] for f in range(3)],
        [1.0, 2.0, 3.0], atol=5e-3,
    )


def test_gmx_preprocessor_errors(tmp_path):
    from mdhelper_tpu.io.topology_files import read_gmx_top

    bad_else = tmp_path / "a.itp"
    bad_else.write_text("#else\n")
    with pytest.raises(ValueError, match="#else without"):
        read_gmx_top(str(bad_else))
    bad_sym = tmp_path / "b.itp"
    bad_sym.write_text("#ifdef\n#endif\n")
    with pytest.raises(ValueError, match="needs a symbol"):
        read_gmx_top(str(bad_sym))


def test_write_xtc_box_validation(tmp_path):
    from mdhelper_tpu.io.xtc import write_xtc

    pos = np.zeros((4, 2, 3), np.float32)
    with pytest.raises(ValueError, match=r"got \(2, 3\)"):
        write_xtc(str(tmp_path / "x.xtc"), pos,
                  np.zeros((2, 3)))


PRMTOP_TWO_WATERS = """%VERSION  VERSION_STAMP = V0001.000  DATE = 08/18/26
%FLAG TITLE
%FORMAT(20a4)
WAT2
%FLAG POINTERS
%FORMAT(10I8)
       6       2       4       0       0       0       0       0       0       0
       0       2       0       0       0       0       0       0       0       0
       0       0       0       0       0       0       0       0       0       0
       0
%FLAG ATOM_NAME
%FORMAT(20a4)
O   H1  H2  O   H1  H2
%FLAG CHARGE
%FORMAT(5E16.8)
 -1.51973970E+01  7.59869850E+00  7.59869850E+00 -1.51973970E+01  7.59869850E+00
  7.59869850E+00
%FLAG MASS
%FORMAT(5E16.8)
  1.60000000E+01  1.00800000E+00  1.00800000E+00  1.60000000E+01  1.00800000E+00
  1.00800000E+00
%FLAG AMBER_ATOM_TYPE
%FORMAT(20a4)
OW  HW  HW  OW  HW  HW
%FLAG RESIDUE_LABEL
%FORMAT(20a4)
WAT WAT
%FLAG RESIDUE_POINTER
%FORMAT(10I8)
       1       4
%FLAG BONDS_INC_HYDROGEN
%FORMAT(10I8)
       0       3       1       0       6       1       9      12       1       9
      15       1
"""


def test_read_prmtop(tmp_path):
    from mdhelper_tpu.io.topology_files import read_prmtop

    path = str(tmp_path / "wat2.prmtop")
    with open(path, "w") as fh:
        fh.write(PRMTOP_TWO_WATERS)
    top = read_prmtop(path)
    assert top["n_atoms"] == 6
    np.testing.assert_array_equal(
        top["names"], ["O", "H1", "H2", "O", "H1", "H2"]
    )
    np.testing.assert_array_equal(
        top["types"], ["OW", "HW", "HW", "OW", "HW", "HW"]
    )
    # AMBER internal charge / 18.2223 -> elementary charges
    np.testing.assert_allclose(
        top["charges"],
        [-0.834, 0.417, 0.417, -0.834, 0.417, 0.417],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        top["masses"], [16.0, 1.008, 1.008, 16.0, 1.008, 1.008]
    )
    np.testing.assert_array_equal(
        top["resindices"], [0, 0, 0, 1, 1, 1]
    )
    np.testing.assert_array_equal(
        top["resnames"], ["WAT"] * 6
    )
    # index*3 bond convention
    np.testing.assert_array_equal(
        np.sort(top["bonds"], axis=0),
        [[0, 1], [0, 2], [3, 4], [3, 5]],
    )

    # charge neutrality of the fixture
    assert abs(top["charges"].sum()) < 1e-6


def test_prmtop_amber_netcdf_full_stack(tmp_path):
    """The complete AMBER path: Universe.from_files(prmtop, nc) and a
    bonded analysis driven off the prmtop's connectivity."""

    from mdhelper_tpu.analysis.bonded import BondLengthDistribution
    from mdhelper_tpu.core.universe import Universe
    from mdhelper_tpu.openmm.file import NetCDFFile

    top_path = str(tmp_path / "wat2.prmtop")
    with open(top_path, "w") as fh:
        fh.write(PRMTOP_TWO_WATERS)

    local = np.random.default_rng(71)
    box = 12.0
    T = 4
    coords = np.empty((T, 6, 3))
    for f in range(T):
        centers = local.random((2, 3)) * box
        for m in range(2):
            o = 3 * m
            coords[f, o] = centers[m]
            for h in (o + 1, o + 2):
                d = local.standard_normal(3)
                d /= np.linalg.norm(d)
                coords[f, h] = centers[m] + 0.9572 * d
    coords %= box

    nc_path = str(tmp_path / "traj")
    out = NetCDFFile(nc_path, "w")
    out.write_header(N=6, cell=True, velocities=False,
                     forces=False)
    for f in range(T):
        out.write_model(
            float(f), coords[f],
            cell_lengths=np.array([box] * 3),
            cell_angles=np.array([90.0] * 3),
        )
    out._nc.close()

    u = Universe.from_files(top_path, nc_path + ".nc")
    assert u.atoms.n_atoms == 6
    assert u.trajectory.n_frames == T
    np.testing.assert_allclose(
        u.atoms.charges[:3], [-0.834, 0.417, 0.417], atol=1e-6
    )

    bl = BondLengthDistribution(
        u.atoms, n_bins=20, range=(0.8, 1.1), verbose=False
    ).run()
    assert bl.results.counts.sum() == 4 * T
    np.testing.assert_allclose(bl.results.mean, 0.9572, atol=1e-4)
