"""
File formats
============

Dependency-free byte-level codecs backing the trajectory I/O layer:
NetCDF-3 (AMBER), DCD (CHARMM/NAMD/X-PLOR), XTC (GROMACS compressed,
with a C++ fast path), TRR (GROMACS full precision), LAMMPS text
dumps, and the PSF/PDB/GRO/LAMMPS-data/GROMACS-top topology parsers.
"""

from . import (  # noqa: F401
    dcd,
    lammps_dump,
    netcdf3,
    structure_writers,
    topology_files,
    trr,
    xtc,
)
from .netcdf3 import Dataset  # noqa: F401
from .structure_writers import write_gro, write_pdb, write_xyz  # noqa: F401

__all__ = [
    "netcdf3",
    "dcd",
    "xtc",
    "trr",
    "lammps_dump",
    "topology_files",
    "structure_writers",
    "Dataset",
    "write_pdb",
    "write_gro",
    "write_xyz",
]
