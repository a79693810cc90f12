"""
Device compute cores
====================

The hot-loop layer of MDHelper-TPU: batched, jittable kernels that the
analysis classes fold trajectory chunks through.  Where the reference
uses MDAnalysis C helpers and Numba loops
(``/root/reference/src/mdhelper/algorithm/accelerated.py``,
``analysis/structure.py:32-104``), these modules formulate the same
math as XLA-friendly tensor programs (MXU matmuls + fused VPU
elementwise) with Pallas kernels for the cases XLA cannot tile well.
"""

from . import (  # noqa: F401
    cell_histogram,
    doublefloat,
    histogram,
    mesh_scattering,
    pallas_cell_histogram,
    pallas_kernels,
    pbc,
    profiles,
    scattering,
)

__all__ = [
    "cell_histogram",
    "doublefloat",
    "histogram",
    "mesh_scattering",
    "pallas_cell_histogram",
    "pallas_kernels",
    "pbc",
    "profiles",
    "scattering",
]
