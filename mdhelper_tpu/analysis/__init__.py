"""
Analysis modules
================

User-facing trajectory analyses (reference:
``/root/reference/src/mdhelper/analysis/__init__.py``).
"""

from . import (  # noqa: F401
    base,
    bonded,
    cluster,
    contacts,
    dynamics,
    electrostatics,
    flow,
    free_energy,
    hbonds,
    interface,
    multi,
    orientation,
    pairing,
    polymer,
    profile,
    rmsd,
    sasa,
    steinhardt,
    structure,
    thermodynamics,
    transport,
)
from .multi import run_together  # noqa: F401
from .base import (  # noqa: F401
    DynamicAnalysisBase,
    Hash,
    NumbaAnalysisBase,
    ParallelAnalysisBase,
    SerialAnalysisBase,
)

__all__ = [
    "base",
    "bonded",
    "cluster",
    "contacts",
    "dynamics",
    "flow",
    "free_energy",
    "hbonds",
    "interface",
    "multi",
    "orientation",
    "run_together",
    "electrostatics",
    "pairing",
    "polymer",
    "profile",
    "rmsd",
    "sasa",
    "steinhardt",
    "structure",
    "thermodynamics",
    "transport",
    "Hash",
    "SerialAnalysisBase",
    "NumbaAnalysisBase",
    "ParallelAnalysisBase",
    "DynamicAnalysisBase",
]
