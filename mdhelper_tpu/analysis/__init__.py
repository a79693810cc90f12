"""
Analysis modules
================

User-facing trajectory analyses (reference:
``/root/reference/src/mdhelper/analysis/__init__.py``).
"""

from . import (  # noqa: F401
    base,
    electrostatics,
    polymer,
    profile,
    structure,
    thermodynamics,
    transport,
)
from .base import (  # noqa: F401
    DynamicAnalysisBase,
    Hash,
    NumbaAnalysisBase,
    ParallelAnalysisBase,
    SerialAnalysisBase,
)

__all__ = [
    "base",
    "electrostatics",
    "polymer",
    "profile",
    "structure",
    "thermodynamics",
    "transport",
    "Hash",
    "SerialAnalysisBase",
    "NumbaAnalysisBase",
    "ParallelAnalysisBase",
    "DynamicAnalysisBase",
]
