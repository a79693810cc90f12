"""
Analysis modules
================

User-facing trajectory analyses (reference:
``/root/reference/src/mdhelper/analysis/__init__.py``).
"""

from . import base, structure  # noqa: F401
from .base import (  # noqa: F401
    DynamicAnalysisBase,
    Hash,
    NumbaAnalysisBase,
    ParallelAnalysisBase,
    SerialAnalysisBase,
)

__all__ = [
    "base",
    "structure",
    "Hash",
    "SerialAnalysisBase",
    "NumbaAnalysisBase",
    "ParallelAnalysisBase",
    "DynamicAnalysisBase",
]
