"""
LAMMPS helpers
==============

Simulation-setup utilities for LAMMPS (reference:
``/root/reference/src/mdhelper/lammps/__init__.py``).
"""

from . import topology  # noqa: F401

__all__ = ["topology"]
