"""
Plotting helpers
================

Publication-figure utilities (reference:
``/root/reference/src/mdhelper/plot/__init__.py``).  Host-only
matplotlib code.
"""

from . import axis, color, rcparam  # noqa: F401

__all__ = ["axis", "color", "rcparam"]
