"""
Algorithms
==========

Numerical core of MDHelper-TPU (reference:
``/root/reference/src/mdhelper/algorithm/__init__.py``).  The hot-loop
kernels live in :mod:`mdhelper_tpu.ops`; this package provides the
user-facing numerical API.
"""

from . import (  # noqa: F401
    accelerated,
    correlation,
    molecule,
    topology,
    unit,
    utility,
)

__all__ = [
    "accelerated",
    "correlation",
    "molecule",
    "topology",
    "unit",
    "utility",
]
