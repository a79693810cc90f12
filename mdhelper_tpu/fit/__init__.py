"""
Curve-fitting models
====================

Plain functions shaped for :func:`scipy.optimize.curve_fit` (reference:
``/root/reference/src/mdhelper/fit/__init__.py``).  Host-side NumPy —
fits operate on tiny reduced results, never on device data.
"""

from . import (  # noqa: F401
    distribution,
    exponential,
    fourier,
    gaussian,
    polynomial,
    power,
)

__all__ = [
    "distribution",
    "exponential",
    "fourier",
    "gaussian",
    "polynomial",
    "power",
]
