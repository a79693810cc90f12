"""
MDHelper-TPU
============

A TPU-native (JAX/XLA/Pallas) rebuild of the MDHelper toolkit: analysis
modules and helper functions for molecular dynamics (MD) simulations.

The public surface mirrors the reference package root
(``/root/reference/src/mdhelper/__init__.py:10-21``): a global unit
registry ``ureg``, the quantity alias ``Q_``, the ``FOUND_OPENMM``
feature flag, and the ``VERSION`` string.  The unit registry is this
package's own dependency-free engine (:mod:`mdhelper_tpu.units`)
because ``pint`` is not guaranteed to be present.

Numerical precision
-------------------
Double precision is enabled in JAX at import time (opt out by setting
``MDHELPER_TPU_X64=0`` before import).  Analysis results are accumulated
in float64 to match the reference's NumPy/SciPy semantics; hot kernels
may internally use float32/bfloat16 fast paths whose outputs are
validated against the float64 oracle in the test suite.
"""

import os
from importlib.util import find_spec

if os.environ.get("MDHELPER_TPU_X64", "1") != "0":
    import jax

    jax.config.update("jax_enable_x64", True)

from .units import Quantity, UnitRegistry  # noqa: E402

Q_ = Quantity
ureg = UnitRegistry(auto_reduce_dimensions=True)

VERSION = "1.0.0"
__version__ = VERSION
FOUND_OPENMM = find_spec("openmm") is not None

__all__ = [
    "algorithm",
    "analysis",
    "fit",
    "lammps",
    "plot",
    "FOUND_OPENMM",
    "VERSION",
    "Q_",
    "ureg",
]

from . import algorithm, analysis, fit, lammps, plot  # noqa: E402, F401

if FOUND_OPENMM:
    __all__.append("openmm")
