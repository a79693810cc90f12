"""
OpenMM helpers
==============

Simulation-setup utilities for OpenMM (reference:
``/root/reference/src/mdhelper/openmm/__init__.py``).  The trajectory
file layer (:mod:`mdhelper_tpu.openmm.file`) works without OpenMM; the
other modules require it and raise ``ImportError`` on import when it is
absent.
"""

from importlib.util import find_spec

from . import expressions, file  # noqa: F401

__all__ = ["expressions", "file"]

if find_spec("openmm") is not None:  # pragma: no cover (no OpenMM here)
    from . import (  # noqa: F401
        bond,
        pair,
        reporter,
        system,
        topology,
        unit,
        utility,
    )

    __all__ += [
        "bond",
        "pair",
        "reporter",
        "system",
        "topology",
        "unit",
        "utility",
    ]
