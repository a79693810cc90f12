r"""
OpenMM physical constants and unit reduction
============================================

Reference: ``/root/reference/src/mdhelper/openmm/unit.py``.  Requires
OpenMM.
"""

from openmm import unit

from ..algorithm import unit as _unit

__all__ = [
    "VACUUM_PERMITTIVITY",
    "get_scaling_factors",
    "get_lj_scaling_factors",
]

#: Vacuum permittivity :math:`\varepsilon_0` in OpenMM units.
VACUUM_PERMITTIVITY = 8.854187812813e-12 * unit.farad / unit.meter


def get_scaling_factors(
    bases: dict, other: dict = {}
) -> dict:
    """Alias of
    :func:`mdhelper_tpu.algorithm.unit.get_scaling_factors` for
    ``openmm.unit`` quantities."""

    return _unit.get_scaling_factors(bases, other)


def get_lj_scaling_factors(
    bases: dict, other: dict = {}
) -> dict:
    """Alias of
    :func:`mdhelper_tpu.algorithm.unit.get_lj_scaling_factors` for
    ``openmm.unit`` quantities."""

    return _unit.get_lj_scaling_factors(bases, other)
