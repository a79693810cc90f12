"""
Core runtime
============

Trajectory data layer and topology containers: the host-side half of
the TPU streaming model.
"""

from . import trajectory, universe  # noqa: F401
from .trajectory import ArrayReader, Frame, NPZReader, TrajectoryReader  # noqa: F401
from .universe import AtomGroup, Topology, Universe  # noqa: F401

__all__ = [
    "trajectory",
    "universe",
    "ArrayReader",
    "NPZReader",
    "Frame",
    "TrajectoryReader",
    "AtomGroup",
    "Topology",
    "Universe",
]
