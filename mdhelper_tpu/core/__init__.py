"""
Core runtime
============

Trajectory data layer and topology containers: the host-side half of
the TPU streaming model.
"""

from . import trajectory, universe  # noqa: F401
from .trajectory import (  # noqa: F401
    ArrayReader,
    Frame,
    NetCDFReader,
    NPZReader,
    TrajectoryReader,
)
from .universe import AtomGroup, Topology, Universe  # noqa: F401

__all__ = [
    "trajectory",
    "universe",
    "ArrayReader",
    "NPZReader",
    "NetCDFReader",
    "Frame",
    "TrajectoryReader",
    "AtomGroup",
    "Topology",
    "Universe",
]
