"""
File formats
============

Dependency-free binary codecs backing the trajectory I/O layer.
"""

from . import netcdf3  # noqa: F401
from .netcdf3 import Dataset  # noqa: F401

__all__ = ["netcdf3", "Dataset"]
