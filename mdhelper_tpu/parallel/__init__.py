"""
Parallelism
===========

Device-mesh construction and sharding helpers — the TPU-native
replacement for the reference's multiprocessing/joblib/dask scheduler
layer (SURVEY.md section 2.7).
"""

from . import mesh  # noqa: F401
from .mesh import FRAME_AXIS, frame_sharding, get_mesh  # noqa: F401

__all__ = ["mesh", "FRAME_AXIS", "get_mesh", "frame_sharding"]
