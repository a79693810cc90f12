"""
Device mesh and sharding helpers
================================

The TPU-native replacement for the reference's process-pool scheduler
(``/root/reference/src/mdhelper/analysis/base.py:312-507``): instead of
forking workers that each re-open the trajectory, a single process
streams frame batches onto a :class:`jax.sharding.Mesh` whose ``frames``
axis spans the local devices (ICI within a slice; add a ``hosts`` axis
over DCN for multi-host runs).  Accumulator pytrees stay replicated;
XLA inserts the cross-device reductions.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "FRAME_AXIS",
    "get_mesh",
    "frame_sharding",
    "replicated_sharding",
    "pad_to_multiple",
]

FRAME_AXIS = "frames"


def get_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = FRAME_AXIS,
) -> Mesh:
    """Build a 1-D device mesh over (up to) `n_devices` local devices.

    ``n_devices=1`` reproduces serial execution; ``None`` uses every
    addressable device.
    """

    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        n_devices = max(1, min(int(n_devices), len(devices)))
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def frame_sharding(mesh: Mesh, batch_ndim: int = 3) -> NamedSharding:
    """Sharding that splits the leading (frame-batch) axis over the
    mesh and replicates the rest."""

    spec = PartitionSpec(mesh.axis_names[0], *([None] * (batch_ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def pad_to_multiple(
    array: np.ndarray, multiple: int, axis: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Pad `array` along `axis` to a multiple of `multiple` (repeating
    the last slice so padded entries stay numerically benign) and return
    ``(padded, mask)`` where `mask` is 1 for real entries."""

    n = array.shape[axis]
    remainder = (-n) % multiple
    mask = np.ones(n + remainder, dtype=np.float64)
    if remainder:
        mask[n:] = 0.0
        pad_block = np.take(array, [-1] * remainder, axis=axis)
        array = np.concatenate((array, pad_block), axis=axis)
    return array, mask
