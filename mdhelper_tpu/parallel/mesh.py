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
    "initialize_distributed",
    "get_mesh",
    "fetch_global",
    "frame_sharding",
    "replicated_sharding",
    "pad_to_multiple",
    "process_frame_block",
]

FRAME_AXIS = "frames"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Join a multi-host analysis job (the TPU-native replacement for
    the reference's ``dask.distributed`` backend,
    ``/root/reference/src/mdhelper/analysis/base.py:396-448``).

    One process runs per host; after initialization ``jax.devices()``
    spans every host's chips and frame chunks shard across all of them
    — collectives ride ICI within a slice and DCN across slices, with
    no user-level scheduler process.  On Cloud TPU pods the arguments
    are auto-detected from the environment; on CPU/GPU clusters pass
    the coordinator ``host:port``, the process count, and this
    process's id (exactly one reader process per host).
    """

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def get_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = FRAME_AXIS,
) -> Mesh:
    """Build a 1-D device mesh over (up to) `n_devices` local devices.

    ``n_devices=1`` reproduces serial execution; ``None`` uses every
    addressable device.  In a multi-host job (after
    :func:`initialize_distributed`) the mesh spans every host's
    devices, ordered host-by-host so each host's frame block is
    contiguous; `n_devices` is ignored there to keep hosts balanced.
    """

    if devices is None:
        devices = jax.devices()
        if jax.process_count() > 1:
            devices = sorted(
                devices, key=lambda d: (d.process_index, d.id)
            )
            return Mesh(np.array(devices), (axis_name,))
    if n_devices is not None:
        n_devices = max(1, min(int(n_devices), len(devices)))
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def process_frame_block(n_padded: int) -> tuple[int, int]:
    """The contiguous ``[lo, hi)`` sub-range of a padded, frame-sharded
    axis owned by this process (host) under the host-contiguous 1-D
    mesh of :func:`get_mesh` — the per-host reader offsets of the
    multi-host input pipeline (each host reads only its own frames)."""

    n_procs = jax.process_count()
    if n_padded % n_procs:
        raise ValueError(
            f"Padded frame axis ({n_padded}) must divide evenly over "
            f"{n_procs} processes."
        )
    per_proc = n_padded // n_procs
    lo = jax.process_index() * per_proc
    return lo, lo + per_proc


def fetch_global(array) -> np.ndarray:
    """Fetch a (possibly multi-host global) ``jax.Array`` to host
    numpy: plain ``np.asarray`` when every shard is process-local or
    the array is fully replicated; otherwise a tiled
    ``process_allgather`` re-assembles the global value on every host
    (e.g. a q-sharded S(q) accumulator whose tiles live across DCN).
    """

    if not isinstance(array, jax.Array):
        return np.asarray(array)
    if array.is_fully_addressable or array.is_fully_replicated:
        return np.asarray(array)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(array, tiled=True)
    )


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
