r"""
Ring-pass pair histogram (atom sharding)
========================================

The context-parallel-style mechanism from SURVEY.md section 5.7: when
the atom count outgrows one chip, the pair-distance histogram shards
*atoms* (not frames) across the mesh.  Each device keeps its i-shard of
positions fixed while the j-shards rotate around the ICI ring via
``ppermute`` — structurally identical to ring attention — accumulating
partial histograms that are ``psum``-reduced at the end.

The reference has no analog (its only distribution is frame-parallel
process pools, ``analysis/base.py:312-507``); this is the TPU-native
path to 10^6-atom RDFs.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.histogram import (
    _bin_distances,
    _contract_bins,
    _exact_bin_indices,
    _pair_block_histogram,
)

__all__ = ["ring_radial_histogram"]


def _local_ring_histogram(
    pos1,
    pos2,
    box,
    edges,
    *,
    axis_name: str,
    n_shards: int,
    shard_size: int,
    n_real: int,
    exclusion,
    n_bins: int,
    precision: str = "fast",
    shard_size_j: int = None,
    n_real_j: int = None,
):
    """Per-device body: accumulate this device's i-shard against every
    rotating j-shard, then reduce over the ring.  For cross-group
    histograms the j side carries its own shard size / real count
    (``shard_size_j`` / ``n_real_j``); indices on each side are
    per-group, so tile exclusion keeps the unsharded semantics."""

    shard_size_j = shard_size if shard_size_j is None else shard_size_j
    n_real_j = n_real if n_real_j is None else n_real_j
    my_id = jax.lax.axis_index(axis_name)
    i_offset = my_id * shard_size
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def step(carry, step_index):
        counts, j_block = carry
        j_owner = (my_id - step_index) % n_shards
        j_offset = j_owner * shard_size_j
        shape = (pos1.shape[0], j_block.shape[0])
        if precision == "exact":
            idx = _exact_bin_indices(
                pos1, j_block, box, edges, n_bins
            )
            weights = jnp.ones(shape, jnp.float32)
        else:
            dist, weights = _pair_block_histogram(
                pos1, j_block, box, edges, i_offset, j_offset, None,
                n_bins,
            )
        # Mask padded rows (global index >= n_real) and excluded
        # tiles on the GLOBAL atom indices.
        i_idx = i_offset + jax.lax.broadcasted_iota(
            jnp.int32, shape, 0
        )
        j_idx = j_offset + jax.lax.broadcasted_iota(
            jnp.int32, shape, 1
        )
        if exclusion is not None:
            e0, e1 = exclusion
            weights = weights * (i_idx // e0 != j_idx // e1)
        weights = weights * (i_idx < n_real) * (j_idx < n_real_j)
        if precision == "exact":
            counts = counts + _contract_bins(
                jnp.where(weights > 0, idx, n_bins),
                weights.astype(jnp.float32),
                n_bins,
            )
        else:
            counts = counts + _bin_distances(
                dist, edges, weights, n_bins
            )
        # Rotate the j-shard one hop around the ring.
        j_block = jax.lax.ppermute(j_block, axis_name, perm)
        return (counts, j_block), None

    zero_counts = jnp.zeros(
        n_bins,
        dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32,
    )
    # Mark the carry as device-varying for shard_map's vma typing.
    init = (jax.lax.pvary(zero_counts, (axis_name,)), pos2)
    (counts, _), _ = jax.lax.scan(
        step, init, jnp.arange(n_shards, dtype=jnp.int32)
    )
    return jax.lax.psum(counts, axis_name)


def ring_radial_histogram(
    positions,
    box,
    edges,
    mesh: Mesh = None,
    *,
    positions2=None,
    exclusion=None,
    axis_name: str = None,
    precision: str = "fast",
):
    r"""Atom-sharded radial pair-distance histogram over a device ring.

    Matches :func:`mdhelper_tpu.ops.histogram.radial_histogram_frame`
    for ``pos1 = pos2 = positions`` (all pairs, np.histogram binning),
    but with the atom axis sharded across `mesh` and the partial
    j-shards rotated via ``ppermute``.

    Parameters
    ----------
    positions : array-like
        Coordinates, shape ``(N, 3)``.
    box : array-like
        Orthorhombic box lengths, shape ``(3,)``.
    edges : array-like
        Histogram bin edges, shape ``(n_bins + 1,)``.
    mesh : `jax.sharding.Mesh`, optional
        1-D device mesh (defaults to all local devices on an
        ``"atoms"`` axis).
    exclusion : `tuple`, keyword-only, optional
        ``(e0, e1)`` tile exclusion on the *global* atom indices.

    positions2 : array-like, keyword-only, optional
        Second group's coordinates ``(N_2, 3)`` for a cross-group
        histogram (i side stays `positions`; this side rotates).
        Indices on each side are per-group, matching the unsharded
        cross semantics.

    Returns
    -------
    counts : `numpy.ndarray`
        Histogram counts, shape ``(n_bins,)`` (replicated).
    """

    if mesh is None:
        devices = np.array(jax.devices())
        mesh = Mesh(devices, ("atoms",))
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    n_shards = mesh.devices.size

    def pad_to_shards(pos):
        pos = np.asarray(pos)
        n = pos.shape[0]
        size = -(-n // n_shards)
        pad = size * n_shards - n
        if pad:
            pos = np.concatenate(
                (pos, np.repeat(pos[-1:], pad, axis=0))
            )
        return pos, size, n

    positions, shard_size, n_real = pad_to_shards(positions)
    if positions2 is None:
        pos_j, shard_size_j, n_real_j = positions, shard_size, n_real
    else:
        pos_j, shard_size_j, n_real_j = pad_to_shards(positions2)
    n_bins = int(np.asarray(edges).shape[0]) - 1

    body = functools.partial(
        _local_ring_histogram,
        axis_name=axis_name,
        n_shards=n_shards,
        shard_size=shard_size,
        n_real=n_real,
        exclusion=exclusion,
        n_bins=n_bins,
        precision=precision,
        shard_size_j=shard_size_j,
        n_real_j=n_real_j,
    )
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P()),
        out_specs=P(),
    )
    counts = jax.jit(sharded)(
        jnp.asarray(positions),
        jnp.asarray(pos_j),
        jnp.asarray(box),
        jnp.asarray(edges),
    )
    return np.asarray(counts)
