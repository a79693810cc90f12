"""
Density-profile binning kernels
===============================

Per-axis 1-D histogramming for density/charge profiles (reference hot
loop: ``/root/reference/src/mdhelper/analysis/profile.py:807-818``, a
per-frame ``numpy.histogram`` per group per axis).  Binning runs in the
coordinates' dtype (mixing float64 edges into a float32 batch would
promote onto the TPU's emulated-f64 path) and accumulates scatter-free
via a two-level one-hot digit contraction on the MXU (scatter-adds
serialize on TPU).
"""

import jax
import jax.numpy as jnp

__all__ = ["axis_histogram_batch"]


def axis_histogram_batch(coords, mask, edges):
    r"""Histogram 1-D coordinates over a frame batch.

    Parameters
    ----------
    coords : `jax.Array`
        Coordinates along one axis, shape ``(B, N)``.
    mask : `jax.Array`
        Frame validity mask, shape ``(B,)``.
    edges : `jax.Array`
        Bin edges, shape ``(n_bins + 1,)`` (np.histogram semantics).

    Returns
    -------
    counts : `jax.Array`
        Counts summed over real frames, shape ``(n_bins,)``.
    """

    n_bins = edges.shape[0] - 1
    edges = edges.astype(coords.dtype)
    idx = jnp.searchsorted(edges, coords, side="right") - 1
    idx = jnp.where(coords == edges[-1], n_bins - 1, idx)
    in_range = (coords >= edges[0]) & (coords <= edges[-1])
    idx = jnp.where(in_range, idx, n_bins).reshape(-1)
    weights = (
        in_range.astype(jnp.float32)
        * mask[:, None].astype(jnp.float32)
    ).reshape(-1)

    n_fine = 16
    n_coarse = -(-(n_bins + 1) // n_fine)
    coarse_iota = jax.lax.broadcasted_iota(
        jnp.int32, (idx.shape[0], n_coarse), 1
    )
    fine_iota = jax.lax.broadcasted_iota(
        jnp.int32, (idx.shape[0], n_fine), 1
    )
    coarse = (idx[:, None] // n_fine == coarse_iota).astype(
        jnp.float32
    )
    fine = (
        idx[:, None] % n_fine == fine_iota
    ).astype(jnp.float32) * weights[:, None]
    counts2d = jax.lax.dot_general(
        coarse, fine,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return counts2d.reshape(-1)[:n_bins].astype(dtype)
