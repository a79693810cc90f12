"""
Density-profile binning kernels
===============================

Per-axis 1-D histogramming for density/charge profiles (reference hot
loop: ``/root/reference/src/mdhelper/analysis/profile.py:807-818``, a
per-frame ``numpy.histogram`` per group per axis).  Formulated as a
batched bin-scatter with float64 accumulation.
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
    idx = jnp.searchsorted(edges, coords, side="right") - 1
    idx = jnp.where(coords == edges[-1], n_bins - 1, idx)
    in_range = (coords >= edges[0]) & (coords <= edges[-1])
    idx = jnp.where(in_range, idx, n_bins)
    weights = in_range * mask[:, None]
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    counts = jnp.zeros(n_bins + 1, dtype=dtype)
    counts = counts.at[idx.ravel()].add(weights.ravel().astype(dtype))
    return counts[:n_bins]
