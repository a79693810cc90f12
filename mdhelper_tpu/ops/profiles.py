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

__all__ = ["axis_histogram_batch", "plane_histogram_batch"]


def _bin_indices(coords, edges, n_bins):
    """np.histogram bin indices along one axis; out-of-range marked
    by a False weight (idx clamped in-range for the one-hot)."""

    edges = edges.astype(coords.dtype)
    idx = jnp.searchsorted(edges, coords, side="right") - 1
    idx = jnp.where(coords == edges[-1], n_bins - 1, idx)
    in_range = (coords >= edges[0]) & (coords <= edges[-1])
    return jnp.clip(idx, 0, n_bins - 1), in_range


def plane_histogram_batch(
    coords, mask, edges_x, edges_y, weights=None
):
    r"""2-D histogram of per-atom plane coordinates over a frame
    batch — one one-hot outer-product matmul per frame (MXU;
    scatter-adds serialize on TPU).

    Parameters
    ----------
    coords : `jax.Array`
        Plane coordinates, shape ``(B, N, 2)``.
    mask : `jax.Array`
        Frame validity mask, shape ``(B,)``.
    edges_x, edges_y : `jax.Array`
        Bin edges (np.histogram semantics).
    weights : `jax.Array`, optional
        Per-atom weights, shape ``(N,)`` (e.g. charges).

    Returns
    -------
    counts : `jax.Array`
        Counts summed over real frames, shape ``(n_x, n_y)``.
    """

    n_x = edges_x.shape[0] - 1
    n_y = edges_y.shape[0] - 1
    dtype = jnp.float32

    def frame(args):
        xy, m = args
        ix, ok_x = _bin_indices(xy[:, 0], edges_x, n_x)
        iy, ok_y = _bin_indices(xy[:, 1], edges_y, n_y)
        w = (ok_x & ok_y).astype(dtype) * m.astype(dtype)
        if weights is not None:
            w = w * weights.astype(dtype)
        onehot_x = (
            ix[:, None]
            == jax.lax.broadcasted_iota(
                jnp.int32, (ix.shape[0], n_x), 1
            )
        ).astype(dtype)
        onehot_y = (
            iy[:, None]
            == jax.lax.broadcasted_iota(
                jnp.int32, (iy.shape[0], n_y), 1
            )
        ).astype(dtype) * w[:, None]
        # HIGHEST: onehot_y carries real-valued weights (charges);
        # the default bf16 pass would round them (~4e-3 relative).
        return jax.lax.dot_general(
            onehot_x, onehot_y,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    counts = jax.lax.map(frame, (coords, mask)).sum(axis=0)
    out = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return counts.astype(out)


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
    idx, in_range = _bin_indices(coords, edges, n_bins)
    idx = idx.reshape(-1)
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
