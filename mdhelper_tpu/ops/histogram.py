"""
Pair-distance histogram kernels
===============================

The RDF hot loop (reference:
``/root/reference/src/mdhelper/analysis/structure.py:32-104`` —
MDAnalysis ``capped_distance`` cell lists + ``numpy.histogram``).  On
TPU the natural formulation is brute-force tiled pair blocks: at RDF
scales (up to ~10^5 atoms) the (i-tile × j-tile) distance sweep keeps
the VPU saturated and needs no dynamic-shape neighbor lists, and the
reference's ``n_batches`` memory knob becomes a static tile grid.

Histogram binning matches ``numpy.histogram`` semantics on uniform
edges: bin k is [e_k, e_{k+1}) with the last bin closed, values outside
[e_0, e_last] dropped.

This module provides the XLA formulation (works on every backend and
is the correctness oracle); :mod:`mdhelper_tpu.ops.pallas_histogram`
holds the hand-tiled TPU kernel used by the benchmark path.
"""

import jax
import jax.numpy as jnp

__all__ = ["radial_histogram_frame", "radial_histogram_batch"]


def _bin_distances(dist, edges, weights, n_bins):
    """np.histogram-compatible binning of `dist` with per-pair 0/1
    weights; returns float64-accumulated counts."""

    idx = jnp.searchsorted(edges, dist, side="right") - 1
    # Last bin is closed: d == e_last belongs to bin n_bins - 1.
    idx = jnp.where(dist == edges[-1], n_bins - 1, idx)
    in_range = (dist >= edges[0]) & (dist <= edges[-1])
    weights = weights * in_range
    # Out-of-range values spill into a discard bin.
    idx = jnp.where(in_range, idx, n_bins)
    counts = jnp.zeros(n_bins + 1, dtype=jnp.float64 if
                       jax.config.jax_enable_x64 else jnp.float32)
    counts = counts.at[idx.ravel()].add(weights.ravel().astype(counts.dtype))
    return counts[:n_bins]


def _pair_block_histogram(
    p1, p2, box, edges, i_offset, j_offset, exclusion, n_bins
):
    """Histogram of min-image distances for one (i-tile, j-tile) pair
    block.  `i_offset`/`j_offset` are the absolute starting indices of
    the tiles (for the exclusion mask and padding detection)."""

    n1, n2 = p1.shape[0], p2.shape[0]
    delta = p1[:, None, :] - p2[None, :, :]
    delta = delta - box * jnp.round(delta / box)
    dist = jnp.sqrt((delta * delta).sum(axis=-1))

    i_idx = i_offset + jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 0)
    j_idx = j_offset + jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 1)
    weights = jnp.ones((n1, n2))
    if exclusion is not None:
        e0, e1 = exclusion
        weights = weights * (i_idx // e0 != j_idx // e1)
    return dist, weights


def radial_histogram_frame(
    pos1,
    pos2,
    box,
    edges,
    *,
    exclusion=None,
    n1_real=None,
    n2_real=None,
    tile=4096,
):
    r"""Radial pair-distance histogram for a single frame.

    Parameters
    ----------
    pos1, pos2 : `jax.Array`
        Particle positions, shapes ``(N_1, 3)`` and ``(N_2, 3)``
        (possibly padded; see `n1_real`/`n2_real`).
    box : `jax.Array`
        Orthorhombic box lengths, shape ``(3,)``.
    edges : `jax.Array`
        Monotonic bin edges, shape ``(n_bins + 1,)``.
    exclusion : `tuple`, optional
        ``(e0, e1)`` tile exclusion: pairs with ``i // e0 == j // e1``
        are dropped (reference ``structure.py:100-102``).
    n1_real, n2_real : `int`, optional
        Number of real (unpadded) rows in each group.
    tile : `int`, optional
        Atom tile size; pair blocks of ``tile x tile`` bound memory
        (the TPU analog of the reference's ``n_batches``).

    Returns
    -------
    counts : `jax.Array`
        Histogram counts, shape ``(n_bins,)``, float accumulator.
    """

    n_bins = edges.shape[0] - 1
    n1, n2 = pos1.shape[0], pos2.shape[0]
    n1_real = n1 if n1_real is None else n1_real
    n2_real = n2 if n2_real is None else n2_real

    if n1 * n2 <= tile * tile:
        dist, weights = _pair_block_histogram(
            pos1, pos2, box, edges, 0, 0, exclusion, n_bins
        )
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 0)
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 1)
        weights = weights * (i_idx < n1_real) * (j_idx < n2_real)
        return _bin_distances(dist, edges, weights, n_bins)

    # Tiled sweep: pad each group to a tile multiple, scan pair blocks.
    def pad(p, t):
        r = (-p.shape[0]) % t
        return jnp.pad(p, ((0, r), (0, 0))) if r else p

    p1 = pad(pos1, tile)
    p2 = pad(pos2, tile)
    nt1, nt2 = p1.shape[0] // tile, p2.shape[0] // tile
    p1_tiles = p1.reshape(nt1, tile, 3)
    p2_tiles = p2.reshape(nt2, tile, 3)

    def block(carry, idx):
        ti, tj = idx // nt2, idx % nt2
        a = jax.lax.dynamic_index_in_dim(p1_tiles, ti, keepdims=False)
        b = jax.lax.dynamic_index_in_dim(p2_tiles, tj, keepdims=False)
        dist, weights = _pair_block_histogram(
            a, b, box, edges, ti * tile, tj * tile, exclusion, n_bins
        )
        i_idx = ti * tile + jax.lax.broadcasted_iota(
            jnp.int32, (tile, tile), 0
        )
        j_idx = tj * tile + jax.lax.broadcasted_iota(
            jnp.int32, (tile, tile), 1
        )
        weights = weights * (i_idx < n1_real) * (j_idx < n2_real)
        return carry + _bin_distances(dist, edges, weights, n_bins), None

    init = jnp.zeros(
        n_bins,
        dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32,
    )
    counts, _ = jax.lax.scan(
        block, init, jnp.arange(nt1 * nt2, dtype=jnp.int32)
    )
    return counts


def radial_histogram_batch(
    pos1,
    pos2,
    box,
    mask,
    edges,
    *,
    exclusion=None,
    n1_real=None,
    n2_real=None,
    tile=4096,
):
    """Mask-weighted histogram over a frame batch: `pos1`/`pos2` have
    shape ``(B, N, 3)``, `box` ``(B, 3)``, `mask` ``(B,)``.  Returns the
    counts summed over real frames, shape ``(n_bins,)``."""

    per_frame = jax.vmap(
        lambda a, b, c: radial_histogram_frame(
            a, b, c, edges, exclusion=exclusion, n1_real=n1_real,
            n2_real=n2_real, tile=tile,
        )
    )(pos1, pos2, box)
    return (per_frame * mask[:, None]).sum(axis=0)
