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
import numpy as np

__all__ = ["radial_histogram_frame", "radial_histogram_batch"]


def _bin_distances(dist, edges, weights, n_bins):
    """np.histogram-compatible binning of `dist` with per-pair 0/1
    weights, accumulated scatter-free as a two-level one-hot digit
    contraction on the MXU (scatter-adds serialize on TPU, and at
    frame-batch scale the batched scatter kernel crashes this
    environment's TPU runtime outright).

    Bin search runs in `dist`'s dtype: promoting float32 distances to
    float64 edges would drop the whole sweep onto the ~100x-slower
    emulated-f64 path on TPU.
    """

    edges = edges.astype(dist.dtype)
    idx = jnp.searchsorted(edges, dist, side="right") - 1
    # Last bin is closed: d == e_last belongs to bin n_bins - 1.
    idx = jnp.where(dist == edges[-1], n_bins - 1, idx)
    in_range = (dist >= edges[0]) & (dist <= edges[-1])
    weights = (weights * in_range).astype(jnp.float32)
    # Out-of-range values spill into a discard row.
    idx = jnp.where(in_range, idx, n_bins).reshape(-1)

    n_fine = 16
    n_coarse = -(-(n_bins + 1) // n_fine)
    w_flat = weights.reshape(-1)

    # Chunk the one-hot contraction: a full tile-squared (P, 29) pair
    # of digit matrices is ~2 GB at P ~ 17M, which out-of-memories the
    # device once frames batch on top.
    chunk = 1 << 21
    n_chunks = -(-idx.shape[0] // chunk)
    if n_chunks > 1:
        pad = n_chunks * chunk - idx.shape[0]
        idx = jnp.pad(idx, (0, pad), constant_values=n_bins)
        w_flat = jnp.pad(w_flat, (0, pad))

    coarse_iota = jax.lax.broadcasted_iota(
        jnp.int32, (min(chunk, idx.shape[0]), n_coarse), 1
    )
    fine_iota = jax.lax.broadcasted_iota(
        jnp.int32, (min(chunk, idx.shape[0]), n_fine), 1
    )

    def contract(idx_c, w_c):
        coarse = (idx_c[:, None] // n_fine == coarse_iota).astype(
            jnp.float32
        )
        fine = (
            idx_c[:, None] % n_fine == fine_iota
        ).astype(jnp.float32) * w_c[:, None]
        return jax.lax.dot_general(
            coarse, fine,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if n_chunks == 1:
        counts2d = contract(idx, w_flat)
    else:
        counts2d, _ = jax.lax.scan(
            lambda acc, ins: (acc + contract(*ins), None),
            jnp.zeros((n_coarse, n_fine), jnp.float32),
            (
                idx.reshape(n_chunks, chunk),
                w_flat.reshape(n_chunks, chunk),
            ),
        )
    accum = (
        jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    )
    return counts2d.reshape(-1)[:n_bins].astype(accum)


#: all 26 non-zero image shifts in {-1, 0, 1}^3 for the triclinic
#: minimum-image search (fractional rounding alone is not guaranteed
#: minimal for tilted cells; checking the neighbor block is — the same
#: contract as MDAnalysis ``minimize_vectors``).
_IMAGE_SHIFTS = np.array(
    [
        (sx, sy, sz)
        for sx in (-1, 0, 1)
        for sy in (-1, 0, 1)
        for sz in (-1, 0, 1)
        if (sx, sy, sz) != (0, 0, 0)
    ],
    dtype=np.float64,
)


def _inv3(m):
    """Closed-form 3x3 inverse (adjugate / determinant).  Avoids
    ``jnp.linalg.inv``, whose LU lowering does not compile on this
    TPU backend."""

    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    ca = e * i - f * h
    cb = -(d * i - f * g)
    cc = d * h - e * g
    cd = -(b * i - c * h)
    ce = a * i - c * g
    cf = -(a * h - b * g)
    cg = b * f - c * e
    ch = -(a * f - c * d)
    ci = a * e - b * d
    det = a * ca + b * cb + c * cc
    adj = jnp.stack(
        (
            jnp.stack((ca, cd, cg)),
            jnp.stack((cb, ce, ch)),
            jnp.stack((cc, cf, ci)),
        )
    )
    return adj / det


def _min_image_distance(delta, box):
    """Minimum-image distances of displacement block `delta`
    (``(..., 3)``).  `box` is either ``(3,)`` orthorhombic lengths or a
    ``(3, 3)`` lower-triangular box matrix (rows = box vectors) for
    triclinic cells."""

    if box.ndim == 1:
        delta = delta - box * jnp.round(delta / box)
        return jnp.sqrt((delta * delta).sum(axis=-1))
    inv = _inv3(box)
    frac = delta @ inv
    frac = frac - jnp.round(frac)
    base = frac @ box
    d2 = (base * base).sum(axis=-1)
    shift_vecs = jnp.asarray(_IMAGE_SHIFTS, dtype=delta.dtype) @ box
    for k in range(shift_vecs.shape[0]):  # static: 26 fused min steps
        cand = base + shift_vecs[k]
        d2 = jnp.minimum(d2, (cand * cand).sum(axis=-1))
    return jnp.sqrt(d2)


def _pair_block_histogram(
    p1, p2, box, edges, i_offset, j_offset, exclusion, n_bins
):
    """Histogram of min-image distances for one (i-tile, j-tile) pair
    block.  `i_offset`/`j_offset` are the absolute starting indices of
    the tiles (for the exclusion mask and padding detection)."""

    n1, n2 = p1.shape[0], p2.shape[0]
    # The sweep runs in the positions' dtype: an f64 box (or f64 ones)
    # would silently promote the entire pair block onto the emulated-
    # f64 path on TPU — ~100x slower, and long enough at frame-batch
    # scale to crash the device worker.
    box = box.astype(p1.dtype)
    delta = p1[:, None, :] - p2[None, :, :]
    dist = _min_image_distance(delta, box)

    i_idx = i_offset + jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 0)
    j_idx = j_offset + jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 1)
    weights = jnp.ones((n1, n2), dtype=jnp.float32)
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

    # lax.map, not vmap: a vmapped pair sweep multiplies the tile
    # working set by the frame-batch size (device OOM at 100k-atom,
    # 8-frame scales); mapping keeps one frame's tiles live at a time.
    per_frame = jax.lax.map(
        lambda abc: radial_histogram_frame(
            abc[0], abc[1], abc[2], edges, exclusion=exclusion,
            n1_real=n1_real, n2_real=n2_real, tile=tile,
        ),
        (pos1, pos2, box),
    )
    return (per_frame * mask[:, None]).sum(axis=0)
