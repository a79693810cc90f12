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

__all__ = [
    "radial_histogram_frame",
    "radial_histogram_batch",
    "displacement_histogram_frame",
]


def _bin_distances(dist, edges, weights, n_bins):
    """np.histogram-compatible binning of `dist` with per-pair 0/1
    weights (see :func:`_contract_bins`).

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
    return _contract_bins(idx, weights, n_bins)


def _contract_bins(idx, weights, n_bins):
    """Accumulate bin indices (spill row ``n_bins`` for discards)
    scatter-free as a two-level one-hot digit contraction on the MXU
    (scatter-adds serialize on TPU, and at frame-batch scale the
    batched scatter kernel crashes this environment's TPU runtime
    outright)."""

    idx = idx.reshape(-1)
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


def _exact_d2_orthorhombic(p1, p2, box):
    """Squared minimum-image distances of a float32 block in
    error-free double-float arithmetic.  Assumes wrapped inputs (image
    multiple in {-1, 0, 1}).  `p1`/`p2` are broadcast-compatible
    ``(..., 3)`` arrays — callers supply ``p1[:, None, :]`` /
    ``p2[None, :, :]`` views for a pair block, or equal shapes for
    elementwise displacements (the van Hove self part)."""

    from .doublefloat import df_sub, df_sum3, df_square, two_diff

    components = []
    for k in range(3):
        s, e = two_diff(p1[..., k], p2[..., k])
        m = jnp.round(s / box[k])
        d = df_sub((s, e), (m * box[k], jnp.float32(0.0)))
        components.append(df_square(d))
    return df_sum3(*components)


def _exact_d2_triclinic(p1, p2, box):
    """Squared minimum-image distances for a triclinic cell in
    double-float arithmetic: the base image multiple comes from
    float32 fractional rounding, and all 27 neighbor candidates are
    evaluated exactly (two-float32) with the minimum taken in
    double-float — so near-tied images resolve the same way a float64
    oracle over the same float32 box resolves them.

    `box` is the ``(3, 3)`` LOWER-TRIANGULAR float32 box matrix (rows
    are the box vectors, :func:`~mdhelper_tpu.algorithm.topology.
    triclinic_matrices`); the structural zeros above the diagonal are
    exploited to skip 1/3 of the products.  Exactness is relative to
    the float32 box the kernel receives (same contract as the
    orthorhombic path).  `p1`/`p2` are broadcast-compatible
    ``(..., 3)`` arrays (see :func:`_exact_d2_orthorhombic`).
    """

    from .doublefloat import (
        df_add,
        df_min,
        df_sub,
        df_sum3,
        df_square,
        two_diff,
        two_prod,
    )

    inv = _inv3(box)
    # Exact per-component displacements (hi, lo) and the f32 base
    # image multiple from fractional rounding.
    s_hi, s_lo = [], []
    for k in range(3):
        s, e = two_diff(p1[..., k], p2[..., k])
        s_hi.append(s)
        s_lo.append(e)
    # HIGHEST: TPU f32 matmuls default to one bf16 pass (~2e-3
    # relative); the 27-image search absorbs +-1 base-multiple
    # errors, but full f32 keeps n0 deterministic vs the oracle.
    frac = jnp.matmul(
        jnp.stack(s_hi, axis=-1), inv,
        precision=jax.lax.Precision.HIGHEST,
    )
    n0 = jnp.round(frac)  # (N1, N2, 3), integer-valued f32

    best = None
    for shift in np.concatenate(
        (np.zeros((1, 3)), _IMAGE_SHIFTS)
    ).astype(np.float32):
        m = [n0[..., j] + shift[j] for j in range(3)]
        components = []
        for k in range(3):
            # t = sum_{j >= k} m_j * box[j, k] (lower-triangular).
            t = two_prod(m[k], box[k, k])
            for j in range(k + 1, 3):
                t = df_add(t, two_prod(m[j], box[j, k]))
            d = df_sub((s_hi[k], s_lo[k]), t)
            components.append(df_square(d))
        d2 = df_sum3(*components)
        best = d2 if best is None else df_min(best, d2)
    return best


def _exact_bin_indices(p1, p2, box, edges, n_bins, *,
                       elementwise: bool = False):
    """Exact double-float bin assignment for a pair block with UNIFORM
    float32-stream edges: squared minimum-image distances evaluate in
    error-free two-float32 arithmetic
    (:mod:`mdhelper_tpu.ops.doublefloat`) and a float32-estimated bin
    index is +-1-corrected against the exact boundary values
    ``(e_0 + k h)^2`` — float64-grade binning without any emulated
    f64 in the pair sweep (same recipe as the Pallas cell kernel's
    ``_bin_exact``).  `box` is ``(3,)`` orthorhombic lengths (wrapped
    inputs assumed) or a ``(3, 3)`` lower-triangular box matrix.
    Returns spill-row (``n_bins``) indices for out-of-range pairs; the
    last bin is closed (np.histogram).  With ``elementwise=True``,
    `p1`/`p2` pair row-for-row (``(N, 3) -> (N,)`` displacement
    indices) instead of all-against-all.
    """

    from .doublefloat import df_add, df_ge, df_lt, two_prod

    # Split the uniform-edge constants e0^2, 2 e0 h, h^2 into
    # double-float pairs.  A handful of scalar f64 ops (emulated on
    # TPU, but executed once per call).
    f64 = edges.astype(
        jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    )
    e0 = f64[0]
    h = (f64[-1] - f64[0]) / n_bins

    def split(x):
        hi = x.astype(jnp.float32)
        return hi, (x - hi).astype(jnp.float32)

    c0 = split(e0 * e0)
    c1 = split(2.0 * e0 * h)
    c2 = split(h * h)
    e0_f32 = e0.astype(jnp.float32)
    inv_h = (1.0 / h).astype(jnp.float32)
    box = box.astype(jnp.float32)
    p1 = p1.astype(jnp.float32)
    p2 = p2.astype(jnp.float32)

    if not elementwise:
        p1 = p1[:, None, :]
        p2 = p2[None, :, :]
    if box.ndim == 1:
        d2 = _exact_d2_orthorhombic(p1, p2, box)
    else:
        d2 = _exact_d2_triclinic(p1, p2, box)

    def boundary(k):
        kf = k.astype(jnp.float32)
        k2 = kf * kf
        t1 = two_prod(kf, c1[0])
        t2 = two_prod(k2, c2[0])
        acc = df_add(c0, (t1[0], t1[1] + kf * c1[1]))
        return df_add(acc, (t2[0], t2[1] + k2 * c2[1]))

    dist = jnp.sqrt(jnp.maximum(d2[0], jnp.float32(0.0)))
    idx = jnp.clip(
        ((dist - e0_f32) * inv_h).astype(jnp.int32),
        0,
        n_bins,
    )
    one = jnp.int32(1)
    idx = (
        idx
        + jnp.where(df_ge(d2, boundary(idx + one)), one, jnp.int32(0))
        - jnp.where(df_lt(d2, boundary(idx)), one, jnp.int32(0))
    )
    # np.histogram range semantics: keep d^2 in [e_0^2, e_last^2],
    # INCLUSIVE of the last edge (the last bin is closed), spill the
    # rest; the min() folds d == e_last into bin n_bins - 1.
    b_last = boundary(jnp.int32(n_bins))
    in_range = df_ge(d2, boundary(jnp.int32(0))) & (
        df_lt(d2, b_last) | _df_eq(d2, b_last)
    )
    idx = jnp.where(in_range, jnp.minimum(idx, n_bins - 1), n_bins)
    return idx


def _df_eq(a, b):
    return (a[0] == b[0]) & (a[1] == b[1])


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


def _image_shift(delta, box):
    """Integer image multiples for an orthorhombic fold, with
    non-positive box lengths treated as aperiodic (vacuum systems,
    e.g. box-less XYZ files, must not fold — a zero length would
    otherwise produce NaNs)."""

    period = jnp.where(box > 0, box, jnp.inf)
    return jnp.where(box > 0, jnp.round(delta / period), 0.0)


def _min_image_distance(delta, box):
    """Minimum-image distances of displacement block `delta`
    (``(..., 3)``).  `box` is either ``(3,)`` orthorhombic lengths or a
    ``(3, 3)`` lower-triangular box matrix (rows = box vectors) for
    triclinic cells."""

    if box.ndim == 1:
        delta = delta - box * _image_shift(delta, box)
        return jnp.sqrt((delta * delta).sum(axis=-1))
    inv = _inv3(box)
    # HIGHEST: the default bf16 MXU pass would smear the folded
    # vector by ~2e-3 of the box (not absorbed by the image search —
    # every candidate inherits base's error).
    hi = jax.lax.Precision.HIGHEST
    frac = jnp.matmul(delta, inv, precision=hi)
    frac = frac - jnp.round(frac)
    base = jnp.matmul(frac, box, precision=hi)
    d2 = (base * base).sum(axis=-1)
    shift_vecs = jnp.matmul(
        jnp.asarray(_IMAGE_SHIFTS, dtype=delta.dtype), box,
        precision=hi,
    )
    for k in range(shift_vecs.shape[0]):  # static: 26 fused min steps
        cand = base + shift_vecs[k]
        d2 = jnp.minimum(d2, (cand * cand).sum(axis=-1))
    return jnp.sqrt(d2)


def _min_image_vectors(delta, box):
    """Minimum-image displacement VECTORS (``(..., 3)``) — the
    vector-valued counterpart of :func:`_min_image_distance` (angles
    and dihedrals need the folded vectors, not just their norms).
    `box` is ``(3,)`` orthorhombic lengths or a ``(3, 3)``
    lower-triangular box matrix."""

    if box.ndim == 1:
        return delta - box * _image_shift(delta, box)
    inv = _inv3(box)
    # HIGHEST: see _min_image_distance — bf16 folding error is not
    # absorbed by the image search.
    hi = jax.lax.Precision.HIGHEST
    frac = jnp.matmul(delta, inv, precision=hi)
    frac = frac - jnp.round(frac)
    base = jnp.matmul(frac, box, precision=hi)
    best = base
    best_d2 = (base * base).sum(axis=-1)
    shift_vecs = jnp.matmul(
        jnp.asarray(_IMAGE_SHIFTS, dtype=delta.dtype), box,
        precision=hi,
    )
    for k in range(shift_vecs.shape[0]):  # static: 26 fused steps
        cand = base + shift_vecs[k]
        d2 = (cand * cand).sum(axis=-1)
        take = d2 < best_d2
        best = jnp.where(take[..., None], cand, best)
        best_d2 = jnp.minimum(best_d2, d2)
    return best


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
    precision: str = "fast",
):
    r"""Radial pair-distance histogram for a single frame.

    Parameters
    ----------
    pos1, pos2 : `jax.Array`
        Particle positions, shapes ``(N_1, 3)`` and ``(N_2, 3)``
        (possibly padded; see `n1_real`/`n2_real`).
    box : `jax.Array`
        Orthorhombic box lengths, shape ``(3,)``, or a ``(3, 3)``
        lower-triangular box matrix for triclinic cells.
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
    precision : `str`, static keyword-only
        ``"fast"`` bins in the positions' dtype (float32 streams can
        flip pairs within one ulp of a bin edge vs float64);
        ``"exact"`` (uniform edges only; orthorhombic or triclinic
        boxes) bins in double-float — float64-grade counts from
        float32 streams (:func:`_exact_bin_indices`).

    Returns
    -------
    counts : `jax.Array`
        Histogram counts, shape ``(n_bins,)``, float accumulator.
    """

    n_bins = edges.shape[0] - 1
    n1, n2 = pos1.shape[0], pos2.shape[0]
    n1_real = n1 if n1_real is None else n1_real
    n2_real = n2 if n2_real is None else n2_real
    exact = precision == "exact"

    def block_counts(a, b, i0, j0, ni, nj):
        if exact:
            idx = _exact_bin_indices(a, b, box, edges, n_bins)
            weights = jnp.ones((a.shape[0], b.shape[0]), jnp.float32)
        else:
            dist, weights = _pair_block_histogram(
                a, b, box, edges, i0, j0, None, n_bins
            )
        i_idx = i0 + jax.lax.broadcasted_iota(
            jnp.int32, (a.shape[0], b.shape[0]), 0
        )
        j_idx = j0 + jax.lax.broadcasted_iota(
            jnp.int32, (a.shape[0], b.shape[0]), 1
        )
        if exclusion is not None:
            e0, e1 = exclusion
            weights = weights * (i_idx // e0 != j_idx // e1)
        weights = weights * (i_idx < ni) * (j_idx < nj)
        if exact:
            # Invalid (spilled) pairs already sit in the discard row.
            return _contract_bins(
                jnp.where(weights > 0, idx, n_bins),
                weights.astype(jnp.float32),
                n_bins,
            )
        return _bin_distances(dist, edges, weights, n_bins)

    if n1 * n2 <= tile * tile:
        return block_counts(pos1, pos2, 0, 0, n1_real, n2_real)

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
        return carry + block_counts(
            a, b, ti * tile, tj * tile, n1_real, n2_real
        ), None

    init = jnp.zeros(
        n_bins,
        dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32,
    )
    counts, _ = jax.lax.scan(
        block, init, jnp.arange(nt1 * nt2, dtype=jnp.int32)
    )
    return counts


def displacement_histogram_frame(
    pos1,
    pos2,
    box,
    edges,
    *,
    n_real=None,
    precision: str = "fast",
):
    r"""Histogram of ELEMENTWISE minimum-image displacement magnitudes
    :math:`|\mathbf{r}_{1,i} - \mathbf{r}_{2,i}|` for one frame — the
    van Hove *self*-part histogram (compare
    :func:`radial_histogram_frame`, which histograms all pairs).

    Parameters
    ----------
    pos1, pos2 : `jax.Array`
        Same-ordering particle positions, both ``(N, 3)`` (wrapped;
        the minimum image resolves the crossing of periodic
        boundaries between the two frames).
    box : `jax.Array`
        ``(3,)`` orthorhombic lengths or a ``(3, 3)`` lower-triangular
        box matrix.
    edges : `jax.Array`
        Monotonic bin edges, shape ``(n_bins + 1,)``.
    n_real : `int`, optional
        Number of real (unpadded) rows.
    precision : `str`, static keyword-only
        ``"fast"`` bins in the positions' dtype; ``"exact"`` (uniform
        edges) bins float32 streams in double-float — float64-grade
        counts without emulated f64 (:func:`_exact_bin_indices`).

    Returns
    -------
    counts : `jax.Array`
        Histogram counts, shape ``(n_bins,)``, float accumulator.
    """

    n_bins = edges.shape[0] - 1
    n = pos1.shape[0]
    n_real = n if n_real is None else n_real
    valid = jax.lax.iota(jnp.int32, n) < n_real
    weights = valid.astype(jnp.float32)
    if precision == "exact":
        idx = _exact_bin_indices(
            pos1, pos2, box, edges, n_bins, elementwise=True
        )
        return _contract_bins(
            jnp.where(valid, idx, n_bins), weights, n_bins
        )
    box = box.astype(pos1.dtype)
    dist = _min_image_distance(pos1 - pos2, box)
    return _bin_distances(dist, edges, weights, n_bins)


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
    precision: str = "fast",
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
            precision=precision,
        ),
        (pos1, pos2, box),
    )
    return (per_frame * mask[:, None]).sum(axis=0)
