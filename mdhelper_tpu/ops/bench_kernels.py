r"""
Benchmark-grade fused kernels (float32 TPU path)
================================================

The production-throughput formulation of the benchmark pipeline
(RDF + S(q) + displacement accumulation) in pure XLA, designed around
TPU units rather than translated from the reference:

* **Histogram via MXU matmul.**  Scatter-adds serialize on TPU, so the
  per-pair bin index is factorized into (coarse, fine) digits with
  ``n_coarse * n_fine >= n_bins + 1`` and the histogram becomes
  ``counts[c, f] = sum_p A[p, c] * B[p, f]`` — an
  ``(n_coarse, P) @ (P, n_fine)`` contraction on the systolic array,
  with the 0/1 digit indicators built by broadcast compares on the
  VPU.  This replaces the reference's ``capped_distance`` +
  ``numpy.histogram`` hot loop (``analysis/structure.py:92-104``).
* **Pair tiling.**  The :math:`N^2` minimum-image sweep is tiled
  (i-tile x j-tile) under a ``lax.scan`` so VMEM-sized blocks stream
  through the VPU; the reference's ``n_batches`` memory knob becomes
  this static grid.
* **S(q) trig sums** are the ``(N_q, 3) @ (3, N)`` phase matmul with
  fused sin/cos reductions.
* Block-level f32 partial counts are exact (counts per block stay far
  below 2^24) and are accumulated into float32 carries per step; the
  benchmark accumulates steps in float64 on the host side of the carry
  if exactness over very long runs is needed.
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["pair_histogram_two_level", "fused_analysis_step"]


def _digit_indicators(idx, n_digits):
    """0/1 f32 indicator matrix (P, n_digits) for integer digits."""

    digits = jax.lax.broadcasted_iota(
        jnp.int32, (1, n_digits), 1
    )
    return (idx[:, None] == digits).astype(jnp.float32)


@partial(jax.jit, static_argnames=("n_bins", "tile"))
def pair_histogram_two_level(
    positions, box, r_max, n_bins: int, tile: int = 2048
):
    r"""All-pairs min-image distance histogram with uniform bins on
    ``[0, r_max]`` via the two-level MXU matmul factorization.

    Self-pairs (i == j, distance 0) are included in bin 0; subtract
    ``N`` afterwards for an exclusion-(1,1) histogram.

    Parameters
    ----------
    positions : `jax.Array`
        Coordinates, shape ``(N, 3)`` float32.
    box : `jax.Array` or `float`
        Cubic/orthorhombic box lengths (scalar or ``(3,)``).
    r_max : `float`
        Histogram range upper bound.
    n_bins : `int`
        Number of bins.
    tile : `int`
        Atom tile edge for the pair blocks.

    Returns
    -------
    counts : `jax.Array`
        float32 counts, shape ``(n_bins,)``.
    """

    n = positions.shape[0]
    n_fine = 16
    n_coarse = -(-(n_bins + 1) // n_fine)  # ceil; slot n_bins = spill
    inv_dr = jnp.float32(n_bins / r_max)
    spill = jnp.int32(n_bins)

    pad = (-n) % tile
    padded = jnp.pad(positions, ((0, pad), (0, 0)))
    n_tiles = padded.shape[0] // tile
    tiles = padded.reshape(n_tiles, tile, 3)
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (n_tiles * tile, 1), 0)
        < n
    ).astype(jnp.float32).reshape(n_tiles, tile)

    box = jnp.asarray(box, dtype=jnp.float32)

    def block(carry, index):
        ti, tj = index // n_tiles, index % n_tiles
        a = jax.lax.dynamic_index_in_dim(tiles, ti, keepdims=False)
        b = jax.lax.dynamic_index_in_dim(tiles, tj, keepdims=False)
        va = jax.lax.dynamic_index_in_dim(valid, ti, keepdims=False)
        vb = jax.lax.dynamic_index_in_dim(valid, tj, keepdims=False)

        delta = a[:, None, :] - b[None, :, :]
        delta = delta - box * jnp.round(delta / box)
        dist_sq = (delta * delta).sum(axis=-1)
        dist = jnp.sqrt(dist_sq)

        idx = jnp.floor(dist * inv_dr).astype(jnp.int32)
        in_range = (idx < n_bins) & (
            (va[:, None] * vb[None, :]) > 0
        )
        idx = jnp.where(in_range, idx, spill)

        flat = idx.reshape(-1)
        coarse = _digit_indicators(flat // n_fine, n_coarse)
        fine = _digit_indicators(flat % n_fine, n_fine)
        # (n_coarse, P) @ (P, n_fine) on the MXU.
        partial_counts = jax.lax.dot_general(
            coarse,
            fine,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return carry + partial_counts, None

    init = jnp.zeros((n_coarse, n_fine), jnp.float32)
    counts2d, _ = jax.lax.scan(
        block, init, jnp.arange(n_tiles * n_tiles, dtype=jnp.int32)
    )
    counts = counts2d.reshape(-1)[: n_bins + 1]
    # Drop the spill slot; remove padded-row contributions already
    # masked out above.
    return counts[:n_bins]


def fused_analysis_step(carry, positions, box, qs, edges_sq):
    """One benchmark step: fold a ``(B, N, 3)`` float32 frame batch
    into the (RDF counts, S(q), displacement moment) carry."""

    n_bins = carry["counts"].shape[0]
    r_max = jnp.sqrt(edges_sq[-1])
    n = positions.shape[1]

    def frame(carry, pos):
        counts = pair_histogram_two_level(
            pos, box, r_max, n_bins
        )
        # Exclusion (1, 1): remove the N self-pairs from bin 0.
        counts = counts.at[0].add(-jnp.float32(n))

        phases = jnp.matmul(
            qs, pos.T, precision=jax.lax.Precision.HIGHEST
        )  # (N_q, N) MXU — full f32: bf16 phases are unusable
        cos = jnp.cos(phases).sum(axis=1)
        sin = jnp.sin(phases).sum(axis=1)

        disp = ((pos - pos.mean(axis=0)) ** 2).sum()

        return {
            "counts": carry["counts"] + counts,
            "ssf": carry["ssf"] + cos**2 + sin**2,
            "disp": carry["disp"] + disp,
        }, None

    carry, _ = jax.lax.scan(frame, carry, positions)
    return carry
