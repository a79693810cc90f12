r"""
Hand-tiled Pallas TPU kernels for the two hot ops
=================================================

Fused, VMEM-resident formulations of the framework's hottest loops
(the XLA versions live in :mod:`mdhelper_tpu.ops.scattering` and
:mod:`mdhelper_tpu.ops.histogram`; these kernels exist to squeeze the
last HBM round-trips out of them):

* :func:`trig_sums` — the :math:`\sum_j w_j e^{i\mathbf{q}\cdot
  \mathbf{r}_j}` sweep (reference hot loop
  ``/root/reference/src/mdhelper/algorithm/accelerated.py:81-165``).
  Each grid step materializes one ``(q_tile, atom_tile)`` phase block
  *only in VMEM*, applies cos/sin on the VPU, reduces over atoms, and
  accumulates into the q-tile's output block — the ``(N_q, N)`` phase
  matrix never exists in HBM.  Supports the same ``precision="exact"``
  double-float path as the XLA kernel (error-free products, mod-
  :math:`2\pi` reduction, first-order trig correction).

* :func:`pair_histogram` — the brute-force minimum-image pair-distance
  histogram (reference ``analysis/structure.py:92-104``).  Each grid
  step forms one ``(i_tile, j_tile)`` distance block in VMEM, converts
  to bin indices, and contracts two one-hot digit matrices on the MXU
  into a ``(n_coarse, n_fine)`` on-chip accumulator (scatter-free
  binning; TPU scatter-adds serialize).

Both kernels run in interpreter mode off-TPU so the CPU test suite
exercises them (`interpret=True` when the default backend is not TPU).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .doublefloat import df_add, df_sub, two_prod

__all__ = ["trig_sums", "pair_histogram"]

_TWO_PI = 2 * np.pi
_TWO_PI_HI = np.float32(_TWO_PI)
_TWO_PI_LO = np.float32(_TWO_PI - np.float64(_TWO_PI_HI))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_axis(x, axis, multiple, value=0.0):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# ---------------------------------------------------------------------
# S(q) trig sums
# ---------------------------------------------------------------------
def _trig_kernel(q_ref, p_ref, w_ref, cos_ref, sin_ref, *, exact):
    """One (q_tile, atom_tile) block: phases -> cos/sin -> reduce."""

    j = pl.program_id(1)

    if exact:
        phase = None
        for k in range(3):
            term = two_prod(q_ref[k, :][:, None], p_ref[k, :][None, :])
            phase = term if phase is None else df_add(phase, term)
        turns = jnp.round(phase[0] / _TWO_PI_HI)
        corr = two_prod(turns, _TWO_PI_HI)
        hi, lo = df_sub(
            phase, (corr[0], corr[1] + turns * _TWO_PI_LO)
        )
        cos_hi, sin_hi = jnp.cos(hi), jnp.sin(hi)
        cos = cos_hi - lo * sin_hi
        sin = sin_hi + lo * cos_hi
    else:
        phases = (
            q_ref[0, :][:, None] * p_ref[0, :][None, :]
            + q_ref[1, :][:, None] * p_ref[1, :][None, :]
            + q_ref[2, :][:, None] * p_ref[2, :][None, :]
        )
        cos = jnp.cos(phases)
        sin = jnp.sin(phases)

    w = w_ref[0, :][None, :]
    # Output blocks are (8, q_tile) — the minimum float32 sublane
    # tile; row 0 carries the data (rows 1-7 are padding).
    cos_part = jnp.broadcast_to(
        (cos * w).sum(axis=1)[None, :], cos_ref.shape
    )
    sin_part = jnp.broadcast_to(
        (sin * w).sum(axis=1)[None, :], sin_ref.shape
    )

    @pl.when(j == 0)
    def _():
        cos_ref[:] = cos_part
        sin_ref[:] = sin_part

    @pl.when(j > 0)
    def _():
        cos_ref[:] = cos_ref[:] + cos_part
        sin_ref[:] = sin_ref[:] + sin_part


@functools.partial(
    jax.jit, static_argnames=("precision", "q_tile", "atom_tile")
)
def trig_sums(
    qs,
    positions,
    weights=None,
    *,
    precision: str = "fast",
    q_tile: int = 256,
    atom_tile: int = 2048,
):
    r"""Pallas :math:`(\sum_j w_j\cos\mathbf{q}\cdot\mathbf{r}_j,
    \sum_j w_j\sin\cdot)` per wavevector; drop-in for
    :func:`mdhelper_tpu.ops.scattering.trig_sums_frame`.

    Parameters
    ----------
    qs : `jax.Array`
        Wavevectors ``(N_q, 3)`` float32.
    positions : `jax.Array`
        Positions ``(N, 3)`` float32.
    weights : `jax.Array`, optional
        Per-particle weights ``(N,)``.
    precision : `str`, static
        ``"fast"`` (float32 phases) or ``"exact"`` (double-float
        phases reduced mod :math:`2\pi`; see `ops/doublefloat.py`).
    q_tile, atom_tile : `int`, static
        VMEM block sizes (lane-aligned multiples of 128).
    """

    n_q = qs.shape[0]
    n = positions.shape[0]
    if weights is None:
        weights = jnp.ones((n,), jnp.float32)

    qs_t = _pad_axis(qs.T.astype(jnp.float32), 1, q_tile)  # (3, Q)
    pos_t = _pad_axis(
        positions.T.astype(jnp.float32), 1, atom_tile
    )  # (3, N)
    w = _pad_axis(
        weights.astype(jnp.float32)[None, :], 1, atom_tile
    )  # (1, N)

    n_qt = qs_t.shape[1] // q_tile
    n_at = pos_t.shape[1] // atom_tile

    kernel = functools.partial(
        _trig_kernel, exact=(precision == "exact")
    )
    cos, sin = pl.pallas_call(
        kernel,
        grid=(n_qt, n_at),
        in_specs=[
            pl.BlockSpec(
                (3, q_tile), lambda i, j: (jnp.int32(0), i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, atom_tile), lambda i, j: (jnp.int32(0), j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, atom_tile), lambda i, j: (jnp.int32(0), j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (8, q_tile), lambda i, j: (jnp.int32(0), i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, q_tile), lambda i, j: (jnp.int32(0), i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, n_qt * q_tile), jnp.float32),
            jax.ShapeDtypeStruct((8, n_qt * q_tile), jnp.float32),
        ],
        interpret=_interpret(),
    )(qs_t, pos_t, w)
    return cos[0, :n_q], sin[0, :n_q]


# ---------------------------------------------------------------------
# Pair-distance histogram
# ---------------------------------------------------------------------
def _hist_kernel(
    p_i_ref, p_j_ref, w_i_ref, w_j_ref, out_ref,
    *, box, inv_dr, n_bins, n_coarse, n_fine, i_tile, j_tile,
    exclusion,
):
    """One (i_tile, j_tile) pair block -> (n_coarse, n_fine) partial
    counts via two one-hot digit contractions on the MXU."""

    i = pl.program_id(0)
    j = pl.program_id(1)

    # All static integers enter as np.int32 scalars: with x64 enabled,
    # mixing Python ints into i32 arithmetic inside a Mosaic kernel
    # trace recurses endlessly in jax's weak-type promotion.
    bins_i32 = np.int32(n_bins)
    fine_i32 = np.int32(n_fine)

    d2 = None
    for k in range(3):
        delta = p_i_ref[k, :][:, None] - p_j_ref[k, :][None, :]
        delta = delta - box[k] * jnp.round(delta / box[k])
        d2 = delta * delta if d2 is None else d2 + delta * delta
    dist = jnp.sqrt(d2)
    # f32 -> i32 conversion truncates toward zero == floor for the
    # non-negative scaled distances here.
    idx = jax.lax.convert_element_type(dist * inv_dr, jnp.int32)

    valid = (
        (w_i_ref[0, :][:, None] > 0)
        & (w_j_ref[0, :][None, :] > 0)
        & (idx < bins_i32)
    )
    if exclusion is not None:
        e0, e1 = np.int32(exclusion[0]), np.int32(exclusion[1])
        gi = i * np.int32(i_tile) + jax.lax.broadcasted_iota(
            jnp.int32, (i_tile, j_tile), 0
        )
        gj = j * np.int32(j_tile) + jax.lax.broadcasted_iota(
            jnp.int32, (i_tile, j_tile), 1
        )
        valid = valid & (gi // e0 != gj // e1)
    # Flatten the pair block into a single lane-major row — the only
    # full flatten Mosaic supports — and build the digit one-hots with
    # digits on sublanes: (n_coarse, P) and (n_fine, P).  The digit
    # contraction is then an MXU matmul over the long lane axis.
    pairs = i_tile * j_tile
    idx = jnp.where(valid, idx, bins_i32).reshape(1, pairs)

    coarse_iota = jax.lax.broadcasted_iota(
        jnp.int32, (n_coarse, pairs), 0
    )
    fine_iota = jax.lax.broadcasted_iota(
        jnp.int32, (n_fine, pairs), 0
    )
    # bfloat16 one-hots (0/1 exact; native MXU rate) with float32
    # accumulation keep the counts exact.  Selects happen in f32 (the
    # i1 mask's native layout) and convert exactly to bf16: Mosaic
    # cannot relayout i1 masks onto the (16, 128) bf16 tiling.
    one = np.float32(1.0)
    zero = np.float32(0.0)
    coarse = jax.lax.convert_element_type(
        jnp.where(idx // fine_i32 == coarse_iota, one, zero),
        jnp.bfloat16,
    )
    fine = jax.lax.convert_element_type(
        jnp.where(idx % fine_i32 == fine_iota, one, zero),
        jnp.bfloat16,
    )
    partial = jax.lax.dot_general(
        coarse, fine,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[:] = partial

    @pl.when((i > 0) | (j > 0))
    def _():
        out_ref[:] = out_ref[:] + partial


@functools.partial(
    jax.jit,
    static_argnames=(
        "box", "r_max", "n_bins", "exclusion", "i_tile", "j_tile",
    ),
)
def pair_histogram(
    positions,
    box,
    r_max,
    n_bins: int,
    *,
    exclusion=None,
    i_tile: int = 256,
    j_tile: int = 512,
):
    r"""Brute-force all-pairs minimum-image distance histogram with
    ``n_bins`` uniform bins on ``[0, r_max]``; Pallas counterpart of
    :func:`mdhelper_tpu.ops.bench_kernels.pair_histogram_two_level`.

    Parameters
    ----------
    positions : `jax.Array`
        Wrapped coordinates ``(N, 3)`` float32.
    box : `tuple`, static
        Orthorhombic box lengths (3 floats; static — the kernel bakes
        them in, so per-trajectory not per-frame boxes).
    r_max : `float`, static
        Histogram range.
    exclusion : `tuple`, static, optional
        ``(e0, e1)`` index-block exclusion (``(1, 1)`` drops self
        pairs).
    i_tile, j_tile : `int`, static
        Pair-block tile sizes.

    Notes
    -----
    The spill row for out-of-range pairs is bin ``n_bins`` of the
    padded two-level table and is dropped on return.  Partial counts
    per block stay far below 2^24, so float32 accumulation is exact.
    """

    n = positions.shape[0]
    pos_t = _pad_axis(positions.T.astype(jnp.float32), 1, max(i_tile, j_tile))
    w = _pad_axis(
        jnp.ones((1, n), jnp.float32), 1, max(i_tile, j_tile)
    )
    n_pad = pos_t.shape[1]

    n_fine = 16
    # Coarse rows padded to the bf16 sublane tile (16).
    n_coarse = -(-(n_bins + 1) // (n_fine * 16)) * 16
    inv_dr = np.float32(n_bins / r_max)
    box3 = tuple(np.float32(b) for b in box)

    kernel = functools.partial(
        _hist_kernel,
        box=box3, inv_dr=inv_dr, n_bins=n_bins,
        n_coarse=n_coarse, n_fine=n_fine,
        i_tile=i_tile, j_tile=j_tile, exclusion=exclusion,
    )
    counts2d = pl.pallas_call(
        kernel,
        grid=(n_pad // i_tile, n_pad // j_tile),
        in_specs=[
            pl.BlockSpec(
                (3, i_tile), lambda i, j: (jnp.int32(0), i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, j_tile), lambda i, j: (jnp.int32(0), j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, i_tile), lambda i, j: (jnp.int32(0), i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, j_tile), lambda i, j: (jnp.int32(0), j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_coarse, n_fine), lambda i, j: (jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_coarse, n_fine), jnp.float32),
        interpret=_interpret(),
    )(pos_t, pos_t, w, w)
    return counts2d.reshape(-1)[:n_bins]
