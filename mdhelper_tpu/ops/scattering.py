r"""
Scattering (structure-factor) kernels
=====================================

The :math:`\sum_\mathbf{r} \exp(i\,\mathbf{q}\cdot\mathbf{r})` sweep —
the hottest loop in the reference
(``/root/reference/src/mdhelper/algorithm/accelerated.py:81-165``,
:math:`\mathcal{O}(N_q N)` complex exponentials per frame per group).

TPU formulation: the phase matrix :math:`\mathbf{q}\cdot\mathbf{r}^T`
is an ``(N_q, 3) @ (3, N)`` matmul (MXU), followed by fused cos/sin and
a row reduction (VPU).  Everything stays real-valued — complex arrays
cannot be materialized on this TPU platform — so all functions return
``(sum cos, sum sin)`` pairs; :math:`|\sum e^{iqr}|^2` is then
``cos_sum**2 + sin_sum**2`` (the reference's "trig" form,
``analysis/structure.py:1238-1314``, which it notes is overflow-safe).
"""

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["trig_sums_frame", "trig_sums_batch", "ssf_from_trig_sums"]

_TWO_PI = 2 * np.pi
_TWO_PI_HI = np.float32(_TWO_PI)
_TWO_PI_LO = np.float32(_TWO_PI - np.float64(_TWO_PI_HI))


def _exact_phases(qs, pos, qs_lo=None):
    r"""Range-reduced phases :math:`\mathbf{q}\cdot\mathbf{r} \bmod
    2\pi` in double-float (two-float32) arithmetic.

    Large phases (hundreds of radians at 100k-atom box scales) lose
    ~:math:`|\phi|\,\varepsilon_{32}` of angular precision in a naive
    float32 dot product; computing the dot and the modular reduction
    error-free and correcting the trig to first order in the residual
    restores ~1e-7-level phase accuracy on the fast VPU path.

    ``qs_lo`` optionally carries the low words of double-float
    wavevectors (float64 q split as hi + lo): the ``lo * r`` products
    fold into the error terms, so float64-grade wavevectors survive a
    float32 compute path without any float64 emulation on the device.
    """

    from .doublefloat import df_add, df_sub, two_prod

    phase = None
    for k in range(3):
        term = two_prod(qs[:, None, k], pos[None, :, k])
        if qs_lo is not None:
            term = (
                term[0],
                term[1] + qs_lo[:, None, k] * pos[None, :, k],
            )
        phase = term if phase is None else df_add(phase, term)

    # phi - 2*pi*round(phi / 2*pi), with 2*pi as a double-float.
    turns = jnp.round(phase[0] / _TWO_PI_HI)
    correction = two_prod(turns, _TWO_PI_HI)
    reduced = df_sub(
        phase, (correction[0], correction[1] + turns * _TWO_PI_LO)
    )
    return reduced


def trig_sums_frame(
    qs, pos, weights=None, *, precision: str = "fast",
    q_tile: int = 1024,
):
    r"""Per-wavevector :math:`\sum_j w_j\cos(\mathbf{q}\cdot
    \mathbf{r}_j)` and :math:`\sum_j w_j\sin(\cdot)` for one frame.

    Parameters
    ----------
    qs : `jax.Array`
        Wavevectors, shape ``(N_q, 3)``.
    pos : `jax.Array`
        Positions, shape ``(N, 3)``.
    weights : `jax.Array`, optional
        Per-particle weights (e.g. padding mask or form factors),
        shape ``(N,)``.
    precision : `str`, keyword-only
        ``"fast"``: phase matmul in the input dtype (MXU).
        ``"exact"``: double-float phases reduced mod :math:`2\pi` with
        a first-order trig correction — float64-grade sums from
        float32 inputs without TPU float64 emulation.

    Returns
    -------
    cos_sum, sin_sum : `jax.Array`
        Shape ``(N_q,)`` each.
    """

    # The sweep runs in the positions' dtype: f64 wavevectors must not
    # promote f32 TPU position streams to emulated f64.  On the exact
    # path f64 wavevectors are split hi + lo (double-float), so no
    # wavevector precision is lost in the cast.
    if weights is not None:
        weights = weights.astype(pos.dtype)
    if precision == "exact":
        if qs.dtype != pos.dtype:
            qs_hi = qs.astype(pos.dtype)
            qs_lo = (qs - qs_hi).astype(pos.dtype)
        else:
            qs_hi, qs_lo = qs, None

        # Tile the wavevector axis: the double-float intermediates are
        # several (q_tile, N) buffers, which must stay well under HBM.
        n_q = qs.shape[0]
        n_tiles = max(1, -(-n_q // q_tile))
        pad = n_tiles * q_tile - n_q
        qs_tiles = jnp.pad(qs_hi, ((0, pad), (0, 0))).reshape(
            n_tiles, q_tile, 3
        )
        lo_tiles = (
            None
            if qs_lo is None
            else jnp.pad(qs_lo, ((0, pad), (0, 0))).reshape(
                n_tiles, q_tile, 3
            )
        )

        def tile_fn(blocks):
            q_block, lo_block = blocks
            hi, lo = _exact_phases(q_block, pos, lo_block)
            cos_hi, sin_hi = jnp.cos(hi), jnp.sin(hi)
            # First-order correction: lo is ~1 ulp of the phase.
            cos = cos_hi - lo * sin_hi
            sin = sin_hi + lo * cos_hi
            if weights is not None:
                cos = cos * weights
                sin = sin * weights
            return cos.sum(axis=-1), sin.sum(axis=-1)

        if lo_tiles is None:
            cos_t, sin_t = jax.lax.map(
                lambda q: tile_fn((q, None)), qs_tiles
            )
        else:
            cos_t, sin_t = jax.lax.map(
                tile_fn, (qs_tiles, lo_tiles)
            )
        return cos_t.reshape(-1)[:n_q], sin_t.reshape(-1)[:n_q]

    # HIGHEST: the default bf16 MXU pass loses ~2e-3 of phase —
    # useless for trig arguments; full-f32 6-pass is still MXU-bound.
    phases = jnp.matmul(
        qs.astype(pos.dtype), pos.T,
        precision=jax.lax.Precision.HIGHEST,
    )  # (N_q, N) — MXU
    cos = jnp.cos(phases)
    sin = jnp.sin(phases)
    if weights is not None:
        cos = cos * weights
        sin = sin * weights
    return cos.sum(axis=-1), sin.sum(axis=-1)


def trig_sums_batch(qs, pos, weights=None):
    """Batched :func:`trig_sums_frame`: `pos` has shape ``(B, N, 3)``;
    returns ``(B, N_q)`` cos/sin sums."""

    return jax.vmap(
        lambda p: trig_sums_frame(qs, p, weights)
    )(pos)


def ssf_from_trig_sums(cos_sum, sin_sum, mask):
    r"""Accumulate :math:`\sum_\mathrm{frames} |\sum_j e^{iqr_j}|^2`
    from per-frame trig sums with a frame mask; shape ``(N_q,)``."""

    ssf = cos_sum**2 + sin_sum**2
    return (ssf * mask[:, None]).sum(axis=0)
