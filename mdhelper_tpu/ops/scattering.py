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

import jax
import jax.numpy as jnp

__all__ = ["trig_sums_frame", "trig_sums_batch", "ssf_from_trig_sums"]


def trig_sums_frame(qs, pos, weights=None):
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

    Returns
    -------
    cos_sum, sin_sum : `jax.Array`
        Shape ``(N_q,)`` each.
    """

    phases = qs @ pos.T  # (N_q, N) — MXU
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
