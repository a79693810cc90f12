"""
Accelerated kernels
===================

JAX/XLA equivalents of the reference's Numba kernel library
(``/root/reference/src/mdhelper/algorithm/accelerated.py``).  Where the
reference hand-writes serial and ``prange``-parallel loop variants, the
XLA compiler parallelizes and fuses these expressions automatically, so
each ``*_parallel_*`` name is an alias of the single implementation.
The ``q @ r.T`` inner products ride the MXU; the trig reductions fuse
onto the VPU.  The heavily tiled production versions of these kernels
(used by the structure-factor analyses) live in
:mod:`mdhelper_tpu.ops.scattering`.

The ``*_inplace_*`` variants exist for API parity: JAX arrays are
immutable, so they compute functionally and write the result into the
provided NumPy output buffer.
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "dot_1d_1d",
    "delta_fourier_transform_1d_1d",
    "delta_fourier_transform_sum_2d_2d",
    "delta_fourier_transform_sum_parallel_2d_2d",
    "inner_2d_2d",
    "inner_parallel_2d_2d",
    "pythagorean_trigonometric_identity_1d",
    "pythagorean_trigonometric_identity_1d_1d",
    "cosine_sum_1d",
    "cosine_sum_2d",
    "cosine_sum_parallel_2d",
    "cosine_sum_inplace_2d",
    "cosine_sum_inplace_parallel_2d",
    "sine_sum_1d",
    "sine_sum_2d",
    "sine_sum_parallel_2d",
    "sine_sum_inplace_2d",
    "sine_sum_inplace_parallel_2d",
]


@jax.jit
def dot_1d_1d(a, b):
    r"""Dot product of two ``(3,)`` vectors.
    Parity: ``accelerated.py:12-43``."""

    return jnp.dot(jnp.asarray(a), jnp.asarray(b))


@jax.jit
def delta_fourier_transform_1d_1d(q, r):
    r""":math:`\exp(i\,\mathbf{q}\cdot\mathbf{r})` for single vectors.
    Parity: ``accelerated.py:45-79``."""

    return jnp.exp(1j * jnp.dot(jnp.asarray(q), jnp.asarray(r)))


@jax.jit
def delta_fourier_transform_sum_2d_2d(qs, rs):
    r""":math:`\sum_\mathbf{r} \exp(i\,\mathbf{q}\cdot\mathbf{r})` for
    every wavevector in `qs` (shape ``(N_q, 3)``) over all positions in
    `rs` (shape ``(N_r, 3)``); returns shape ``(N_q,)``.

    Parity: ``accelerated.py:81-165``.  The phase matrix is a single
    ``(N_q, 3) @ (3, N_r)`` matmul (MXU) followed by fused cos/sin
    reductions.
    """

    phases = jnp.matmul(
        jnp.asarray(qs), jnp.asarray(rs).T,
        precision=jax.lax.Precision.HIGHEST,
    )
    return (
        jnp.cos(phases).sum(axis=1) + 1j * jnp.sin(phases).sum(axis=1)
    )


delta_fourier_transform_sum_parallel_2d_2d = (
    delta_fourier_transform_sum_2d_2d
)


@jax.jit
def inner_2d_2d(qs, rs):
    r"""All pairwise inner products: ``(N_q, 3) x (N_r, 3) ->
    (N_q, N_r)``.  Parity: ``accelerated.py:167-247``."""

    return jnp.matmul(
        jnp.asarray(qs), jnp.asarray(rs).T,
        precision=jax.lax.Precision.HIGHEST,
    )


inner_parallel_2d_2d = inner_2d_2d


@jax.jit
def pythagorean_trigonometric_identity_1d(r):
    r""":math:`(\sum_i \cos r_i)^2 + (\sum_i \sin r_i)^2`.
    Parity: ``accelerated.py:249-280``."""

    r = jnp.asarray(r)
    return jnp.cos(r).sum() ** 2 + jnp.sin(r).sum() ** 2


@jax.jit
def pythagorean_trigonometric_identity_1d_1d(r, s):
    r""":math:`2(\sum_i \cos r_i \sum_j \cos s_j +
    \sum_i \sin r_i \sum_j \sin s_j)`.
    Parity: ``accelerated.py:281-321``."""

    r, s = jnp.asarray(r), jnp.asarray(s)
    return 2 * (
        jnp.cos(r).sum() * jnp.cos(s).sum()
        + jnp.sin(r).sum() * jnp.sin(s).sum()
    )


@jax.jit
def cosine_sum_1d(x):
    r""":math:`\sum_i \cos x_i`. Parity: ``accelerated.py:323-351``."""

    return jnp.cos(jnp.asarray(x)).sum()


@jax.jit
def cosine_sum_2d(xs):
    r"""Row-wise :math:`\sum_j \cos x_{ij}` for shape ``(N, M)``.
    Parity: ``accelerated.py:353-415``."""

    return jnp.cos(jnp.asarray(xs)).sum(axis=1)


cosine_sum_parallel_2d = cosine_sum_2d


def cosine_sum_inplace_2d(xs, s) -> None:
    r"""Row-wise cosine sums written into the NumPy buffer `s`.
    Parity: ``accelerated.py:417-474``."""

    np.copyto(s, np.asarray(cosine_sum_2d(xs)))


cosine_sum_inplace_parallel_2d = cosine_sum_inplace_2d


@jax.jit
def sine_sum_1d(x):
    r""":math:`\sum_i \sin x_i`. Parity: ``accelerated.py:476-504``."""

    return jnp.sin(jnp.asarray(x)).sum()


@jax.jit
def sine_sum_2d(xs):
    r"""Row-wise :math:`\sum_j \sin x_{ij}` for shape ``(N, M)``.
    Parity: ``accelerated.py:506-568``."""

    return jnp.sin(jnp.asarray(xs)).sum(axis=1)


sine_sum_parallel_2d = sine_sum_2d


def sine_sum_inplace_2d(xs, s) -> None:
    r"""Row-wise sine sums written into the NumPy buffer `s`.
    Parity: ``accelerated.py:570-627``."""

    np.copyto(s, np.asarray(sine_sum_2d(xs)))


sine_sum_inplace_parallel_2d = sine_sum_inplace_2d
