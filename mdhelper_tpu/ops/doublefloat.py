r"""
Double-float (float32 pair) arithmetic
======================================

Error-free transformations for computing float64-grade quantities on
TPU hardware whose native wide type is emulated slowly.  A value is
carried as an unevaluated sum ``hi + lo`` of two float32s (~48
significand bits) — enough to make distance-to-bin assignment of
float32 coordinates *exact*, since products and differences of float32
inputs are exactly representable in the pair.

Classic Dekker/Knuth building blocks, written to survive XLA: the
compiler preserves IEEE semantics (no fast-math reassociation), and
allowing excess precision (FMA contraction) only tightens the error
terms.
"""

import numpy as np

__all__ = [
    "two_sum",
    "two_diff",
    "two_prod",
    "df_add",
    "df_sub",
    "df_sum3",
    "df_square",
    "df_ge",
    "df_lt",
    "df_min",
]

# NumPy scalar (a jaxpr literal, not a captured device constant —
# Pallas kernels reject captured consts): 2^12 + 1 Dekker split.
_SPLITTER = np.float32(4097.0)


def two_sum(a, b):
    """Error-free a + b = s + e (Knuth)."""

    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def two_diff(a, b):
    """Error-free a - b = s + e."""

    s = a - b
    bb = s - a
    e = (a - (s - bb)) - (b + bb)
    return s, e


def _split(a):
    c = _SPLITTER * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free a * b = p + e (Dekker)."""

    p = a * b
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def df_add(x, y):
    """(hi, lo) + (hi, lo) with renormalization."""

    s, e = two_sum(x[0], y[0])
    e = e + x[1] + y[1]
    hi, lo = two_sum(s, e)
    return hi, lo


def df_sub(x, y):
    return df_add(x, (-y[0], -y[1]))


def df_sum3(x, y, z):
    return df_add(df_add(x, y), z)


def df_square(x):
    """(hi, lo)^2 as a double-float."""

    p, e = two_prod(x[0], x[0])
    e = e + 2.0 * x[0] * x[1]
    hi, lo = two_sum(p, e)
    return hi, lo


def df_ge(x, y):
    """x >= y for double-floats (lexicographic on normalized pairs)."""

    return (x[0] > y[0]) | ((x[0] == y[0]) & (x[1] >= y[1]))


def df_lt(x, y):
    return ~df_ge(x, y)


def df_min(x, y):
    """Elementwise minimum of two double-floats."""

    import jax.numpy as jnp

    take_y = df_lt(y, x)
    return (
        jnp.where(take_y, y[0], x[0]),
        jnp.where(take_y, y[1], x[1]),
    )
