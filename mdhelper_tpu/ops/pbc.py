"""
Periodic-boundary device kernels
================================

Pure-function PBC transforms used inside jitted analysis updates:
minimum-image displacement, wrapping, and the order-dependent
trajectory unwrap expressed as a :func:`jax.lax.scan` over the frame
axis (the reference's per-frame image-flag tracking,
``/root/reference/src/mdhelper/algorithm/topology.py:294-383``).
"""

import jax
import jax.numpy as jnp

__all__ = [
    "min_image_displacement",
    "wrap_positions",
    "unwrap_scan",
    "com_shift_scan",
]


def min_image_displacement(delta, box):
    """Apply the orthorhombic minimum-image convention to displacement
    vectors.  `box` broadcasts against the trailing axis of `delta`."""

    return delta - box * jnp.round(delta / box)


def wrap_positions(positions, box):
    """Wrap coordinates into [0, box) (the jit-friendly variant of
    :func:`mdhelper_tpu.algorithm.topology.wrap`)."""

    return positions - jnp.floor(positions / box) * box


def unwrap_scan(positions, box, initial=None, images=None):
    r"""Unwrap a whole (chunk of a) trajectory with image-flag tracking.

    Sequential over frames (a particle that jumps more than half a box
    length between consecutive frames is assumed to have crossed the
    boundary), expressed as ``lax.scan``: carry = (previous wrapped
    positions, image counts).

    Parameters
    ----------
    positions : `jax.Array`
        Wrapped coordinates, shape ``(T, N, 3)``.
    box : `jax.Array`
        Box lengths, shape ``(3,)`` or ``(T, 3)``.
    initial : `jax.Array`, optional
        Wrapped positions of the frame *preceding* this chunk (carry
        hand-off for chunked streaming).  Defaults to the first frame.
    images : `jax.Array`, optional
        Image counts carried in from the previous chunk.

    Returns
    -------
    unwrapped : `jax.Array`
        Unwrapped coordinates, shape ``(T, N, 3)``.
    carry : `tuple`
        ``(last wrapped frame, last image counts)`` to seed the next
        chunk.
    """

    if initial is None:
        initial = positions[0]
    if images is None:
        images = jnp.zeros(positions.shape[1:], dtype=jnp.int32)
    per_frame_box = box.ndim == 2

    def step(carry, inputs):
        prev, imgs = carry
        if per_frame_box:
            pos, frame_box = inputs
        else:
            pos, frame_box = inputs, box
        half = frame_box / 2
        delta = pos - prev
        crossings = jnp.where(
            jnp.abs(delta) >= half, jnp.sign(delta).astype(jnp.int32), 0
        )
        imgs = imgs - crossings
        return (pos, imgs), pos + imgs * frame_box

    xs = (positions, box) if per_frame_box else positions
    (last, imgs), unwrapped = jax.lax.scan(step, (initial, images), xs)
    return unwrapped, (last, imgs)


def com_shift_scan(unwrapped, masses):
    """Remove system center-of-mass drift from an unwrapped chunk:
    subtracts each frame's mass-weighted mean displacement relative to
    the first frame of the *trajectory* (caller supplies positions
    already referenced consistently)."""

    com = jnp.einsum(
        "a,tad->td", masses, unwrapped,
        precision=jax.lax.Precision.HIGHEST,
    ) / masses.sum()
    return unwrapped - com[:, None, :]
