r"""
Accumulator checkpointing
=========================

Checkpoint/resume for long streaming analyses (SURVEY.md section 5.3/
5.4: the reference persists only final results, ``.npz`` via
``SerialAnalysisBase.save``; simulation restarts live in the AMBER
NetCDF layer).  Here the *carry pytree* — histogram counts, trig-sum
ring buffers, image flags — plus the stream position are saved to a
``.npz`` after every chunk, so a killed analysis resumes mid-
trajectory instead of recomputing.
"""

import numpy as np

import jax

__all__ = ["save_carry", "load_carry"]


def save_carry(path: str, carry, frames_done: int, stores=None) -> None:
    """Write a carry pytree and the number of processed frames.

    `stores` optionally adds host-side store state (per-frame result
    buffers + the store offset, from
    ``SerialAnalysisBase._store_state``) so store-type analyses can
    checkpoint too; keys are saved under a ``store||`` prefix."""

    leaves, treedef = jax.tree.flatten(carry)
    arrays = {
        f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)
    }
    if stores:
        for key, value in stores.items():
            arrays[f"store||{key}"] = np.asarray(value)
    np.savez(
        path,
        __frames_done__=np.int64(frames_done),
        __n_leaves__=np.int64(len(leaves)),
        **arrays,
    )


def load_carry(path: str, template, with_stores: bool = False):
    """Restore ``(carry, frames_done)`` from `path`, shaping the leaves
    like `template` (dtypes/devices follow the template's leaves).
    With ``with_stores=True``, returns ``(carry, frames_done,
    stores)`` where `stores` maps the saved host-store keys back to
    arrays (empty for carry-only checkpoints)."""

    archive = np.load(path)
    frames_done = int(archive["__frames_done__"])
    n_leaves = int(archive["__n_leaves__"])
    template_leaves, treedef = jax.tree.flatten(template)
    if n_leaves != len(template_leaves):
        raise ValueError(
            f"Checkpoint has {n_leaves} leaves but the carry template "
            f"has {len(template_leaves)}; the analysis configuration "
            "changed."
        )
    leaves = []
    for i, ref in enumerate(template_leaves):
        value = archive[f"leaf_{i}"]
        if hasattr(ref, "dtype"):
            import jax.numpy as jnp

            value = jnp.asarray(value, dtype=ref.dtype)
        leaves.append(value)
    carry = jax.tree.unflatten(treedef, leaves)
    if not with_stores:
        return carry, frames_done
    stores = {
        name[len("store||"):]: archive[name]
        for name in archive.files
        if name.startswith("store||")
    }
    return carry, frames_done, stores
