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


def save_carry(path: str, carry, frames_done: int) -> None:
    """Write a carry pytree and the number of processed frames."""

    leaves, treedef = jax.tree.flatten(carry)
    arrays = {
        f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)
    }
    np.savez(
        path,
        __frames_done__=np.int64(frames_done),
        __n_leaves__=np.int64(len(leaves)),
        **arrays,
    )


def load_carry(path: str, template):
    """Restore ``(carry, frames_done)`` from `path`, shaping the leaves
    like `template` (dtypes/devices follow the template's leaves)."""

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
    return jax.tree.unflatten(treedef, leaves), frames_done
