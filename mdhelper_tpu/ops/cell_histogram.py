r"""
Cell-list pair histogram
========================

Cutoff-aware formulation of the RDF hot loop: when the histogram range
is much smaller than the box, the :math:`N^2` sweep wastes almost all
of its pair work.  This kernel builds a device-side cell list by
*sorting* (the TPU-friendly substitute for the reference's
``capped_distance`` C cell lists, ``analysis/structure.py:92-104``):

1. assign each atom a cell id (cells no smaller than the cutoff),
2. ``argsort`` atoms by cell, derive per-cell start/count by binary
   search, and build a fixed-capacity ``(n_cells, capacity)`` slot
   table over the *sorted* order,
3. stream sorted-atom chunks: each atom against the concatenated
   27-neighbor-cell slots (gathers), minimum-image distances, and the
   two-level one-hot MXU matmul histogram.

The i-side is exactly ``N`` atoms (no per-cell padding waste); only the
j-side pays the capacity padding.  Everything is static-shaped;
`capacity` bounds the atoms per cell and the achieved maximum occupancy
is returned for a host-side overflow check (re-plan with a larger
`capacity_factor` on overflow).

Float32 note: bin boundary assignment can differ from other
implementations by one ulp of the distance for pairs that sit exactly
on an edge; integer-exactness of the counts themselves is preserved
(per-chunk partial counts stay far below 2^24).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "cell_histogram_plan",
    "neighbor_cell_ids",
    "cell_pair_histogram",
]


def cell_histogram_plan(
    n_atoms: int,
    box,
    r_max: float,
    *,
    capacity_factor: float = 1.6,
) -> dict:
    """Static cell-grid geometry for a given box/cutoff (host side)."""

    box = np.asarray(box, dtype=float)
    n_cells_dim = np.maximum(3, np.floor(box / r_max).astype(int))
    n_cells = int(np.prod(n_cells_dim))
    mean_occupancy = n_atoms / n_cells
    capacity = int(math.ceil(mean_occupancy * capacity_factor)) + 4
    capacity = -(-capacity // 8) * 8  # sublane-align
    return {
        "n_cells_dim": tuple(int(n) for n in n_cells_dim),
        "n_cells": n_cells,
        "capacity": capacity,
    }


def neighbor_cell_ids(n_cells_dim) -> np.ndarray:
    """(n_cells, 27) linear ids of each cell's periodic neighbors."""

    nx, ny, nz = n_cells_dim
    cx, cy, cz = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    cells = np.stack((cx.ravel(), cy.ravel(), cz.ravel()), axis=1)
    offsets = np.stack(
        np.meshgrid(*[np.arange(-1, 2)] * 3, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    neighbor = (cells[:, None, :] + offsets[None, :, :]) % np.array(
        n_cells_dim
    )
    return (
        neighbor[..., 0] * ny * nz
        + neighbor[..., 1] * nz
        + neighbor[..., 2]
    ).astype(np.int32)


# Backwards-compatible private alias.
_neighbor_cell_ids = neighbor_cell_ids


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_cells_dim", "capacity", "n_bins", "cell_block", "exclusion",
        "precision", "r_max",
    ),
)
def cell_pair_histogram(
    positions,
    box,
    r_max,
    neighbor_ids,
    *,
    n_cells_dim,
    capacity: int,
    n_bins: int,
    exclusion=None,
    cell_block: int = 8,
    precision: str = "fast",
):
    r"""All-pairs histogram with uniform bins on ``[0, r_max]`` using a
    sorted cell list; returns ``(counts, max_occupancy)``.

    Parameters
    ----------
    positions : `jax.Array`
        Wrapped coordinates, shape ``(N, 3)`` float32.
    box : `jax.Array`
        Orthorhombic box lengths ``(3,)``.
    r_max : `float`
        Histogram upper bound (must not exceed the cell size).
    neighbor_ids : `jax.Array`
        ``(n_cells, 27)`` table from :func:`neighbor_cell_ids`.
    exclusion : `tuple`, static keyword-only, optional
        ``(e0, e1)`` tile exclusion on the original atom indices.
    precision : `str`, static keyword-only
        ``"fast"`` computes distances in the input dtype (float32 bin
        boundaries jitter by ~1 ulp of the distance); ``"exact"``
        evaluates the squared distance and the bin-boundary comparison
        in double-float (two-float32) arithmetic — exact for float32
        coordinates — so the counts match a float64 oracle while
        staying on the fast VPU path (native float64 is emulated ~100x
        slower on TPU).  The one-hot binning matmul stays float32
        (counts are exact integers well below 2^24 per block).
    """

    n = positions.shape[0]
    nx, ny, nz = n_cells_dim
    n_cells = nx * ny * nz
    box = jnp.asarray(box, dtype=positions.dtype)
    cell_size = box / jnp.array([nx, ny, nz], dtype=positions.dtype)

    # 1. Cell ids + sort.
    cell_xyz = jnp.clip(
        jnp.floor(positions / cell_size).astype(jnp.int32),
        0,
        jnp.array([nx - 1, ny - 1, nz - 1], dtype=jnp.int32),
    )
    cid = (
        cell_xyz[:, 0] * (ny * nz)
        + cell_xyz[:, 1] * nz
        + cell_xyz[:, 2]
    )
    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    sorted_pos = positions[order]

    # 2. Fixed-capacity slot table over the sorted order.
    cell_range = jnp.arange(n_cells, dtype=cid.dtype)
    starts = jnp.searchsorted(sorted_cid, cell_range, side="left")
    ends = jnp.searchsorted(sorted_cid, cell_range, side="right")
    occupancy = (ends - starts).astype(jnp.int32)
    max_occupancy = occupancy.max()

    slots = jnp.arange(capacity, dtype=jnp.int32)
    table_slots = jnp.clip(
        starts[:, None].astype(jnp.int32) + slots[None, :], 0, n - 1
    )  # (n_cells, capacity) indices into the sorted arrays
    table_valid = slots[None, :] < occupancy[:, None]

    n_fine = 16
    n_coarse = -(-(n_bins + 1) // n_fine)
    spill = jnp.int32(n_bins)

    def digits(idx_flat, count):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, count), 1)
        return (idx_flat[:, None] == iota).astype(jnp.float32)

    # 3. Stream blocks of cells: each cell's atoms (i) against the
    # concatenated 27-neighbor-cell slots (j).  Gathering whole cells
    # amortizes the j-neighborhood gather over every atom in the cell
    # (a per-atom formulation gathers ~capacity x more data and loses
    # to the brute-force sweep on TPU).
    n_blocks = -(-n_cells // cell_block)
    pad_cells = n_blocks * cell_block - n_cells
    block_slots = jnp.pad(table_slots, ((0, pad_cells), (0, 0))).reshape(
        n_blocks, cell_block, capacity
    )
    block_valid = jnp.pad(table_valid, ((0, pad_cells), (0, 0))).reshape(
        n_blocks, cell_block, capacity
    )
    block_nbrs = jnp.pad(neighbor_ids, ((0, pad_cells), (0, 0))).reshape(
        n_blocks, cell_block, 27
    )

    inv_dr = jnp.asarray(n_bins, positions.dtype) / jnp.asarray(
        r_max, positions.dtype
    )
    if precision == "exact":
        # Bin-boundary constants dr^2 = (r_max / n_bins)^2 as a
        # double-float (host-side split of the float64 value).
        dr2_wide = np.float64(r_max) ** 2 / np.float64(n_bins) ** 2
        dr2_hi = np.float32(dr2_wide)
        dr2_lo = np.float32(dr2_wide - np.float64(dr2_hi))

    def _exact_bin_index(i_pos, j_pos):
        """Exact bin assignment via double-float squared distances:
        idx such that (idx*dr)^2 <= d^2 < ((idx+1)*dr)^2."""

        from .doublefloat import (
            df_ge,
            df_lt,
            df_sum3,
            df_square,
            df_sub,
            two_diff,
            two_prod,
        )

        components = []
        for k in range(3):
            s, e = two_diff(
                i_pos[:, :, None, k], j_pos[:, None, :, k]
            )
            # Wrapped inputs: the image multiple is in {-1, 0, 1}, so
            # m * box is exact in float32 — no two_prod needed.
            m = jnp.round(s / box[k])
            d = df_sub((s, e), (m * box[k], jnp.zeros((), s.dtype)))
            components.append(df_square(d))
        d2 = df_sum3(*components)

        # Float32 estimate, then exact +-1 correction against the
        # double-float bin boundaries (k*dr)^2 = k^2 * dr^2.
        idx = jnp.floor(
            jnp.sqrt(jnp.maximum(d2[0], 0.0)) * inv_dr
        ).astype(jnp.int32)
        idx = jnp.clip(idx, 0, n_bins)

        def boundary(k):
            k2 = (k * k).astype(jnp.float32)  # exact for k <= 2048
            bh, bl = two_prod(k2, jnp.float32(dr2_hi))
            return bh, bl + k2 * jnp.float32(dr2_lo)

        idx = (
            idx
            + df_ge(d2, boundary(idx + 1)).astype(jnp.int32)
            - df_lt(d2, boundary(idx)).astype(jnp.int32)
        )
        return idx

    def block_fn(carry, inputs):
        i_slots, i_valid, nbrs = inputs
        i_pos = sorted_pos[i_slots]  # (B, cap, 3)
        j_slots = table_slots[nbrs].reshape(
            cell_block, 27 * capacity
        )
        j_valid = table_valid[nbrs].reshape(cell_block, 27 * capacity)
        j_pos = sorted_pos[j_slots]  # (B, 27c, 3)

        if precision == "exact":
            idx = _exact_bin_index(i_pos, j_pos)
        else:
            delta = i_pos[:, :, None, :] - j_pos[:, None, :, :]
            delta = delta - box * jnp.round(delta / box)
            dist = jnp.sqrt((delta * delta).sum(-1))
            idx = jnp.floor(dist * inv_dr).astype(jnp.int32)
        weights = (
            i_valid[:, :, None] & j_valid[:, None, :] & (idx < n_bins)
        )
        if exclusion is not None:
            e0, e1 = exclusion
            i_gidx = order[i_slots]
            j_gidx = order[j_slots]
            weights = weights & (
                i_gidx[:, :, None] // e0 != j_gidx[:, None, :] // e1
            )
        idx = jnp.where(weights, idx, spill).reshape(-1)

        partial = jax.lax.dot_general(
            digits(idx // n_fine, n_coarse),
            digits(idx % n_fine, n_fine),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return carry + partial, None

    init = jnp.zeros((n_coarse, n_fine), jnp.float32)
    counts2d, _ = jax.lax.scan(
        block_fn, init, (block_slots, block_valid, block_nbrs)
    )
    return counts2d.reshape(-1)[:n_bins], max_occupancy
