r"""
Pallas cell-list pair histogram
===============================

The flagship RDF kernel, hand-tiled: sorted atom positions are packed
into a 128-aligned ``(3, n_cells * capacity)`` slot table that lives
entirely in VMEM (1-3 MB at 100k atoms), so every one of the
:math:`27 N_\mathrm{cell}` neighbor pair blocks is formed, binned, and
contracted on-chip — no pair-block HBM traffic at all (the XLA
formulation in :mod:`mdhelper_tpu.ops.cell_histogram` streams its
gathered blocks through HBM).  Per grid step (one cell):

1. the cell's i-block is an aligned dynamic lane slice of the table,
2. each neighbor's j-block is another aligned slice (cell ids arrive
   via scalar prefetch, so the addresses are known before the body),
3. minimum-image distances -> bin indices (float32, or double-float
   "exact" — error-free two-float32 arithmetic, matching
   :mod:`mdhelper_tpu.ops.doublefloat`),
4. indices flatten lane-major and the coarse/fine digit one-hots
   contract on the MXU into a ``(n_coarse, n_fine)`` accumulator,
   chunked to bound VMEM.

Parity: the reference's ``capped_distance`` cell lists
(``/root/reference/src/mdhelper/analysis/structure.py:92-104``).
Mosaic constraints shaping the design: dynamic lane slices must be
128-aligned (hence the padded slot table), flattens must be lane-major
``(1, n)``, one-hot digits sit on sublanes, and all static ints enter
as ``np.int32`` (x64 weak-type promotion recurses otherwise).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .doublefloat import (
    df_ge,
    df_lt,
    df_sub,
    df_sum3,
    df_square,
    two_diff,
    two_prod,
)

__all__ = [
    "pallas_cell_plan",
    "cell_pair_histogram_pallas",
    "cross_pair_histogram_pallas",
]


def _cdiv(a, b):
    return -(-a // b)


def pallas_cell_plan(n_atoms, box, r_max, *, capacity_sigmas=4.0):
    """Cell-grid geometry with lane-aligned capacity (host side).

    Capacity is the smallest multiple of 128 above
    ``mean + capacity_sigmas * sqrt(mean) + 4`` — Poisson statistics
    for near-uniform liquids; padded pair work scales with
    ``capacity**2``, so a tight capacity matters (~3x throughput at
    100k atoms vs the naive 1.6x-mean sizing).  Occupancy overflow is
    detected at runtime (the kernel wrapper returns the achieved
    maximum) — re-plan with a larger ``capacity_sigmas`` if it trips.
    """

    box = np.asarray(box, dtype=float)
    n_cells_dim = np.maximum(3, np.floor(box / r_max).astype(int))
    n_cells = int(np.prod(n_cells_dim))
    mean_occupancy = n_atoms / n_cells
    capacity = int(
        np.ceil(
            mean_occupancy
            + capacity_sigmas * np.sqrt(mean_occupancy)
            + 4
        )
    )
    capacity = _cdiv(capacity, 128) * 128  # lane-aligned slots
    return {
        "n_cells_dim": tuple(int(n) for n in n_cells_dim),
        "n_cells": n_cells,
        "capacity": capacity,
    }


def _bin_fast(ip, jp, box, inv_dr):
    d2 = None
    for k in range(3):
        delta = ip[k, :][:, None] - jp[k, :][None, :]
        delta = delta - box[k] * jnp.round(delta / box[k])
        d2 = delta * delta if d2 is None else d2 + delta * delta
    dist = jnp.sqrt(d2)
    # f32 -> i32 truncation == floor for the non-negative product.
    return jax.lax.convert_element_type(dist * inv_dr, jnp.int32)


def _bin_exact(ip, jp, box, inv_dr, dr2_hi, dr2_lo, n_bins):
    """Exact double-float bin assignment: float32-estimated index with
    a +-1 correction against the exact (k*dr)^2 boundaries."""

    components = []
    for k in range(3):
        s, e = two_diff(ip[k, :][:, None], jp[k, :][None, :])
        # Wrapped inputs give s in (-L, L), so the image multiple m is
        # in {-1, 0, 1} and m * L is exact in float32 — no two_prod.
        m = jnp.round(s / box[k])
        d = df_sub((s, e), (m * box[k], np.float32(0.0)))
        components.append(df_square(d))
    d2 = df_sum3(*components)

    idx = jax.lax.convert_element_type(
        jnp.sqrt(jnp.maximum(d2[0], np.float32(0.0))) * inv_dr,
        jnp.int32,
    )
    idx = jnp.minimum(idx, np.int32(n_bins))

    def boundary(k):
        k2 = jax.lax.convert_element_type(k * k, jnp.float32)
        bh, bl = two_prod(k2, dr2_hi)
        return bh, bl + k2 * dr2_lo

    one = np.int32(1)
    idx = (
        idx
        + jnp.where(df_ge(d2, boundary(idx + one)), one, np.int32(0))
        - jnp.where(df_lt(d2, boundary(idx)), one, np.int32(0))
    )
    return idx


def _kernel(
    nbr_ref, occ_ref, pos_ref, out_ref,
    *, capacity, n_bins, n_coarse, n_fine, box, inv_dr,
    dr2_hi, dr2_lo, exact, chunk_rows,
):
    c = pl.program_id(0)
    cap = capacity
    bins_i32 = np.int32(n_bins)
    fine_i32 = np.int32(n_fine)

    i_start = c * np.int32(cap)
    ip = pos_ref[:, pl.ds(pl.multiple_of(i_start, 128), cap)]
    i_occ = occ_ref[c]
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    i_valid = slot_col < i_occ  # (cap, 1)

    # Coarse rows padded to the bfloat16 sublane tile (16): Mosaic
    # cannot relayout a 13-row i1 mask onto the (16, 128) bf16 tiling.
    acc = jnp.zeros((n_coarse, n_fine), jnp.float32)

    def nb_body(nb, acc):
        j_cell = nbr_ref[c, nb]
        j_start = j_cell * np.int32(cap)
        jp = pos_ref[:, pl.ds(pl.multiple_of(j_start, 128), cap)]
        j_occ = occ_ref[j_cell]
        j_valid = lane < j_occ  # (1, cap)

        if exact:
            idx = _bin_exact(
                ip, jp, box, inv_dr, dr2_hi, dr2_lo, n_bins
            )
        else:
            idx = _bin_fast(ip, jp, box, inv_dr)

        # Self-pair exclusion by global slot index.
        gi = i_start + jax.lax.broadcasted_iota(
            jnp.int32, (cap, cap), 0
        )
        gj = j_start + jax.lax.broadcasted_iota(
            jnp.int32, (cap, cap), 1
        )
        valid = i_valid & j_valid & (idx < bins_i32) & (gi != gj)
        idx = jnp.where(valid, idx, bins_i32)

        # Chunked lane-major digit contraction (bounds the one-hot
        # VMEM footprint to 2 * n_fine * chunk_rows * cap entries).
        # The chunk count is static, so unroll with static slices —
        # dynamic i64/i32 index arithmetic inside Mosaic kernel traces
        # recurses in jax's weak-type promotion under x64.  One-hots
        # are built in bfloat16 (0/1 are exact; the MXU runs bf16
        # natively at 2-3x the f32 rate) with float32 accumulation, so
        # the counts stay exact.
        c_iota = jax.lax.broadcasted_iota(
            jnp.int32, (n_coarse, chunk_rows * cap), 0
        )
        f_iota = jax.lax.broadcasted_iota(
            jnp.int32, (n_fine, chunk_rows * cap), 0
        )
        for ch in range(cap // chunk_rows):
            rows = idx[ch * chunk_rows:(ch + 1) * chunk_rows, :]
            flat = rows.reshape(1, chunk_rows * cap)
            # Select in f32 (the i1 mask's native layout), then convert
            # 0/1 exactly to bf16 — Mosaic cannot relayout i1 masks
            # onto the (16, 128) bf16 tiling directly.
            coarse = jax.lax.convert_element_type(
                jnp.where(
                    flat // fine_i32 == c_iota,
                    np.float32(1), np.float32(0),
                ),
                jnp.bfloat16,
            )
            fine = jax.lax.convert_element_type(
                jnp.where(
                    flat % fine_i32 == f_iota,
                    np.float32(1), np.float32(0),
                ),
                jnp.bfloat16,
            )
            acc = acc + jax.lax.dot_general(
                coarse, fine,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc

    acc = jax.lax.fori_loop(0, 27, nb_body, acc)

    @pl.when(c == 0)
    def _():
        out_ref[:] = acc

    @pl.when(c > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


@functools.partial(
    jax.jit,
    static_argnames=(
        "box", "n_cells_dim", "capacity", "n_bins", "r_max",
        "precision", "exclusion",
    ),
)
def cell_pair_histogram_pallas(
    positions,
    neighbor_ids,
    *,
    box,
    r_max,
    n_cells_dim,
    capacity: int,
    n_bins: int,
    precision: str = "fast",
    exclusion=(1, 1),
):
    r"""All-pairs histogram on ``[0, r_max]`` via the Pallas cell-list
    kernel; returns ``(counts, max_occupancy)``.

    Signature mirrors :func:`mdhelper_tpu.ops.cell_histogram.
    cell_pair_histogram` with a plan from :func:`pallas_cell_plan`
    (capacity must be lane-aligned); ``box`` is static here (a tuple
    of floats — the kernel bakes the lengths in).  ``exclusion`` currently supports
    only self-pair removal ``(1, 1)``; molecule-block exclusion goes
    through the XLA kernel.

    The cell build (ids, argsort, searchsorted, padded slot-table
    gather) runs as regular XLA ops; only the pair sweep is the Pallas
    kernel.
    """

    if exclusion != (1, 1):
        raise NotImplementedError(
            "pallas cell histogram supports exclusion=(1, 1) only"
        )
    n = positions.shape[0]
    nx, ny, nz = n_cells_dim
    n_cells = nx * ny * nz
    n_fine = 16
    n_coarse = _cdiv(n_bins + 1, n_fine)
    # bf16 one-hot rows must fill whole (16, 128) sublane tiles.
    n_rows = _cdiv(n_coarse, 16) * 16
    box_static = tuple(np.float32(b) for b in box)
    box = jnp.asarray(box_static, dtype=jnp.float32)
    positions = positions.astype(jnp.float32)
    cell_size = box / jnp.asarray([nx, ny, nz], dtype=jnp.float32)

    # --- cell build (XLA) ---
    cell_xyz = jnp.clip(
        jax.lax.convert_element_type(
            positions / cell_size, jnp.int32
        ),
        0,
        jnp.asarray([nx - 1, ny - 1, nz - 1], dtype=jnp.int32),
    )
    cid = (
        cell_xyz[:, 0] * np.int32(ny * nz)
        + cell_xyz[:, 1] * np.int32(nz)
        + cell_xyz[:, 2]
    )
    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    sorted_pos = positions[order]
    cell_range = jnp.arange(n_cells, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_cid, cell_range, side="left")
    occupancy = (
        jnp.searchsorted(sorted_cid, cell_range, side="right") - starts
    ).astype(jnp.int32)
    max_occupancy = occupancy.max()

    # Padded, lane-aligned slot table: slot s of cell c lives at lane
    # c * capacity + s.  Out-of-occupancy slots hold clipped garbage
    # rows; the kernel masks them by occupancy.
    slots = jnp.arange(capacity, dtype=jnp.int32)
    table = jnp.clip(
        starts[:, None].astype(jnp.int32) + slots[None, :],
        0, np.int32(n - 1),
    ).reshape(-1)
    pos_table = sorted_pos[table].T  # (3, n_cells * capacity)

    inv_dr = np.float32(np.float64(n_bins) / np.float64(r_max))
    dr2_wide = np.float64(r_max) ** 2 / np.float64(n_bins) ** 2
    dr2_hi = np.float32(dr2_wide)
    dr2_lo = np.float32(dr2_wide - np.float64(dr2_hi))

    # One-hot chunking: cap the live one-hot pair to ~8 MB.
    chunk_rows = max(
        8, min(capacity, (4 * 1024 * 1024) // (4 * n_fine * capacity))
    )
    while capacity % chunk_rows:
        chunk_rows //= 2

    kernel = functools.partial(
        _kernel,
        capacity=capacity, n_bins=n_bins,
        n_coarse=n_rows, n_fine=n_fine,
        box=box_static,
        inv_dr=inv_dr, dr2_hi=dr2_hi, dr2_lo=dr2_lo,
        exact=(precision == "exact"), chunk_rows=chunk_rows,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec(
                (3, n_cells * capacity),
                lambda c, s1, s2: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_rows, n_fine),
            lambda c, s1, s2: (jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
    )
    counts2d = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, n_fine), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(neighbor_ids.astype(jnp.int32), occupancy, pos_table)
    return counts2d[:n_coarse].reshape(-1)[:n_bins], max_occupancy


def _cross_kernel(
    nbr_ref, occ1_ref, occ2_ref, pos1_ref, pos2_ref, out_ref,
    *, cap1, cap2, n_bins, n_coarse, n_fine, box, inv_dr,
    dr2_hi, dr2_lo, exact, chunk_rows,
):
    """Cross-group variant of :func:`_kernel`: i atoms from group 1's
    slot table, j atoms from group 2's; no self-pair exclusion (the
    groups must be disjoint)."""

    c = pl.program_id(0)
    bins_i32 = np.int32(n_bins)
    fine_i32 = np.int32(n_fine)

    ip = pos1_ref[:, pl.ds(pl.multiple_of(c * np.int32(cap1), 128), cap1)]
    i_occ = occ1_ref[c]
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (cap1, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap2), 1)
    i_valid = slot_col < i_occ

    acc = jnp.zeros((n_coarse, n_fine), jnp.float32)

    def nb_body(nb, acc):
        j_cell = nbr_ref[c, nb]
        jp = pos2_ref[
            :, pl.ds(pl.multiple_of(j_cell * np.int32(cap2), 128), cap2)
        ]
        j_valid = lane < occ2_ref[j_cell]

        if exact:
            idx = _bin_exact(
                ip, jp, box, inv_dr, dr2_hi, dr2_lo, n_bins
            )
        else:
            idx = _bin_fast(ip, jp, box, inv_dr)

        valid = i_valid & j_valid & (idx < bins_i32)
        idx = jnp.where(valid, idx, bins_i32)

        c_iota = jax.lax.broadcasted_iota(
            jnp.int32, (n_coarse, chunk_rows * cap2), 0
        )
        f_iota = jax.lax.broadcasted_iota(
            jnp.int32, (n_fine, chunk_rows * cap2), 0
        )
        for ch in range(cap1 // chunk_rows):
            flat = idx[ch * chunk_rows:(ch + 1) * chunk_rows, :].reshape(
                1, chunk_rows * cap2
            )
            coarse = jax.lax.convert_element_type(
                jnp.where(
                    flat // fine_i32 == c_iota,
                    np.float32(1), np.float32(0),
                ),
                jnp.bfloat16,
            )
            fine = jax.lax.convert_element_type(
                jnp.where(
                    flat % fine_i32 == f_iota,
                    np.float32(1), np.float32(0),
                ),
                jnp.bfloat16,
            )
            acc = acc + jax.lax.dot_general(
                coarse, fine,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc

    acc = jax.lax.fori_loop(0, 27, nb_body, acc)

    @pl.when(c == 0)
    def _():
        out_ref[:] = acc

    @pl.when(c > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _slot_table(positions, n_cells_dim, capacity, box, cell_size):
    """Device cell build: returns ((3, n_cells*capacity) table,
    (n_cells,) occupancy, max occupancy)."""

    nx, ny, nz = n_cells_dim
    n = positions.shape[0]
    n_cells = nx * ny * nz
    cell_xyz = jnp.clip(
        jax.lax.convert_element_type(positions / cell_size, jnp.int32),
        0,
        jnp.asarray([nx - 1, ny - 1, nz - 1], dtype=jnp.int32),
    )
    cid = (
        cell_xyz[:, 0] * np.int32(ny * nz)
        + cell_xyz[:, 1] * np.int32(nz)
        + cell_xyz[:, 2]
    )
    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    sorted_pos = positions[order]
    cell_range = jnp.arange(n_cells, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_cid, cell_range, side="left")
    occupancy = (
        jnp.searchsorted(sorted_cid, cell_range, side="right") - starts
    ).astype(jnp.int32)
    slots = jnp.arange(capacity, dtype=jnp.int32)
    table = jnp.clip(
        starts[:, None].astype(jnp.int32) + slots[None, :],
        0, np.int32(n - 1),
    ).reshape(-1)
    return sorted_pos[table].T, occupancy, occupancy.max()


@functools.partial(
    jax.jit,
    static_argnames=(
        "box", "n_cells_dim", "capacity1", "capacity2", "n_bins",
        "r_max", "precision",
    ),
)
def cross_pair_histogram_pallas(
    positions1,
    positions2,
    neighbor_ids,
    *,
    box,
    r_max,
    n_cells_dim,
    capacity1: int,
    capacity2: int,
    n_bins: int,
    precision: str = "fast",
):
    r"""Cross-group cutoff histogram: every (group-1, group-2) pair on
    uniform bins ``[0, r_max]``; returns ``(counts, max_occ1,
    max_occ2)``.  The groups must be disjoint atom sets (no self-pair
    exclusion is applied).  Plan each capacity with
    :func:`pallas_cell_plan` on the respective group size.
    """

    nx, ny, nz = n_cells_dim
    n_cells = nx * ny * nz
    n_fine = 16
    n_coarse = _cdiv(n_bins + 1, n_fine)
    n_rows = _cdiv(n_coarse, 16) * 16
    box_static = tuple(np.float32(b) for b in box)
    box_arr = jnp.asarray(box_static, dtype=jnp.float32)
    cell_size = box_arr / jnp.asarray(
        [nx, ny, nz], dtype=jnp.float32
    )

    t1, occ1, max1 = _slot_table(
        positions1.astype(jnp.float32), n_cells_dim, capacity1,
        box_arr, cell_size,
    )
    t2, occ2, max2 = _slot_table(
        positions2.astype(jnp.float32), n_cells_dim, capacity2,
        box_arr, cell_size,
    )

    inv_dr = np.float32(np.float64(n_bins) / np.float64(r_max))
    dr2_wide = np.float64(r_max) ** 2 / np.float64(n_bins) ** 2
    dr2_hi = np.float32(dr2_wide)
    dr2_lo = np.float32(dr2_wide - np.float64(dr2_hi))
    chunk_rows = max(
        8,
        min(capacity1, (4 * 1024 * 1024) // (4 * n_fine * capacity2)),
    )
    while capacity1 % chunk_rows:
        chunk_rows //= 2

    kernel = functools.partial(
        _cross_kernel,
        cap1=capacity1, cap2=capacity2, n_bins=n_bins,
        n_coarse=n_rows, n_fine=n_fine,
        box=box_static, inv_dr=inv_dr, dr2_hi=dr2_hi, dr2_lo=dr2_lo,
        exact=(precision == "exact"), chunk_rows=chunk_rows,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec(
                (3, n_cells * capacity1),
                lambda c, s1, s2, s3: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, n_cells * capacity2),
                lambda c, s1, s2, s3: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_rows, n_fine),
            lambda c, s1, s2, s3: (jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
    )
    counts2d = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, n_fine), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(neighbor_ids.astype(jnp.int32), occ1, occ2, t1, t2)
    return counts2d[:n_coarse].reshape(-1)[:n_bins], max1, max2
