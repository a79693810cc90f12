r"""
Pallas cell-list pair histogram
===============================

The flagship RDF kernel, hand-tiled: sorted atom positions are packed
into a 128-aligned ``(8, n_cells * capacity)`` slot table that lives
entirely in VMEM (rows 0-2 hold xyz; rows 3-5 carry the atom id and
the two tile-exclusion ids — a ``(3, S)`` float32 VMEM array is
physically padded to 8 sublanes anyway, so the id rows are free), so
every one of the :math:`27 N_\mathrm{cell}` neighbor pair blocks is
formed, binned, and contracted on-chip — no pair-block HBM traffic at
all (the XLA formulation in :mod:`mdhelper_tpu.ops.cell_histogram`
streams its gathered blocks through HBM).  Per grid step (one cell):

1. the cell's i-block is an aligned dynamic lane slice of the table,
2. each neighbor's j-block is another aligned slice (cell ids arrive
   via scalar prefetch, so the addresses are known before the body),
3. minimum-image distances -> bin indices (float32, or double-float
   "exact" — error-free two-float32 arithmetic, matching
   :mod:`mdhelper_tpu.ops.doublefloat`); the box lengths arrive as
   scalar-prefetch floats, so NPT (per-frame) boxes re-use one
   compiled kernel,
4. identical-atom pairs and ``(e0, e1)`` tile-excluded pairs are
   masked by comparing the id rows,
5. indices flatten lane-major and the coarse/fine digit one-hots
   contract on the MXU into a ``(n_coarse, n_fine)`` accumulator,
   chunked to bound VMEM.

Parity: the reference's ``capped_distance`` cell lists and exclusion
blocks (``/root/reference/src/mdhelper/analysis/structure.py:92-104``).
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
    "pallas_cell_plan_search",
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

    For per-frame (NPT) boxes, plan with the SMALLEST box expected
    along the trajectory: a box shrinking below ``n_cells_dim * r_max``
    invalidates the 27-cell sweep (the kernel wrapper poisons the
    counts with NaN when that happens).
    """

    box = np.asarray(box, dtype=float)
    n_cells_dim = np.maximum(3, np.floor(box / r_max).astype(int))
    n_cells = int(np.prod(n_cells_dim))
    return {
        "n_cells_dim": tuple(int(n) for n in n_cells_dim),
        "n_cells": n_cells,
        "capacity": _aligned_capacity(
            n_atoms, n_cells, capacity_sigmas
        ),
    }


def _aligned_capacity(n_atoms, n_cells, capacity_sigmas):
    """Lane-aligned per-cell slot capacity (shared by the naive plan
    and the grid search): ``mean + sigmas * sqrt(mean) + 4`` snapped
    up to a multiple of 128, bounded below by one lane tile and above
    by the whole group (a cell can never hold more than every atom)."""

    mean = n_atoms / n_cells
    cap = int(np.ceil(mean + capacity_sigmas * np.sqrt(mean) + 4))
    cap = _cdiv(cap, 128) * 128
    return max(128, min(cap, _cdiv(max(n_atoms, 1), 128) * 128))


def pallas_cell_plan_search(
    n_atoms,
    box,
    r_max,
    *,
    n_atoms2=None,
    capacity_sigmas=4.0,
    table_budget_bytes=9 << 20,
):
    """Cost-driven cell-grid search (host side): pick ``n_cells_dim``
    to minimize the kernel's padded pair work.

    The naive plan (:func:`pallas_cell_plan`) always uses the FINEST
    legal grid, ``floor(box / r_max)`` cells per axis — but capacity
    snaps up to lane multiples of 128, so when the per-cell occupancy
    is far below a multiple (e.g. each group of a 50/50 binary
    mixture at half density) most of the ``capacity**2`` pair block is
    padding.  Every grid from 3 cells per axis up to the finest is
    legal (a cell only needs to be >= ``r_max`` wide), and coarser
    grids trade more real pairs examined for much better slot
    occupancy; the sweet spot minimizes

        ``n_cells * n_neighbors * capacity1 * capacity2``

    (the per-slot work — distance math, one-hot digit contraction —
    is uniform across slots), subject to the slot tables fitting the
    ~16 MB VMEM alongside the one-hot chunks.  Measured on a TPU v5e
    at 100k atoms, 50/50 cross: the searched grid is ~2x the naive
    grid's throughput (BASELINE.md "Cross-RDF").

    ``n_atoms2 is not None`` plans the cross kernel: BOTH groups share
    one grid (the kernel requirement) and the returned dict carries
    ``capacity`` / ``capacity2``.  Set ``MDTPU_CELL_SEARCH=0`` to
    disable the search (naive finest-grid plans; the A/B knob).
    """

    import os

    box = np.asarray(box, dtype=float)
    max_dims = np.maximum(3, np.floor(box / r_max).astype(int))
    cross = n_atoms2 is not None
    n_nbr = 27 if cross else 14

    def plan_for(dims):
        nx, ny, nz = (int(d) for d in dims)
        n_cells = nx * ny * nz
        c1 = _aligned_capacity(n_atoms, n_cells, capacity_sigmas)
        plan = {
            "n_cells_dim": (nx, ny, nz),
            "n_cells": n_cells,
            "capacity": c1,
        }
        c2 = c1
        if cross:
            c2 = _aligned_capacity(
                n_atoms2, n_cells, capacity_sigmas
            )
            plan["capacity2"] = c2
        plan["_tables_bytes"] = (
            4 * _ROWS * n_cells * (c1 + (c2 if cross else 0))
        )
        plan["_cost"] = n_cells * n_nbr * c1 * c2
        return plan

    fallback = plan_for(max_dims)
    if os.environ.get("MDTPU_CELL_SEARCH", "1") == "0":
        return fallback

    def axis_candidates(m):
        # Cost and table bytes depend on the axes only through the
        # cell-count PRODUCT, and capacity is 128-stepped — the cost
        # landscape is coarse, so a geometric subset (~8% spacing,
        # max end always included) finds the same optimum as the full
        # O(max_dims^3) enumeration without stalling _prepare on
        # large-box/small-cutoff systems (a 1000 A box at r_max 3
        # would otherwise visit ~37M triples).
        m = int(m)
        if m <= 16:
            return list(range(3, m + 1))
        vals = {3, m}
        v = 3.0
        while v < m:
            vals.add(int(round(v)))
            v *= 1.08
        return sorted(vals)

    best = None
    for nx in axis_candidates(max_dims[0]):
        for ny in axis_candidates(max_dims[1]):
            for nz in axis_candidates(max_dims[2]):
                plan = plan_for((nx, ny, nz))
                if plan["_tables_bytes"] > table_budget_bytes:
                    continue
                key = (plan["_cost"], plan["n_cells"])
                if best is None or key < best[0]:
                    best = (key, plan)
    # Nothing under budget (dense systems where even the finest
    # grid's tables overflow): fall back to the naive finest-grid
    # plan — identical to MDTPU_CELL_SEARCH=0 / pallas_cell_plan.
    return fallback if best is None else best[1]


def _cell_sweep_ok(box, dims, n_cells_dim, r_max):
    """Is the 27-cell neighbor sweep complete for this box?  A cell
    must be at least ``r_max`` wide — EXCEPT on axes clamped to the
    3-cell minimum, where the +-1 neighborhood already spans the whole
    axis and every pair is examined regardless of cell width."""

    whole_axis = jnp.asarray(
        [n == 3 for n in n_cells_dim], dtype=bool
    )
    wide_enough = box * np.float32(1 + 1e-6) >= dims * np.float32(r_max)
    return (wide_enough | whole_axis).all()


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


def _digit_contract(idx, acc, *, chunk_rows, cap_j, n_coarse, n_fine):
    """Chunked lane-major digit contraction of bin indices ``idx``
    (rows x cap_j, invalid entries already spilled to ``n_bins``) into
    the ``(n_coarse, n_fine)`` accumulator.

    Bounds the one-hot VMEM footprint to
    ``2 * n_fine * chunk_rows * cap_j`` entries.  The chunk count is
    static, so unroll with static slices — dynamic i64/i32 index
    arithmetic inside Mosaic kernel traces recurses in jax's weak-type
    promotion under x64.  One-hots are built in bfloat16 (0/1 are
    exact; the MXU runs bf16 natively at 2-3x the f32 rate) with
    float32 accumulation, so the counts stay exact.  Selects happen in
    f32 (the i1 mask's native layout), then convert 0/1 exactly to
    bf16 — Mosaic cannot relayout i1 masks onto the (16, 128) bf16
    tiling directly.
    """

    fine_i32 = np.int32(n_fine)
    n_rows = idx.shape[0]
    c_iota = jax.lax.broadcasted_iota(
        jnp.int32, (n_coarse, chunk_rows * cap_j), 0
    )
    f_iota = jax.lax.broadcasted_iota(
        jnp.int32, (n_fine, chunk_rows * cap_j), 0
    )
    for ch in range(n_rows // chunk_rows):
        rows = idx[ch * chunk_rows:(ch + 1) * chunk_rows, :]
        flat = rows.reshape(1, chunk_rows * cap_j)
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


# Slot-table row layout (see module docstring): xyz, atom id,
# i-side exclusion id, j-side exclusion id, two spare rows.
_ROWS = 8
_ROW_AID = 3
_ROW_EX_I = 4
_ROW_EX_J = 5


@functools.lru_cache(maxsize=None)
def _neighbor_tables(n_cells_dim):
    """Static neighbor tables for a cell grid: the full ``(n_cells,
    27)`` offset table (cross kernel) and the ``(n_cells, 14)``
    half-shell table — the cell itself plus the 13 positive-
    lexicographic offsets (self kernel; Newton's third law).  With
    >= 3 cells per axis and offsets in {-1, 0, 1}, wrapped targets
    collide only for equal offsets, so every unordered cell pair
    appears exactly once in the half shell."""

    nx, ny, nz = n_cells_dim
    cx, cy, cz = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )

    def cid(dx, dy, dz):
        return (
            ((cx + dx) % nx) * ny + (cy + dy) % ny
        ) * nz + (cz + dz) % nz

    offsets = [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
    ]
    full = np.stack(
        [cid(*d) for d in offsets], axis=-1
    ).reshape(-1, 27).astype(np.int32)
    half = np.stack(
        [cid(0, 0, 0)]
        + [cid(*d) for d in offsets if d > (0, 0, 0)],
        axis=-1,
    ).reshape(-1, 14).astype(np.int32)
    return full, half


def _slot_table(
    positions, n_cells_dim, capacity, cell_size, *, ex_i=None, ex_j=None
):
    """Device cell build: returns the ``(8, n_cells * capacity)`` slot
    table (xyz + id rows), the ``(n_cells,)`` occupancy, and the max
    occupancy.

    ``ex_i`` / ``ex_j`` are per-atom tile-exclusion ids (``index //
    e``) stored as float32 — exact below 2^24 atoms — so the kernel
    masks excluded pairs with one VPU compare per side.
    """

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
    cell_range = jnp.arange(n_cells, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_cid, cell_range, side="left")
    occupancy = (
        jnp.searchsorted(sorted_cid, cell_range, side="right") - starts
    ).astype(jnp.int32)

    atom_id = jnp.arange(n, dtype=jnp.int32).astype(jnp.float32)
    packed = jnp.concatenate(
        [
            positions[order].T.astype(jnp.float32),
            atom_id[order][None],
            (atom_id if ex_i is None else ex_i)[order][None],
            (atom_id if ex_j is None else ex_j)[order][None],
            jnp.zeros((_ROWS - _ROW_EX_J - 1, n), jnp.float32),
        ],
        axis=0,
    )  # (8, n) in cell order

    # Padded, lane-aligned slot table: slot s of cell c lives at lane
    # c * capacity + s.  Out-of-occupancy slots hold clipped garbage
    # columns; the kernel masks them by occupancy.
    slots = jnp.arange(capacity, dtype=jnp.int32)
    table = jnp.clip(
        starts[:, None].astype(jnp.int32) + slots[None, :],
        0, np.int32(n - 1),
    ).reshape(-1)
    return packed[:, table], occupancy, occupancy.max()


def _kernel(
    nbr_ref, occ_ref, box_ref, pos_ref, out_ref,
    *, capacity, n_bins, n_coarse, n_fine, inv_dr,
    dr2_hi, dr2_lo, exact, exclude, chunk_rows,
):
    """Half-shell (Newton's-third-law) sweep: neighbor 0 is the cell
    itself, masked to the strict upper slot triangle; neighbors 1-13
    are the positive-lexicographic offsets.  Every unordered pair is
    examined exactly ONCE (half the pair math of a full 27-cell
    sweep); the wrapper doubles the counts to restore the ordered-pair
    convention.  Valid because the self-RDF masks (identical-atom
    drop, ``(e, e)`` tile exclusion) are symmetric."""

    c = pl.program_id(0)
    cap = capacity
    bins_i32 = np.int32(n_bins)
    box = (box_ref[0], box_ref[1], box_ref[2])

    i_start = c * np.int32(cap)
    ip = pos_ref[:, pl.ds(pl.multiple_of(i_start, 128), cap)]
    i_occ = occ_ref[c]
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    i_valid = slot_col < i_occ  # (cap, 1)
    ei = ip[_ROW_EX_I, :][:, None]
    upper = slot_col < lane  # (cap, cap) strict upper triangle

    def block_acc(acc, j_cell, self_cell):
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

        # The self block keeps only the strict upper slot triangle
        # (which also drops identical atoms); distinct cells never
        # share an atom, so no atom-id compare is needed.
        valid = i_valid & j_valid & (idx < bins_i32)
        if self_cell:
            valid = valid & upper
        if exclude:
            valid = valid & (ei != jp[_ROW_EX_J, :][None, :])
        idx = jnp.where(valid, idx, bins_i32)

        return _digit_contract(
            idx, acc, chunk_rows=chunk_rows, cap_j=cap,
            n_coarse=n_coarse, n_fine=n_fine,
        )

    acc = jnp.zeros((n_coarse, n_fine), jnp.float32)
    acc = block_acc(acc, c, True)
    acc = jax.lax.fori_loop(
        1, 14, lambda nb, a: block_acc(a, nbr_ref[c, nb], False), acc
    )

    @pl.when(c == 0)
    def _():
        out_ref[:] = acc

    @pl.when(c > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _exclusion_ids(n, exclusion):
    """Per-atom ``(index // e0, index // e1)`` tile-exclusion ids as
    float32, or ``(None, None)`` when the identical-atom mask already
    covers the semantics (no exclusion, or ``(1, 1)``)."""

    if exclusion is None or tuple(exclusion) == (1, 1):
        return None, None, False
    e0, e1 = (int(e) for e in exclusion)
    idx = jnp.arange(n, dtype=jnp.int32)
    return (
        (idx // np.int32(e0)).astype(jnp.float32),
        (idx // np.int32(e1)).astype(jnp.float32),
        True,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_cells_dim", "capacity", "n_bins", "r_max",
        "precision", "exclusion",
    ),
)
def cell_pair_histogram_pallas(
    positions,
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

    Use a plan from :func:`pallas_cell_plan` (capacity must be
    lane-aligned); neighbor geometry derives from the static
    ``n_cells_dim`` — a half-shell (Newton's-third-law) sweep that
    evaluates each unordered pair once and doubles the counts.
    ``box`` is a runtime ``(3,)`` array (or tuple) of orthorhombic box
    lengths — per-frame (NPT) boxes re-use one compiled kernel; when a
    frame's box shrinks below ``n_cells_dim * r_max`` (the cell sweep
    would miss pairs) the returned counts are NaN-poisoned.
    ``exclusion=(e, e)`` drops pairs whose atom indices satisfy
    ``i // e == j // e`` (the reference's tile exclusion,
    ``analysis/structure.py:92-104``); identical-atom pairs are always
    dropped.  Asymmetric ``(e0, e1)`` tiles are incompatible with the
    half-shell sweep — use the XLA kernel for those.

    The cell build (ids, argsort, searchsorted, padded slot-table
    gather) runs as regular XLA ops; only the pair sweep is the Pallas
    kernel.
    """

    n = positions.shape[0]
    nx, ny, nz = n_cells_dim
    n_cells = nx * ny * nz
    n_fine = 16
    n_coarse = _cdiv(n_bins + 1, n_fine)
    # bf16 one-hot rows must fill whole (16, 128) sublane tiles.
    n_rows = _cdiv(n_coarse, 16) * 16
    box = jnp.asarray(box, dtype=jnp.float32).reshape(3)
    positions = positions.astype(jnp.float32)
    dims = jnp.asarray([nx, ny, nz], dtype=jnp.float32)
    cell_size = box / dims

    if exclusion is not None and exclusion[0] != exclusion[1]:
        raise NotImplementedError(
            "the half-shell self kernel requires symmetric (e, e) "
            "exclusion tiles; use the XLA kernel for (e0, e1)."
        )
    _, half_shell = _neighbor_tables(n_cells_dim)
    ex_i, ex_j, exclude = _exclusion_ids(n, exclusion)
    pos_table, occupancy, max_occupancy = _slot_table(
        positions, n_cells_dim, capacity, cell_size,
        ex_i=ex_i, ex_j=ex_j,
    )

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
        inv_dr=inv_dr, dr2_hi=dr2_hi, dr2_lo=dr2_lo,
        exact=(precision == "exact"), exclude=exclude,
        chunk_rows=chunk_rows,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec(
                (_ROWS, n_cells * capacity),
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
    )(jnp.asarray(half_shell), occupancy, box, pos_table)
    # Each unordered pair was counted once; restore the ordered-pair
    # convention of the XLA kernel / np.histogram oracle.
    counts = counts2d[:n_coarse].reshape(-1)[:n_bins] * np.float32(2)
    counts = jnp.where(
        _cell_sweep_ok(box, dims, n_cells_dim, r_max),
        counts,
        jnp.float32(np.nan),
    )
    return counts, max_occupancy


def _cross_kernel(
    nbr_ref, occ1_ref, occ2_ref, box_ref, pos1_ref, pos2_ref, out_ref,
    *, cap1, cap2, n_bins, n_coarse, n_fine, inv_dr,
    dr2_hi, dr2_lo, exact, exclude, chunk_rows,
):
    """Cross-group variant of :func:`_kernel`: i atoms from group 1's
    slot table, j atoms from group 2's; no identical-atom handling
    (the groups must be disjoint), optional tile exclusion via the id
    rows."""

    c = pl.program_id(0)
    bins_i32 = np.int32(n_bins)
    box = (box_ref[0], box_ref[1], box_ref[2])

    ip = pos1_ref[:, pl.ds(pl.multiple_of(c * np.int32(cap1), 128), cap1)]
    i_occ = occ1_ref[c]
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (cap1, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap2), 1)
    i_valid = slot_col < i_occ
    ei = ip[_ROW_EX_I, :][:, None]

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
        if exclude:
            valid = valid & (ei != jp[_ROW_EX_J, :][None, :])
        idx = jnp.where(valid, idx, bins_i32)

        return _digit_contract(
            idx, acc, chunk_rows=chunk_rows, cap_j=cap2,
            n_coarse=n_coarse, n_fine=n_fine,
        )

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
        "n_cells_dim", "capacity1", "capacity2", "n_bins",
        "r_max", "precision", "exclusion",
    ),
)
def cross_pair_histogram_pallas(
    positions1,
    positions2,
    *,
    box,
    r_max,
    n_cells_dim,
    capacity1: int,
    capacity2: int,
    n_bins: int,
    precision: str = "fast",
    exclusion=None,
):
    r"""Cross-group cutoff histogram: every (group-1, group-2) pair on
    uniform bins ``[0, r_max]``; returns ``(counts, max_occ1,
    max_occ2)``.  The groups must be disjoint atom sets (no
    identical-atom masking is applied).  ``box`` is a runtime ``(3,)``
    array — per-frame boxes supported, NaN-poisoned when a box
    invalidates the cell sweep (see
    :func:`cell_pair_histogram_pallas`).  ``exclusion=(e0, e1)`` drops
    pairs with ``i1 // e0 == i2 // e1`` on the group-local indices —
    the reference's molecule-block exclusion for, e.g., intra-molecular
    cation-anion pairs.  Plan each capacity with
    :func:`pallas_cell_plan` on the respective group size.
    """

    nx, ny, nz = n_cells_dim
    n_cells = nx * ny * nz
    n_fine = 16
    n_coarse = _cdiv(n_bins + 1, n_fine)
    n_rows = _cdiv(n_coarse, 16) * 16
    box = jnp.asarray(box, dtype=jnp.float32).reshape(3)
    dims = jnp.asarray([nx, ny, nz], dtype=jnp.float32)
    cell_size = box / dims

    exclude = exclusion is not None
    ex1 = ex2 = None
    if exclude:
        e0, e1 = (int(e) for e in exclusion)
        ex1 = (
            jnp.arange(positions1.shape[0], dtype=jnp.int32)
            // np.int32(e0)
        ).astype(jnp.float32)
        ex2 = (
            jnp.arange(positions2.shape[0], dtype=jnp.int32)
            // np.int32(e1)
        ).astype(jnp.float32)

    full_shell, _ = _neighbor_tables(n_cells_dim)
    t1, occ1, max1 = _slot_table(
        positions1.astype(jnp.float32), n_cells_dim, capacity1,
        cell_size, ex_i=ex1, ex_j=ex1,
    )
    t2, occ2, max2 = _slot_table(
        positions2.astype(jnp.float32), n_cells_dim, capacity2,
        cell_size, ex_i=ex2, ex_j=ex2,
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
        inv_dr=inv_dr, dr2_hi=dr2_hi, dr2_lo=dr2_lo,
        exact=(precision == "exact"), exclude=exclude,
        chunk_rows=chunk_rows,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec(
                (_ROWS, n_cells * capacity1),
                lambda c, s1, s2, s3, s4: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_ROWS, n_cells * capacity2),
                lambda c, s1, s2, s3, s4: (jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_rows, n_fine),
            lambda c, s1, s2, s3, s4: (jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
    )
    counts2d = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, n_fine), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(full_shell), occ1, occ2, box, t1, t2)
    counts = counts2d[:n_coarse].reshape(-1)[:n_bins]
    counts = jnp.where(
        _cell_sweep_ok(box, dims, n_cells_dim, r_max),
        counts,
        jnp.float32(np.nan),
    )
    return counts, max1, max2
