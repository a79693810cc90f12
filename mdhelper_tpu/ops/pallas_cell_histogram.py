r"""
Pallas cell-list pair histogram
===============================

The flagship RDF kernel, hand-tiled: sorted atom positions are packed
into a 128-aligned ``(8, n_cells * capacity)`` slot table (rows 0-2
hold xyz; rows 3-5 carry the atom id and the two tile-exclusion ids —
a ``(3, S)`` float32 VMEM array is physically padded to 8 sublanes
anyway, so the id rows are free).  Tables under ~12 MB live entirely
in VMEM, so every one of the :math:`27 N_\mathrm{cell}` neighbor pair
blocks is formed, binned, and contracted on-chip — no pair-block HBM
traffic at all (the XLA formulation in
:mod:`mdhelper_tpu.ops.cell_histogram` streams its gathered blocks
through HBM).  Larger tables (>~300k atoms) switch to the
STREAMING-BLOCK kernels: the grid becomes ``(n_cells, n_neighbors)``
and the scalar-prefetched neighbor table drives per-step DMA of just
the two ``(8, capacity)`` blocks through the index maps — the same
pair math at any N (the j-block re-reads are a sub-millisecond HBM
stream against seconds of pair math).  Per grid step (one cell for
the resident layout):

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
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .doublefloat import (
    df_add,
    df_ge,
    df_lt,
    df_min,
    df_sub,
    df_sum3,
    df_square,
    two_diff,
    two_prod,
)

__all__ = [
    "CellCapacityOverflow",
    "pallas_cell_plan",
    "pallas_cell_plan_search",
    "cell_pair_histogram_pallas",
    "cross_pair_histogram_pallas",
    "triclinic_perpendicular_widths",
]


def _cdiv(a, b):
    return -(-a // b)


class CellCapacityOverflow(RuntimeError):
    """A frame's densest cell exceeded the planned slot capacity.

    The plan search minimizes padded pair work, which lands the
    128-lane-snapped capacity ~4 sigma above the mean occupancy —
    optimal throughput, but a long run over many (cell, frame) draws
    can trip it.  Analyses catch this and retry with an escalated
    ``capacity_sigmas`` (one replan + recompile) so the common case
    stays fast."""


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
    triclinic=False,
    _force_generalized=False,
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
    is uniform across slots).  Table size does not constrain the
    search: plans whose slot tables exceed the VMEM budget run on the
    streaming-block kernels (per-(cell, neighbor) DMA) instead of the
    resident-table layout.  Measured on a TPU v5e at 100k atoms,
    50/50 cross: the searched grid is ~2x the naive grid's throughput
    (BASELINE.md "Cross-RDF").

    ``n_atoms2 is not None`` plans the cross kernel: BOTH groups share
    one grid (the kernel requirement) and the returned dict carries
    ``capacity`` / ``capacity2``.  Set ``MDTPU_CELL_SEARCH=0`` to
    disable the search (naive finest-grid plans; the A/B knob; only
    meaningful in the legacy space).

    ``box`` may have 2 entries (the ``drop_axis`` grids — plan over
    the two kept extents).  Boxes under 3 cutoffs on some axis search
    the GENERALIZED space instead: grids from 1 cell per axis up,
    including cells narrower than the cutoff swept with per-axis
    ``reach`` (see :func:`_neighbor_tables_general`); the returned
    ``reach`` tuple must be passed to the kernel wrappers.  A legacy
    box whose every legal reach-1 plan exceeds the ~512-lane
    capacity budget (extremely dense 3-cutoff boxes) also falls
    through to the generalized space.
    """

    import itertools
    import os

    box = np.asarray(box, dtype=float)
    d = len(box)
    floors = np.floor(box / r_max).astype(int)
    cross = n_atoms2 is not None
    # LEGACY space (every axis >= 3 cutoff-wide cells): reach-1 grids
    # from 3 cells up to the finest legal, half/27-style sweeps —
    # byte-for-byte the pre-round-5 behavior.  Otherwise the
    # GENERALIZED space: any grid from 1 cell per axis up (including
    # cells NARROWER than the cutoff, swept with per-axis reach
    # ``m_i = floor(r_max / w_i) + 1`` and deduped wrapped neighbor
    # tables), which serves small boxes and 2-D ``drop_axis`` grids
    # without ever falling back to the O(N^2) sweep.
    legacy = (not _force_generalized) and bool(
        np.all(floors >= 3)
    )

    def reach_for(dims):
        if legacy:
            return (1,) * d
        return tuple(
            int(np.floor(r_max * n / b + 1e-9)) + 1
            for n, b in zip(dims, box)
        )

    one_reach = (1,) * d
    legacy_full = 3 ** d

    def plan_for(dims):
        dims = tuple(int(x) for x in dims)
        n_cells = 1
        for x in dims:
            n_cells *= x
        c1 = _aligned_capacity(n_atoms, n_cells, capacity_sigmas)
        c2 = c1
        if legacy:
            reach = one_reach
            n_full = legacy_full
            half_ok = True
        else:
            reach = reach_for(dims)
            n_full = 1
            half_ok = True
            for n_ax, m in zip(dims, reach):
                k = 2 * m + 1
                n_full *= n_ax if n_ax < k else k
                if n_ax < k:
                    half_ok = False
        plan = {
            "n_cells_dim": dims,
            "n_cells": n_cells,
            "capacity": c1,
            "reach": reach,
        }
        if cross:
            c2 = _aligned_capacity(
                n_atoms2, n_cells, capacity_sigmas
            )
            plan["capacity2"] = c2
        if cross:
            n_eff = n_full
        else:
            n_eff = (n_full - 1) // 2 + 1 if half_ok else n_full
        plan["_tables_bytes"] = (
            4 * _ROWS * n_cells * (c1 + (c2 if cross else 0))
        )
        pair_work = c1 * c2
        if not legacy:
            # Per-block fixed costs (DMA, setup) break the cost tie
            # between all-neighbor grids of different granularity;
            # without it a 1-cell and a 16^3 all-pairs grid cost the
            # same padded pairs and the search degenerates.
            pair_work += 64.0 * (c1 + c2)
        plan["_cost"] = n_cells * n_eff * pair_work
        return plan

    if legacy:
        fallback = plan_for(np.maximum(3, floors))
        lo = 3
        max_dims = np.maximum(3, floors)
    else:
        fallback = None
        lo = 1
        # allow subdivision down to ~64 atoms mean per cell (capacity
        # then snaps to the 128-lane floor)
        n_target = (
            int(
                np.ceil(
                    (max(n_atoms, n_atoms2 or 0) / 64.0)
                    ** (1.0 / d)
                )
            )
            + 1
        )
        max_dims = np.maximum(3, np.maximum(floors, n_target))
    if legacy and os.environ.get("MDTPU_CELL_SEARCH", "1") == "0":
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
            return list(range(lo, m + 1))
        vals = {lo, m}
        v = float(lo)
        while v < m:
            vals.add(int(round(v)))
            v *= 1.08
        return sorted(vals)

    best = None
    best_any = None
    for dims in itertools.product(
        *[axis_candidates(m) for m in max_dims]
    ):
        plan = plan_for(dims)
        key = (plan["_cost"], plan["n_cells"])
        if best_any is None or key < best_any[0]:
            best_any = (key, plan)
        # Scoped-VMEM budget: the exact-binning elementwise chain
        # materializes a handful of (cap_i, cap_j) f32 intermediates
        # on the Mosaic stack — measured on chip, cap 896 blows the
        # 16 MB scoped limit (26.8 MB) for the orthorhombic chain
        # while cap <= 512 fits; the triclinic PER-PAIR 27-candidate
        # chain is ~16x hungrier (67.7 MB at cap 512, also measured)
        # and needs cap <= 128.  Prefer plans within budget (grids
        # can always subdivide).
        cap_budget = (
            128 if (triclinic and not legacy) else 512
        )
        if plan["capacity"] <= cap_budget and (
            plan.get("capacity2", 0) <= cap_budget
        ):
            if best is None or key < best[0]:
                best = (key, plan)
    if best is not None:
        return best[1]
    if legacy:
        # Every legal reach-1 plan is over the capacity budget (a
        # very dense barely-3-cutoff box): subdivide instead.
        return pallas_cell_plan_search(
            n_atoms, box, r_max, n_atoms2=n_atoms2,
            capacity_sigmas=capacity_sigmas, triclinic=triclinic,
            _force_generalized=True,
        )
    if best_any is not None:
        return best_any[1]
    return fallback


def plan_is_tri_pp(plan, triclinic: bool) -> bool:
    """Does this plan run the per-pair 27-candidate triclinic
    kernels?  ONE definition, matching the kernel wrappers'
    ``legacy_tri`` routing — the cost/chunk heuristics in the
    analysis layer must not re-derive it (a round-5 review caught a
    drifted copy costing a ~21x chunk shrink)."""

    return triclinic and (
        tuple(plan["reach"]) != (1,) * len(plan["reach"])
        or any(n < 3 for n in plan["n_cells_dim"])
    )


def _cell_sweep_ok(extents, n_cells_dim, reach, r_max):
    """Is the neighbor sweep complete for this box?  Cells at offset
    ``m_i + 1`` (the first excluded ring) have a minimum per-pair
    separation of ``m_i * w_i`` along axis ``i``, so completeness is
    ``m_i * extents_i / n_i >= r_max`` — EXCEPT on axes where the
    deduped neighborhood already spans every cell
    (``n_i <= 2 m_i + 1``), where all pairs are examined regardless
    of cell width.  ``extents`` is the runtime per-axis box length
    (orthorhombic) or perpendicular width (triclinic per-pair mode);
    with ``reach == (1, ...)`` this is the classic
    cell-at-least-``r_max``-wide rule."""

    whole_axis = jnp.asarray(
        [n <= 2 * m + 1 for n, m in zip(n_cells_dim, reach)],
        dtype=bool,
    )
    dims = jnp.asarray(n_cells_dim, jnp.float32)
    mr = jnp.asarray(reach, jnp.float32)
    wide_enough = (
        extents * mr * np.float32(1 + 1e-6)
        >= dims * np.float32(r_max)
    )
    return (wide_enough | whole_axis).all()


def _bin_boundary_constants(r_max, n_bins, r_min=0.0):
    """Static binning constants for the exact tail, as a tuple whose
    first element selects the convention:

    * ``("zero", inv_dr, dr2_hi, dr2_lo)`` — uniform bins from 0:
      ``r_max / n_bins`` is rounded in f64 FIRST, then squared — the
      same boundary convention as the XLA path's uniform-edge width
      ``h = (edges[-1] - edges[0]) / n_bins``, so the two routes
      resolve bin-edge tie pairs identically (split-sensitive; see
      BASELINE.md "triclinic Pallas cell kernels").
    * ``("offset", e0, inv_h, c0, c1, c2)`` — uniform bins from
      ``r_min > 0``: the boundary ``(e_0 + k h)^2`` expands to
      ``e_0^2 + 2 e_0 h k + h^2 k^2`` with each coefficient split
      into a double-float pair, REPLICATING
      ``ops/histogram._exact_bin_indices`` operation-for-operation
      (incl. the closed last edge and the below-range spill).
    """

    if r_min == 0.0:
        inv_dr = np.float32(np.float64(n_bins) / np.float64(r_max))
        dr2_wide = (np.float64(r_max) / np.float64(n_bins)) ** 2
        dr2_hi = np.float32(dr2_wide)
        dr2_lo = np.float32(dr2_wide - np.float64(dr2_hi))
        return ("zero", inv_dr, dr2_hi, dr2_lo)
    # Offset grid: FULL-f64 endpoints, exactly like the analysis
    # classes' ``np.linspace(r_min, r_max)`` edges feeding the XLA
    # path (``_exact_bin_indices`` reads ``edges.astype(f64)``) — an
    # f32-rounded e0 here would shift every boundary by ~1e-7
    # relative and flip bin-edge tie pairs between the two routes
    # (round-4 review catch).
    e0 = np.float64(r_min)
    e_last = np.float64(r_max)
    h = (e_last - e0) / np.float64(n_bins)

    def split(x):
        hi = np.float32(x)
        return (hi, np.float32(x - np.float64(hi)))

    return (
        "offset",
        np.float32(e0),
        np.float32(1.0 / h),
        split(e0 * e0),
        split(2.0 * e0 * h),
        split(h * h),
    )


def _fast_index_from_dist(dist, bin_consts, n_bins):
    """Fast-path index for either binning convention (see
    :func:`_bin_boundary_constants`)."""

    if bin_consts[0] == "zero":
        inv_dr = bin_consts[1]
        # f32 -> i32 truncation == floor for the non-negative product.
        return jax.lax.convert_element_type(dist * inv_dr, jnp.int32)
    _, e0, inv_h = bin_consts[:3]
    idx = jax.lax.convert_element_type(
        (dist - e0) * inv_h, jnp.int32
    )
    # Truncation rounds (-1, 0) up to 0: spill below-range distances
    # explicitly.
    return jnp.where(dist < e0, np.int32(n_bins), idx)


def _bin_fast(ip, jp, box, bin_consts, n_bins, axes=(0, 1, 2)):
    d2 = None
    for k in axes:
        delta = ip[k, :][:, None] - jp[k, :][None, :]
        delta = delta - box[k] * jnp.round(delta / box[k])
        d2 = delta * delta if d2 is None else d2 + delta * delta
    return _fast_index_from_dist(jnp.sqrt(d2), bin_consts, n_bins)


def _exact_index_from_d2(d2, bin_consts, n_bins):
    """Float32-estimated bin index with a +-1 correction against the
    exact squared-edge boundaries (shared exact-binning tail; see
    :func:`_bin_boundary_constants` for the two conventions)."""

    if bin_consts[0] == "zero":
        _, inv_dr, dr2_hi, dr2_lo = bin_consts
        idx = jax.lax.convert_element_type(
            jnp.sqrt(jnp.maximum(d2[0], np.float32(0.0))) * inv_dr,
            jnp.int32,
        )
        idx = jnp.minimum(idx, np.int32(n_bins))

        def boundary(k):
            k2 = jax.lax.convert_element_type(k * k, jnp.float32)
            bh, bl = two_prod(k2, dr2_hi)
            # The trailing df_add normalizes the (hi, lo) split
            # exactly like the XLA path's boundary accumulation
            # (ops/histogram._exact_bin_indices) — double-float
            # compares are split-sensitive on bin-edge tie pairs.
            return df_add(
                (np.float32(0.0), np.float32(0.0)),
                (bh, bl + k2 * dr2_lo),
            )

        one = np.int32(1)
        return (
            idx
            + jnp.where(
                df_ge(d2, boundary(idx + one)), one, np.int32(0)
            )
            - jnp.where(df_lt(d2, boundary(idx)), one, np.int32(0))
        )

    # Offset grid — replicate ops/histogram._exact_bin_indices
    # operation-for-operation: boundary(k) = e0^2 + 2 e0 h k + h^2 k^2
    # accumulated as df_add(df_add(c0, t1), t2), f32-estimated index
    # from (dist - e0) * inv_h, +-1 correction, below-range spill and
    # a CLOSED last edge (np.histogram range semantics).
    _, e0, inv_h, c0, c1, c2 = bin_consts
    bins_i32 = np.int32(n_bins)

    def boundary(k):
        kf = jax.lax.convert_element_type(k, jnp.float32)
        k2 = kf * kf
        t1 = two_prod(kf, c1[0])
        t2 = two_prod(k2, c2[0])
        acc = df_add(
            (np.float32(c0[0]), np.float32(c0[1])),
            (t1[0], t1[1] + kf * np.float32(c1[1])),
        )
        return df_add(acc, (t2[0], t2[1] + k2 * np.float32(c2[1])))

    dist = jnp.sqrt(jnp.maximum(d2[0], np.float32(0.0)))
    idx = jnp.clip(
        jax.lax.convert_element_type((dist - e0) * inv_h, jnp.int32),
        np.int32(0),
        bins_i32,
    )
    one = np.int32(1)
    idx = (
        idx
        + jnp.where(df_ge(d2, boundary(idx + one)), one, np.int32(0))
        - jnp.where(df_lt(d2, boundary(idx)), one, np.int32(0))
    )
    b_last = boundary(bins_i32)
    in_range = df_ge(d2, boundary(np.int32(0))) & (
        df_lt(d2, b_last)
        | ((d2[0] == b_last[0]) & (d2[1] == b_last[1]))
    )
    return jnp.where(
        in_range, jnp.minimum(idx, bins_i32 - one), bins_i32
    )


def _bin_exact(ip, jp, box, bin_consts, n_bins, axes=(0, 1, 2)):
    """Exact double-float bin assignment: float32-estimated index with
    a +-1 correction against the exact (k*dr)^2 boundaries.

    ``axes`` restricts the distance to a coordinate subset (the 2-D
    ``drop_axis`` kernels).  Dropping an axis matches the XLA route's
    zeroed-coordinate convention bit-for-bit: a zero double-float
    component is an exact identity under ``df_add``, so summing two
    components equals the XLA path's three-component sum with its
    zeroed term."""

    components = []
    for k in axes:
        s, e = two_diff(ip[k, :][:, None], jp[k, :][None, :])
        # Wrapped inputs give s in (-L, L), so the image multiple m is
        # in {-1, 0, 1} and m * L is exact in float32 — no two_prod.
        m = jnp.round(s / box[k])
        d = df_sub((s, e), (m * box[k], np.float32(0.0)))
        components.append(df_square(d))
    if len(components) == 3:
        d2 = df_sum3(*components)
    else:
        d2 = df_add(*components)
    return _exact_index_from_d2(d2, bin_consts, n_bins)


def _bin_fast_shift(ip, jp, shift, bin_consts, n_bins):
    """Fast-path bin assignment under a per-BLOCK image shift (the
    triclinic kernels): ``d = (i - shift) - j`` — no per-pair
    minimum-image math at all.  ``shift`` is three (hi, lo) scalar
    pairs; the fast path uses the hi parts."""

    d2 = None
    for k in range(3):
        delta = (ip[k, :] - shift[k][0])[:, None] - jp[k, :][None, :]
        d2 = delta * delta if d2 is None else d2 + delta * delta
    return _fast_index_from_dist(jnp.sqrt(d2), bin_consts, n_bins)


def _bin_exact_shift(ip, jp, shift, bin_consts, n_bins):
    """Exact double-float bin assignment under a per-block image
    shift: the pair difference is error-free (two_diff) and the shift
    arrives as an exact double-float lattice translation
    (:func:`_image_shift_table`), so binning matches a float64 oracle
    over the same float32 coordinates and box."""

    components = []
    for k in range(3):
        s, e = two_diff(ip[k, :][:, None], jp[k, :][None, :])
        d = df_sub((s, e), (shift[k][0], shift[k][1]))
        components.append(df_square(d))
    d2 = df_sum3(*components)
    return _exact_index_from_d2(d2, bin_consts, n_bins)


#: candidate image-multiple shifts for the per-pair triclinic
#: minimum-image search: zero first, then the 26 non-zero {-1, 0, 1}^3
#: combinations in lexicographic order — the SAME candidate order as
#: the XLA oracle (``ops/histogram._exact_d2_triclinic``; order only
#: matters for the doc, the min is value-associative).
_TRI_PP_SHIFTS = [(0, 0, 0)] + [
    (sx, sy, sz)
    for sx in (-1, 0, 1)
    for sy in (-1, 0, 1)
    for sz in (-1, 0, 1)
    if (sx, sy, sz) != (0, 0, 0)
]


def _bin_fast_tri27(ip, jp, hm_ref, bin_consts, n_bins):
    """Fast-path PER-PAIR triclinic minimum-image binning (the
    small-box / subdivided-grid kernels, where per-block shifts are
    not the minimum image): fractional fold + 26-shift search, the
    in-kernel analog of ``ops/histogram._min_image_distance``.

    ``hm_ref`` is the flat ``(18,)`` scalar-prefetch array holding the
    row-major lower-triangular box matrix H (entries 0-8) and its
    inverse (entries 9-17)."""

    delta = [
        ip[k, :][:, None] - jp[k, :][None, :] for k in range(3)
    ]
    frac = []
    for k in range(3):
        f = (
            delta[0] * hm_ref[9 + k]
            + delta[1] * hm_ref[12 + k]
            + delta[2] * hm_ref[15 + k]
        )
        frac.append(f - jnp.round(f))
    base = []
    for k in range(3):
        # lower-triangular H: rows j >= k contribute to column k
        b = frac[k] * hm_ref[3 * k + k]
        for j in range(k + 1, 3):
            b = b + frac[j] * hm_ref[3 * j + k]
        base.append(b)
    d2 = base[0] * base[0] + base[1] * base[1] + base[2] * base[2]
    for shift in _TRI_PP_SHIFTS[1:]:
        cand2 = None
        for k in range(3):
            sv = np.float32(shift[k]) * hm_ref[3 * k + k]
            for j in range(k + 1, 3):
                sv = sv + np.float32(shift[j]) * hm_ref[3 * j + k]
            c = base[k] + sv
            cand2 = c * c if cand2 is None else cand2 + c * c
        d2 = jnp.minimum(d2, cand2)
    return _fast_index_from_dist(jnp.sqrt(d2), bin_consts, n_bins)


def _bin_exact_tri27(ip, jp, hm_ref, bin_consts, n_bins):
    """Exact PER-PAIR triclinic minimum-image binning: replicates
    ``ops/histogram._exact_d2_triclinic`` operation-for-operation —
    f32 fractional rounding for the base image multiple, all 27
    candidates evaluated in error-free double-float, minimum taken in
    double-float — so the small-box Pallas route bins bin-edge tie
    pairs exactly like the XLA 27-image sweep.  ``hm_ref`` as in
    :func:`_bin_fast_tri27`."""

    s_hi, s_lo = [], []
    for k in range(3):
        s, e = two_diff(ip[k, :][:, None], jp[k, :][None, :])
        s_hi.append(s)
        s_lo.append(e)
    n0 = []
    for k in range(3):
        f = (
            s_hi[0] * hm_ref[9 + k]
            + s_hi[1] * hm_ref[12 + k]
            + s_hi[2] * hm_ref[15 + k]
        )
        n0.append(jnp.round(f))
    best = None
    for shift in _TRI_PP_SHIFTS:
        m = [n0[j] + np.float32(shift[j]) for j in range(3)]
        components = []
        for k in range(3):
            # t = sum_{j >= k} m_j * H[j, k] (lower-triangular),
            # df-accumulated in ascending j — the oracle's order.
            t = two_prod(m[k], hm_ref[3 * k + k])
            for j in range(k + 1, 3):
                t = df_add(t, two_prod(m[j], hm_ref[3 * j + k]))
            d = df_sub((s_hi[k], s_lo[k]), t)
            components.append(df_square(d))
        d2 = df_sum3(*components)
        best = d2 if best is None else df_min(best, d2)
    return _exact_index_from_d2(best, bin_consts, n_bins)


def _digit_contract(
    idx, acc, *, chunk_rows, cap_j, n_coarse, n_fine, weights=None
):
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

    ``weights`` (rows x cap_j float32, small exact integers) scale
    each pair's contribution by riding the coarse one-hot's on-value —
    the asymmetric-exclusion ordered-pair multiplicity {0, 1, 2} costs
    no extra contraction (the select exists either way).
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
        if weights is None:
            on = np.float32(1)
        else:
            on = weights[
                ch * chunk_rows:(ch + 1) * chunk_rows, :
            ].reshape(1, chunk_rows * cap_j)
        coarse = jax.lax.convert_element_type(
            jnp.where(
                flat // fine_i32 == c_iota,
                on, np.float32(0),
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


def _asym_weights(ei, ej, jp):
    """Ordered-pair multiplicity for asymmetric ``(e0, e1)`` exclusion
    tiles on the half-shell sweep: for the unordered pair {a, b} the
    ordered product counts ``[a//e0 != b//e1] + [b//e0 != a//e1]``
    (in {0, 1, 2}) — ``ei``/``ej`` are the i-atoms' ``//e0``/``//e1``
    id columns, ``jp`` the j-block slot table.  float32 (exact small
    integers); rides the contraction's coarse one-hot on-value."""

    jei = jp[_ROW_EX_I, :][None, :]
    jej = jp[_ROW_EX_J, :][None, :]
    return jnp.where(
        ei != jej, np.float32(1), np.float32(0)
    ) + jnp.where(jei != ej, np.float32(1), np.float32(0))


@functools.lru_cache(maxsize=None)
def _neighbor_tables(n_cells_dim):
    """Static neighbor tables for a cell grid: the full ``(n_cells,
    27)`` offset table (cross kernel) and the ``(n_cells, 14)``
    half-shell table — the cell itself plus the 13 positive-
    lexicographic offsets (self kernel; Newton's third law).  With
    >= 3 cells per axis and offsets in {-1, 0, 1}, wrapped targets
    collide only for equal offsets, so every unordered cell pair
    appears exactly once in the half shell.

    Alongside each id table, an IMAGE-INDEX table of the same shape:
    ``k = (wx+1)*9 + (wy+1)*3 + (wz+1)`` where ``w`` is the per-axis
    wrap count ``floor((cell + offset) / n)`` in {-1, 0, 1} — the
    row of :func:`_image_shift_table` holding the lattice translation
    that moves the neighbor's atoms next to the home cell (the
    triclinic kernels' per-BLOCK minimum image; no per-pair search)."""

    nx, ny, nz = n_cells_dim
    cx, cy, cz = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )

    def cid(dx, dy, dz):
        return (
            ((cx + dx) % nx) * ny + (cy + dy) % ny
        ) * nz + (cz + dz) % nz

    def img(dx, dy, dz):
        wx = (cx + dx) // nx
        wy = (cy + dy) // ny
        wz = (cz + dz) // nz
        return ((wx + 1) * 9 + (wy + 1) * 3 + (wz + 1)).astype(
            np.int32
        )

    offsets = [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
    ]
    half_offsets = [(0, 0, 0)] + [d for d in offsets if d > (0, 0, 0)]
    full = np.stack(
        [cid(*d) for d in offsets], axis=-1
    ).reshape(-1, 27).astype(np.int32)
    full_img = np.stack(
        [img(*d) for d in offsets], axis=-1
    ).reshape(-1, 27)
    half = np.stack(
        [cid(*d) for d in half_offsets], axis=-1
    ).reshape(-1, 14).astype(np.int32)
    half_img = np.stack(
        [img(*d) for d in half_offsets], axis=-1
    ).reshape(-1, 14)
    return full, full_img, half, half_img


@functools.lru_cache(maxsize=None)
def _neighbor_tables_general(n_cells_dim, reach):
    """Deduped neighbor tables for ANY cell grid — 2-D (``drop_axis``)
    or 3-D dims, per-axis reach ``m_i`` (the cell count covering
    ``r_max``: offsets in ``[-m_i, m_i]``; ``m_i = 1`` is the classic
    one-ring sweep, ``m_i > 1`` serves grids whose cells are narrower
    than the cutoff).  Returns ``(full, half)``:

    * ``full`` — ``(n_cells, n_full)`` int32: every DISTINCT wrapped
      neighbor of each home cell within the reach block.  Axes with
      ``n_i <= 2 m_i + 1`` contribute every cell along that axis
      exactly once (the wrap would otherwise alias offsets — the
      small-box case), so each cell PAIR appears exactly once per
      direction and per-pair minimum-image math counts every atom
      pair once.  The home cell is always column 0 (the ordered
      self-sweep masks identical atoms on that block only).
    * ``half`` — ``(n_cells, n_half)`` Newton's-third-law table (home
      cell first, then the positive-lexicographic offsets), or
      ``None`` when some axis has ``n_i < 2 m_i + 1`` (wrapped
      offsets then collide and the single-visit property breaks).
    """

    import itertools

    dims = tuple(int(n) for n in n_cells_dim)
    reach = tuple(int(m) for m in reach)
    d = len(dims)
    strides = [1] * d
    for ax in range(d - 2, -1, -1):
        strides[ax] = strides[ax + 1] * dims[ax + 1]
    n_cells = int(np.prod(dims))
    grids = np.meshgrid(
        *[np.arange(n) for n in dims], indexing="ij"
    )

    # Full table: per-axis distinct wrapped coordinates, home first.
    per_axis = []
    for ax in range(d):
        n, m = dims[ax], reach[ax]
        if n <= 2 * m + 1:
            # every cell along the axis, starting at the home coord
            offs = np.arange(n)
        else:
            offs = np.concatenate(
                ([0], np.arange(-m, 0), np.arange(1, m + 1))
            )
        per_axis.append(
            (np.arange(n)[:, None] + offs[None, :]) % n
        )  # (n_ax, k_ax); column 0 == home coordinate
    parts = []
    for ax in range(d):
        arr = per_axis[ax][grids[ax]]  # dims + (k_ax,)
        shape = list(arr.shape[:d]) + [1] * d
        shape[d + ax] = arr.shape[-1]
        parts.append(arr.reshape(shape) * strides[ax])
    cid = parts[0]
    for p in parts[1:]:
        cid = cid + p
    full = cid.reshape(n_cells, -1).astype(np.int32)

    if all(n >= 2 * m + 1 for n, m in zip(dims, reach)):
        zero = (0,) * d
        offsets = list(
            itertools.product(*[range(-m, m + 1) for m in reach])
        )
        half_offs = [zero] + [o for o in offsets if o > zero]
        cols = []
        for o in half_offs:
            c = np.zeros(dims, dtype=np.int64)
            for ax in range(d):
                c = c + (
                    (grids[ax] + o[ax]) % dims[ax]
                ) * strides[ax]
            cols.append(c.reshape(-1))
        half = np.stack(cols, axis=-1).astype(np.int32)
    else:
        half = None
    return full, half


#: the 27 per-axis wrap-count combinations indexed by
#: ``k = (wx+1)*9 + (wy+1)*3 + (wz+1)`` (k == 13 is the zero image).
_IMAGE_COMBOS = np.array(
    [
        (wx, wy, wz)
        for wx in (-1, 0, 1)
        for wy in (-1, 0, 1)
        for wz in (-1, 0, 1)
    ],
    dtype=np.float32,
)


def _image_shift_table(box_matrix):
    """The 27 lattice translations ``w @ H`` for wrap counts ``w`` in
    {-1, 0, 1}^3, as DOUBLE-FLOAT ``(27, 3)`` hi/lo pairs — each
    translation is an exact two-float32 sum of up to three float32
    box-matrix rows.

    The per-column accumulation order (diagonal term first, then rows
    below, zero upper-triangle terms skipped) REPLICATES
    ``ops/histogram._exact_d2_triclinic`` operation-for-operation:
    double-float splits are order-sensitive at the ulp^2 level, and an
    identical split is what makes the Pallas route bin bin-edge tie
    pairs exactly like the XLA 27-image sweep (caught on-chip: a
    zero-seeded accumulation flipped ~7 straddle pairs out of 35M)."""

    h = box_matrix.astype(jnp.float32)
    hi = []
    lo = []
    for col in range(3):
        # Lower-triangular: rows >= col contribute; row col first.
        t = two_prod(
            jnp.asarray(_IMAGE_COMBOS[:, col]), h[col, col]
        )
        for row in range(col + 1, 3):
            t = df_add(
                t,
                two_prod(jnp.asarray(_IMAGE_COMBOS[:, row]), h[row, col]),
            )
        hi.append(t[0])
        lo.append(t[1])
    return jnp.stack(hi, axis=-1), jnp.stack(lo, axis=-1)


def triclinic_perpendicular_widths(box_matrix):
    """Perpendicular widths of a (lower-triangular) triclinic cell:
    ``w_i = V / |row_j x row_k|`` — the distance between periodic
    faces along lattice direction ``i``.  Cell-list legality for a
    triclinic grid is ``n_i <= floor(w_i / r_max)`` (host side;
    NumPy or JAX)."""

    h = box_matrix
    xp = jnp if isinstance(h, jax.Array) else np
    volume = xp.abs(h[0, 0] * h[1, 1] * h[2, 2])
    cross01 = xp.cross(h[0], h[1])
    cross02 = xp.cross(h[0], h[2])
    cross12 = xp.cross(h[1], h[2])
    norms = xp.stack(
        [
            xp.sqrt((cross12 * cross12).sum()),
            xp.sqrt((cross02 * cross02).sum()),
            xp.sqrt((cross01 * cross01).sum()),
        ]
    )
    return volume / norms


def _triclinic_sweep_ok(box_matrix, dims, r_max):
    """Per-block image shifts require every cell to be >= ``r_max``
    wide on every axis — STRICTLY (no 3-cell whole-axis exception:
    the shift table pins one image per neighbor block, which is only
    the minimum image when cells are no narrower than the cutoff)."""

    widths = triclinic_perpendicular_widths(box_matrix)
    return (
        widths * np.float32(1 + 1e-6) >= dims * np.float32(r_max)
    ).all()


def _triclinic_wrap_cells(positions, box_matrix, n_cells_dim):
    """Fold positions into the primary triclinic cell and assign cell
    ids (device XLA ops, pre-kernel).  The fold subtracts the integer
    lattice combination ``floor(frac) @ H`` — identity (bit-exact)
    for already-wrapped inputs away from cell faces; unwrapped inputs
    move by float32-rounded row sums (~1 ulp of the box)."""

    from .histogram import _inv3

    h = box_matrix.astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    frac = jnp.matmul(positions, _inv3(h), precision=hp)
    m = jnp.floor(frac)
    wrapped = positions - jnp.matmul(m, h, precision=hp)
    dims = jnp.asarray(n_cells_dim, jnp.int32)
    cell_xyz = jnp.clip(
        jax.lax.convert_element_type(
            (frac - m) * dims.astype(jnp.float32), jnp.int32
        ),
        0,
        dims - 1,
    )
    return wrapped, cell_xyz


def _slot_table(
    positions, n_cells_dim, capacity, cell_size, *,
    ex_i=None, ex_j=None, cell_xyz=None, axes=None,
):
    """Device cell build: returns the ``(8, n_cells * capacity)`` slot
    table (xyz + id rows), the ``(n_cells,)`` occupancy, and the max
    occupancy.

    ``ex_i`` / ``ex_j`` are per-atom tile-exclusion ids (``index //
    e``) stored as float32 — exact below 2^24 atoms — so the kernel
    masks excluded pairs with one VPU compare per side.  ``cell_xyz``
    overrides the orthorhombic ``positions / cell_size`` assignment
    (the triclinic fractional build).  ``n_cells_dim`` may have 2
    entries (the ``drop_axis`` grids); ``axes`` then names the
    coordinate columns the grid spans (cell assignment ignores the
    dropped axis, but all three coordinate rows are packed — the
    kernel's distance math selects its own axes).
    """

    dims = tuple(int(x) for x in n_cells_dim)
    if axes is None:
        axes = tuple(range(len(dims)))
    n = positions.shape[0]
    n_cells = int(np.prod(dims))
    if cell_xyz is None:
        cell_xyz = jnp.clip(
            jax.lax.convert_element_type(
                positions[:, list(axes)] / cell_size, jnp.int32
            ),
            0,
            jnp.asarray([d - 1 for d in dims], dtype=jnp.int32),
        )
    cid = cell_xyz[:, 0]
    for ax in range(1, len(dims)):
        cid = cid * np.int32(dims[ax]) + cell_xyz[:, ax]
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
    *, capacity, n_bins, n_coarse, n_fine, bin_consts, exact, exclude, chunk_rows, asym=False,
    n_nbr=14, axes=(0, 1, 2), ordered=False, tri_pp=False,
):
    """Self-group sweep over the neighbor table (home cell = column
    0 of every row, visited first).

    HALF-SHELL mode (``ordered=False``, the default): neighbors 1..
    ``n_nbr``-1 are the positive-lexicographic offsets, the home
    block is masked to the strict upper slot triangle, and every
    unordered pair is examined exactly ONCE (half the pair math);
    the wrapper doubles the counts to restore the ordered-pair
    convention.  Valid because the self-RDF masks (identical-atom
    drop, ``(e, e)`` tile exclusion) are symmetric.

    ``asym`` serves asymmetric ``(e0, e1)`` tiles on the half-shell
    sweep: each unordered pair contributes its ordered-pair
    multiplicity ``[a//e0 != b//e1] + [b//e0 != a//e1]`` in
    {0, 1, 2} through the contraction weights (no doubling in the
    wrapper; diagonal (i, i) pairs are restored host-side).

    ORDERED mode (``ordered=True``; the small-box / deduped-table
    route): every distinct neighbor is swept per direction, the home
    block drops identical atoms by the id row instead of the
    triangle, exclusion is the plain ordered ``i//e0 != j//e1`` mask
    (asymmetric tiles need no weights), and the wrapper does NOT
    double.  ``axes`` selects the distance components (2-D
    ``drop_axis`` grids); ``tri_pp`` switches to the per-pair
    triclinic minimum-image search (``box_ref`` is then the flat
    (18,) H+inverse array, see :func:`_bin_exact_tri27`)."""

    c = pl.program_id(0)
    cap = capacity
    bins_i32 = np.int32(n_bins)
    box = None if tri_pp else tuple(box_ref[k] for k in range(3))

    i_start = c * np.int32(cap)
    ip = pos_ref[:, pl.ds(pl.multiple_of(i_start, 128), cap)]
    i_occ = occ_ref[c]
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    i_valid = slot_col < i_occ  # (cap, 1)
    ei = ip[_ROW_EX_I, :][:, None]
    ej = ip[_ROW_EX_J, :][:, None]
    upper = slot_col < lane  # (cap, cap) strict upper triangle

    def block_acc(acc, j_cell, self_cell):
        j_start = j_cell * np.int32(cap)
        jp = pos_ref[:, pl.ds(pl.multiple_of(j_start, 128), cap)]
        j_occ = occ_ref[j_cell]
        j_valid = lane < j_occ  # (1, cap)

        if tri_pp:
            idx = (_bin_exact_tri27 if exact else _bin_fast_tri27)(
                ip, jp, box_ref, bin_consts, n_bins
            )
        elif exact:
            idx = _bin_exact(ip, jp, box, bin_consts, n_bins, axes)
        else:
            idx = _bin_fast(ip, jp, box, bin_consts, n_bins, axes)

        # Half-shell: the self block keeps only the strict upper slot
        # triangle (which also drops identical atoms); distinct cells
        # never share an atom, so no atom-id compare is needed.
        # Ordered: the self block drops identical atoms by id.
        valid = i_valid & j_valid & (idx < bins_i32)
        if self_cell:
            if ordered:
                valid = valid & (
                    ip[_ROW_AID, :][:, None]
                    != jp[_ROW_AID, :][None, :]
                )
            else:
                valid = valid & upper
        if exclude:
            valid = valid & (ei != jp[_ROW_EX_J, :][None, :])
        idx = jnp.where(valid, idx, bins_i32)
        weights = _asym_weights(ei, ej, jp) if asym else None

        return _digit_contract(
            idx, acc, chunk_rows=chunk_rows, cap_j=cap,
            n_coarse=n_coarse, n_fine=n_fine, weights=weights,
        )

    acc = jnp.zeros((n_coarse, n_fine), jnp.float32)
    acc = block_acc(acc, c, True)
    # TRACED i32 bounds (folding c*n_nbr into them) are load-bearing:
    # static bounds make fori_loop carry a Python-int counter that
    # canonicalizes to i64 under x64, and any narrowing use of it
    # (the flat-table index arithmetic) recurses Mosaic's 64-bit
    # convert lowering at trace time (chip-only; interpret mode and
    # the CPU tests never see it).  Traced bounds take the while->
    # fori path whose induction var is a native i32.
    base = c * np.int32(n_nbr)
    acc = jax.lax.fori_loop(
        base + np.int32(1), base + np.int32(n_nbr),
        lambda nb, a: block_acc(a, nbr_ref[nb], False),
        acc,
    )

    @pl.when(c == 0)
    def _():
        out_ref[:] = acc

    @pl.when(c > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _kernel_tri(
    nbr_ref, img_ref, occ_ref, shhi_ref, shlo_ref, pos_ref, out_ref,
    *, capacity, n_bins, n_coarse, n_fine, bin_consts, exact, exclude, chunk_rows, asym=False,
):
    """Triclinic half-shell sweep: identical structure to
    :func:`_kernel`, but the minimum image is a per-BLOCK lattice
    translation (``img_ref`` holds each neighbor's row into the
    runtime double-float shift table ``shhi_ref``/``shlo_ref``) —
    no per-pair image math at all.  Valid when every cell is at least
    ``r_max`` wide along every lattice direction (enforced by the
    wrapper's NaN poison)."""

    c = pl.program_id(0)
    cap = capacity
    bins_i32 = np.int32(n_bins)

    i_start = c * np.int32(cap)
    ip = pos_ref[:, pl.ds(pl.multiple_of(i_start, 128), cap)]
    i_occ = occ_ref[c]
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    i_valid = slot_col < i_occ
    ei = ip[_ROW_EX_I, :][:, None]
    ej = ip[_ROW_EX_J, :][:, None]
    upper = slot_col < lane

    def block_acc(acc, j_cell, img_k, self_cell):
        j_start = j_cell * np.int32(cap)
        jp = pos_ref[:, pl.ds(pl.multiple_of(j_start, 128), cap)]
        j_valid = lane < occ_ref[j_cell]
        shift = tuple(
            (
                shhi_ref[img_k, np.int32(k)],
                shlo_ref[img_k, np.int32(k)],
            )
            for k in range(3)
        )

        if exact:
            idx = _bin_exact_shift(
                ip, jp, shift, bin_consts, n_bins
            )
        else:
            idx = _bin_fast_shift(
                ip, jp, shift, bin_consts, n_bins
            )

        valid = i_valid & j_valid & (idx < bins_i32)
        if self_cell:
            valid = valid & upper
        if exclude:
            valid = valid & (ei != jp[_ROW_EX_J, :][None, :])
        idx = jnp.where(valid, idx, bins_i32)
        weights = _asym_weights(ei, ej, jp) if asym else None

        return _digit_contract(
            idx, acc, chunk_rows=chunk_rows, cap_j=cap,
            n_coarse=n_coarse, n_fine=n_fine, weights=weights,
        )

    acc = jnp.zeros((n_coarse, n_fine), jnp.float32)
    acc = block_acc(acc, c, np.int32(13), True)  # zero image
    # traced i32 bounds: see the neighbor loop in _kernel
    base = c * np.int32(14)
    acc = jax.lax.fori_loop(
        base + np.int32(1),
        base + np.int32(14),
        lambda nb, a: block_acc(
            a, nbr_ref[nb], img_ref[nb], False
        ),
        acc,
    )

    @pl.when(c == 0)
    def _():
        out_ref[:] = acc

    @pl.when(c > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _cross_kernel_tri(
    nbr_ref, img_ref, occ1_ref, occ2_ref, shhi_ref, shlo_ref,
    pos1_ref, pos2_ref, out_ref,
    *, cap1, cap2, n_bins, n_coarse, n_fine, bin_consts, exact, exclude, chunk_rows,
):
    """Triclinic cross-group variant of :func:`_cross_kernel` with
    per-block image shifts (see :func:`_kernel_tri`)."""

    c = pl.program_id(0)
    bins_i32 = np.int32(n_bins)

    ip = pos1_ref[:, pl.ds(pl.multiple_of(c * np.int32(cap1), 128), cap1)]
    i_occ = occ1_ref[c]
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (cap1, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap2), 1)
    i_valid = slot_col < i_occ
    ei = ip[_ROW_EX_I, :][:, None]

    acc = jnp.zeros((n_coarse, n_fine), jnp.float32)

    def nb_body(nb, acc):
        j_cell = nbr_ref[nb]
        img_k = img_ref[nb]
        jp = pos2_ref[
            :, pl.ds(pl.multiple_of(j_cell * np.int32(cap2), 128), cap2)
        ]
        j_valid = lane < occ2_ref[j_cell]
        shift = tuple(
            (
                shhi_ref[img_k, np.int32(k)],
                shlo_ref[img_k, np.int32(k)],
            )
            for k in range(3)
        )

        if exact:
            idx = _bin_exact_shift(
                ip, jp, shift, bin_consts, n_bins
            )
        else:
            idx = _bin_fast_shift(
                ip, jp, shift, bin_consts, n_bins
            )

        valid = i_valid & j_valid & (idx < bins_i32)
        if exclude:
            valid = valid & (ei != jp[_ROW_EX_J, :][None, :])
        idx = jnp.where(valid, idx, bins_i32)

        return _digit_contract(
            idx, acc, chunk_rows=chunk_rows, cap_j=cap2,
            n_coarse=n_coarse, n_fine=n_fine,
        )

    # traced i32 bounds: see the neighbor loop in _kernel
    base = c * np.int32(27)
    acc = jax.lax.fori_loop(base, base + np.int32(27), nb_body, acc)

    @pl.when(c == 0)
    def _():
        out_ref[:] = acc

    @pl.when(c > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _upper_or_all(slot_col, lane, nb, cap):
    """Strict upper slot triangle on the self block (``nb == 0``),
    everything elsewhere — as one scalar select folded into the
    compare: ``slot_col < lane + (nb > 0) * cap`` is the triangle when
    ``nb == 0`` and always true otherwise (``slot_col < cap``)."""

    return slot_col < lane + jnp.where(
        nb == np.int32(0), np.int32(0), np.int32(cap)
    )


def _kernel_stream(
    nbr_ref, occ_ref, box_ref, ipos_ref, jpos_ref, out_ref,
    *, capacity, n_bins, n_coarse, n_fine, bin_consts, exact, exclude, chunk_rows, asym=False,
    n_nbr=14, axes=(0, 1, 2), ordered=False, tri_pp=False,
):
    """Streaming-block variant of :func:`_kernel` for slot tables too
    large to hold resident in VMEM (~16 MB/core): the grid is
    ``(n_cells, n_nbr)`` and the index maps DMA only the home cell's
    ``(8, capacity)`` block plus the one neighbor block selected by
    the scalar-prefetched neighbor table — VMEM holds two blocks
    and the accumulator instead of the whole table, removing the
    ~300k-atom compile ceiling (at 500k atoms the resident table is
    34 MB and Mosaic refuses the kernel).  ``ordered`` / ``axes`` /
    ``tri_pp`` as in :func:`_kernel` (``nb == 0`` is the home
    block)."""

    c = pl.program_id(0)
    nb = pl.program_id(1)
    cap = capacity
    bins_i32 = np.int32(n_bins)
    box = None if tri_pp else tuple(box_ref[k] for k in range(3))

    ip = ipos_ref[...]
    jp = jpos_ref[...]
    i_occ = occ_ref[c]
    j_occ = occ_ref[nbr_ref[c * np.int32(n_nbr) + nb]]
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)

    if tri_pp:
        idx = (_bin_exact_tri27 if exact else _bin_fast_tri27)(
            ip, jp, box_ref, bin_consts, n_bins
        )
    elif exact:
        idx = _bin_exact(ip, jp, box, bin_consts, n_bins, axes)
    else:
        idx = _bin_fast(ip, jp, box, bin_consts, n_bins, axes)

    valid = (slot_col < i_occ) & (lane < j_occ) & (idx < bins_i32)
    if ordered:
        # home block (nb == 0): drop identical atoms by id row
        valid = valid & (
            (
                ip[_ROW_AID, :][:, None]
                != jp[_ROW_AID, :][None, :]
            )
            | (nb > np.int32(0))
        )
    else:
        valid = valid & _upper_or_all(slot_col, lane, nb, cap)
    if exclude:
        valid = valid & (
            ip[_ROW_EX_I, :][:, None] != jp[_ROW_EX_J, :][None, :]
        )
    idx = jnp.where(valid, idx, bins_i32)
    weights = (
        _asym_weights(
            ip[_ROW_EX_I, :][:, None], ip[_ROW_EX_J, :][:, None], jp
        )
        if asym
        else None
    )

    acc = _digit_contract(
        idx, jnp.zeros((n_coarse, n_fine), jnp.float32),
        chunk_rows=chunk_rows, cap_j=cap,
        n_coarse=n_coarse, n_fine=n_fine, weights=weights,
    )
    first = (c == 0) & (nb == 0)

    @pl.when(first)
    def _():
        out_ref[:] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] = out_ref[:] + acc


def _kernel_tri_stream(
    nbr_ref, img_ref, occ_ref, shhi_ref, shlo_ref,
    ipos_ref, jpos_ref, out_ref,
    *, capacity, n_bins, n_coarse, n_fine, bin_consts, exact, exclude, chunk_rows, asym=False,
):
    """Triclinic streaming-block variant (see :func:`_kernel_stream`
    and :func:`_kernel_tri`): the per-block lattice image comes from
    the scalar-prefetched image table row for this (cell, neighbor)
    step (``img[c, 0] == 13``, the zero image, on the self block)."""

    c = pl.program_id(0)
    nb = pl.program_id(1)
    cap = capacity
    bins_i32 = np.int32(n_bins)

    ip = ipos_ref[...]
    jp = jpos_ref[...]
    i_occ = occ_ref[c]
    j_occ = occ_ref[nbr_ref[c * np.int32(14) + nb]]
    img_k = img_ref[c * np.int32(14) + nb]
    shift = tuple(
        (shhi_ref[img_k, np.int32(k)], shlo_ref[img_k, np.int32(k)])
        for k in range(3)
    )
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)

    if exact:
        idx = _bin_exact_shift(ip, jp, shift, bin_consts, n_bins)
    else:
        idx = _bin_fast_shift(ip, jp, shift, bin_consts, n_bins)

    valid = (
        (slot_col < i_occ)
        & (lane < j_occ)
        & (idx < bins_i32)
        & _upper_or_all(slot_col, lane, nb, cap)
    )
    if exclude:
        valid = valid & (
            ip[_ROW_EX_I, :][:, None] != jp[_ROW_EX_J, :][None, :]
        )
    idx = jnp.where(valid, idx, bins_i32)
    weights = (
        _asym_weights(
            ip[_ROW_EX_I, :][:, None], ip[_ROW_EX_J, :][:, None], jp
        )
        if asym
        else None
    )

    acc = _digit_contract(
        idx, jnp.zeros((n_coarse, n_fine), jnp.float32),
        chunk_rows=chunk_rows, cap_j=cap,
        n_coarse=n_coarse, n_fine=n_fine, weights=weights,
    )
    first = (c == 0) & (nb == 0)

    @pl.when(first)
    def _():
        out_ref[:] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] = out_ref[:] + acc


def _cross_kernel_stream(
    nbr_ref, occ1_ref, occ2_ref, box_ref,
    ipos_ref, jpos_ref, out_ref,
    *, cap1, cap2, n_bins, n_coarse, n_fine, bin_consts, exact, exclude, chunk_rows,
    n_nbr=27, axes=(0, 1, 2), tri_pp=False,
):
    """Streaming-block variant of :func:`_cross_kernel`: grid
    ``(n_cells, n_nbr)``, group-1 home block + the group-2 neighbor
    block selected by the prefetched neighbor table."""

    c = pl.program_id(0)
    nb = pl.program_id(1)
    bins_i32 = np.int32(n_bins)
    box = None if tri_pp else tuple(box_ref[k] for k in range(3))

    ip = ipos_ref[...]
    jp = jpos_ref[...]
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (cap1, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap2), 1)

    if tri_pp:
        idx = (_bin_exact_tri27 if exact else _bin_fast_tri27)(
            ip, jp, box_ref, bin_consts, n_bins
        )
    elif exact:
        idx = _bin_exact(ip, jp, box, bin_consts, n_bins, axes)
    else:
        idx = _bin_fast(ip, jp, box, bin_consts, n_bins, axes)

    valid = (
        (slot_col < occ1_ref[c])
        & (lane < occ2_ref[nbr_ref[c * np.int32(n_nbr) + nb]])
        & (idx < bins_i32)
    )
    if exclude:
        valid = valid & (
            ip[_ROW_EX_I, :][:, None] != jp[_ROW_EX_J, :][None, :]
        )
    idx = jnp.where(valid, idx, bins_i32)

    acc = _digit_contract(
        idx, jnp.zeros((n_coarse, n_fine), jnp.float32),
        chunk_rows=chunk_rows, cap_j=cap2,
        n_coarse=n_coarse, n_fine=n_fine,
    )
    first = (c == 0) & (nb == 0)

    @pl.when(first)
    def _():
        out_ref[:] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] = out_ref[:] + acc


def _cross_kernel_tri_stream(
    nbr_ref, img_ref, occ1_ref, occ2_ref, shhi_ref, shlo_ref,
    ipos_ref, jpos_ref, out_ref,
    *, cap1, cap2, n_bins, n_coarse, n_fine, bin_consts, exact, exclude, chunk_rows,
):
    """Triclinic streaming-block cross kernel (see
    :func:`_cross_kernel_tri` and :func:`_kernel_stream`)."""

    c = pl.program_id(0)
    nb = pl.program_id(1)
    bins_i32 = np.int32(n_bins)

    ip = ipos_ref[...]
    jp = jpos_ref[...]
    img_k = img_ref[c * np.int32(27) + nb]
    shift = tuple(
        (shhi_ref[img_k, np.int32(k)], shlo_ref[img_k, np.int32(k)])
        for k in range(3)
    )
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (cap1, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap2), 1)

    if exact:
        idx = _bin_exact_shift(ip, jp, shift, bin_consts, n_bins)
    else:
        idx = _bin_fast_shift(ip, jp, shift, bin_consts, n_bins)

    valid = (
        (slot_col < occ1_ref[c])
        & (lane < occ2_ref[nbr_ref[c * np.int32(27) + nb]])
        & (idx < bins_i32)
    )
    if exclude:
        valid = valid & (
            ip[_ROW_EX_I, :][:, None] != jp[_ROW_EX_J, :][None, :]
        )
    idx = jnp.where(valid, idx, bins_i32)

    acc = _digit_contract(
        idx, jnp.zeros((n_coarse, n_fine), jnp.float32),
        chunk_rows=chunk_rows, cap_j=cap2,
        n_coarse=n_coarse, n_fine=n_fine,
    )
    first = (c == 0) & (nb == 0)

    @pl.when(first)
    def _():
        out_ref[:] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] = out_ref[:] + acc


#: Resident slot tables above this VMEM budget stream per-block
#: instead (~16 MB/core VMEM; leave room for the one-hot chunks).
#: MDTPU_PALLAS_STREAM=1/0 forces streaming always/never (A/Bs).
_STREAM_TABLE_BYTES = 12 << 20


def _use_stream_blocks(total_table_bytes: int) -> bool:
    env = os.environ.get("MDTPU_PALLAS_STREAM")
    if env is not None:
        return env not in ("0", "", "false")
    return total_table_bytes > _STREAM_TABLE_BYTES


def _chunk_rows_for(capacity, n_fine, cap_j=None):
    """One-hot contraction row-chunk: the largest DIVISOR of the
    i-capacity whose live one-hot pair stays under ~8 MB.  The old
    halve-until-divides walk degenerated for non-power-of-two
    capacities (cap 384: budget 170 -> 85 -> ... -> 2, i.e. 192
    sub-millimeter contractions per block and a ~10x kernel slowdown
    measured on the 2-D drop_axis route); capacities are multiples
    of 128, so a divisor at or near the budget always exists."""

    cap_j = capacity if cap_j is None else cap_j
    budget = max(8, (4 * 1024 * 1024) // (4 * n_fine * cap_j))
    if budget >= capacity:
        return capacity
    return max(
        d for d in range(1, budget + 1) if capacity % d == 0
    )


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
        "n_cells_dim", "capacity", "n_bins", "r_max", "r_min",
        "precision", "exclusion", "axes", "reach",
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
    r_min: float = 0.0,
    axes=(0, 1, 2),
    reach=None,
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
    ``exclusion=(e0, e1)`` drops ordered pairs whose atom indices
    satisfy ``i // e0 == j // e1`` (the reference's tile exclusion,
    ``analysis/structure.py:92-104``).  Symmetric ``(e, e)`` tiles ride
    the half-shell mask directly (identical-atom pairs are dropped by
    the slot triangle); asymmetric tiles weight each unordered pair by
    its ordered multiplicity ``[i//e0 != j//e1] + [j//e0 != i//e1]``
    in the contraction and restore the surviving diagonal ``(i, i)``
    pairs (``i//e0 != i//e1``; distance 0 -> bin 0) host-side, exactly
    matching the XLA full-product sweep.

    TRICLINIC cells: pass the ``(3, 3)`` lower-triangular box matrix
    as ``box`` (rows are the box vectors,
    ``algorithm.topology.triclinic_matrices``).  The sweep then uses
    per-neighbor-block lattice shifts (:func:`_image_shift_table`) —
    no per-pair image search — and expects inputs wrapped into the
    primary cell (a fractional-coordinate fold is applied, exact for
    wrapped inputs; plan against the PERPENDICULAR widths,
    :func:`triclinic_perpendicular_widths`).  Legality is strict
    (``widths >= n_cells_dim * r_max``, NaN-poisoned otherwise — no
    3-cell whole-axis exception).

    The cell build (ids, argsort, searchsorted, padded slot-table
    gather) runs as regular XLA ops; only the pair sweep is the Pallas
    kernel.

    GENERALIZED grids (round 5): ``n_cells_dim`` may have 2 entries —
    ``axes`` then names the two coordinate columns the grid (and the
    distance) spans, the 2-D ``drop_axis`` RDF.  ``reach`` (from the
    plan search) widens the neighbor sweep to ``[-m_i, m_i]`` for
    grids whose cells are narrower than the cutoff; whenever some
    axis has ``n_i < 2 m_i + 1`` (small boxes) the sweep switches
    from the half-shell to the ORDERED full deduped-table sweep
    (per-pair minimum-image math counts every ordered pair exactly
    once; identical atoms drop by the id row; no doubling).
    Triclinic boxes off the reach-1/>=3-cells legacy path use the
    per-pair 27-candidate minimum-image search
    (:func:`_bin_exact_tri27`) instead of per-block shifts — any
    box size, same binning as the XLA oracle.
    """

    n = positions.shape[0]
    dims_t = tuple(int(x) for x in n_cells_dim)
    d = len(dims_t)
    axes = tuple(axes)
    if len(axes) != d:
        raise ValueError(
            "len(axes) must match len(n_cells_dim) — 2-D grids "
            "require an explicit axes= naming the two kept "
            "coordinate columns"
        )
    reach = (
        (1,) * d if reach is None else tuple(int(m) for m in reach)
    )
    n_cells = int(np.prod(dims_t))
    n_fine = 16
    n_coarse = _cdiv(n_bins + 1, n_fine)
    # bf16 one-hot rows must fill whole (16, 128) sublane tiles.
    n_rows = _cdiv(n_coarse, 16) * 16
    box = jnp.asarray(box, dtype=jnp.float32)
    triclinic = box.ndim == 2
    positions = positions.astype(jnp.float32)

    legacy_tri = (
        triclinic
        and reach == (1, 1, 1)
        and all(nd >= 3 for nd in dims_t)
    )
    tri_pp = triclinic and not legacy_tri
    asym_excl = (
        exclusion is not None and exclusion[0] != exclusion[1]
    )
    ex_i, ex_j, have_excl = _exclusion_ids(n, exclusion)

    if legacy_tri:
        _, _, nbr_tab, half_img = _neighbor_tables(dims_t)
        ordered = False
        n_nbr = 14
    else:
        full_tab, half_tab = _neighbor_tables_general(dims_t, reach)
        # Triclinic per-pair sweeps always run ordered (the 27-
        # candidate search is symmetric, but the half-shell saving is
        # not worth a second code path for the small-box case).
        ordered = tri_pp or half_tab is None
        nbr_tab = full_tab if ordered else half_tab
        n_nbr = nbr_tab.shape[1]

    if triclinic:
        positions, cell_xyz = _triclinic_wrap_cells(
            positions, box, dims_t
        )
        pos_table, occupancy, max_occupancy = _slot_table(
            positions, dims_t, capacity, None,
            ex_i=ex_i, ex_j=ex_j, cell_xyz=cell_xyz,
        )
        if legacy_tri:
            sh_hi, sh_lo = _image_shift_table(box)
            dims_f = jnp.asarray(dims_t, jnp.float32)
            sweep_ok = _triclinic_sweep_ok(box, dims_f, r_max)
        else:
            from .histogram import _inv3

            box_arg = jnp.concatenate(
                [box.reshape(-1), _inv3(box).reshape(-1)]
            )
            sweep_ok = _cell_sweep_ok(
                triclinic_perpendicular_widths(box),
                dims_t, reach, r_max,
            )
    else:
        box = box.reshape(3)
        box_axes = box[np.asarray(axes)]
        dims_f = jnp.asarray(dims_t, jnp.float32)
        pos_table, occupancy, max_occupancy = _slot_table(
            positions, dims_t, capacity, box_axes / dims_f,
            ex_i=ex_i, ex_j=ex_j, axes=axes,
        )
        box_arg = box
        sweep_ok = _cell_sweep_ok(box_axes, dims_t, reach, r_max)

    bin_consts = _bin_boundary_constants(r_max, n_bins, r_min)

    # One-hot chunking: cap the live one-hot pair to ~8 MB.
    chunk_rows = _chunk_rows_for(capacity, n_fine)

    use_asym = asym_excl and not ordered
    common = dict(
        capacity=capacity, n_bins=n_bins,
        n_coarse=n_rows, n_fine=n_fine,
        bin_consts=bin_consts,
        exact=(precision == "exact"),
        exclude=have_excl and (ordered or not asym_excl),
        asym=use_asym,
        chunk_rows=chunk_rows,
    )
    stream = _use_stream_blocks(_ROWS * n_cells * capacity * 4)
    out_spec = pl.BlockSpec(
        (n_rows, n_fine),
        lambda *a: (jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    if stream:
        # Per-(cell, neighbor) blocks: the scalar-prefetched
        # neighbor table drives the j-block DMA via the index map,
        # so VMEM holds two (8, capacity) blocks instead of the whole
        # table (the resident layout caps out near 300k atoms).
        block = pl.BlockSpec(
            (_ROWS, capacity),
            lambda c, nb, nbr, *s: (jnp.int32(0), c),
            memory_space=pltpu.VMEM,
        )
        jblock = pl.BlockSpec(
            (_ROWS, capacity),
            lambda c, nb, nbr, *s: (
                jnp.int32(0), nbr[c * n_nbr + nb]
            ),
            memory_space=pltpu.VMEM,
        )
        if legacy_tri:
            kernel = functools.partial(_kernel_tri_stream, **common)
            n_prefetch = 5
            args = (
                jnp.asarray(nbr_tab.reshape(-1)),
                jnp.asarray(half_img.reshape(-1)),
                occupancy, sh_hi, sh_lo, pos_table, pos_table,
            )
        else:
            kernel = functools.partial(
                _kernel_stream, n_nbr=n_nbr, axes=axes,
                ordered=ordered, tri_pp=tri_pp, **common,
            )
            n_prefetch = 3
            args = (
                jnp.asarray(nbr_tab.reshape(-1)), occupancy,
                box_arg, pos_table, pos_table,
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(n_cells, n_nbr),
            in_specs=[block, jblock],
            out_specs=out_spec,
        )
    else:
        if legacy_tri:
            kernel = functools.partial(_kernel_tri, **common)
            n_prefetch = 5
            args = (
                jnp.asarray(nbr_tab.reshape(-1)),
                jnp.asarray(half_img.reshape(-1)),
                occupancy, sh_hi, sh_lo, pos_table,
            )
        else:
            kernel = functools.partial(
                _kernel, n_nbr=n_nbr, axes=axes,
                ordered=ordered, tri_pp=tri_pp, **common,
            )
            n_prefetch = 3
            args = (
                jnp.asarray(nbr_tab.reshape(-1)), occupancy,
                box_arg, pos_table,
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(n_cells,),
            in_specs=[
                pl.BlockSpec(
                    (_ROWS, n_cells * capacity),
                    lambda c, *s: (jnp.int32(0), jnp.int32(0)),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=out_spec,
        )
    counts2d = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, n_fine), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    counts = counts2d[:n_coarse].reshape(-1)[:n_bins]
    if asym_excl:
        # Half-shell: the kernel accumulated ordered-pair
        # multiplicities through the contraction weights; ordered:
        # the plain mask already counts ordered pairs.  Either way,
        # add back the diagonal (i, i) pairs the identical-atom drop
        # removes but the tile rule keeps (i//e0 != i//e1; distance
        # exactly 0 -> bin 0), matching the XLA full-product sweep.
        # With an offset grid (r_min > 0) zero distances are out of
        # range.
        e0, e1 = (int(e) for e in exclusion)
        ar = np.arange(n)
        n_diag = int(np.sum(ar // e0 != ar // e1))
        if n_diag and r_min == 0.0:
            counts = counts.at[0].add(np.float32(n_diag))
    elif not ordered:
        # Each unordered pair was counted once; restore the
        # ordered-pair convention of the XLA kernel / oracle.
        counts = counts * np.float32(2)
    counts = jnp.where(sweep_ok, counts, jnp.float32(np.nan))
    return counts, max_occupancy


def _cross_kernel(
    nbr_ref, occ1_ref, occ2_ref, box_ref, pos1_ref, pos2_ref, out_ref,
    *, cap1, cap2, n_bins, n_coarse, n_fine, bin_consts, exact, exclude, chunk_rows,
    n_nbr=27, axes=(0, 1, 2), tri_pp=False,
):
    """Cross-group variant of :func:`_kernel`: i atoms from group 1's
    slot table, j atoms from group 2's; no identical-atom handling
    (the groups must be disjoint), optional tile exclusion via the id
    rows.  ``n_nbr`` / ``axes`` / ``tri_pp`` as in :func:`_kernel`
    (the deduped general tables serve any box size)."""

    c = pl.program_id(0)
    bins_i32 = np.int32(n_bins)
    box = None if tri_pp else tuple(box_ref[k] for k in range(3))

    ip = pos1_ref[:, pl.ds(pl.multiple_of(c * np.int32(cap1), 128), cap1)]
    i_occ = occ1_ref[c]
    slot_col = jax.lax.broadcasted_iota(jnp.int32, (cap1, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap2), 1)
    i_valid = slot_col < i_occ
    ei = ip[_ROW_EX_I, :][:, None]

    acc = jnp.zeros((n_coarse, n_fine), jnp.float32)

    def nb_body(nb, acc):
        j_cell = nbr_ref[nb]
        jp = pos2_ref[
            :, pl.ds(pl.multiple_of(j_cell * np.int32(cap2), 128), cap2)
        ]
        j_valid = lane < occ2_ref[j_cell]

        if tri_pp:
            idx = (_bin_exact_tri27 if exact else _bin_fast_tri27)(
                ip, jp, box_ref, bin_consts, n_bins
            )
        elif exact:
            idx = _bin_exact(ip, jp, box, bin_consts, n_bins, axes)
        else:
            idx = _bin_fast(ip, jp, box, bin_consts, n_bins, axes)

        valid = i_valid & j_valid & (idx < bins_i32)
        if exclude:
            valid = valid & (ei != jp[_ROW_EX_J, :][None, :])
        idx = jnp.where(valid, idx, bins_i32)

        return _digit_contract(
            idx, acc, chunk_rows=chunk_rows, cap_j=cap2,
            n_coarse=n_coarse, n_fine=n_fine,
        )

    # traced i32 bounds: see the neighbor loop in _kernel
    base = c * np.int32(n_nbr)
    acc = jax.lax.fori_loop(base, base + np.int32(n_nbr), nb_body, acc)

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
        "r_max", "r_min", "precision", "exclusion", "axes", "reach",
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
    r_min: float = 0.0,
    axes=(0, 1, 2),
    reach=None,
):
    r"""Cross-group cutoff histogram: every (group-1, group-2) pair on
    uniform bins ``[r_min, r_max]`` (``r_min > 0`` switches to the
    offset-grid boundary convention of
    ``ops/histogram._exact_bin_indices``, incl. the closed last
    edge); returns ``(counts, max_occ1,
    max_occ2)``.  The groups must be disjoint atom sets (no
    identical-atom masking is applied).  ``box`` is a runtime ``(3,)``
    array — per-frame boxes supported, NaN-poisoned when a box
    invalidates the cell sweep (see
    :func:`cell_pair_histogram_pallas`).  ``exclusion=(e0, e1)`` drops
    pairs with ``i1 // e0 == i2 // e1`` on the group-local indices —
    the reference's molecule-block exclusion for, e.g., intra-molecular
    cation-anion pairs.  Plan each capacity with
    :func:`pallas_cell_plan` on the respective group size.

    TRICLINIC cells: pass the ``(3, 3)`` lower-triangular box matrix
    as ``box`` (see :func:`cell_pair_histogram_pallas`).

    GENERALIZED grids (2-D ``axes`` grids, per-axis ``reach``, any
    box size): see :func:`cell_pair_histogram_pallas` — the cross
    sweep is ordered by construction, so only the deduped full table
    changes.
    """

    dims_t = tuple(int(x) for x in n_cells_dim)
    d = len(dims_t)
    axes = tuple(axes)
    if len(axes) != d:
        raise ValueError(
            "len(axes) must match len(n_cells_dim) — 2-D grids "
            "require an explicit axes= naming the two kept "
            "coordinate columns"
        )
    reach = (
        (1,) * d if reach is None else tuple(int(m) for m in reach)
    )
    n_cells = int(np.prod(dims_t))
    n_fine = 16
    n_coarse = _cdiv(n_bins + 1, n_fine)
    n_rows = _cdiv(n_coarse, 16) * 16
    box = jnp.asarray(box, dtype=jnp.float32)
    triclinic = box.ndim == 2

    legacy_tri = (
        triclinic
        and reach == (1, 1, 1)
        and all(nd >= 3 for nd in dims_t)
    )
    tri_pp = triclinic and not legacy_tri

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

    if legacy_tri:
        full_shell, full_img, _, _ = _neighbor_tables(dims_t)
        n_nbr = 27
    else:
        full_shell, _ = _neighbor_tables_general(dims_t, reach)
        full_img = None
        n_nbr = full_shell.shape[1]
    positions1 = positions1.astype(jnp.float32)
    positions2 = positions2.astype(jnp.float32)
    box_arg = box
    if triclinic:
        positions1, cells1 = _triclinic_wrap_cells(
            positions1, box, dims_t
        )
        positions2, cells2 = _triclinic_wrap_cells(
            positions2, box, dims_t
        )
        cell_size = None
        if legacy_tri:
            sh_hi, sh_lo = _image_shift_table(box)
            dims_f = jnp.asarray(dims_t, jnp.float32)
            sweep_ok = _triclinic_sweep_ok(box, dims_f, r_max)
        else:
            from .histogram import _inv3

            box_arg = jnp.concatenate(
                [box.reshape(-1), _inv3(box).reshape(-1)]
            )
            sweep_ok = _cell_sweep_ok(
                triclinic_perpendicular_widths(box),
                dims_t, reach, r_max,
            )
    else:
        box = box.reshape(3)
        box_axes = box[np.asarray(axes)]
        dims_f = jnp.asarray(dims_t, jnp.float32)
        cell_size = box_axes / dims_f
        cells1 = cells2 = None
        box_arg = box
        sweep_ok = _cell_sweep_ok(box_axes, dims_t, reach, r_max)
    t1, occ1, max1 = _slot_table(
        positions1, dims_t, capacity1,
        cell_size, ex_i=ex1, ex_j=ex1, cell_xyz=cells1, axes=axes,
    )
    t2, occ2, max2 = _slot_table(
        positions2, dims_t, capacity2,
        cell_size, ex_i=ex2, ex_j=ex2, cell_xyz=cells2, axes=axes,
    )

    bin_consts = _bin_boundary_constants(r_max, n_bins, r_min)
    chunk_rows = _chunk_rows_for(capacity1, n_fine, cap_j=capacity2)

    common = dict(
        cap1=capacity1, cap2=capacity2, n_bins=n_bins,
        n_coarse=n_rows, n_fine=n_fine,
        bin_consts=bin_consts,
        exact=(precision == "exact"), exclude=exclude,
        chunk_rows=chunk_rows,
    )
    stream = _use_stream_blocks(
        _ROWS * n_cells * (capacity1 + capacity2) * 4
    )
    out_spec = pl.BlockSpec(
        (n_rows, n_fine),
        lambda *a: (jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    if stream:
        iblock = pl.BlockSpec(
            (_ROWS, capacity1),
            lambda c, nb, nbr, *s: (jnp.int32(0), c),
            memory_space=pltpu.VMEM,
        )
        jblock = pl.BlockSpec(
            (_ROWS, capacity2),
            lambda c, nb, nbr, *s: (
                jnp.int32(0), nbr[c * n_nbr + nb]
            ),
            memory_space=pltpu.VMEM,
        )
        if legacy_tri:
            kernel = functools.partial(
                _cross_kernel_tri_stream, **common
            )
            n_prefetch = 6
            args = (
                jnp.asarray(full_shell.reshape(-1)),
                jnp.asarray(full_img.reshape(-1)),
                occ1, occ2, sh_hi, sh_lo, t1, t2,
            )
        else:
            kernel = functools.partial(
                _cross_kernel_stream, n_nbr=n_nbr, axes=axes,
                tri_pp=tri_pp, **common,
            )
            n_prefetch = 4
            args = (
                jnp.asarray(full_shell.reshape(-1)), occ1, occ2,
                box_arg, t1, t2,
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(n_cells, n_nbr),
            in_specs=[iblock, jblock],
            out_specs=out_spec,
        )
    else:
        if legacy_tri:
            kernel = functools.partial(_cross_kernel_tri, **common)
            n_prefetch = 6
            args = (
                jnp.asarray(full_shell.reshape(-1)),
                jnp.asarray(full_img.reshape(-1)),
                occ1, occ2, sh_hi, sh_lo, t1, t2,
            )
        else:
            kernel = functools.partial(
                _cross_kernel, n_nbr=n_nbr, axes=axes,
                tri_pp=tri_pp, **common,
            )
            n_prefetch = 4
            args = (
                jnp.asarray(full_shell.reshape(-1)), occ1, occ2,
                box_arg, t1, t2,
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(n_cells,),
            in_specs=[
                pl.BlockSpec(
                    (_ROWS, n_cells * capacity1),
                    lambda c, *s: (jnp.int32(0), jnp.int32(0)),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (_ROWS, n_cells * capacity2),
                    lambda c, *s: (jnp.int32(0), jnp.int32(0)),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=out_spec,
        )
    counts2d = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, n_fine), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    counts = counts2d[:n_coarse].reshape(-1)[:n_bins]
    counts = jnp.where(sweep_ok, counts, jnp.float32(np.nan))
    return counts, max1, max2
