r"""
Solvent-accessible surface area
===============================

Shrake–Rupley solvent-accessible surface area (SASA): each atom's
van der Waals sphere is inflated by the probe radius and sampled
with a deterministic golden-spiral point set; a point is accessible
iff it lies outside every neighbor's inflated sphere, and the
per-atom area is the accessible fraction of the inflated sphere
(Shrake & Rupley 1973).  Beyond-reference capability (bbye98/mdhelper
has no surface analysis; the public analogues are mdtraj's
``shrake_rupley`` and FreeSASA).

TPU-first design: the per-frame work is a dense tiled minimum-image
candidate sweep (an i-block against all atoms — occluders must
satisfy :math:`|r_{ij}| < R_i + R_j`) followed by a ``top_k``
compaction to a static per-atom candidate budget, so the expensive
point-occlusion test is a fixed-shape ``(block, n_points,
max_occluders)`` elementwise reduction — no scatter, no dynamic
shapes, fully fusable by XLA.  Candidate positions are taken
*relative to the central atom* from the already-minimum-imaged pair
vectors, so the inner loop needs no box math at all (valid whenever
occluder reach is below half the box, the usual minimum-image
contract).  On tunnel-attached TPUs (or for large :math:`N`) a
KD-tree host pipeline computes the same quantities in float64.
"""

from numbers import Real

import jax
import jax.numpy as jnp
import numpy as np

from .. import ureg
from ..algorithm.topology import resolve_vdw_radii
from ..algorithm.unit import strip_unit
from ..ops.histogram import _min_image_vectors
from .base import DynamicAnalysisBase
from .cluster import (
    _periodic_contact_pairs,
    _triclinic_contact_pairs,
)
from .steinhardt import (
    _cap_chunk_for_budget,
    _dense_block_size,
    _order_host_pipeline,
    _pad_blocks,
)

__all__ = [
    "OccluderOverflow",
    "SolventAccessibleSurfaceArea",
    "sphere_points",
]


class OccluderOverflow(ValueError):
    """An atom had more occlusion candidates than the static
    ``max_occluders`` budget (dense local packing); re-run with a
    larger budget.  :meth:`SolventAccessibleSurfaceArea.run`
    auto-escalates twice before propagating."""


def sphere_points(n: int) -> np.ndarray:
    r"""Deterministic unit-sphere quadrature points (golden-spiral /
    Fibonacci lattice): ``n`` points with near-uniform area weights,
    the standard Shrake-Rupley test-point set.

    Returns
    -------
    points : `numpy.ndarray`
        Unit vectors, shape ``(n, 3)``.
    """

    if n < 1:
        raise ValueError("'n' must be positive.")
    k = np.arange(n, dtype=np.float64) + 0.5
    z = 1.0 - 2.0 * k / n
    phi = k * (np.pi * (3.0 - np.sqrt(5.0)))
    rho = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    return np.stack(
        [rho * np.cos(phi), rho * np.sin(phi), z], axis=1
    )


class SolventAccessibleSurfaceArea(DynamicAnalysisBase):
    r"""Shrake–Rupley solvent-accessible surface area.

    Each atom :math:`i` is assigned the inflated radius :math:`R_i =
    r_i^\mathrm{vdW} + r_\mathrm{probe}`; ``n_points`` golden-spiral
    test points are placed on that sphere, a point is *accessible*
    iff it lies outside every other inflated sphere, and

    .. math::

       A_i = 4 \pi R_i^2 \,
       \frac{n_\mathrm{accessible}(i)}{n_\mathrm{points}}.

    Parameters
    ----------
    group : `AtomGroup`
        Atoms to compute surface areas for.  All atoms *in the
        group* act as occluders of each other; atoms outside the
        group are ignored (select the full molecule-plus-environment
        group to include their occlusion).
    probe_radius : `float` or unit-bearing quantity, \
    default :code:`1.4`
        Solvent probe radius (Å); the water-sized default.
    n_points : `int`, default :code:`960`
        Test points per atom.  Quadrature error decays roughly as
        ``1/n_points`` for smooth spherical caps.
    radii : `dict`, array-like, or `None`, keyword-only
        Van der Waals radii (Å).  `None` resolves the group's atom
        names against the Bondi table
        (:data:`mdhelper_tpu.algorithm.topology.VDW_RADII`); a `dict`
        overrides/extends that table (keyed by UPPERCASE symbol); an
        array gives explicit per-atom radii.
    max_occluders : `int`, keyword-only, optional
        Static per-atom occlusion-candidate budget (the TPU kernel's
        fixed inner shape).  Defaults to 128 (liquid-density systems
        need ~50); runs that exceed it raise :class:`OccluderOverflow`
        and :meth:`run` auto-escalates twice (doubling, one recompile
        each) before giving up.
    reduced : `bool`, keyword-only, default :code:`False`
        Reduced (LJ) units: `probe_radius` and `radii` are
        dimensionless and ``results.units`` is omitted.
    parallel : `bool`, keyword-only, default :code:`False`
        Shard frame batches over the device mesh.

    Results
    -------
    ``results.areas``
        Per-atom SASA (Å²), shape ``(n_frames, N)``.
    ``results.total_areas``
        Group totals (Å²), shape ``(n_frames,)``.
    ``results.n_neighbors``
        Per-atom occlusion-candidate counts, ``(n_frames, N)``.
    ``results.times``
        Frame times (ps).

    Notes
    -----
    Periodicity follows the universe box: orthorhombic and triclinic
    cells use minimum-image occlusion; zero-length boxes are
    aperiodic (isolated molecules).  The algorithm assumes occluder
    reach (:math:`R_i + R_j`) below half the box — the standard
    minimum-image contract.
    """

    _checkpointable_stores = True

    def __init__(
        self,
        group,
        probe_radius=1.4,
        n_points: int = 960,
        *,
        radii=None,
        max_occluders: int = None,
        reduced: bool = False,
        parallel: bool = False,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        self.group = group
        self.universe = group.universe
        super().__init__(
            self.universe.trajectory, parallel, verbose, **kwargs
        )
        if not isinstance(probe_radius, Real):
            probe_radius = strip_unit(probe_radius, "angstrom")[0]
        if probe_radius < 0:
            raise ValueError("'probe_radius' must be non-negative.")
        if int(n_points) < 1:
            raise ValueError("'n_points' must be positive.")
        n = group.n_atoms
        if n < 1:
            raise ValueError("'group' must contain at least 1 atom.")
        if radii is None or isinstance(radii, dict):
            labels = group.names
            if all(str(lbl) == "X" for lbl in labels):
                # placeholder names (array-built universes): fall
                # back to type labels, the guess_bonds convention
                labels = group.types
            vdw = resolve_vdw_radii(labels, vdwradii=radii)
        else:
            vdw = np.asarray(radii, dtype=np.float64).reshape(-1)
            if len(vdw) != n:
                raise ValueError(
                    f"'radii' has {len(vdw)} entries for "
                    f"{n} atoms."
                )
        if (vdw <= 0).any():
            raise ValueError("van der Waals radii must be positive.")
        self._n_points = int(n_points)
        self._probe = float(probe_radius)
        self._inflated = vdw + self._probe
        if max_occluders is not None and int(max_occluders) < 1:
            raise ValueError("'max_occluders' must be positive.")
        self._max_occluders = (
            None if max_occluders is None else int(max_occluders)
        )
        self._reduced = reduced
        self._atom_indices = group.ix
        self._setup_periodic_box()
        self._sphere = sphere_points(self._n_points)

    def _budget(self, n: int) -> int:
        if self._max_occluders is not None:
            return min(self._max_occluders, max(1, n - 1))
        return min(128, max(1, n - 1))

    def _prepare(self) -> None:
        n = len(self._atom_indices)
        self.results.areas = np.empty((self.n_frames, n))
        self.results.total_areas = np.empty(self.n_frames)
        self.results.n_neighbors = np.empty(
            (self.n_frames, n), dtype=np.int64
        )
        self.results.times = self.frames * self._trajectory.dt
        if not self._reduced:
            self.results.units = {
                "results.areas": ureg.angstrom**2,
                "results.total_areas": ureg.angstrom**2,
                "results.times": ureg.picosecond,
            }
        self._store_offset = 0
        self._reach_warned = False
        self._carry = jnp.zeros(())
        self._host_pipeline = _order_host_pipeline(self, n)
        if self._host_pipeline:
            self._prepare_host()
            return
        k = self._budget(n)
        # per-FRAME work: the dense (n, n) candidate sweep plus the
        # (n, n_points, k) occlusion test (_cap_chunk_for_budget's
        # contract — see its other callers)
        _cap_chunk_for_budget(
            self,
            n,
            float(n) * (float(n) + self._n_points * float(k)),
        )
        self._make_update()

    # -- host pipeline (KD-tree; float64; the large-N path) ---------

    def _prepare_host(self) -> None:
        from ..algorithm.topology import minimize_vectors

        n = len(self._atom_indices)
        n_pts = self._n_points
        radii = self._inflated
        sphere = self._sphere
        cutoff = 2.0 * radii.max()
        triclinic = self._triclinic
        blk = _dense_block_size(n_pts, 64, rows_cap=1024)

        def host_update(batch) -> None:
            positions = self._host_chunk_positions(batch)
            dims_all = np.asarray(
                batch.host_dimensions[: batch.n_real],
                dtype=np.float64,
            )
            n_real = batch.n_real
            areas_b = np.zeros((n_real, n))
            cnt_b = np.zeros((n_real, n), dtype=np.int64)
            for f in range(n_real):
                pos = positions[f]
                dims = dims_all[f]
                if triclinic:
                    rows, cols = _triclinic_contact_pairs(
                        pos, dims, cutoff
                    )
                else:
                    rows, cols = _periodic_contact_pairs(
                        pos, dims[:3], cutoff
                    )
                vec = np.asarray(
                    minimize_vectors(pos[cols] - pos[rows], dims)
                ).reshape(-1, 3)
                d = np.sqrt((vec**2).sum(axis=-1))
                keep = d < radii[rows] + radii[cols]
                rows, cols, vec = rows[keep], cols[keep], vec[keep]
                # directed edges: candidate coordinates RELATIVE to
                # the central atom (minimum-imaged once, at the pair
                # level — the same trick as the device kernel)
                src = np.concatenate([rows, cols])
                dst = np.concatenate([cols, rows])
                rel = np.concatenate([vec, -vec])
                order = np.argsort(src, kind="stable")
                src, dst, rel = src[order], dst[order], rel[order]
                cnt = np.bincount(src, minlength=n)
                offsets = np.concatenate(
                    [[0], np.cumsum(cnt)]
                ).astype(np.int64)
                cnt_b[f] = cnt
                free = np.empty(n, dtype=np.int64)
                for lo in range(0, n, blk):
                    hi = min(lo + blk, n)
                    km = int(cnt[lo:hi].max()) if hi > lo else 0
                    if km == 0:
                        free[lo:hi] = n_pts
                        continue
                    take = offsets[lo:hi, None] + np.arange(km)
                    valid = np.arange(km) < cnt[lo:hi, None]
                    take = np.minimum(take, max(len(src) - 1, 0))
                    rel_j = rel[take]            # (b, km, 3)
                    r_j = radii[dst[take]]       # (b, km)
                    q = (
                        radii[lo:hi, None, None]
                        * sphere[None, :, :]
                    )                             # (b, M, 3)
                    dd = q[:, :, None, :] - rel_j[:, None, :, :]
                    occ = (
                        (dd**2).sum(axis=-1)
                        < (r_j * r_j)[:, None, :]
                    ) & valid[:, None, :]
                    free[lo:hi] = (~occ.any(axis=-1)).sum(axis=-1)
                areas_b[f] = (
                    (4.0 * np.pi / n_pts)
                    * free
                    * radii
                    * radii
                )
            self._store_chunk((areas_b, cnt_b), batch)

        self._host_update_fn = host_update

    # -- device path (dense candidate sweep + top-k compaction) -----

    def _make_update(self) -> None:
        n = len(self._atom_indices)
        n_pts = self._n_points
        k = self._budget(n)
        # the budget this compiled update truncates to; the overflow
        # check in _store_chunk must compare against THIS value, not
        # a recomputed one (an escalated retry must not accept a
        # stale chunk computed under the old, smaller budget)
        self._active_budget = k
        frame_boxes = self._frame_boxes
        bk = _dense_block_size(n_pts, k, rows_cap=1024)
        n_pad = _pad_blocks(n, bk)
        starts = jnp.arange(n_pad // bk, dtype=jnp.int32) * bk
        np_radii = np.pad(self._inflated, (0, n_pad - n))
        np_sphere = self._sphere
        point_weight = 4.0 * np.pi / n_pts

        def frame_fields(args):
            pos_f, box_f = args
            dtype = pos_f.dtype
            b = box_f.astype(dtype)
            pts = jnp.pad(pos_f, ((0, n_pad - n), (0, 0)))
            radii = jnp.asarray(np_radii, dtype=dtype)
            sphere = jnp.asarray(np_sphere, dtype=dtype)
            j_idx = jnp.arange(n_pad, dtype=jnp.int32)
            valid_j = j_idx < n

            def block_free(start):
                i_idx = start + jnp.arange(bk, dtype=jnp.int32)
                pts_i = jax.lax.dynamic_slice(
                    pts, (start, jnp.int32(0)), (bk, 3)
                )
                r_i = jax.lax.dynamic_slice(radii, (start,), (bk,))
                delta = pts[None, :, :] - pts_i[:, None, :]
                dvec = _min_image_vectors(
                    delta.reshape(-1, 3), b
                ).reshape(bk, n_pad, 3)
                d2 = (dvec * dvec).sum(axis=-1)
                touch = r_i[:, None] + radii[None, :]
                cand = (
                    (d2 < touch * touch)
                    & (i_idx[:, None] != j_idx[None, :])
                    & valid_j[None, :]
                )
                cnt = cand.sum(axis=1)
                # static-K compaction: keep the K NEAREST candidates
                # (the drop-order tie-break if the budget overflows —
                # detected via cnt and raised host-side)
                score = jnp.where(
                    cand, -d2, jnp.asarray(-jnp.inf, dtype)
                )
                _, idx = jax.lax.top_k(score, k)
                rel_j = jnp.take_along_axis(
                    dvec, idx[..., None], axis=1
                )                                  # (bk, K, 3)
                r_j = radii[idx]                   # (bk, K)
                is_cand = jnp.take_along_axis(cand, idx, axis=1)
                q = (
                    r_i[:, None, None] * sphere[None, :, :]
                )                                  # (bk, M, 3)
                dd = q[:, :, None, :] - rel_j[:, None, :, :]
                pd2 = (dd * dd).sum(axis=-1)       # (bk, M, K)
                occ = (
                    (pd2 < (r_j * r_j)[:, None, :])
                    & is_cand[:, None, :]
                ).any(axis=-1)
                free = (~occ).sum(axis=1).astype(dtype)
                return free, cnt

            free, cnt = jax.lax.map(block_free, starts)
            free = free.reshape(n_pad)[:n]
            cnt = cnt.reshape(n_pad)[:n]
            r = radii[:n]
            areas = (
                jnp.asarray(point_weight, dtype) * free * r * r
            )
            return areas, cnt

        def update(carry, positions, dimensions, mask):
            del mask
            box = frame_boxes(dimensions)
            out = jax.lax.map(frame_fields, (positions, box))
            return carry, out

        self._update = jax.jit(update)

    # -- shared host-side store -------------------------------------

    def _check_min_image_reach(self, batch) -> None:
        """Warn (once per run) when occluder reach :math:`R_i + R_j`
        exceeds half the box — the minimum-image contract documented
        in the class Notes; beyond it, second periodic images of
        in-reach occluders are silently dropped and areas are
        overestimated."""

        import warnings

        if self._reach_warned:
            return
        dims = np.asarray(
            batch.host_dimensions[: batch.n_real], dtype=np.float64
        )
        if dims.size == 0:
            return
        reach = 2.0 * float(self._inflated.max())
        if self._triclinic:
            from ..algorithm.topology import triclinic_matrices
            from ..ops.pallas_cell_histogram import (
                triclinic_perpendicular_widths,
            )

            matrices = np.asarray(triclinic_matrices(dims))
            min_width = min(
                float(
                    np.min(triclinic_perpendicular_widths(h))
                )
                for h in matrices
            )
        else:
            lengths = dims[:, :3]
            positive = lengths > 0
            if not positive.any():
                return  # aperiodic: no images to miss
            min_width = float(lengths[positive].min())
        if reach > 0.5 * min_width:
            self._reach_warned = True
            warnings.warn(
                "occluder reach (2 * max inflated radius = "
                f"{reach:.2f} A) exceeds half the smallest box "
                f"width ({0.5 * min_width:.2f} A); minimum-image "
                "occlusion drops second periodic images and SASA "
                "will be overestimated in dense small cells."
            )

    def _store_chunk(self, extras, batch) -> None:
        areas, counts = extras
        n_real = batch.n_real
        areas = np.asarray(areas, dtype=np.float64)[:n_real]
        counts = np.asarray(counts)[:n_real].astype(np.int64)
        self._check_min_image_reach(batch)
        if not self._host_pipeline:
            # compare against the budget the compiled update actually
            # truncated with — NOT a recomputation from the current
            # (possibly escalated) max_occluders
            k = self._active_budget
            overflow = int(counts.max(initial=0)) - k
            if overflow > 0:
                raise OccluderOverflow(
                    f"an atom had {k + overflow} occlusion "
                    f"candidates against a max_occluders budget of "
                    f"{k}; re-run with max_occluders >= "
                    f"{k + overflow}."
                )
        lo = self._store_offset
        hi = lo + n_real
        self.results.areas[lo:hi] = areas
        self.results.total_areas[lo:hi] = areas.sum(axis=1)
        self.results.n_neighbors[lo:hi] = counts
        self._store_offset += n_real

    def run(self, *args, **kwargs):
        """Run, auto-escalating the static occlusion-candidate
        budget on overflow: each retry doubles ``max_occluders``
        (one recompile) and re-streams; two escalations bound the
        recursion."""

        import warnings

        try:
            result = super().run(*args, **kwargs)
        except OccluderOverflow:
            # the failed run's async store queue may still hold the
            # overflowing chunk (the raise aborts _drain_stores before
            # its clear()); replaying it into the retry would store
            # budget-truncated areas and shift every later frame slot
            self._pending_stores.clear()
            retries = getattr(self, "_occluder_retries", 0)
            if retries >= 2:
                raise
            self._occluder_retries = retries + 1
            n = len(self._atom_indices)
            self._max_occluders = min(
                2 * self._budget(n), max(1, n - 1)
            )
            warnings.warn(
                "occlusion-candidate budget overflow (dense local "
                "packing); re-running with max_occluders="
                f"{self._max_occluders}."
            )
            return self.run(*args, **kwargs)
        self._occluder_retries = 0
        return result

    def _conclude(self) -> None:
        pass
