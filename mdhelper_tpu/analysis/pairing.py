r"""
Ion pairing
===========

Contact ion-pair statistics between two groups — per-frame pair
counts, per-ion coordination numbers, free-ion fractions, and
(optionally) the intermittent pair-lifetime correlation :math:`c(t)`
and continuous survival :math:`S(t)` via the shared Luzar–Chandler
existence engine (:func:`mdhelper_tpu.analysis.base.
existence_lifetimes`).  Beyond-reference capability (the reference
has no pairing module; the workflow is standard in electrolyte /
polyelectrolyte studies, where contact-pair populations and
lifetimes rationalize conductivity deviations from ideality —
e.g. the Onsager/Nernst–Einstein comparison in
``analysis/transport.py``).

Criterion: two entities (atoms, or residue COMs for molecular ions)
form a contact pair when their minimum-image distance is at most
`cutoff` — pick the first minimum of the corresponding cation–anion
RDF.

TPU formulation: entity positions are a column gather (plus a
segment-sum COM reduction for ``groupings="residues"``); each frame
is one dense ``(N_1, N_2)`` minimum-image sweep (orthorhombic or
triclinic), with counts, per-row/column partner sums, and zero-
partner ("free ion") counts as mask reductions — no scatters, fully
fusable.  The coordination carry is order-independent, so
``parallel=True`` shards frames over the mesh.  On tunnel-attached
TPUs a KD-tree host pipeline computes the same quantities in
float64.
"""

from numbers import Real
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import ureg
from ..algorithm.unit import strip_unit
from ..ops.histogram import _min_image_vectors
from .base import DynamicAnalysisBase, existence_lifetimes
from .steinhardt import _cap_chunk_for_budget
from .structure import _com_positions, _group_segment_ids

__all__ = ["IonPairAnalysis"]


class IonPairAnalysis(DynamicAnalysisBase):
    r"""Contact ion-pair statistics between two groups.

    Parameters
    ----------
    group1, group2 : `AtomGroup`
        The two ion groups (e.g. cations and anions).  Passing
        overlapping groups (or the same group twice, for like-ion
        pairing) is allowed — identical entities are excluded from
        pairing with themselves.
    cutoff : `float` or unit-bearing quantity
        Contact distance cutoff (Å); conventionally the first
        minimum of the corresponding RDF.
    groupings : `str` or 2-tuple, default :code:`"atoms"`
        ``"atoms"`` or ``"residues"`` per group (residue COMs for
        molecular ions).
    pair_counts : `bool`, keyword-only, default :code:`False`
        Accumulate the full ``(N_1, N_2)`` per-pair contact-frame
        count matrix.
    lifetimes : `bool`, keyword-only, default :code:`False`
        Store the per-frame pair-existence matrix and compute the
        intermittent pair correlation :math:`c(t) = \langle h(0)h(t)
        \rangle / \langle h \rangle` and the continuous survival
        :math:`S(t)` (run-length exact).  Memory: ``n_frames x N_1 x
        N_2`` bools on the host.
    reduced : `bool`, keyword-only, default :code:`False`
        Reduced (LJ) units: `cutoff` is dimensionless and
        ``results.units`` is omitted.
    parallel : `bool`, keyword-only, default :code:`False`
        Shard frame batches over the device mesh.

    Results
    -------
    ``results.counts``
        Per-frame contact-pair count, shape ``(n_frames,)``.  When
        `group1` and `group2` resolve to the *same* entity set
        (like-ion pairing), each unordered pair is counted once;
        for partially overlapping selections pairs are ordered
        (``(i, j)`` and ``(j, i)`` both count).
    ``results.mean_count``
        Time-averaged pair count.
    ``results.coordination``
        Two arrays ``[c_1, c_2]``: time-averaged counter-ion
        coordination number per group-1 / group-2 entity, shapes
        ``(N_1,)`` and ``(N_2,)``.
    ``results.free_fractions``
        Per-frame fraction of entities with *zero* counter-ion
        contacts (the "free ion" population), shape
        ``(n_frames, 2)`` — column 0 for `group1`, 1 for `group2`.
    ``results.pair_counts``
        (only with ``pair_counts=True``) per-pair contact-frame
        counts, shape ``(N_1, N_2)`` (the full symmetric matrix in
        the like-ion case).
    ``results.lifetime``, ``results.survival``,
    ``results.lifetime_times``
        (only with ``lifetimes=True``) intermittent pair correlation
        :math:`c(t)`, continuous survival :math:`S(t)` (both
        normalized to 1 at :math:`t = 0`) and the lag times (ps).
    ``results.times``
        Frame times (ps).
    """

    _checkpointable_stores = True

    def _checkpoint_attrs(self) -> tuple:
        return ("_existence",) if self._lifetimes else ()

    def __init__(
        self,
        group1,
        group2,
        cutoff,
        groupings: Union[str, tuple] = "atoms",
        *,
        pair_counts: bool = False,
        lifetimes: bool = False,
        reduced: bool = False,
        parallel: bool = False,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        self._groups = [group1, group2]
        self.universe = group1.universe
        super().__init__(
            self.universe.trajectory, parallel, verbose, **kwargs
        )

        if not isinstance(cutoff, Real):
            cutoff = strip_unit(cutoff, "angstrom")[0]
        if cutoff <= 0:
            raise ValueError("'cutoff' must be positive.")
        self._cutoff = float(cutoff)

        valid = {"atoms", "residues"}
        if isinstance(groupings, str):
            groupings = (groupings, groupings)
        if len(groupings) != 2 or any(
            g not in valid for g in groupings
        ):
            raise ValueError(
                "Invalid groupings; valid values: "
                f"{', '.join(sorted(valid))}."
            )
        self._groupings = tuple(groupings)

        # Stream both groups' columns back-to-back (duplicates are
        # fine — the reader gathers columns by index).
        self._atom_indices = np.concatenate(
            [g.ix for g in self._groups]
        )
        self._sels, self._segs, self._n_entities = [], [], []
        entity_ids = []
        offset = 0
        for g, gr in zip(self._groups, self._groupings):
            if g.n_atoms == 0:
                raise ValueError("Groups must be non-empty.")
            self._sels.append(offset + np.arange(g.n_atoms))
            seg, n = _group_segment_ids(g, gr)
            if gr == "atoms":
                ids = np.asarray(g.ix, dtype=np.int64)
            else:
                # one absolute resindex per entity, in np.unique's
                # SORTED order — the same ordering
                # _group_segment_ids uses for its relabeled segment
                # ids, so row/column e of the contact matrix is the
                # entity with the e-th smallest resindex
                ids = np.unique(
                    np.asarray(g.resindices, dtype=np.int64)
                )
            self._segs.append(seg)
            self._n_entities.append(int(n))
            entity_ids.append(ids)
            offset += g.n_atoms
        # self-pair exclusion only when the entity id spaces overlap
        # (like-ion pairing / overlapping selections); atom ids and
        # resindices never collide across grouping kinds within one
        # universe comparison because we only compare like with like
        same_kind = self._groupings[0] == self._groupings[1]
        if same_kind and np.intersect1d(
            entity_ids[0], entity_ids[1]
        ).size:
            self._not_self = (
                entity_ids[0][:, None] != entity_ids[1][None, :]
            )
        else:
            self._not_self = None
        # identical entity sets (like-ion pairing): the contact
        # matrix is symmetric, so counts / mean_count / lifetimes
        # report each unordered pair ONCE (the matrix sum is halved);
        # pair_counts stays the full symmetric matrix
        self._symmetric = same_kind and np.array_equal(
            entity_ids[0], entity_ids[1]
        )

        self._pair_counts = bool(pair_counts)
        self._lifetimes = bool(lifetimes)
        self._reduced = reduced
        self._setup_periodic_box()

    def _entity_extractor(self, which: int):
        """Traceable (B, n_cols, 3) -> (B, N_i, 3) entity-position
        extractor (column gather, or segment-sum COM reduction for
        residue grouping)."""

        sel = jnp.asarray(self._sels[which])
        seg = self._segs[which]
        if seg is None:
            return lambda positions: positions[:, sel]
        seg_j = jnp.asarray(seg)
        masses = jnp.asarray(self._groups[which].masses)
        n = self._n_entities[which]

        def extract(positions):
            return _com_positions(positions[:, sel], masses, seg_j, n)

        return extract

    def _host_entity_extractor(self, which: int):
        """Numpy mirror of :meth:`_entity_extractor` (float64)."""

        sel = self._sels[which]
        seg = self._segs[which]
        if seg is None:
            return lambda positions: positions[:, sel]
        masses = np.asarray(
            self._groups[which].masses, dtype=np.float64
        )
        n = self._n_entities[which]
        mass_sums = np.bincount(seg, weights=masses, minlength=n)

        def extract(positions):
            pos = positions[:, sel]
            b = len(pos)
            com = np.zeros((b, n, 3))
            np.add.at(
                com,
                (np.arange(b)[:, None], seg[None, :]),
                masses[None, :, None] * pos,
            )
            return com / mass_sums[None, :, None]

        return extract

    def _prepare(self) -> None:
        n1, n2 = self._n_entities
        self.results.counts = np.empty(self.n_frames, dtype=int)
        self.results.free_fractions = np.empty((self.n_frames, 2))
        self.results.times = self.frames * self._trajectory.dt
        if not self._reduced:
            self.results.units = {"results.times": ureg.picosecond}
        self._store_offset = 0
        if self._lifetimes:
            self._existence = np.zeros(
                (self.n_frames, n1, n2), dtype=bool
            )
        self._host_pipeline = (
            not getattr(self, "_parallel", False)
            and self._resolve_host_pipeline()
        )
        if self._host_pipeline:
            self._prepare_host()
            self._carry = np.zeros(())
            return
        self._carry = {
            "partners1": jnp.zeros(n1, dtype=jnp.float64),
            "partners2": jnp.zeros(n2, dtype=jnp.float64),
        }
        if self._pair_counts:
            self._carry["pair_counts"] = jnp.zeros(
                (n1, n2), dtype=jnp.float64
            )
        _cap_chunk_for_budget(
            self,
            len(self._atom_indices),
            10.0 * float(n1) * float(n2),
        )
        self._make_update()

    def _make_update(self) -> None:
        extract1 = self._entity_extractor(0)
        extract2 = self._entity_extractor(1)
        cutoff = self._cutoff
        frame_boxes = self._frame_boxes
        not_self = (
            None
            if self._not_self is None
            else jnp.asarray(self._not_self)
        )
        track_pairs = self._pair_counts
        lifetimes = self._lifetimes
        need_matrix = track_pairs or lifetimes
        n1, n2 = self._n_entities

        def pairs_frame(args):
            p1, p2, box_f = args
            b = box_f.astype(p1.dtype)
            cut2 = jnp.asarray(cutoff * cutoff, dtype=p1.dtype)
            v = _min_image_vectors(
                (p2[None, :, :] - p1[:, None, :]).reshape(-1, 3), b
            ).reshape(n1, n2, 3)
            within = (v * v).sum(axis=-1) <= cut2
            if not_self is not None:
                within = within & not_self
            partners1 = within.sum(axis=1, dtype=jnp.int32)
            partners2 = within.sum(axis=0, dtype=jnp.int32)
            count = partners1.sum()
            free1 = (partners1 == 0).sum(dtype=jnp.int32)
            free2 = (partners2 == 0).sum(dtype=jnp.int32)
            if need_matrix:
                return (
                    count, free1, free2, partners1, partners2,
                    within,
                )
            return (
                count, free1, free2, partners1, partners2, count
            )

        def update(carry, positions, dimensions, mask):
            box = frame_boxes(dimensions)
            e1 = extract1(positions)
            e2 = extract2(positions)
            counts, free1, free2, partners1, partners2, within = (
                jax.lax.map(pairs_frame, (e1, e2, box))
            )
            valid = mask > 0
            w = valid[:, None]
            new = {
                "partners1": carry["partners1"]
                + jnp.where(w, partners1, 0).sum(
                    axis=0, dtype=jnp.int32
                ).astype(jnp.float64),
                "partners2": carry["partners2"]
                + jnp.where(w, partners2, 0).sum(
                    axis=0, dtype=jnp.int32
                ).astype(jnp.float64),
            }
            if track_pairs:
                new["pair_counts"] = carry["pair_counts"] + (
                    within & valid[:, None, None]
                ).sum(axis=0, dtype=jnp.int32).astype(jnp.float64)
            if lifetimes:
                return new, (counts, free1, free2, within)
            return new, (counts, free1, free2)

        self._update = jax.jit(update)

    # -- host pipeline (KD-tree; float64) ---------------------------

    def _prepare_host(self) -> None:
        from scipy.spatial import cKDTree

        from ..algorithm.topology import minimize_vectors
        from .cluster import _wrap_periodic_axes

        extract1 = self._host_entity_extractor(0)
        extract2 = self._host_entity_extractor(1)
        n1, n2 = self._n_entities
        cutoff = self._cutoff
        not_self = self._not_self
        symmetric = self._symmetric
        triclinic = self._triclinic
        track_pairs = self._pair_counts
        lifetimes = self._lifetimes
        self._host_partners = [np.zeros(n1), np.zeros(n2)]
        if track_pairs:
            self._host_pair_counts = np.zeros((n1, n2))

        def host_update(batch) -> None:
            positions = self._host_chunk_positions(batch)
            dims_all = np.asarray(
                batch.host_dimensions[: batch.n_real],
                dtype=np.float64,
            )
            n_real = batch.n_real
            e1 = extract1(positions)[:n_real]
            e2 = extract2(positions)[:n_real]
            counts = np.empty(n_real, dtype=np.int64)
            frees = np.empty((n_real, 2))
            lo = self._store_offset
            for f in range(n_real):
                p1, p2 = e1[f], e2[f]
                dims = dims_all[f]
                box = dims[:3]
                if not triclinic and (box > 0).any():
                    w2, boxsize = _wrap_periodic_axes(p2, box)
                    w1, _ = _wrap_periodic_axes(p1, box)
                    tree = (
                        cKDTree(w2)
                        if boxsize is None
                        else cKDTree(w2, boxsize=boxsize)
                    )
                    cand = tree.query_ball_point(w1, cutoff)
                    rows = np.repeat(
                        np.arange(n1), [len(c) for c in cand]
                    )
                    cols = (
                        np.concatenate(
                            [np.asarray(c, dtype=np.int64)
                             for c in cand if c]
                        )
                        if rows.size
                        else np.empty(0, dtype=np.int64)
                    )
                else:
                    block = 1024
                    r_parts, c_parts = [], []
                    for blo in range(0, n1, block):
                        bhi = min(blo + block, n1)
                        v = np.asarray(
                            minimize_vectors(
                                (
                                    p2[None, :, :]
                                    - p1[blo:bhi, None, :]
                                ).reshape(-1, 3),
                                dims,
                            )
                        ).reshape(bhi - blo, n2, 3)
                        within = (v**2).sum(-1) <= cutoff**2
                        r, c = np.nonzero(within)
                        r_parts.append(r + blo)
                        c_parts.append(c)
                    rows = (
                        np.concatenate(r_parts)
                        if r_parts
                        else np.empty(0, dtype=np.int64)
                    )
                    cols = (
                        np.concatenate(c_parts)
                        if c_parts
                        else np.empty(0, dtype=np.int64)
                    )
                if rows.size and not_self is not None:
                    keep = not_self[rows, cols]
                    rows, cols = rows[keep], cols[keep]
                counts[f] = (
                    rows.size // 2 if symmetric else rows.size
                )
                pc1 = np.bincount(rows, minlength=n1)
                pc2 = np.bincount(cols, minlength=n2)
                self._host_partners[0] += pc1
                self._host_partners[1] += pc2
                frees[f, 0] = (pc1 == 0).sum() / n1
                frees[f, 1] = (pc2 == 0).sum() / n2
                if rows.size:
                    if track_pairs:
                        np.add.at(
                            self._host_pair_counts, (rows, cols), 1
                        )
                    if lifetimes:
                        self._existence[lo + f, rows, cols] = True
            self.results.counts[lo:lo + n_real] = counts
            self.results.free_fractions[lo:lo + n_real] = frees
            self._store_offset += n_real

        self._host_update_fn = host_update

    def _store_chunk(self, extras, batch) -> None:
        if self._lifetimes:
            counts, free1, free2, within = extras
        else:
            counts, free1, free2 = extras
            within = None
        n_real = batch.n_real
        n1, n2 = self._n_entities
        lo = self._store_offset
        chunk_counts = np.asarray(counts)[:n_real]
        if self._symmetric:
            # symmetric matrix, diagonal excluded: even sums
            chunk_counts = chunk_counts // 2
        self.results.counts[lo:lo + n_real] = chunk_counts
        self.results.free_fractions[lo:lo + n_real, 0] = (
            np.asarray(free1)[:n_real] / n1
        )
        self.results.free_fractions[lo:lo + n_real, 1] = (
            np.asarray(free2)[:n_real] / n2
        )
        if within is not None:
            self._existence[lo:lo + n_real] = np.asarray(within)[
                :n_real
            ]
        self._store_offset += n_real

    def _conclude(self) -> None:
        self.results.mean_count = float(self.results.counts.mean())
        partners = (
            self._host_partners
            if self._host_pipeline
            else [
                np.asarray(self._carry["partners1"]),
                np.asarray(self._carry["partners2"]),
            ]
        )
        self.results.coordination = [
            p / self.n_frames for p in partners
        ]
        if self._pair_counts:
            pair = (
                self._host_pair_counts
                if self._host_pipeline
                else np.asarray(self._carry["pair_counts"])
            )
            self.results.pair_counts = pair.astype(np.int64)
        if self._lifetimes:
            T = self.n_frames
            h = self._existence.reshape(T, -1)
            lag_dt = self._uniform_lag_dt("Ion-pair lifetimes")
            self.results.lifetime_times = np.arange(T) * lag_dt
            self.results.lifetime, self.results.survival = (
                existence_lifetimes(h)
            )
            if not self._reduced:
                self.results.units[
                    "results.lifetime_times"
                ] = ureg.picosecond
