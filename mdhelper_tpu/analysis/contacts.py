r"""
Native contacts
===============

Fraction of native contacts :math:`q(t)` between two groups relative
to a reference frame — the standard folding/binding observable.  A
beyond-reference capability (bbye98/mdhelper has none; the public
analogue is ``MDAnalysis.analysis.contacts.Contacts``).

The reference pair list (all inter-group pairs within `radius` in
the reference structure) is built once on the host with a periodic
KD-tree; per frame the device work is a fixed-shape gather +
minimum-image distance over those :math:`P` pairs — O(P) fused VPU
work, so this analysis is effectively free when fused into a larger
stream (``analysis.multi.run_together``).  On tunnel-attached TPUs
the per-chunk update runs host-side (float64 numpy), like the other
O(N)-bookkeeping analyses.

Methods (MDAnalysis semantics):

- ``"hard"`` — :math:`q = \langle r_{ij} < \lambda\,r_{ij}^0
  \rangle` (contact kept while shorter than ``lambda_`` times its
  reference length; ``lambda_ = 1.8`` default).
- ``"radius"`` — :math:`q = \langle r_{ij} < \text{radius} \rangle`
  (fixed cutoff).
- ``"soft"`` — Best-Hummer smooth switching
  :math:`q = \bigl\langle 1 / (1 + e^{\beta (r_{ij} - \lambda
  r_{ij}^0)}) \bigr\rangle`.
"""

from numbers import Real

import jax
import jax.numpy as jnp
import numpy as np

from .. import ureg
from ..algorithm.unit import strip_unit
from ..ops.histogram import _min_image_distance
from .base import DynamicAnalysisBase

__all__ = ["NativeContacts"]


class NativeContacts(DynamicAnalysisBase):
    r"""Fraction of native contacts :math:`q(t)`.

    Parameters
    ----------
    group_a, group_b : `AtomGroup`
        The two groups whose inter-group contacts are tracked (e.g.
        the two halves of an interface, or a ligand and a binding
        site).  Identical-atom pairs are excluded automatically when
        the groups overlap.
    radius : `float` or unit-bearing quantity, default 4.5
        Contact-definition cutoff (Å) applied to the REFERENCE
        structure (and the per-frame cutoff for
        ``method="radius"``).
    reference : `int` or pair of array-like, optional
        Reference frame index (default 0) or explicit
        ``(positions_a, positions_b)`` coordinates.
    method : `str`, keyword-only, default ``"hard"``
        ``"hard"``, ``"soft"`` or ``"radius"`` (see module docs).
    lambda_ : `float`, keyword-only, default 1.8
        Tolerance factor on the reference distances (``"hard"`` /
        ``"soft"``).
    beta : `float`, keyword-only, default 5.0
        Softness (1/Å) of the ``"soft"`` switching function.
    reduced : `bool`, keyword-only, default False
        Reduced (LJ) units (omits ``results.units``).
    parallel : `bool`, keyword-only, default False
        Shard frame batches over the device mesh.

    Results
    -------
    ``results.q``
        Fraction of native contacts per frame, shape
        ``(n_frames,)``.
    ``results.n_native``
        Number of reference contacts :math:`P`.
    ``results.pairs``
        The reference pair list as group-local ``(P, 2)`` indices
        into `group_a` / `group_b`.
    ``results.r0``
        Reference contact distances (Å), shape ``(P,)``.
    ``results.times``
        Frame times (ps).
    """

    _checkpointable_stores = True

    def __init__(
        self,
        group_a,
        group_b=None,
        radius=4.5,
        *,
        reference=None,
        method: str = "hard",
        lambda_: float = 1.8,
        beta: float = 5.0,
        reduced: bool = False,
        parallel: bool = False,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        if group_b is None:
            group_b = group_a
        self.group_a = group_a
        self.group_b = group_b
        self.universe = group_a.universe
        super().__init__(
            self.universe.trajectory, parallel, verbose, **kwargs
        )
        if not isinstance(radius, Real):
            radius = strip_unit(radius, "angstrom")[0]
        if radius <= 0:
            raise ValueError("'radius' must be positive.")
        if method not in ("hard", "soft", "radius"):
            raise ValueError(
                "Invalid method. Valid values: 'hard', 'soft', "
                "'radius'."
            )
        if lambda_ <= 0 or beta <= 0:
            raise ValueError(
                "'lambda_' and 'beta' must be positive."
            )
        self._radius = float(radius)
        self._method = method
        self._lambda = float(lambda_)
        self._beta = float(beta)
        self._reduced = reduced
        self._reference_spec = reference

        involved = np.unique(
            np.concatenate([group_a.ix, group_b.ix])
        )
        self._atom_indices = involved
        col_of = {int(g): c for c, g in enumerate(involved)}
        self._a_col = np.fromiter(
            (col_of[int(i)] for i in group_a.ix),
            dtype=np.int64, count=group_a.n_atoms,
        )
        self._b_col = np.fromiter(
            (col_of[int(i)] for i in group_b.ix),
            dtype=np.int64, count=group_b.n_atoms,
        )
        self._setup_periodic_box()
        self._require_box("Native contacts")

    def _resolve_reference(self) -> None:
        from ..algorithm.topology import minimize_vectors
        from .cluster import (
            _periodic_contact_pairs,
            _triclinic_contact_pairs,
        )

        ref = self._reference_spec
        if ref is None:
            ref = 0
        if isinstance(ref, (int, np.integer)):
            positions, dims = self._trajectory.read_frames(
                [int(ref)]
            )
            ref_a = positions[0][self.group_a.ix]
            ref_b = positions[0][self.group_b.ix]
            ref_dims = dims[0]
        else:
            ref_a, ref_b = (
                np.asarray(r, dtype=np.float64) for r in ref
            )
            ref_dims = np.asarray(
                self.universe.dimensions, dtype=np.float64
            )
        if ref_a.shape != (self.group_a.n_atoms, 3) or (
            ref_b.shape != (self.group_b.n_atoms, 3)
        ):
            raise ValueError(
                "'reference' coordinates must match the group "
                "sizes."
            )
        # inter-group reference contacts via one KD-tree over the
        # concatenated points (pairs filtered to (a, b) membership)
        n_a = len(ref_a)
        pts = np.concatenate([ref_a, ref_b])
        if self._triclinic:
            rows, cols = _triclinic_contact_pairs(
                pts, ref_dims, self._radius
            )
        else:
            rows, cols = _periodic_contact_pairs(
                pts, ref_dims[:3], self._radius
            )
        in_a = rows < n_a
        in_b = cols >= n_a
        # rows < cols always; keep (a, b) cross pairs from either
        # orientation
        keep_ab = in_a & in_b
        a_idx = rows[keep_ab]
        b_idx = cols[keep_ab] - n_a
        # same-atom pairs (overlapping groups) never count
        same = (
            self.group_a.ix[a_idx] == self.group_b.ix[b_idx]
        )
        a_idx, b_idx = a_idx[~same], b_idx[~same]
        if len(a_idx) == 0:
            raise ValueError(
                "No native contacts within 'radius' in the "
                "reference structure."
            )
        vec = np.asarray(
            minimize_vectors(
                ref_b[b_idx] - ref_a[a_idx], ref_dims
            )
        )
        self._pair_a = a_idx
        self._pair_b = b_idx
        self._r0 = np.linalg.norm(vec, axis=1)

    def _prepare(self) -> None:
        self._resolve_reference()
        self.results.q = np.empty(self.n_frames)
        self.results.n_native = len(self._r0)
        self.results.pairs = np.stack(
            [self._pair_a, self._pair_b], axis=1
        )
        self.results.r0 = self._r0.copy()
        self.results.times = self.frames * self._trajectory.dt
        if not self._reduced:
            self.results.units = {
                "results.times": ureg.picosecond,
                "results.r0": ureg.angstrom,
            }
        self._store_offset = 0
        self._carry = jnp.zeros(())
        self._host_pipeline = (
            not getattr(self, "_parallel", False)
            and self._resolve_host_pipeline()
        )
        if self._host_pipeline:
            self._prepare_host()
            return
        self._make_update()

    def _pair_q(self, r, xp):
        """Per-pair contact values from distances (numpy or jnp)."""

        if self._method == "radius":
            return (r < self._radius).astype(r.dtype)
        thresh = self._lambda * (
            xp.asarray(self._r0, dtype=r.dtype)
            if xp is jnp
            else self._r0
        )
        if self._method == "hard":
            return (r < thresh).astype(r.dtype)
        return 1.0 / (
            1.0 + xp.exp(self._beta * (r - thresh))
        )

    def _make_update(self) -> None:
        a_cols = jnp.asarray(self._a_col[self._pair_a])
        b_cols = jnp.asarray(self._b_col[self._pair_b])
        frame_boxes = self._frame_boxes

        def frame_q(args):
            pos_f, box_f = args
            b = box_f.astype(pos_f.dtype)
            r = _min_image_distance(
                pos_f[b_cols] - pos_f[a_cols], b
            )
            return self._pair_q(r, jnp).mean()

        def update(carry, positions, dimensions, mask):
            del mask
            box = frame_boxes(dimensions)
            q = jax.lax.map(frame_q, (positions, box))
            return carry, q

        self._update = jax.jit(update)

    def _prepare_host(self) -> None:
        from ..algorithm.topology import minimize_vectors

        a_cols = self._a_col[self._pair_a]
        b_cols = self._b_col[self._pair_b]

        def host_update(batch) -> None:
            positions = self._host_chunk_positions(batch)
            dims_all = np.asarray(
                batch.host_dimensions[: batch.n_real],
                dtype=np.float64,
            )
            n_real = batch.n_real
            q = np.empty(n_real)
            for f in range(n_real):
                pos = positions[f]
                vec = np.asarray(
                    minimize_vectors(
                        pos[b_cols] - pos[a_cols], dims_all[f]
                    )
                )
                r = np.linalg.norm(vec, axis=1)
                q[f] = self._pair_q(r, np).mean()
            self._store_chunk(q, batch)

        self._host_update_fn = host_update

    def _store_chunk(self, extras, batch) -> None:
        q = np.asarray(extras, dtype=np.float64)[: batch.n_real]
        lo = self._store_offset
        self.results.q[lo:lo + batch.n_real] = q
        self._store_offset += batch.n_real

    def _conclude(self) -> None:
        pass
