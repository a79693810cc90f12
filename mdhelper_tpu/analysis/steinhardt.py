r"""
Bond-orientational order
========================

Steinhardt bond-orientational order parameters (:math:`q_l`,
:math:`w_l`, and the Lechner-Dellago neighbor-averaged
:math:`\bar{q}_l`, :math:`\bar{w}_l`) and the Errington-Debenedetti
tetrahedral order parameter.  Beyond-reference capabilities
(bbye98/mdhelper has no local-order analysis; the public analogues
are pyscal and freud).

TPU-first design: neighbor detection is a dense tiled minimum-image
sweep (i-blocks x all-j, ``lax.map`` over blocks so the
``(block, N, 2l+1)`` harmonic intermediates stay bounded), and the
real spherical harmonics are trig-free Cartesian polynomials
(:mod:`mdhelper_tpu.algorithm.spherical`) — pure fused VPU
elementwise work plus MXU-shaped reductions, no complex arrays, no
scatter.  On tunnel-attached TPUs (or for :math:`N \gtrsim 10^4`,
where dense :math:`O(N^2)` loses to :math:`O(N \log N)`) a KD-tree
host pipeline computes the same quantities in float64.

Rotational invariants, neighbor averaging, and the Wigner-3j
third-order couplings follow the standard definitions (Steinhardt,
Nelson & Ronchetti 1983; Lechner & Dellago 2008); see
:func:`mdhelper_tpu.algorithm.spherical.invariant_wl`.
"""

from numbers import Real

import jax
import jax.numpy as jnp
import numpy as np

from .. import ureg
from ..algorithm.spherical import (
    invariant_ql,
    invariant_wl,
    real_sph_harm,
    sph_harm_columns,
)
from ..algorithm.unit import strip_unit
from ..ops.histogram import _min_image_vectors
from .base import DynamicAnalysisBase
from .cluster import (
    _periodic_contact_pairs,
    _triclinic_contact_pairs,
)

__all__ = ["SteinhardtOrderParameter", "TetrahedralOrderParameter"]


def _dense_block_size(
    n_pad: int, n_cols: int, rows_cap: int = None
) -> int:
    """i-block size keeping the (block, n_pad, n_cols) dense
    intermediate under ~64 MB of f32.  ``rows_cap`` overrides the
    default row clamp (``n_pad``) when the blocked axis differs from
    the intermediate's second dimension (the SASA kernels block over
    atoms but size by (n_points, max_occluders))."""
    budget = 16_000_000.0
    raw = budget / max(1.0, float(n_pad) * n_cols)
    bk = 1 << max(3, int(np.floor(np.log2(max(8.0, raw)))))
    return int(min(bk, 1024, n_pad if rows_cap is None else rows_cap))


def _pad_blocks(n: int, bk: int) -> int:
    return int(-(-n // bk) * bk)


def _order_host_pipeline(self, n: int) -> bool:
    """Host-pipeline routing for the order-parameter classes: unlike
    the O(N) bookkeeping analyses, their per-frame device work is a
    dense O(N^2) sweep — big enough that the device wins even through
    the tunnel (same-window A/B at 9k atoms: device 5.4/5.5 vs host
    2.0/3.1 frames/s, BASELINE.md round 3).  The KD-tree host path
    remains the large-N O(N log N) route and the explicit-knob
    escape (``MDTPU_HOST_PIPELINE=1``)."""

    import os

    if getattr(self, "_parallel", False):
        return False
    knob = os.environ.get("MDTPU_HOST_PIPELINE")
    if knob not in (None, ""):
        return knob != "0"
    return self._resolve_host_pipeline() and n > 20_000


def _cap_chunk_for_budget(self, n: int, work_per_frame: float) -> None:
    """Cap the chunk so one device execution stays ~20 s: the dense
    sweep runs ~1e10 pair-harmonic ops/s on the chip, and tunnel
    runtimes kill executions past ~60-90 s (BASELINE.md round-3
    watchdog bisection).  Shared by the order-parameter classes."""

    est = work_per_frame / 1.0e10
    max_frames = max(1, int(20.0 / max(est, 1e-9)))
    frame_bytes = n * 3 * np.dtype(self._stream_dtype()).itemsize
    self._chunk_bytes = min(
        self._chunk_bytes, max_frames * frame_bytes
    )


class SteinhardtOrderParameter(DynamicAnalysisBase):
    r"""Per-particle Steinhardt bond-orientational order parameters.

    For each particle :math:`i` with neighbors :math:`j` within
    `cutoff`,

    .. math::

       q_{lm}(i) = \frac{1}{N_b(i)} \sum_{j \in \mathcal{N}(i)}
       Y_{lm}(\hat{r}_{ij}), \qquad
       q_l(i) = \sqrt{\frac{4\pi}{2l+1} \sum_m |q_{lm}(i)|^2},

    with optional third-order invariants :math:`\hat{w}_l(i)`
    (``wl=True``) and the Lechner-Dellago neighborhood averages
    :math:`\bar{q}_l(i)`, :math:`\bar{w}_l(i)` (``averaged=True``),
    which average :math:`q_{lm}` over :math:`\mathcal{N}(i) \cup
    \{i\}` before forming the invariants.

    Parameters
    ----------
    group : `AtomGroup`
        Particles to analyze.
    cutoff : `float` or unit-bearing quantity
        Neighbor-shell cutoff (Å).
    degrees : sequence of `int`, default ``(4, 6)``
        Harmonic degrees :math:`l`.
    averaged : `bool`, keyword-only, default False
        Also compute :math:`\bar{q}_l` (and :math:`\bar{w}_l` with
        ``wl=True``).
    wl : `bool`, keyword-only, default False
        Also compute the normalized third-order invariants
        :math:`\hat{w}_l`.
    reduced : `bool`, keyword-only, default False
        Reduced (LJ) units (omits ``results.units``).
    parallel : `bool`, keyword-only, default False
        Shard frame batches over the device mesh.

    Results
    -------
    ``results.ql``
        Per-particle :math:`q_l`, shape ``(n_frames, n_degrees,
        N)``.  Particles with no neighbors get 0.
    ``results.ql_mean``
        Particle-averaged :math:`\langle q_l \rangle`, shape
        ``(n_frames, n_degrees)``.
    ``results.Ql``
        Global order parameter from the particle-averaged
        :math:`q_{lm}` (phase-coherent; decays as
        :math:`N^{-1/2}` in a liquid), shape ``(n_frames,
        n_degrees)``.
    ``results.wl``, ``results.ql_avg``, ``results.wl_avg``
        (with the corresponding flags) :math:`\hat{w}_l`,
        :math:`\bar{q}_l`, :math:`\hat{\bar{w}}_l`, each
        ``(n_frames, n_degrees, N)``.
    ``results.n_neighbors``
        Per-particle neighbor counts, ``(n_frames, N)``.
    ``results.times``
        Frame times (ps).
    """

    _checkpointable_stores = True

    def __init__(
        self,
        group,
        cutoff,
        degrees=(4, 6),
        *,
        averaged: bool = False,
        wl: bool = False,
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
        if not isinstance(cutoff, Real):
            cutoff = strip_unit(cutoff, "angstrom")[0]
        if cutoff <= 0:
            raise ValueError("'cutoff' must be positive.")
        degrees = tuple(int(l) for l in degrees)
        if not degrees or any(l < 1 for l in degrees):
            raise ValueError(
                "'degrees' must be a non-empty sequence of "
                "positive integers."
            )
        if group.n_atoms < 2:
            raise ValueError("'group' must contain at least 2 atoms.")
        self._cutoff = float(cutoff)
        self._degrees = degrees
        self._n_cols = sph_harm_columns(degrees)
        self._averaged = bool(averaged)
        self._wl = bool(wl)
        self._reduced = reduced
        self._atom_indices = group.ix
        self._setup_periodic_box()
        self._require_box("Bond-orientational order")

    def _prepare(self) -> None:
        n = len(self._atom_indices)
        n_l = len(self._degrees)
        self.results.ql = np.empty((self.n_frames, n_l, n))
        self.results.ql_mean = np.empty((self.n_frames, n_l))
        self.results.Ql = np.empty((self.n_frames, n_l))
        self.results.n_neighbors = np.empty(
            (self.n_frames, n), dtype=np.int64
        )
        if self._wl:
            self.results.wl = np.empty((self.n_frames, n_l, n))
        if self._averaged:
            self.results.ql_avg = np.empty((self.n_frames, n_l, n))
            if self._wl:
                self.results.wl_avg = np.empty(
                    (self.n_frames, n_l, n)
                )
        self.results.times = self.frames * self._trajectory.dt
        if not self._reduced:
            self.results.units = {"results.times": ureg.picosecond}
        self._store_offset = 0
        self._carry = jnp.zeros(())
        self._host_pipeline = _order_host_pipeline(self, n)
        if self._host_pipeline:
            self._prepare_host()
            return
        _cap_chunk_for_budget(
            self,
            n,
            n * n * self._n_cols * (1.5 if self._averaged else 1.0),
        )
        self._make_update()

    # -- host pipeline (KD-tree; float64; the large-N path) --------

    def _prepare_host(self) -> None:
        from ..algorithm.topology import minimize_vectors

        n = len(self._atom_indices)
        degrees = self._degrees
        n_cols = self._n_cols
        cutoff = self._cutoff
        triclinic = self._triclinic
        averaged = self._averaged
        # reversed-bond parity: Y_lm(-u) = (-1)^l Y_lm(u)
        parity = np.concatenate(
            [
                np.full(2 * l + 1, (-1.0) ** l)
                for l in degrees
            ]
        )

        def host_update(batch) -> None:
            positions = self._host_chunk_positions(batch)
            dims_all = np.asarray(
                batch.host_dimensions[: batch.n_real],
                dtype=np.float64,
            )
            n_real = batch.n_real
            qlm_b = np.zeros((n_real, n, n_cols))
            cnt_b = np.zeros((n_real, n), dtype=np.int64)
            qbar_b = (
                np.zeros((n_real, n, n_cols))
                if averaged
                else np.zeros((n_real,))
            )
            for f in range(n_real):
                pos = positions[f]
                dims = dims_all[f]
                if triclinic:
                    # row-blocked sweep: O(block x N) memory
                    rows, cols = _triclinic_contact_pairs(
                        pos, dims, cutoff
                    )
                else:
                    rows, cols = _periodic_contact_pairs(
                        pos, dims[:3], cutoff
                    )
                vec = np.asarray(
                    minimize_vectors(pos[cols] - pos[rows], dims)
                )
                d = np.linalg.norm(vec, axis=-1)
                u = vec / np.where(d > 0, d, 1.0)[:, None]
                y = real_sph_harm(degrees, u)
                # per-column bincount: ~2x np.add.at for this shape
                sums = np.stack(
                    [
                        np.bincount(
                            rows, weights=y[:, c], minlength=n
                        )
                        + parity[c]
                        * np.bincount(
                            cols, weights=y[:, c], minlength=n
                        )
                        for c in range(n_cols)
                    ],
                    axis=1,
                )
                cnt = np.bincount(rows, minlength=n) + np.bincount(
                    cols, minlength=n
                )
                qlm = sums / np.maximum(cnt, 1)[:, None]
                qlm_b[f] = qlm
                cnt_b[f] = cnt
                if averaged:
                    nbr = np.stack(
                        [
                            np.bincount(
                                rows, weights=qlm[cols, c],
                                minlength=n,
                            )
                            + np.bincount(
                                cols, weights=qlm[rows, c],
                                minlength=n,
                            )
                            for c in range(n_cols)
                        ],
                        axis=1,
                    )
                    qbar_b[f] = (qlm + nbr) / (cnt + 1)[:, None]
            self._store_chunk((qlm_b, cnt_b, qbar_b), batch)

        self._host_update_fn = host_update

    # -- device path (dense tiled sweep) ----------------------------

    def _make_update(self) -> None:
        n = len(self._atom_indices)
        degrees = self._degrees
        n_cols = self._n_cols
        cutoff = self._cutoff
        averaged = self._averaged
        frame_boxes = self._frame_boxes
        bk = _dense_block_size(n, n_cols)
        n_pad = _pad_blocks(n, bk)
        starts = jnp.arange(n_pad // bk, dtype=jnp.int32) * bk

        def frame_fields(args):
            pos_f, box_f = args
            dtype = pos_f.dtype
            b = box_f.astype(dtype)
            pts = jnp.pad(pos_f, ((0, n_pad - n), (0, 0)))
            j_idx = jnp.arange(n_pad, dtype=jnp.int32)
            valid_j = j_idx < n
            cut2 = jnp.asarray(cutoff * cutoff, dtype=dtype)
            eps = jnp.asarray(1e-12, dtype=dtype)

            def pair_mask_u(start):
                i_idx = start + jnp.arange(bk, dtype=jnp.int32)
                pts_i = jax.lax.dynamic_slice(
                    pts, (start, jnp.int32(0)), (bk, 3)
                )
                delta = pts_i[:, None, :] - pts[None, :, :]
                dvec = _min_image_vectors(
                    delta.reshape(-1, 3), b
                ).reshape(bk, n_pad, 3)
                d2 = (dvec * dvec).sum(axis=-1)
                ok = (
                    (d2 <= cut2)
                    & (i_idx[:, None] != j_idx[None, :])
                    & valid_j[None, :]
                )
                w = ok.astype(dtype)
                u = dvec * jax.lax.rsqrt(
                    jnp.maximum(d2, eps)
                )[..., None]
                return w, u

            def block_sums(start):
                w, u = pair_mask_u(start)
                y = real_sph_harm(degrees, u, xp=jnp)
                # HIGHEST: the TPU MXU's default f32 contraction is
                # bf16 passes (~1e-3 relative) — order parameters
                # need the full-precision 6-pass path.
                sums = jnp.einsum(
                    "bn,bnc->bc", w, y,
                    precision=jax.lax.Precision.HIGHEST,
                )
                return sums, w.sum(axis=1)

            sums, cnt = jax.lax.map(block_sums, starts)
            sums = sums.reshape(n_pad, n_cols)
            cnt = cnt.reshape(n_pad)
            qlm = sums / jnp.maximum(cnt, 1.0)[:, None]

            if averaged:
                def block_nbr(start):
                    w, _ = pair_mask_u(start)
                    return jnp.matmul(
                        w, qlm,
                        precision=jax.lax.Precision.HIGHEST,
                    )

                nbr = jax.lax.map(block_nbr, starts).reshape(
                    n_pad, n_cols
                )
                qbar = (qlm + nbr) / (cnt + 1.0)[:, None]
                qbar = qbar[:n]
            else:
                qbar = jnp.zeros((), dtype=dtype)
            return qlm[:n], cnt[:n], qbar

        def update(carry, positions, dimensions, mask):
            del mask
            box = frame_boxes(dimensions)
            out = jax.lax.map(frame_fields, (positions, box))
            return carry, out

        self._update = jax.jit(update)

    # -- shared host-side derivation --------------------------------

    def _store_chunk(self, extras, batch) -> None:
        qlm, counts, qbar = extras
        n_real = batch.n_real
        qlm = np.asarray(qlm, dtype=np.float64)[:n_real]
        counts = np.asarray(counts)[:n_real]
        lo = self._store_offset
        hi = lo + n_real
        self.results.n_neighbors[lo:hi] = np.rint(counts).astype(
            np.int64
        )
        if self._averaged:
            qbar = np.asarray(qbar, dtype=np.float64)[:n_real]
        col = 0
        for k, l in enumerate(self._degrees):
            width = 2 * l + 1
            block = qlm[..., col:col + width]
            self.results.ql[lo:hi, k] = invariant_ql(l, block)
            self.results.ql_mean[lo:hi, k] = self.results.ql[
                lo:hi, k
            ].mean(axis=-1)
            self.results.Ql[lo:hi, k] = invariant_ql(
                l, block.mean(axis=1)
            )
            if self._wl:
                self.results.wl[lo:hi, k] = invariant_wl(l, block)
            if self._averaged:
                ablock = qbar[..., col:col + width]
                self.results.ql_avg[lo:hi, k] = invariant_ql(
                    l, ablock
                )
                if self._wl:
                    self.results.wl_avg[lo:hi, k] = invariant_wl(
                        l, ablock
                    )
            col += width
        self._store_offset += n_real

    def _conclude(self) -> None:
        pass


class TetrahedralOrderParameter(DynamicAnalysisBase):
    r"""Errington-Debenedetti tetrahedral order parameter

    .. math::

       q_{\mathrm{tet}}(i) = 1 - \frac{3}{8} \sum_{j < k}^{4}
       \left( \cos\psi_{jik} + \tfrac{1}{3} \right)^2

    over the four nearest neighbors of each particle (1 for a
    perfect tetrahedral cage, 0 on average for an ideal gas).

    Parameters
    ----------
    group : `AtomGroup`
        Particles to analyze (e.g. water oxygens).
    n_neighbors : `int`, keyword-only, default 4
        Neighbors defining the local cage; the prefactor
        generalizes as :math:`q = 1 - \frac{9}{2 k (k - 1)}
        \sum_{j<k} (\cos\psi + 1/3)^2` for :math:`k` neighbors
        (reduces to the standard :math:`3/8` at :math:`k = 4`).
    reduced : `bool`, keyword-only, default False
        Reduced (LJ) units (omits ``results.units``).
    parallel : `bool`, keyword-only, default False
        Shard frame batches over the device mesh.

    Results
    -------
    ``results.q_tet``
        Per-particle order parameter, shape ``(n_frames, N)``.
    ``results.q_tet_mean``
        Particle-averaged value per frame, shape ``(n_frames,)``.
    ``results.times``
        Frame times (ps).
    """

    _checkpointable_stores = True

    def __init__(
        self,
        group,
        *,
        n_neighbors: int = 4,
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
        n_neighbors = int(n_neighbors)
        if n_neighbors < 2:
            raise ValueError("'n_neighbors' must be at least 2.")
        if group.n_atoms <= n_neighbors:
            raise ValueError(
                "'group' must contain more atoms than "
                "'n_neighbors'."
            )
        self._k = n_neighbors
        self._reduced = reduced
        self._atom_indices = group.ix
        self._setup_periodic_box()
        self._require_box("Tetrahedral order")

    def _prepare(self) -> None:
        n = len(self._atom_indices)
        self.results.q_tet = np.empty((self.n_frames, n))
        self.results.q_tet_mean = np.empty(self.n_frames)
        self.results.times = self.frames * self._trajectory.dt
        if not self._reduced:
            self.results.units = {"results.times": ureg.picosecond}
        self._store_offset = 0
        self._carry = jnp.zeros(())
        self._host_pipeline = _order_host_pipeline(self, n)
        if self._host_pipeline:
            self._prepare_host()
            return
        _cap_chunk_for_budget(self, n, n * n * 10.0)
        self._make_update()

    @staticmethod
    def _angle_sum_prefactor(k: int) -> float:
        # Errington-Debenedetti normalization: 3/8 at k = 4 (k(k-1)/2
        # angle pairs, each worth up to (1 + 1/3)^2 = 16/9; the
        # prefactor makes an ideal gas average to ~0).
        return 9.0 / (2.0 * k * (k - 1))

    # -- host pipeline (KD-tree k-NN; float64) ----------------------

    def _prepare_host(self) -> None:
        from ..algorithm.topology import minimize_vectors
        from .cluster import _wrap_periodic_axes

        n = len(self._atom_indices)
        k = self._k
        triclinic = self._triclinic
        pref = self._angle_sum_prefactor(k)

        def knn_indices(pos, dims):
            if triclinic:
                # row-blocked sweep: O(block x N) memory
                out = np.empty((n, k), dtype=np.int64)
                block = 1024
                for lo in range(0, n, block):
                    hi = min(lo + block, n)
                    delta = (
                        pos[lo:hi, None, :] - pos[None, :, :]
                    ).reshape(-1, 3)
                    mv = np.asarray(minimize_vectors(delta, dims))
                    d2 = (mv**2).sum(-1).reshape(hi - lo, n)
                    d2[
                        np.arange(hi - lo), np.arange(lo, hi)
                    ] = np.inf
                    out[lo:hi] = np.argpartition(
                        d2, k - 1, axis=1
                    )[:, :k]
                return out
            from scipy.spatial import cKDTree

            wrapped, boxsize = _wrap_periodic_axes(pos, dims[:3])
            tree = (
                cKDTree(wrapped)
                if boxsize is None
                else cKDTree(wrapped, boxsize=boxsize)
            )
            _, ii = tree.query(wrapped, k=k + 1)
            not_self = ii != np.arange(n)[:, None]
            order = np.argsort(~not_self, kind="stable", axis=1)
            return np.take_along_axis(ii, order[:, :k], axis=1)

        def host_update(batch) -> None:
            positions = self._host_chunk_positions(batch)
            dims_all = np.asarray(
                batch.host_dimensions[: batch.n_real],
                dtype=np.float64,
            )
            n_real = batch.n_real
            q_b = np.empty((n_real, n))
            iu, ju = np.triu_indices(k, 1)
            for f in range(n_real):
                pos = positions[f]
                dims = dims_all[f]
                idx = knn_indices(pos, dims)
                vec = np.asarray(
                    minimize_vectors(
                        (pos[idx] - pos[:, None, :]).reshape(-1, 3),
                        dims,
                    )
                ).reshape(n, k, 3)
                u = vec / np.linalg.norm(
                    vec, axis=-1, keepdims=True
                )
                cosang = np.einsum(
                    "ika,ila->ikl", u, u
                )[:, iu, ju]
                q_b[f] = 1.0 - pref * (
                    (cosang + 1.0 / 3.0) ** 2
                ).sum(axis=-1)
            self._store_chunk(q_b, batch)

        self._host_update_fn = host_update

    # -- device path (dense tiled sweep + top_k) --------------------

    def _make_update(self) -> None:
        n = len(self._atom_indices)
        k = self._k
        frame_boxes = self._frame_boxes
        pref = self._angle_sum_prefactor(k)
        bk = _dense_block_size(n, 4)
        n_pad = _pad_blocks(n, bk)
        starts = jnp.arange(n_pad // bk, dtype=jnp.int32) * bk
        pair_mask = np.triu(np.ones((k, k), dtype=bool), 1)

        def frame_q(args):
            pos_f, box_f = args
            dtype = pos_f.dtype
            b = box_f.astype(dtype)
            pts = jnp.pad(pos_f, ((0, n_pad - n), (0, 0)))
            j_idx = jnp.arange(n_pad, dtype=jnp.int32)
            inf = jnp.asarray(jnp.inf, dtype=dtype)
            eps = jnp.asarray(1e-12, dtype=dtype)
            mask_pairs = jnp.asarray(pair_mask)

            def block(start):
                i_idx = start + jnp.arange(bk, dtype=jnp.int32)
                pts_i = jax.lax.dynamic_slice(
                    pts, (start, jnp.int32(0)), (bk, 3)
                )
                delta = pts_i[:, None, :] - pts[None, :, :]
                dvec = _min_image_vectors(
                    delta.reshape(-1, 3), b
                ).reshape(bk, n_pad, 3)
                d2 = (dvec * dvec).sum(axis=-1)
                bad = (i_idx[:, None] == j_idx[None, :]) | (
                    j_idx[None, :] >= n
                )
                d2 = jnp.where(bad, inf, d2)
                _, idx = jax.lax.top_k(-d2, k)  # (bk, k)
                nbr = pts[idx]
                v = _min_image_vectors(
                    (nbr - pts_i[:, None, :]).reshape(-1, 3), b
                ).reshape(bk, k, 3)
                u = v * jax.lax.rsqrt(
                    jnp.maximum((v * v).sum(axis=-1), eps)
                )[..., None]
                # HIGHEST: default f32 MXU contraction is bf16-grade
                g = jnp.einsum(
                    "ika,ila->ikl", u, u,
                    precision=jax.lax.Precision.HIGHEST,
                )
                third = jnp.asarray(1.0 / 3.0, dtype=dtype)
                s = (
                    ((g + third) ** 2) * mask_pairs
                ).sum(axis=(-1, -2))
                return 1.0 - jnp.asarray(pref, dtype=dtype) * s

            return jax.lax.map(block, starts).reshape(n_pad)[:n]

        def update(carry, positions, dimensions, mask):
            del mask
            box = frame_boxes(dimensions)
            q = jax.lax.map(frame_q, (positions, box))
            return carry, q

        self._update = jax.jit(update)

    def _store_chunk(self, extras, batch) -> None:
        q = np.asarray(extras, dtype=np.float64)[: batch.n_real]
        lo = self._store_offset
        hi = lo + batch.n_real
        self.results.q_tet[lo:hi] = q
        self.results.q_tet_mean[lo:hi] = q.mean(axis=-1)
        self._store_offset += batch.n_real

    def _conclude(self) -> None:
        pass
