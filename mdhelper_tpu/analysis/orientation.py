r"""
Orientational order
===================

Nematic order parameter and orientational relaxation for systems of
linear entities (liquid crystals, rod-like molecules, polymer
segments).  A beyond-reference capability (the reference's closest
surface is the end-to-end vector ACF, reference
``analysis/polymer.py:510-803``).

Per frame the molecular axes :math:`\hat{u}_i` (minimum-image
normalized vectors between two index-matched atom groups) form the
traceless symmetric order tensor

.. math::

   Q_{ab} = \frac{1}{N}\sum_i \frac{3 u_{ia} u_{ib} -
   \delta_{ab}}{2},

whose largest eigenvalue is the nematic scalar :math:`P_2` and whose
corresponding eigenvector is the director.  The per-frame tensor is a
single ``(N, 3)`` einsum (MXU-friendly); eigen-decomposition of the
3x3 results happens on the host at conclusion.

Orientational relaxation :math:`C_2(t) = \langle P_2(\hat{u}(t_0)
\cdot \hat{u}(t_0+t)) \rangle` is evaluated with the Wiener-Khinchin
engine using the outer-product identity :math:`\langle (\hat{u}
\cdot \hat{u}')^2 \rangle = \sum_{ab} \langle (u_a u_b)(u'_a u'_b)
\rangle` — the squared-cosine correlation is the summed ACF of the
six unique outer-product components (weights 1 diagonal, 2
off-diagonal), so no time-origin loop is needed.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .. import ureg
from ..ops.histogram import _min_image_vectors
from .base import DynamicAnalysisBase

__all__ = ["NematicOrderParameter", "OrientationProfile"]


def _compact_pair_columns(begins, ends):
    """Validation + streamed-column compaction for the axis-vector
    classes: both groups must share a universe, match in length, be
    non-empty, and pair distinct atoms (a zero-length axis has no
    orientation).  Returns ``(atom_indices, b_col, e_col)``."""

    if begins.universe is not ends.universe:
        raise ValueError(
            "'begins' and 'ends' must belong to the same universe."
        )
    if begins.n_atoms != ends.n_atoms:
        raise ValueError(
            "'begins' and 'ends' must have the same number of "
            "atoms."
        )
    if begins.n_atoms == 0:
        raise ValueError("Empty axis groups.")
    if (np.asarray(begins.ix) == np.asarray(ends.ix)).any():
        raise ValueError(
            "'begins' and 'ends' pair an atom with itself; each "
            "axis needs two distinct atoms."
        )
    involved = np.unique(np.concatenate([begins.ix, ends.ix]))
    col_of = {int(g): c for c, g in enumerate(involved)}
    b_col = np.fromiter(
        (col_of[int(i)] for i in begins.ix),
        dtype=np.int64, count=begins.n_atoms,
    )
    e_col = np.fromiter(
        (col_of[int(i)] for i in ends.ix),
        dtype=np.int64, count=ends.n_atoms,
    )
    return involved, b_col, e_col


class NematicOrderParameter(DynamicAnalysisBase):
    r"""Nematic order parameter :math:`P_2`, director, and
    orientational relaxation :math:`C_1(t)` / :math:`C_2(t)`.

    Parameters
    ----------
    begins, ends : `AtomGroup`
        Index-matched groups defining the molecular axes
        :math:`\hat{u}_i \propto \mathbf{r}_{\mathrm{ends},i} -
        \mathbf{r}_{\mathrm{begins},i}` (minimum image).
    acf : `bool`, keyword-only, default False
        Store per-frame axes and compute the orientational
        relaxation functions :math:`C_1(t) = \langle \hat{u}(0)
        \cdot \hat{u}(t) \rangle` and :math:`C_2(t)` (memory:
        ``n_frames x N x 6`` floats on the host).
    reduced : `bool`, keyword-only, default False
        Reduced (LJ) units (omits ``results.units``).
    parallel : `bool`, keyword-only, default False
        Shard frame batches over the device mesh.

    Results
    -------
    ``results.Q``
        Per-frame order tensors, shape ``(n_frames, 3, 3)``.
    ``results.P2``
        Per-frame nematic scalar (largest eigenvalue of `Q`).
    ``results.director``
        Per-frame director (eigenvector of the largest eigenvalue),
        shape ``(n_frames, 3)``.
    ``results.P2_mean``
        Nematic scalar of the time-averaged order tensor (the
        standard reported :math:`S`).
    ``results.acf_times``, ``results.C1``, ``results.C2``
        (only with ``acf=True``) lag times and the orientational
        relaxation functions (both normalized to 1 at :math:`t=0`).
    ``results.times``
        Frame times (ps).
    """

    _checkpointable_stores = True

    def _checkpoint_attrs(self) -> tuple:
        return ("_axes",) if self._acf else ()

    def __init__(
        self,
        begins,
        ends,
        *,
        acf: bool = False,
        reduced: bool = False,
        parallel: bool = False,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        (
            self._atom_indices, self._b_col, self._e_col
        ) = _compact_pair_columns(begins, ends)
        self.universe = begins.universe
        super().__init__(
            self.universe.trajectory, parallel, verbose, **kwargs
        )
        self._begins_ix = begins.ix
        self._ends_ix = ends.ix
        self._acf = bool(acf)
        self._reduced = reduced
        self._setup_periodic_box()

    def _prepare(self) -> None:
        self.results.Q = np.empty((self.n_frames, 3, 3))
        self.results.times = self.frames * self._trajectory.dt
        if not self._reduced:
            self.results.units = {"results.times": ureg.picosecond}
        if self._acf:
            self._axes = np.empty(
                (self.n_frames, len(self._begins_ix), 3)
            )
        self._store_offset = 0
        # conclusion-heavy analysis: the carry is a passthrough
        # scalar (the streaming driver keys on its presence)
        self._carry = jnp.zeros(())
        # O(N) per-frame einsum + host-side eigendecomposition: on a
        # tunnel-attached TPU the device round trip is all cost, so
        # the stage runs host-side there (like DipoleMoment)
        self._host_pipeline = (
            not getattr(self, "_parallel", False)
            and self._resolve_host_pipeline()
        )
        if self._host_pipeline:
            self._prepare_host()
            return
        self._make_update()

    def _prepare_host(self) -> None:
        from ..algorithm.topology import minimize_vectors

        b_col, e_col = self._b_col, self._e_col
        store_axes = self._acf

        def host_update(batch) -> None:
            positions = self._host_chunk_positions(batch)
            dims_all = np.asarray(
                batch.host_dimensions[: batch.n_real],
                dtype=np.float64,
            )
            n_real = batch.n_real
            Q = np.empty((n_real, 3, 3))
            axes = (
                np.empty((n_real, len(b_col), 3))
                if store_axes
                else np.zeros((n_real,))
            )
            for f in range(n_real):
                pos = positions[f]
                v = np.asarray(
                    minimize_vectors(
                        pos[e_col] - pos[b_col], dims_all[f]
                    )
                )
                u = v / np.linalg.norm(v, axis=-1, keepdims=True)
                outer = np.einsum("ia,ib->ab", u, u) / len(u)
                Q[f] = (3.0 * outer - np.eye(3)) / 2.0
                if store_axes:
                    axes[f] = u
            self._store_chunk((Q, axes), batch)

        self._host_update_fn = host_update

    def _make_update(self) -> None:
        b_col = jnp.asarray(self._b_col)
        e_col = jnp.asarray(self._e_col)
        frame_boxes = self._frame_boxes
        store_axes = self._acf

        def frame_axes(args):
            pos_f, box_f = args
            b = box_f.astype(pos_f.dtype)
            v = _min_image_vectors(pos_f[e_col] - pos_f[b_col], b)
            u = v / jnp.sqrt((v * v).sum(axis=-1))[:, None]
            outer = jnp.einsum(
                "ia,ib->ab", u, u,
                precision=jax.lax.Precision.HIGHEST,
            ) / u.shape[0]
            eye = jnp.eye(3, dtype=u.dtype)
            Q = (3.0 * outer - eye) / 2.0
            if store_axes:
                return Q, u
            return Q, jnp.zeros((), dtype=u.dtype)

        def update(carry, positions, dimensions, mask):
            del mask
            box = frame_boxes(dimensions)
            Q, axes = jax.lax.map(frame_axes, (positions, box))
            return carry, (Q, axes)

        self._update = jax.jit(update)

    def _store_chunk(self, extras, batch) -> None:
        Q, axes = extras
        n_real = batch.n_real
        lo = self._store_offset
        self.results.Q[lo:lo + n_real] = np.asarray(Q)[:n_real]
        if self._acf:
            self._axes[lo:lo + n_real] = np.asarray(axes)[:n_real]
        self._store_offset += n_real

    def _conclude(self) -> None:
        Q = self.results.Q
        evals, evecs = np.linalg.eigh(Q)
        self.results.P2 = evals[:, -1]
        directors = evecs[:, :, -1]
        # fix the sign convention: positive first non-zero component
        flip = np.sign(
            np.where(
                np.abs(directors[:, 0]) > 1e-12,
                directors[:, 0],
                np.where(
                    np.abs(directors[:, 1]) > 1e-12,
                    directors[:, 1],
                    directors[:, 2],
                ),
            )
        )
        self.results.director = directors * flip[:, None]
        mean_evals = np.linalg.eigvalsh(Q.mean(axis=0))
        self.results.P2_mean = float(mean_evals[-1])
        if self._acf:
            self._conclude_acf()

    def _conclude_acf(self) -> None:
        from ..algorithm.correlation import correlation_fft

        u = self._axes  # (T, N, 3)
        T = u.shape[0]
        # C1: vector ACF, averaged over entities
        c1 = np.asarray(
            correlation_fft(u, axis=0, average=True, vector=True)
        )
        self.results.C1 = c1 / c1[0]
        # C2 via the outer-product identity: six unique components
        # with multiplicity weights (xx, yy, zz, xy, xz, yz)
        prods = np.stack(
            [
                u[..., 0] * u[..., 0],
                u[..., 1] * u[..., 1],
                u[..., 2] * u[..., 2],
                np.sqrt(2.0) * u[..., 0] * u[..., 1],
                np.sqrt(2.0) * u[..., 0] * u[..., 2],
                np.sqrt(2.0) * u[..., 1] * u[..., 2],
            ],
            axis=-1,
        )  # (T, N, 6)
        cos2 = np.asarray(
            correlation_fft(
                prods, axis=0, average=True, vector=True
            )
        )
        self.results.C2 = (3.0 * cos2 - 1.0) / 2.0
        self.results.acf_times = np.arange(T) * self._uniform_lag_dt(
            "Orientational relaxation"
        )
        if not self._reduced:
            self.results.units[
                "results.acf_times"
            ] = ureg.picosecond


class OrientationProfile(DynamicAnalysisBase):
    r"""Axis-resolved orientational order of molecular vectors —
    :math:`P_1(z) = \langle \cos\theta \rangle` and :math:`P_2(z) =
    \langle (3\cos^2\theta - 1)/2 \rangle` binned along a box axis
    (beyond reference; the standard water/surfactant-at-interface
    observable, e.g. dipole orientation vs. distance from a wall).

    :math:`\theta` is the angle between each entity's axis
    :math:`\hat{u}_i` (minimum-image normalized vector from `begins`
    to `ends`) and a fixed lab direction (`director`, defaulting to
    the profiled axis).  Entities bin at their minimum-image bond
    midpoint.

    TPU formulation: one fused elementwise program per chunk (vector
    fold, normalize, dot) feeding three one-hot MXU histograms
    (count, :math:`\sum\cos\theta`, :math:`\sum\cos^2\theta`) via
    :func:`mdhelper_tpu.ops.profiles.axis_histogram_batch` with
    per-frame weights.  The accumulators are order-independent, so
    ``parallel=True`` shards frames over the mesh.  Bond folding and
    wrapping use each frame's own box (NPT-safe); only the bin grid
    is the initialization-time cell (the profile-class convention;
    orthorhombic only).

    Parameters
    ----------
    begins, ends : `AtomGroup`
        Index-matched groups defining the molecular axes (e.g. water
        oxygens and the midpoints proxy of their hydrogens, or
        surfactant head/tail atoms).
    axis : `str`, default :code:`"z"`
        Profiled box axis (``"x"``, ``"y"`` or ``"z"``).
    n_bins : `int`, default 100
        Bins along the axis.
    director : array-like, keyword-only, optional
        Lab reference direction (normalized internally); defaults to
        the unit vector of `axis`.
    reduced : `bool`, keyword-only, default :code:`False`
        Reduced (LJ) units.
    parallel : `bool`, keyword-only, default :code:`False`
        Shard frame batches over the device mesh.

    Results
    -------
    ``results.bins``
        Bin centers (Å).
    ``results.counts``
        Per-bin entity counts summed over frames.
    ``results.p1``, ``results.p2``
        Orientational order profiles (NaN in empty bins).
    """

    def __init__(
        self,
        begins,
        ends,
        axis: str = "z",
        n_bins: int = 100,
        *,
        director=None,
        reduced: bool = False,
        parallel: bool = False,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        (
            self._atom_indices, self._b_col, self._e_col
        ) = _compact_pair_columns(begins, ends)
        self.universe = begins.universe
        super().__init__(
            self.universe.trajectory, parallel, verbose, **kwargs
        )
        self._setup_periodic_box()
        if self._triclinic:
            raise ValueError(
                "OrientationProfile needs an orthorhombic cell."
            )
        self._require_box("OrientationProfile")
        if axis not in ("x", "y", "z"):
            raise ValueError("axis must be 'x', 'y' or 'z'.")
        self._axis = "xyz".index(axis)
        if int(n_bins) < 1:
            raise ValueError("'n_bins' must be positive.")
        self._n_bins = int(n_bins)
        if director is None:
            director = np.eye(3)[self._axis]
        director = np.asarray(director, dtype=np.float64).reshape(3)
        norm = np.linalg.norm(director)
        if norm == 0:
            raise ValueError("'director' must be non-zero.")
        self._director = director / norm
        self._reduced = reduced
        self._dimensions = np.asarray(
            self.universe.dimensions[:3], dtype=np.float64
        )

    def _prepare(self) -> None:
        length = self._dimensions[self._axis]
        self._edges = np.linspace(0.0, length, self._n_bins + 1)
        self.results.bins = (
            self._edges[:-1] + self._edges[1:]
        ) / 2
        if not self._reduced:
            self.results.units = {"results.bins": ureg.angstrom}
        self._carry = {
            "n": jnp.zeros(self._n_bins, dtype=jnp.float64),
            "cos": jnp.zeros(self._n_bins, dtype=jnp.float64),
            "cos2": jnp.zeros(self._n_bins, dtype=jnp.float64),
        }
        self._make_update()

    def _make_update(self) -> None:
        from ..ops.histogram import _image_shift
        from ..ops.pbc import wrap_positions
        from ..ops.profiles import axis_histogram_batch

        dtype = self._stream_dtype()
        b_col = jnp.asarray(self._b_col)
        e_col = jnp.asarray(self._e_col)
        edges = jnp.asarray(self._edges, dtype=dtype)
        director = jnp.asarray(self._director, dtype=dtype)
        ax = self._axis

        def update(carry, positions, dimensions, mask):
            # per-FRAME boxes for the PHYSICS (the bond fold and the
            # wrap: an NPT frame must fold with ITS box); only the
            # bin GRID is the init-time cell, the profile-class
            # convention
            box = dimensions[:, None, :3].astype(positions.dtype)
            b_pos = positions[:, b_col]
            e_pos = positions[:, e_col]
            delta = e_pos - b_pos
            v = delta - box * _image_shift(delta, box)
            norm = jnp.sqrt((v * v).sum(axis=-1))
            # distinct-atom pairs are enforced at init; a residual
            # zero-length bond (coincident f32 coordinates) must not
            # poison the histograms: its cos stays finite and its
            # bin coordinate goes NaN (dropped by the histogram)
            valid = norm > 0
            u = v / jnp.maximum(
                norm, jnp.finfo(v.dtype).tiny
            )[..., None]
            cos = (u * director).sum(axis=-1)  # (B, N)
            mid = wrap_positions(b_pos + 0.5 * v, box)
            coord = jnp.where(
                valid,
                mid[..., ax],
                jnp.asarray(jnp.nan, positions.dtype),
            )

            # per-FRAME f32 histograms, f64 cross-frame accumulation:
            # keeps serial and frame-sharded parallel runs bit-equal
            # (a batch-flattened f32 dot would group frames
            # differently across shards)
            def per_frame(args):
                coord_f, cos_f, m_f = args
                n = axis_histogram_batch(
                    coord_f[None], m_f[None], edges
                )
                c1 = axis_histogram_batch(
                    coord_f[None], m_f[None], edges,
                    weights=cos_f[None],
                )
                c2 = axis_histogram_batch(
                    coord_f[None], m_f[None], edges,
                    weights=(cos_f * cos_f)[None],
                )
                return n, c1, c2

            n, c1, c2 = jax.lax.map(
                per_frame, (coord, cos, mask)
            )
            return {
                "n": carry["n"]
                + n.astype(jnp.float64).sum(axis=0),
                "cos": carry["cos"]
                + c1.astype(jnp.float64).sum(axis=0),
                "cos2": carry["cos2"]
                + c2.astype(jnp.float64).sum(axis=0),
            }

        from .base import jit_update

        self._update = jit_update(update)

    def _conclude(self) -> None:
        n = np.asarray(self._carry["n"])
        c1 = np.asarray(self._carry["cos"])
        c2 = np.asarray(self._carry["cos2"])
        self.results.counts = n
        with np.errstate(divide="ignore", invalid="ignore"):
            self.results.p1 = np.where(n > 0, c1 / n, np.nan)
            self.results.p2 = np.where(
                n > 0, (3.0 * c2 / n - 1.0) / 2.0, np.nan
            )
