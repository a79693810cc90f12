r"""
Structural superposition
========================

RMSD time series and per-atom RMSF with optimal (weighted)
superposition.  Beyond-reference capabilities (bbye98/mdhelper has
no structural-alignment analysis; the public analogues are
`MDAnalysis.analysis.rms` and `mdtraj.rmsd`).

TPU-first design: the optimal rotation comes from the quaternion
(Davenport/Theobald) formulation — per frame, a single
``(3, N) @ (N, 3)`` HIGHEST-precision MXU covariance matmul feeds a
symmetric ``4x4`` eigenproblem (``jnp.linalg.eigh`` over the frame
batch), with the minimum RMSD available directly from the largest
eigenvalue: :math:`\mathrm{RMSD}^2 = (G_p + G_q - 2\lambda_{\max})
/ W`.  No SVD, no data-dependent control flow, one fused program per
chunk.  On tunnel-attached TPUs a float64 numpy host pipeline
computes the identical quantities.

Superposition math validated against
``scipy.spatial.transform.Rotation.align_vectors`` (see
``tests/test_analysis_rmsd.py``).

Note: superposition assumes whole (unwrapped) structures — fold
molecules before aligning; minimum-image conventions do not apply to
rigid-body fits.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .. import ureg
from .base import DynamicAnalysisBase, jit_update

# cap on one PCA.transform() host read (full universe atom width)
_TRANSFORM_BLOCK_BYTES = 2**28

__all__ = ["PrincipalComponentAnalysis", "RMSD", "RMSF", "TICA"]


def _davenport_k(c):
    """Symmetric 4x4 Davenport matrix from the (..., 3, 3) weighted
    covariance C = sum_i w_i p_i q_i^T (works with numpy or jnp
    arrays; pure stack/arithmetic)."""

    c11, c12, c13 = c[..., 0, 0], c[..., 0, 1], c[..., 0, 2]
    c21, c22, c23 = c[..., 1, 0], c[..., 1, 1], c[..., 1, 2]
    c31, c32, c33 = c[..., 2, 0], c[..., 2, 1], c[..., 2, 2]
    xp = jnp if isinstance(c11, jax.Array) else np
    rows = [
        [c11 + c22 + c33, c23 - c32, c31 - c13, c12 - c21],
        [c23 - c32, c11 - c22 - c33, c12 + c21, c13 + c31],
        [c31 - c13, c12 + c21, -c11 + c22 - c33, c23 + c32],
        [c12 - c21, c13 + c31, c23 + c32, -c11 - c22 + c33],
    ]
    return xp.stack(
        [xp.stack(r, axis=-1) for r in rows], axis=-2
    )


def _rotation_from_quaternion(q):
    """(..., 4) scalar-first unit quaternion -> (..., 3, 3) proper
    rotation matrix (numpy or jnp)."""

    qw, qx, qy, qz = (
        q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    )
    xp = jnp if isinstance(qw, jax.Array) else np
    rows = [
        [
            qw * qw + qx * qx - qy * qy - qz * qz,
            2 * (qx * qy - qw * qz),
            2 * (qx * qz + qw * qy),
        ],
        [
            2 * (qx * qy + qw * qz),
            qw * qw - qx * qx + qy * qy - qz * qz,
            2 * (qy * qz - qw * qx),
        ],
        [
            2 * (qx * qz - qw * qy),
            2 * (qy * qz + qw * qx),
            qw * qw - qx * qx - qy * qy + qz * qz,
        ],
    ]
    return xp.stack(
        [xp.stack(r, axis=-1) for r in rows], axis=-2
    )


class _SuperpositionBase(DynamicAnalysisBase):
    """Shared reference handling + per-frame fit machinery."""

    def __init__(
        self,
        group,
        reference=None,
        *,
        align: bool = True,
        weights=None,
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
        if group.n_atoms < 3:
            raise ValueError(
                "'group' must contain at least 3 atoms for a "
                "rigid-body fit."
            )
        self._align = bool(align)
        self._reduced = reduced
        self._atom_indices = group.ix
        if weights is None:
            w = np.ones(group.n_atoms)
        elif isinstance(weights, str):
            if weights != "mass":
                raise ValueError(
                    "'weights' must be None, 'mass', or an array."
                )
            w = np.asarray(group.masses, dtype=np.float64)
        else:
            w = np.asarray(weights, dtype=np.float64)
            if w.shape != (group.n_atoms,):
                raise ValueError(
                    "'weights' must have one value per group atom."
                )
        if not (w >= 0).all() or w.sum() == 0:
            raise ValueError(
                "'weights' must be non-negative with positive sum."
            )
        self._weights = w
        self._reference_spec = reference

    def _resolve_reference(self) -> None:
        ref = self._reference_spec
        if ref is None:
            ref = 0
        if isinstance(ref, (int, np.integer)):
            positions, _ = self._trajectory.read_frames([int(ref)])
            ref = positions[0][self._atom_indices]
        ref = np.asarray(ref, dtype=np.float64)
        if ref.shape != (len(self._atom_indices), 3):
            raise ValueError(
                "'reference' must be a frame index or an "
                f"({len(self._atom_indices)}, 3) coordinate array."
            )
        w = self._weights
        self._w_total = float(w.sum())
        com = (w[:, None] * ref).sum(axis=0) / self._w_total
        self._ref_centered = ref - com
        self._ref_com = com
        self._gq = float(
            (w * (self._ref_centered**2).sum(axis=1)).sum()
        )

    # -- shared per-frame fit (device) -------------------------------

    def _frame_fit_fn(self):
        """Returns f(positions (B, N, 3)) -> (rmsd (B,),
        rotations (B, 3, 3), centered (B, N, 3)) in the stream
        dtype (f64 accumulating scalars)."""

        align = self._align
        w_np = self._weights
        gq = self._gq
        w_total = self._w_total
        ref_np = self._ref_centered

        def fit(positions):
            dtype = positions.dtype
            w = jnp.asarray(w_np, dtype=dtype)
            ref = jnp.asarray(ref_np, dtype=dtype)
            hi = jax.lax.Precision.HIGHEST
            com = jnp.einsum(
                "n,bnd->bd", w, positions, precision=hi
            ) / w_total
            pc = positions - com[:, None, :]
            wp = pc * w[None, :, None]
            gp = jnp.einsum(
                "bnd,bnd->b", wp, pc, precision=hi
            )
            if not align:
                diff = pc - ref[None]
                ss = jnp.einsum(
                    "n,bnd,bnd->b", w, diff, diff, precision=hi
                )
                rmsd = jnp.sqrt(jnp.maximum(ss / w_total, 0.0))
                eye = jnp.broadcast_to(
                    jnp.eye(3, dtype=dtype),
                    (positions.shape[0], 3, 3),
                )
                return rmsd, eye, pc
            c = jnp.einsum(
                "bnd,ne->bde", wp, ref, precision=hi
            )  # (B, 3, 3): sum w p q^T
            k = _davenport_k(c)
            vals, vecs = jnp.linalg.eigh(k)
            lam = vals[..., -1]
            quat = vecs[..., :, -1]
            rot = _rotation_from_quaternion(quat)
            rmsd = jnp.sqrt(
                jnp.maximum(gp + gq - 2.0 * lam, 0.0) / w_total
            )
            return rmsd, rot, pc

        return fit

    # -- shared host-side projection (PCA/TICA transform) ------------

    def _project_aligned(
        self, comps: np.ndarray, mean_x: np.ndarray
    ) -> np.ndarray:
        """Re-stream the analyzed frames host-side, align each to the
        reference, and project the mean-centered flattened
        coordinates onto the ``(3N, k)`` component columns."""

        w = self._weights
        w_total = self._w_total
        ref = self._ref_centered
        frames = np.asarray(self.frames)
        out = np.empty((len(frames), comps.shape[1]))
        # bounded blocks: read_frames materializes frames at full
        # universe atom width, so cap each read at ~256 MB and subset
        # the analyzed columns immediately (a single bulk read of a
        # long large-N trajectory would exhaust host memory)
        n_universe = self.universe.atoms.n_atoms
        block = max(
            1, int(_TRANSFORM_BLOCK_BYTES // max(n_universe * 24, 1))
        )
        for lo in range(0, len(frames), block):
            chunk = frames[lo:lo + block]
            positions, _ = self._trajectory.read_frames(chunk)
            positions = np.asarray(positions)[:, self._atom_indices]
            for j in range(len(chunk)):
                pos = positions[j]
                com = (w[:, None] * pos).sum(axis=0) / w_total
                pc = pos - com
                if self._align:
                    c = (pc * w[:, None]).T @ ref
                    _, vecs = np.linalg.eigh(_davenport_k(c))
                    rot = _rotation_from_quaternion(vecs[:, -1])
                    pc = pc @ rot.T
                out[lo + j] = (pc.reshape(-1) - mean_x) @ comps
        return out


class RMSD(_SuperpositionBase):
    r"""Root-mean-square deviation from a reference structure.

    Per frame the optimally superposed (weighted) RMSD

    .. math::

       \mathrm{RMSD}(t) = \min_{R} \sqrt{\frac{\sum_i w_i
       |R\,(\mathbf{r}_i(t) - \mathbf{r}_\mathrm{com}) -
       (\mathbf{r}_i^\mathrm{ref} -
       \mathbf{r}_\mathrm{com}^\mathrm{ref})|^2}{\sum_i w_i}}

    via the quaternion eigenvalue method (no explicit rotation
    needed for the minimum; the optimal rotation is reported too).

    Parameters
    ----------
    group : `AtomGroup`
        Atoms to fit.
    reference : `int` or array-like, optional
        Reference frame index (default 0) or explicit ``(N, 3)``
        coordinates.
    align : `bool`, keyword-only, default True
        Remove the optimal rigid-body rotation (and the COM shift).
        With ``align=False`` the RMSD is computed after centering
        only.
    weights : `None`, ``"mass"`` or array-like, keyword-only
        Fit weights.
    reduced : `bool`, keyword-only, default False
        Reduced (LJ) units (omits ``results.units``).
    parallel : `bool`, keyword-only, default False
        Shard frame batches over the device mesh.

    Results
    -------
    ``results.rmsd``
        Per-frame RMSD (Å), shape ``(n_frames,)``.
    ``results.rotations``
        Optimal mobile→reference rotation matrices,
        ``(n_frames, 3, 3)`` (identity with ``align=False``).
    ``results.times``
        Frame times (ps).
    """

    _checkpointable_stores = True

    def _prepare(self) -> None:
        self._resolve_reference()
        self.results.rmsd = np.empty(self.n_frames)
        self.results.rotations = np.empty((self.n_frames, 3, 3))
        self.results.times = self.frames * self._trajectory.dt
        if not self._reduced:
            self.results.units = {
                "results.times": ureg.picosecond,
                "results.rmsd": ureg.angstrom,
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
        fit = self._frame_fit_fn()

        def update(carry, positions, dimensions, mask):
            del dimensions, mask
            rmsd, rot, _ = fit(positions)
            return carry, (rmsd, rot)

        self._update = jax.jit(update)

    def _prepare_host(self) -> None:
        w = self._weights
        w_total = self._w_total
        ref = self._ref_centered
        gq = self._gq
        align = self._align

        def host_update(batch) -> None:
            positions = self._host_chunk_positions(batch)
            n_real = batch.n_real
            rmsd = np.empty(n_real)
            rots = np.empty((n_real, 3, 3))
            for f in range(n_real):
                pos = positions[f]
                com = (w[:, None] * pos).sum(axis=0) / w_total
                pc = pos - com
                if not align:
                    rmsd[f] = np.sqrt(
                        (w * ((pc - ref) ** 2).sum(axis=1)).sum()
                        / w_total
                    )
                    rots[f] = np.eye(3)
                    continue
                wp = pc * w[:, None]
                gp = float((wp * pc).sum())
                c = wp.T @ ref
                vals, vecs = np.linalg.eigh(_davenport_k(c))
                lam = vals[-1]
                rots[f] = _rotation_from_quaternion(vecs[:, -1])
                rmsd[f] = np.sqrt(
                    max(gp + gq - 2.0 * lam, 0.0) / w_total
                )
            self._store_chunk((rmsd, rots), batch)

        self._host_update_fn = host_update

    def _store_chunk(self, extras, batch) -> None:
        rmsd, rot = extras
        n_real = batch.n_real
        lo = self._store_offset
        self.results.rmsd[lo:lo + n_real] = np.asarray(
            rmsd, dtype=np.float64
        )[:n_real]
        self.results.rotations[lo:lo + n_real] = np.asarray(
            rot, dtype=np.float64
        )[:n_real]
        self._store_offset += n_real

    def _conclude(self) -> None:
        pass


class RMSF(_SuperpositionBase):
    r"""Per-atom root-mean-square fluctuation about the (aligned)
    mean structure:

    .. math::

       \mathrm{RMSF}_i = \sqrt{\bigl\langle |\mathbf{r}_i -
       \langle\mathbf{r}_i\rangle|^2 \bigr\rangle},

    with every frame optimally superposed onto the reference first
    (``align=True``; the single-pass identity :math:`\langle |r -
    \langle r\rangle|^2\rangle = \langle |r|^2\rangle - |\langle r
    \rangle|^2` keeps the accumulator one ``(N, 3)`` + one ``(N,)``
    float64 carry).

    Parameters are those of :class:`RMSD`; ``weights`` affect the
    superposition only (fluctuations are reported per atom,
    unweighted).

    Results
    -------
    ``results.rmsf``
        Per-atom RMSF (Å), shape ``(N,)``.
    ``results.mean_positions``
        The aligned average structure in the reference's centered
        frame, shape ``(N, 3)``.
    """

    def _prepare(self) -> None:
        self._resolve_reference()
        n = len(self._atom_indices)
        self.results.units = (
            {} if self._reduced else {"results.rmsf": ureg.angstrom}
        )
        self._host_pipeline = (
            not getattr(self, "_parallel", False)
            and self._resolve_host_pipeline()
        )
        if self._host_pipeline:
            self._sum = np.zeros((n, 3))
            self._sumsq = np.zeros(n)
            self._count = 0
            self._carry = np.zeros(())
            self._prepare_host()
            return
        self._carry = {
            "sum": jnp.zeros((n, 3), jnp.float64),
            "sumsq": jnp.zeros(n, jnp.float64),
            "count": jnp.zeros((), jnp.float64),
        }
        fit = self._frame_fit_fn()
        hi = jax.lax.Precision.HIGHEST

        def update(carry, positions, dimensions, mask):
            del dimensions
            _, rot, pc = fit(positions)
            aligned = jnp.einsum(
                "bnd,bed->bne", pc, rot, precision=hi
            )  # pc @ rot.T
            m = mask.astype(aligned.dtype)
            carry = {
                "sum": carry["sum"]
                + jnp.einsum(
                    "bne,b->ne", aligned, m, precision=hi
                ).astype(jnp.float64),
                "sumsq": carry["sumsq"]
                + jnp.einsum(
                    "bne,bne,b->n", aligned, aligned, m,
                    precision=hi,
                ).astype(jnp.float64),
                "count": carry["count"] + m.sum(),
            }
            # carry-only analysis (_store_chunk = None): the runtime
            # expects the bare carry, not a (carry, extras) pair
            return carry

        self._update = jax.jit(update)
        self._store_chunk = None

    def _prepare_host(self) -> None:
        w = self._weights
        w_total = self._w_total
        ref = self._ref_centered
        align = self._align

        def host_update(batch) -> None:
            positions = self._host_chunk_positions(batch)
            for f in range(batch.n_real):
                pos = positions[f]
                com = (w[:, None] * pos).sum(axis=0) / w_total
                pc = pos - com
                if align:
                    c = (pc * w[:, None]).T @ ref
                    _, vecs = np.linalg.eigh(_davenport_k(c))
                    rot = _rotation_from_quaternion(vecs[:, -1])
                    pc = pc @ rot.T
                self._sum += pc
                self._sumsq += (pc * pc).sum(axis=1)
                self._count += 1

        self._host_update_fn = host_update

    def _conclude(self) -> None:
        if self._host_pipeline:
            total, sumsq, count = (
                self._sum, self._sumsq, self._count
            )
        else:
            total = np.asarray(self._carry["sum"])
            sumsq = np.asarray(self._carry["sumsq"])
            count = float(self._carry["count"])
        mean = total / count
        var = sumsq / count - (mean * mean).sum(axis=1)
        self.results.rmsf = np.sqrt(np.maximum(var, 0.0))
        self.results.mean_positions = mean


class PrincipalComponentAnalysis(_SuperpositionBase):
    r"""Principal component analysis of the (aligned) coordinate
    covariance — collective-motion decomposition (the
    ``MDAnalysis.analysis.pca`` analogue; beyond reference).

    Every frame is optimally superposed onto the reference
    (``align=True``), flattened to a ``3N`` vector, and accumulated
    into single-pass first/second moments; the covariance

    .. math::

       C = \langle (\mathbf{x} - \langle\mathbf{x}\rangle)
       (\mathbf{x} - \langle\mathbf{x}\rangle)^T \rangle

    is eigendecomposed at conclusion.  The per-chunk device work is
    one HIGHEST-precision ``(B, 3N) x (B, 3N)`` MXU matmul
    (accumulated in float64 on the host side of the carry), so the
    pass rides the same stream as any other analysis.

    Parameters are those of :class:`RMSD` (``weights`` affect the
    superposition only; the covariance is unweighted, MDAnalysis
    semantics).

    Results
    -------
    ``results.variance``
        Eigenvalues (Å²), descending, shape ``(3N,)``.
    ``results.cumulated_variance``
        Normalized cumulative variance (what fraction the first
        ``k`` components explain).
    ``results.p_components``
        Eigenvectors as columns, shape ``(3N, 3N)``; sign convention:
        the largest-magnitude entry of each component is positive.
    ``results.mean_positions``
        The aligned average structure, shape ``(N, 3)``.

    Use :meth:`transform` to project a trajectory onto the leading
    components after :meth:`run`.
    """

    def _prepare(self) -> None:
        self._resolve_reference()
        n = len(self._atom_indices)
        self.results.units = (
            {}
            if self._reduced
            else {"results.variance": ureg.angstrom**2}
        )
        self._host_pipeline = (
            not getattr(self, "_parallel", False)
            and self._resolve_host_pipeline()
        )
        if self._host_pipeline:
            self._sum = np.zeros(3 * n)
            self._m2 = np.zeros((3 * n, 3 * n))
            self._count = 0
            self._carry = np.zeros(())
            self._prepare_host()
            return
        self._carry = {
            "sum": jnp.zeros(3 * n, jnp.float64),
            "m2": jnp.zeros((3 * n, 3 * n), jnp.float64),
            "count": jnp.zeros((), jnp.float64),
        }
        fit = self._frame_fit_fn()
        hi = jax.lax.Precision.HIGHEST

        def update(carry, positions, dimensions, mask):
            del dimensions
            _, rot, pc = fit(positions)
            aligned = jnp.einsum(
                "bnd,bed->bne", pc, rot, precision=hi
            ).reshape(positions.shape[0], -1)  # (B, 3N)
            m = mask.astype(aligned.dtype)
            x = aligned * m[:, None]
            carry = {
                "sum": carry["sum"]
                + x.sum(axis=0).astype(jnp.float64),
                "m2": carry["m2"]
                + jnp.einsum(
                    "bi,bj->ij", x, aligned, precision=hi
                ).astype(jnp.float64),
                "count": carry["count"] + m.sum(),
            }
            return carry

        self._update = jax.jit(update)
        self._store_chunk = None

    def _prepare_host(self) -> None:
        w = self._weights
        w_total = self._w_total
        ref = self._ref_centered
        align = self._align

        def host_update(batch) -> None:
            positions = self._host_chunk_positions(batch)
            for f in range(batch.n_real):
                pos = positions[f]
                com = (w[:, None] * pos).sum(axis=0) / w_total
                pc = pos - com
                if align:
                    c = (pc * w[:, None]).T @ ref
                    _, vecs = np.linalg.eigh(_davenport_k(c))
                    rot = _rotation_from_quaternion(vecs[:, -1])
                    pc = pc @ rot.T
                x = pc.reshape(-1)
                self._sum += x
                self._m2 += np.outer(x, x)
                self._count += 1

        self._host_update_fn = host_update

    def _conclude(self) -> None:
        if self._host_pipeline:
            total, m2, count = self._sum, self._m2, self._count
        else:
            total = np.asarray(self._carry["sum"])
            m2 = np.asarray(self._carry["m2"])
            count = float(self._carry["count"])
        mean = total / count
        cov = m2 / count - np.outer(mean, mean)
        vals, vecs = np.linalg.eigh(cov)
        vals, vecs = vals[::-1], vecs[:, ::-1]
        # deterministic sign: largest-|entry| positive per component
        peaks = np.argmax(np.abs(vecs), axis=0)
        signs = np.sign(vecs[peaks, np.arange(vecs.shape[1])])
        signs[signs == 0] = 1.0
        self.results.variance = np.maximum(vals, 0.0)
        total_var = self.results.variance.sum()
        self.results.cumulated_variance = (
            np.cumsum(self.results.variance) / total_var
            if total_var
            else np.zeros_like(vals)
        )
        self.results.p_components = vecs * signs
        self.results.mean_positions = mean.reshape(-1, 3)

    def transform(self, n_components: int = None) -> np.ndarray:
        """Project the analyzed trajectory onto the leading
        `n_components` (default: all) principal components:
        re-streams the same frames host-side, aligns each to the
        reference, and returns ``(n_frames, n_components)``."""

        if "p_components" not in self.results:
            raise RuntimeError("Call run() before transform().")
        k = (
            self.results.p_components.shape[1]
            if n_components is None
            else int(n_components)
        )
        return self._project_aligned(
            self.results.p_components[:, :k],
            self.results.mean_positions.reshape(-1),
        )


class TICA(_SuperpositionBase):
    r"""Time-lagged independent component analysis of the (aligned)
    coordinates — the slow-collective-motion decomposition
    (Molgedey–Schuster / the pyEMMA ``tica`` analogue; beyond
    reference, like :class:`PrincipalComponentAnalysis` whose
    streaming it extends with a device-resident lag ring).

    With :math:`\mathbf{x}_t` the aligned, flattened ``3N``
    coordinates, TICA solves the symmetrized generalized eigenproblem

    .. math::

       \tfrac{1}{2}\bigl(C_\tau + C_\tau^T\bigr)\,\mathbf{u}
       = \lambda\, C_0\, \mathbf{u},
       \qquad
       C_\tau = \bigl\langle (\mathbf{x}_t - \boldsymbol{\mu})
       (\mathbf{x}_{t+\tau} - \boldsymbol{\mu})^T
       \bigr\rangle_t

    (:math:`\boldsymbol{\mu}` and :math:`C_0` over all analyzed
    frames; :math:`C_\tau` over the :math:`T - \tau` lagged pairs).
    Eigenvalues are autocorrelations of the component projections at
    lag :math:`\tau`, so implied timescales follow as
    :math:`t_i = -\tau\,\Delta t / \ln\lambda_i`.

    TPU-first design: like the
    :class:`~mdhelper_tpu.analysis.structure.IntermediateScatteringFunction`
    ring buffer, the lagged pairs accumulate inside a
    :func:`jax.lax.scan` over the frame axis whose carry holds the
    last ``lag`` aligned frames — the trajectory streams ONCE in
    time order (``_sequential``), with the instantaneous and lagged
    second moments as HIGHEST-precision MXU outer products
    accumulated in float64.  On tunnel-attached TPUs a float64 numpy
    host pipeline computes the identical statistics.

    Parameters are those of :class:`RMSD`, plus:

    lag : `int`, keyword-only, default 1
        Lag :math:`\tau` in analyzed-frame steps.
    rcond : `float`, keyword-only, default 1e-8
        Whitening cutoff: :math:`C_0` eigenvalues below ``rcond``
        times the largest are dropped (rigid-body alignment leaves
        ~6 near-null modes that would otherwise amplify noise).

    Results
    -------
    ``results.eigenvalues``
        Lag-:math:`\tau` autocorrelations :math:`\lambda_i`,
        descending, shape ``(k,)`` (``k`` = retained whitened rank).
    ``results.timescales``
        Implied timescales :math:`-\tau\,\Delta t/\ln\lambda_i` (ps;
        ``inf`` where :math:`\lambda_i \ge 1`, ``nan`` where
        :math:`\lambda_i \le 0`).
    ``results.tica_components``
        Component columns in coordinate space, shape ``(3N, k)``,
        normalized to unit instantaneous variance
        (:math:`\mathbf{u}^T C_0 \mathbf{u} = 1`); sign convention:
        the largest-magnitude entry of each column is positive.
    ``results.mean_positions``
        The aligned average structure, shape ``(N, 3)``.
    ``results.rank``
        Retained whitened rank ``k``.

    Use :meth:`transform` to project a trajectory onto the leading
    components after :meth:`run`.
    """

    _sequential = True

    def __init__(self, group, reference=None, *, lag: int = 1,
                 rcond: float = 1e-8, **kwargs) -> None:
        super().__init__(group, reference, **kwargs)
        if int(lag) < 1:
            raise ValueError("'lag' must be a positive frame count.")
        self._lag = int(lag)
        self._rcond = float(rcond)

    def _prepare(self) -> None:
        from .structure import _check_even_frame_spacing

        self._resolve_reference()
        if self._lag >= self.n_frames:
            raise ValueError(
                f"lag ({self._lag}) must be below the analyzed "
                f"frame count ({self.n_frames})."
            )
        # the lag ring correlates pairs a fixed number of STEPS apart,
        # so the selection must be uniform in time (same guard as the
        # ISF / van Hove rings)
        self._frame_step = _check_even_frame_spacing(self.frames)
        n3 = 3 * len(self._atom_indices)
        self.results.units = (
            {}
            if self._reduced
            else {"results.timescales": ureg.picosecond}
        )
        self._host_pipeline = (
            not getattr(self, "_parallel", False)
            and self._resolve_host_pipeline()
        )
        if self._host_pipeline:
            self._h_ring = np.zeros((self._lag, n3))
            self._h_frame = 0
            self._h_sum = np.zeros(n3)
            self._h_m2 = np.zeros((n3, n3))
            self._h_sum_a = np.zeros(n3)
            self._h_sum_b = np.zeros(n3)
            self._h_mab = np.zeros((n3, n3))
            self._h_pairs = 0
            self._carry = np.zeros(())
            self._prepare_host()
            return

        dtype = jnp.dtype(self._stream_dtype())
        lag = self._lag
        self._carry = {
            "ring": jnp.zeros((lag, n3), dtype),
            "frame": jnp.zeros((), jnp.int64),
            "sum": jnp.zeros(n3, jnp.float64),
            "m2": jnp.zeros((n3, n3), jnp.float64),
            "sum_a": jnp.zeros(n3, jnp.float64),
            "sum_b": jnp.zeros(n3, jnp.float64),
            "mab": jnp.zeros((n3, n3), jnp.float64),
        }
        fit = self._frame_fit_fn()
        hi = jax.lax.Precision.HIGHEST

        def scan_step(carry, inputs):
            x, valid = inputs  # (3N,), scalar mask
            fi = carry["frame"]
            ridx = (fi % lag).astype(jnp.int32)
            a = carry["ring"][ridx]
            ok = ((fi >= lag) & (valid > 0)).astype(jnp.float64)
            v = (valid > 0).astype(jnp.float64)
            xa = x * ok.astype(x.dtype)
            xv = x * v.astype(x.dtype)
            carry = {
                "ring": jnp.where(
                    valid > 0, carry["ring"].at[ridx].set(x),
                    carry["ring"],
                ),
                "frame": fi + (valid > 0),
                "sum": carry["sum"] + xv.astype(jnp.float64),
                "m2": carry["m2"] + jnp.einsum(
                    "i,j->ij", xv, x, precision=hi
                ).astype(jnp.float64),
                "sum_a": carry["sum_a"]
                + (a * ok.astype(a.dtype)).astype(jnp.float64),
                "sum_b": carry["sum_b"] + xa.astype(jnp.float64),
                "mab": carry["mab"] + jnp.einsum(
                    "i,j->ij", a * ok.astype(a.dtype), x,
                    precision=hi,
                ).astype(jnp.float64),
            }
            return carry, None

        def update(carry, positions, dimensions, mask):
            del dimensions
            _, rot, pc = fit(positions)
            aligned = jnp.einsum(
                "bnd,bed->bne", pc, rot, precision=hi
            ).reshape(positions.shape[0], -1)  # (B, 3N)
            carry, _ = jax.lax.scan(scan_step, carry, (aligned, mask))
            return carry

        self._update = jit_update(update)
        self._store_chunk = None

    def _prepare_host(self) -> None:
        w = self._weights
        w_total = self._w_total
        ref = self._ref_centered
        align = self._align
        lag = self._lag

        def host_update(batch) -> None:
            positions = self._host_chunk_positions(batch)
            for f in range(batch.n_real):
                pos = positions[f]
                com = (w[:, None] * pos).sum(axis=0) / w_total
                pc = pos - com
                if align:
                    c = (pc * w[:, None]).T @ ref
                    _, vecs = np.linalg.eigh(_davenport_k(c))
                    rot = _rotation_from_quaternion(vecs[:, -1])
                    pc = pc @ rot.T
                x = pc.reshape(-1)
                fi = self._h_frame
                if fi >= lag:
                    a = self._h_ring[fi % lag]
                    self._h_sum_a += a
                    self._h_sum_b += x
                    self._h_mab += np.outer(a, x)
                    self._h_pairs += 1
                self._h_ring[fi % lag] = x
                self._h_sum += x
                self._h_m2 += np.outer(x, x)
                self._h_frame = fi + 1

        self._host_update_fn = host_update

    def _conclude(self) -> None:
        if self._host_pipeline:
            count = float(self._h_frame)
            pairs = float(self._h_pairs)
            total, m2 = self._h_sum, self._h_m2
            sum_a, sum_b = self._h_sum_a, self._h_sum_b
            mab = self._h_mab
        else:
            count = float(self._carry["frame"])
            pairs = max(count - self._lag, 0.0)
            total = np.asarray(self._carry["sum"])
            m2 = np.asarray(self._carry["m2"])
            sum_a = np.asarray(self._carry["sum_a"])
            sum_b = np.asarray(self._carry["sum_b"])
            mab = np.asarray(self._carry["mab"])
        if pairs < 1:
            raise RuntimeError(
                "No lagged pairs were accumulated (lag >= analyzed "
                "frames)."
            )
        mean = total / count
        c0 = m2 / count - np.outer(mean, mean)
        # C_tau = <(a - mu)(b - mu)^T> over the pair events
        ctau = (
            mab / pairs
            - np.outer(mean, sum_b / pairs)
            - np.outer(sum_a / pairs, mean)
            + np.outer(mean, mean)
        )
        ctau = (ctau + ctau.T) / 2

        # whiten C0 (truncated: alignment leaves near-null modes)
        vals0, vecs0 = np.linalg.eigh(c0)
        keep = vals0 > self._rcond * max(vals0[-1], 0.0)
        if not keep.any():
            raise RuntimeError(
                "The instantaneous covariance has no retained modes "
                "(frozen coordinates?)."
            )
        whiten = vecs0[:, keep] / np.sqrt(vals0[keep])
        m = whiten.T @ ctau @ whiten
        lam, y = np.linalg.eigh((m + m.T) / 2)
        lam, y = lam[::-1], y[:, ::-1]
        comps = whiten @ y  # u^T C0 u = 1 by construction
        peaks = np.argmax(np.abs(comps), axis=0)
        signs = np.sign(comps[peaks, np.arange(comps.shape[1])])
        signs[signs == 0] = 1.0
        comps = comps * signs

        lag_time = self._lag * self._frame_step * self._trajectory.dt
        with np.errstate(divide="ignore", invalid="ignore"):
            timescales = np.where(
                lam >= 1.0,
                np.inf,
                -lag_time / np.log(np.where(lam > 0, lam, np.nan)),
            )
        self.results.eigenvalues = lam
        self.results.timescales = timescales
        self.results.tica_components = comps
        self.results.mean_positions = mean.reshape(-1, 3)
        self.results.rank = comps.shape[1]

    def transform(self, n_components: int = None) -> np.ndarray:
        """Project the analyzed trajectory onto the leading
        `n_components` (default: all retained) independent
        components: re-streams the same frames host-side, aligns
        each to the reference, and returns
        ``(n_frames, n_components)``."""

        if "tica_components" not in self.results:
            raise RuntimeError("Call run() before transform().")
        k = (
            self.results.tica_components.shape[1]
            if n_components is None
            else int(n_components)
        )
        return self._project_aligned(
            self.results.tica_components[:, :k],
            self.results.mean_positions.reshape(-1),
        )
