r"""
Polymer analysis
================

Radius of gyration, end-to-end vector autocorrelation and single-chain
structure factor for homopolymers (reference:
``/root/reference/src/mdhelper/analysis/polymer.py``).

TPU formulation: per-frame chain reductions (COMs, gyration tensors,
end-to-end vectors, per-chain trig sums) are batched einsums /
segment reductions; the single-chain S(q) phase matrix
:math:`\mathbf{q}\cdot\mathbf{r}^T` rides the MXU.  Image-flag
unwrapping runs as a sequential ``lax.scan`` when requested.

Intentional deviation: for ``groupings="residues"`` the monomer count
per chain is derived from the *residue* count (``n_residues //
n_chains``), and monomer masses are residue totals.  The reference
divides the atom count (``polymer.py:107``), which is only correct for
1-atom residues (its test fixtures); both conventions coincide there.
"""

import warnings
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np
from scipy import optimize, special

from .. import Q_, ureg
from ..algorithm.correlation import correlation_fft, correlation_shift
from ..algorithm.topology import unwrap_edge
from ..algorithm.unit import strip_unit
from ..fit.exponential import stretched_exp
from ..ops.scattering import trig_sums_frame
from .base import (
    DynamicAnalysisBase,
    host_unwrap_chunk,
    jit_update,
)
from .structure import _com_positions, _group_segment_ids, _wavevector_grid

__all__ = [
    "calculate_relaxation_time",
    "Gyradius",
    "EndToEndVector",
    "MeanSquareInternalDistance",
    "PersistenceLength",
    "SingleChainStructureFactor",
    "RouseModes",
]


def _sym3_eigvals(S, xp=jnp):
    """Descending eigenvalues of symmetric ``(..., 3, 3)`` matrices
    via the trigonometric closed form — elementwise math only, so it
    lowers on this TPU backend (``jnp.linalg`` LU/QR paths do not).

    `xp` selects the array module (``jnp`` on device, ``np`` in the
    host pipeline).
    """

    q = (S[..., 0, 0] + S[..., 1, 1] + S[..., 2, 2]) / 3.0
    eye = xp.eye(3, dtype=S.dtype)
    A = S - q[..., None, None] * eye
    p2 = (A * A).sum(axis=(-2, -1)) / 6.0
    p = xp.sqrt(xp.maximum(p2, 0.0))
    det = (
        A[..., 0, 0]
        * (A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1])
        - A[..., 0, 1]
        * (A[..., 1, 0] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 0])
        + A[..., 0, 2]
        * (A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0])
    )
    safe = xp.maximum(2.0 * p * p * p, xp.finfo(p2.dtype).tiny)
    r = xp.clip(det / safe, -1.0, 1.0)
    phi = xp.arccos(r) / 3.0
    l1 = q + 2.0 * p * xp.cos(phi)
    l3 = q + 2.0 * p * xp.cos(phi + 2.0 * np.pi / 3.0)
    l2 = 3.0 * q - l1 - l3
    return l1, l2, l3


def _shape_descriptors(S, xp=jnp):
    r"""Gyration-tensor shape invariants of symmetric ``(..., 3, 3)``
    tensors: asphericity :math:`b = \lambda_1 - (\lambda_2 +
    \lambda_3)/2`, acylindricity :math:`c = \lambda_2 - \lambda_3`
    and relative shape anisotropy :math:`\kappa^2 = (b^2 + 3c^2/4) /
    (\lambda_1+\lambda_2+\lambda_3)^2` (Theodorou--Suter
    conventions; :math:`\kappa^2 = 0` for spherical symmetry, 1 for
    a rod)."""

    l1, l2, l3 = _sym3_eigvals(S, xp=xp)
    b = l1 - 0.5 * (l2 + l3)
    c = l2 - l3
    tr = l1 + l2 + l3
    tr2 = xp.maximum(tr * tr, xp.finfo(b.dtype).tiny)
    kappa2 = (b * b + 0.75 * c * c) / tr2
    return b, c, kappa2


def calculate_relaxation_time(
    time: np.ndarray, acf: np.ndarray
) -> float:
    r"""Orientational relaxation time from an end-to-end vector ACF via
    a stretched-exponential fit:

    .. math::

       C_\mathrm{ee}(t) = e^{-(t/\tau)^\beta},\qquad
       \tau_\mathrm{r} = \tau\,\Gamma(1 + 1/\beta)

    Parity: ``analysis/polymer.py:59-108``.
    """

    tau, beta = optimize.curve_fit(
        stretched_exp, time / time[1], acf, bounds=(0, np.inf)
    )[0]
    return tau * time[1] * special.gamma(1 + beta**-1)


class _PolymerAnalysisBase(DynamicAnalysisBase):
    """Chain/monomer bookkeeping shared by the polymer analyses.
    Parity: ``analysis/polymer.py:110-237``."""

    def __init__(
        self,
        groups,
        groupings: Union[str, tuple] = "atoms",
        n_chains=None,
        n_monomers=None,
        *,
        unwrap: bool = False,
        parallel: bool = False,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        self._groups = (
            [groups] if hasattr(groups, "universe") else list(groups)
        )
        self.universe = self._groups[0].universe
        super().__init__(
            self.universe.trajectory, parallel, verbose, **kwargs
        )

        self._dimensions = (
            None
            if self.universe.dimensions is None
            else self.universe.dimensions[:3].copy()
        )

        self._n_groups = len(self._groups)
        valid = {"atoms", "residues"}
        if isinstance(groupings, str):
            if groupings not in valid:
                raise ValueError(
                    f"Invalid grouping '{groupings}'. Valid values: "
                    f"{', '.join(sorted(valid))}."
                )
            self._groupings = self._n_groups * [groupings]
        else:
            if self._n_groups != len(groupings):
                raise ValueError(
                    "The number of grouping values is not equal to the "
                    "number of groups."
                )
            for g in groupings:
                if g not in valid:
                    raise ValueError(
                        f"Invalid grouping '{g}'. Valid values: "
                        f"{', '.join(sorted(valid))}."
                    )
            self._groupings = list(groupings)

        if n_chains is None or n_monomers is None:
            self._internal = True
            self._n_chains = np.empty(self._n_groups, dtype=int)
            self._n_monomers = np.empty_like(self._n_chains)
            for i, (g, gr) in enumerate(
                zip(self._groups, self._groupings)
            ):
                self._n_chains[i] = g.n_segments
                entities = (
                    g.n_atoms if gr == "atoms" else g.n_residues
                )
                self._n_monomers[i] = entities // self._n_chains[i]
        else:
            self._internal = False
            self._n_chains = (
                n_chains * np.ones(self._n_groups, dtype=int)
                if isinstance(n_chains, (int, np.integer))
                else np.asarray(n_chains, dtype=int)
            )
            self._n_monomers = (
                n_monomers * np.ones(self._n_groups, dtype=int)
                if isinstance(n_monomers, (int, np.integer))
                else np.asarray(n_monomers, dtype=int)
            )
            if len(self._n_chains) != self._n_groups or len(
                self._n_monomers
            ) != self._n_groups:
                raise ValueError(
                    "The number of chain/monomer counts must match the "
                    "number of groups."
                )

        self._unwrap = unwrap
        self._sequential = unwrap
        self._verbose = verbose

        # Per-group monomer reduction metadata.
        self._atom_indices = np.concatenate(
            [g.ix for g in self._groups]
        )
        self._sels, self._segs = [], []
        offset = 0
        for g, gr in zip(self._groups, self._groupings):
            self._sels.append(offset + np.arange(g.n_atoms))
            seg, _ = (
                (None, g.n_atoms)
                if gr == "atoms"
                else _group_segment_ids(g, "residues")
            )
            self._segs.append(seg)
            offset += g.n_atoms

    def _monomer_masses(self, i: int) -> np.ndarray:
        """(M, N_p) monomer masses for group i (residue totals when
        grouped by residues)."""

        g = self._groups[i]
        if self._groupings[i] == "atoms":
            masses = g.masses
        else:
            seg, n = _group_segment_ids(g, "residues")
            masses = np.zeros(n)
            np.add.at(masses, seg, g.masses)
        return masses.reshape(self._n_chains[i], self._n_monomers[i])

    def _monomer_positions_fn(self, i: int):
        """Returns a traceable (B, N_sel, 3) -> (B, M, N_p, 3) monomer
        position extractor for group i."""

        sel = jnp.asarray(self._sels[i])
        seg = self._segs[i]
        m = self._n_chains[i]
        n_p = self._n_monomers[i]
        if seg is None:

            def extract(positions):
                return positions[:, sel].reshape(-1, m, n_p, 3)

        else:
            seg = jnp.asarray(seg)
            masses = jnp.asarray(self._groups[i].masses)
            n_entities = m * n_p

            def extract(positions):
                coms = _com_positions(
                    positions[:, sel], masses, seg, n_entities
                )
                return coms.reshape(-1, m, n_p, 3)

        return extract

    # -- host pipeline (tunnel-attached TPUs) ---------------------------
    # The polymer reductions are O(N) einsums whose per-frame results
    # stream to host stores and conclude with host FFT fits, so on a
    # tunnel-attached TPU they run entirely host-side (float64), like
    # the Onsager pipeline (see SerialAnalysisBase._host_pipeline).

    def _resolve_polymer_host(self) -> bool:
        return (
            not getattr(self, "_parallel", False)
            and self._resolve_host_pipeline()
        )

    def _host_monomer_extractor(self, i: int):
        """Numpy mirror of :meth:`_monomer_positions_fn` (float64)."""

        sel = self._sels[i]
        seg = self._segs[i]
        m = int(self._n_chains[i])
        n_p = int(self._n_monomers[i])
        if seg is None:

            def extract(positions):
                return positions[:, sel].reshape(
                    len(positions), m, n_p, 3
                )

        else:
            masses = np.asarray(
                self._groups[i].masses, dtype=np.float64
            )
            n_entities = m * n_p
            mass_sums = np.bincount(
                seg, weights=masses, minlength=n_entities
            )

            def extract(positions):
                pos = positions[:, sel]
                n_frames = len(pos)
                com = np.zeros((n_frames, n_entities, 3))
                np.add.at(
                    com,
                    (np.arange(n_frames)[:, None], seg[None, :]),
                    masses[None, :, None] * pos,
                )
                com /= mass_sums[None, :, None]
                return com.reshape(n_frames, m, n_p, 3)

        return extract

    def _init_host_unwrap(self, ends_only: bool = False) -> None:
        """Per-group (previous frame, image counts) unwrap states
        seeded by the edge-unwrapped first frame (float64)."""

        self.universe.trajectory[int(self.frames[0])]
        states = []
        for i in range(self._n_groups):
            prev = np.asarray(
                self._initial_unwrapped_monomers(i), dtype=np.float64
            )
            if ends_only:
                prev = prev[:, (0, -1)]
            states.append((prev, np.zeros(prev.shape)))
        self._host_states = states

    def _host_unwrap(self, i: int, monomers: np.ndarray) -> np.ndarray:
        box = np.asarray(self._dimensions, dtype=np.float64)
        prev, images = self._host_states[i]
        unwrapped, self._host_states[i] = host_unwrap_chunk(
            monomers, box, prev, images
        )
        return unwrapped

    def _initial_unwrapped_monomers(self, i: int) -> np.ndarray:
        """Edge-unwrapped (M, N_p, 3) monomer positions at the first
        analyzed frame (for seeding image-flag tracking).
        Parity: ``analysis/polymer.py:365-436``."""

        g = self._groups[i]
        m, n_p = self._n_chains[i], self._n_monomers[i]
        if self._internal and self._groupings[i] == "residues":
            whole = unwrap_edge(group=g)
        else:
            chain_starts = n_p * np.arange(m)[:, None]
            offsets = np.arange(n_p - 1)[None, :, None]
            bonds = (
                chain_starts[:, :, None] + offsets + np.arange(2)
            ).reshape(-1, 2)
            whole = unwrap_edge(
                positions=g.positions,
                bonds=bonds,
                dimensions=self._dimensions,
                masses=g.masses,
            )
        if self._groupings[i] == "atoms":
            return whole.reshape(m, n_p, 3)
        seg, n = _group_segment_ids(g, "residues")
        out = np.asarray(
            _com_positions(
                jnp.asarray(whole)[None],
                jnp.asarray(g.masses),
                jnp.asarray(seg),
                n,
            )[0]
        )
        return out.reshape(m, n_p, 3)


def _unwrap_step(box):
    """Image-flag unwrap scan step factory (monomer positions)."""

    def step(carry, inputs):
        pos, valid = inputs
        prev, images = carry
        half = box / 2
        delta = pos - prev
        crossings = jnp.where(
            jnp.abs(delta) >= half, jnp.sign(delta).astype(jnp.int32), 0
        )
        images = jnp.where(valid > 0, images - crossings, images)
        prev = jnp.where(valid > 0, pos, prev)
        return (prev, images), pos + images * box

    return step


class Gyradius(_PolymerAnalysisBase):
    r"""Radius of gyration :math:`R_\mathrm{g}` per chain, averaged
    over chains, per frame.

    Parity: ``analysis/polymer.py:239-508`` — overall or per-axis
    ``components``, optional image-flag ``unwrap`` seeded by an
    edge-unwrap of the first frame.

    Results: ``results.gyradii`` with shape ``(N_g, N_t)`` (or
    ``(N_g, N_t, 3)`` with components).

    ``shape=True`` (beyond reference) additionally computes the
    gyration-tensor shape invariants per chain, averaged over chains
    per frame: ``results.asphericity`` (:math:`b`, Angstrom^2),
    ``results.acylindricity`` (:math:`c`, Angstrom^2) and
    ``results.shape_anisotropy`` (:math:`\kappa^2`, dimensionless —
    0 for spherical symmetry, 1 for a rod), each ``(N_g, N_t)``.
    Eigenvalues come from the closed-form trigonometric solution for
    symmetric 3x3 tensors (device-friendly; no ``linalg`` lowering).
    """

    # store-type checkpointing: the per-frame stores are results
    # arrays (time on axis 1 — same-selection resume restores them
    # whole; a different selection fails the shape check cleanly).
    _checkpointable_stores = True

    def __init__(
        self,
        groups,
        groupings: Union[str, tuple] = "atoms",
        n_chains=None,
        n_monomers=None,
        *,
        components: bool = False,
        shape: bool = False,
        unwrap: bool = False,
        parallel: bool = False,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        super().__init__(
            groups,
            groupings,
            n_chains,
            n_monomers,
            unwrap=unwrap,
            parallel=parallel,
            verbose=verbose,
            **kwargs,
        )
        if shape and components:
            raise ValueError(
                "components and shape are mutually exclusive."
            )
        self._components = components
        self._shape = shape

    def _prepare(self) -> None:
        shape = [self._n_groups, self.n_frames]
        if self._components:
            shape.append(3)
        self.results.gyradii = np.empty(shape)
        self.results.units = {"results.gyradii": ureg.angstrom}
        if self._shape:
            for name in (
                "asphericity", "acylindricity", "shape_anisotropy"
            ):
                self.results[name] = np.empty(
                    (self._n_groups, self.n_frames)
                )
            self.results.units["results.asphericity"] = (
                ureg.angstrom**2
            )
            self.results.units["results.acylindricity"] = (
                ureg.angstrom**2
            )
        self._store_offset = 0

        self._host_pipeline = self._resolve_polymer_host()
        if self._host_pipeline:
            self._prepare_host()
            self._carry = np.zeros(())
            return

        extractors = [
            self._monomer_positions_fn(i) for i in range(self._n_groups)
        ]
        dtype = self._stream_dtype()
        monomer_masses = [
            jnp.asarray(self._monomer_masses(i), dtype=dtype)
            for i in range(self._n_groups)
        ]
        components = self._components
        unwrap = self._unwrap

        if unwrap:
            box = jnp.asarray(self._dimensions, dtype=dtype)
            self.universe.trajectory[int(self.frames[0])]
            prev0 = [
                jnp.asarray(
                    self._initial_unwrapped_monomers(i), dtype=dtype
                )
                for i in range(self._n_groups)
            ]
            images0 = [
                jnp.zeros(p.shape, dtype=jnp.int32) for p in prev0
            ]
            self._carry = (tuple(prev0), tuple(images0))
            step = _unwrap_step(box)
        else:
            self._carry = (jnp.zeros(()), jnp.zeros(()))

        shape_descriptors = self._shape

        def chain_gyradii(monomers, masses):
            """(B, M, N_p, 3), (M, N_p) -> (B,) / (B, 3) / (B, 4)
            chain-mean radii of gyration (+ shape invariants)."""

            total = masses.sum(axis=-1)  # (M,)
            com = jnp.einsum(
                "mp,bmpd->bmd", masses, monomers,
                precision=jax.lax.Precision.HIGHEST,
            ) / total[None, :, None]
            dr = monomers - com[:, :, None, :]
            sq = dr**2
            if components:
                all_sq = sq.sum(axis=-1, keepdims=True)
                ortho = all_sq - sq
                rg = jnp.sqrt(
                    jnp.einsum(
                        "mp,bmpd->bmd", masses, ortho,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    / total[None, :, None]
                )
                return rg.mean(axis=1)
            rg = jnp.sqrt(
                jnp.einsum(
                    "mp,bmpd->bm", masses, sq,
                    precision=jax.lax.Precision.HIGHEST,
                ) / total[None, :]
            )
            if shape_descriptors:
                tensor = jnp.einsum(
                    "mp,bmpd,bmpe->bmde", masses, dr, dr,
                    precision=jax.lax.Precision.HIGHEST,
                ) / total[None, :, None, None]
                b, c, kappa2 = _shape_descriptors(tensor)
                return jnp.stack(
                    (
                        rg.mean(axis=1),
                        b.mean(axis=1),
                        c.mean(axis=1),
                        kappa2.mean(axis=1),
                    ),
                    axis=-1,
                )
            return rg.mean(axis=1)

        if unwrap:

            def update(carry, positions, dimensions, mask):
                del dimensions
                prevs, imagess = carry
                new_prevs, new_imagess, outputs = [], [], []
                for extract, masses, prev, images in zip(
                    extractors, monomer_masses, prevs, imagess
                ):
                    monomers = extract(positions)
                    (prev, images), unwrapped = jax.lax.scan(
                        step, (prev, images), (monomers, mask)
                    )
                    new_prevs.append(prev)
                    new_imagess.append(images)
                    outputs.append(chain_gyradii(unwrapped, masses))
                return (
                    (tuple(new_prevs), tuple(new_imagess)),
                    jnp.stack(outputs, axis=1),
                )

        else:

            def update(carry, positions, dimensions, mask):
                del dimensions, mask
                outputs = [
                    chain_gyradii(extract(positions), masses)
                    for extract, masses in zip(
                        extractors, monomer_masses
                    )
                ]
                return carry, jnp.stack(outputs, axis=1)

        self._update = jax.jit(update)

    def _prepare_host(self) -> None:
        extractors = [
            self._host_monomer_extractor(i)
            for i in range(self._n_groups)
        ]
        masses_list = [
            self._monomer_masses(i).astype(np.float64)
            for i in range(self._n_groups)
        ]
        components = self._components
        if self._unwrap:
            self._init_host_unwrap()

        shape_descriptors = self._shape

        def chain_gyradii(monomers, masses):
            total = masses.sum(axis=-1)
            com = np.einsum(
                "mp,bmpd->bmd", masses, monomers
            ) / total[None, :, None]
            dr = monomers - com[:, :, None, :]
            sq = dr**2
            if components:
                all_sq = sq.sum(axis=-1, keepdims=True)
                ortho = all_sq - sq
                rg = np.sqrt(
                    np.einsum("mp,bmpd->bmd", masses, ortho)
                    / total[None, :, None]
                )
                return rg.mean(axis=1)
            rg = np.sqrt(
                np.einsum("mp,bmpd->bm", masses, sq)
                / total[None, :]
            )
            if shape_descriptors:
                tensor = np.einsum(
                    "mp,bmpd,bmpe->bmde", masses, dr, dr
                ) / total[None, :, None, None]
                b, c, kappa2 = _shape_descriptors(tensor, xp=np)
                return np.stack(
                    (
                        rg.mean(axis=1),
                        b.mean(axis=1),
                        c.mean(axis=1),
                        kappa2.mean(axis=1),
                    ),
                    axis=-1,
                )
            return rg.mean(axis=1)

        def host_update(batch) -> None:
            positions = self._host_chunk_positions(batch)
            outputs = []
            for i, (extract, masses) in enumerate(
                zip(extractors, masses_list)
            ):
                monomers = extract(positions)
                if self._unwrap:
                    monomers = self._host_unwrap(i, monomers)
                outputs.append(chain_gyradii(monomers, masses))
            self._store_chunk(np.stack(outputs, axis=1), batch)

        self._host_update_fn = host_update

    def _store_chunk(self, gyradii, batch) -> None:
        n_real = batch.n_real
        lo = self._store_offset
        block = np.asarray(gyradii)[:n_real]  # (B, G[, 3 | 4])
        block = np.moveaxis(block, 0, 1)  # (G, B[, ...])
        if self._shape:
            self.results.gyradii[:, lo:lo + n_real] = block[..., 0]
            self.results.asphericity[:, lo:lo + n_real] = block[..., 1]
            self.results.acylindricity[:, lo:lo + n_real] = (
                block[..., 2]
            )
            self.results.shape_anisotropy[:, lo:lo + n_real] = (
                block[..., 3]
            )
        else:
            self.results.gyradii[:, lo:lo + n_real] = block
        self._store_offset += n_real

    def _conclude(self) -> None:
        pass


class EndToEndVector(_PolymerAnalysisBase):
    r"""Normalized end-to-end vector autocorrelation function
    :math:`C_\mathrm{ee}(t) = \langle\hat{\mathbf{R}}(t)\cdot
    \hat{\mathbf{R}}(0)\rangle` and the derived orientational
    relaxation time.

    Parity: ``analysis/polymer.py:510-803``.  The end monomers' image
    flags are tracked when ``unwrap=True``; the ACF is evaluated with
    the FFT correlator over (blocks, frames, chains).
    """

    _checkpointable_stores = True

    def _checkpoint_attrs(self) -> tuple:
        return ("_e2e",)

    def __init__(
        self,
        groups,
        groupings: Union[str, tuple] = "atoms",
        n_chains=None,
        n_monomers=None,
        *,
        n_blocks: int = 1,
        dt=None,
        fft: bool = True,
        unwrap: bool = False,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        kwargs.pop("parallel", None)
        super().__init__(
            groups,
            groupings,
            n_chains,
            n_monomers,
            unwrap=unwrap,
            parallel=False,
            verbose=verbose,
            **kwargs,
        )
        self._N_chains = int(self._n_chains.sum())
        self._chain_slices = []
        index = 0
        for m in self._n_chains:
            self._chain_slices.append(slice(index, index + int(m)))
            index += int(m)
        self._n_blocks = n_blocks
        self._dt = strip_unit(dt or self._trajectory.dt, "picosecond")[0]
        self._fft = fft

    def _prepare(self) -> None:
        self._n_frames_block = self.n_frames // self._n_blocks
        self._n_frames = self._n_blocks * self._n_frames_block
        extra = self.n_frames - self._n_frames
        if extra > 0:
            warnings.warn(
                f"The trajectory is not divisible into "
                f"{self._n_blocks:,} blocks, so the last {extra:,} "
                "frame(s) will be discarded."
            )

        df = np.diff(self.frames)
        step = int(df[0]) if len(df) else 1
        self.results.times = (
            step * self._dt * np.arange(self._n_frames_block)
        )
        self.results.units = {"results.times": ureg.picosecond}

        self._e2e = np.empty((self.n_frames, self._N_chains, 3))
        self._store_offset = 0

        self._host_pipeline = self._resolve_polymer_host()
        if self._host_pipeline:
            self._prepare_host()
            self._carry = np.zeros(())
            return

        extractors = [
            self._monomer_positions_fn(i) for i in range(self._n_groups)
        ]
        dtype = self._stream_dtype()
        end_masses = [
            jnp.asarray(
                self._monomer_masses(i)[:, (0, -1)], dtype=dtype
            )
            for i in range(self._n_groups)
        ]
        unwrap = self._unwrap

        if unwrap:
            box = jnp.asarray(self._dimensions, dtype=dtype)
            self.universe.trajectory[int(self.frames[0])]
            prev0 = [
                jnp.asarray(
                    self._initial_unwrapped_monomers(i)[:, (0, -1)],
                    dtype=dtype,
                )
                for i in range(self._n_groups)
            ]
            images0 = [
                jnp.zeros(p.shape, dtype=jnp.int32) for p in prev0
            ]
            self._carry = (tuple(prev0), tuple(images0))
            step_fn = _unwrap_step(box)
        else:
            self._carry = (jnp.zeros(()), jnp.zeros(()))

        def ends_of(extract, positions):
            monomers = extract(positions)  # (B, M, N_p, 3)
            return monomers[:, :, (0, -1), :]  # (B, M, 2, 3)

        if unwrap:

            def update(carry, positions, dimensions, mask):
                del dimensions
                prevs, imagess = carry
                new_prevs, new_imagess, vectors = [], [], []
                for extract, prev, images in zip(
                    extractors, prevs, imagess
                ):
                    ends = ends_of(extract, positions)
                    (prev, images), unwrapped = jax.lax.scan(
                        step_fn, (prev, images), (ends, mask)
                    )
                    new_prevs.append(prev)
                    new_imagess.append(images)
                    vectors.append(
                        unwrapped[:, :, 1] - unwrapped[:, :, 0]
                    )
                return (
                    (tuple(new_prevs), tuple(new_imagess)),
                    jnp.concatenate(vectors, axis=1),
                )

        else:

            def update(carry, positions, dimensions, mask):
                del dimensions, mask
                vectors = [
                    ends_of(extract, positions)[:, :, 1]
                    - ends_of(extract, positions)[:, :, 0]
                    for extract in extractors
                ]
                return carry, jnp.concatenate(vectors, axis=1)

        self._update = jax.jit(update)

    def _prepare_host(self) -> None:
        extractors = [
            self._host_monomer_extractor(i)
            for i in range(self._n_groups)
        ]
        if self._unwrap:
            self._init_host_unwrap(ends_only=True)

        def host_update(batch) -> None:
            positions = self._host_chunk_positions(batch)
            vectors = []
            for i, extract in enumerate(extractors):
                ends = extract(positions)[:, :, (0, -1), :]
                if self._unwrap:
                    ends = self._host_unwrap(i, ends)
                vectors.append(ends[:, :, 1] - ends[:, :, 0])
            self._store_chunk(
                np.concatenate(vectors, axis=1), batch
            )

        self._host_update_fn = host_update

    def _store_chunk(self, vectors, batch) -> None:
        n_real = batch.n_real
        lo = self._store_offset
        self._e2e[lo:lo + n_real] = np.asarray(vectors)[:n_real]
        self._store_offset += n_real

    def _conclude(self) -> None:
        acf_fn = correlation_fft if self._fft else correlation_shift
        self.results.acf = np.empty(
            (self._n_groups, self._n_blocks, self._n_frames_block)
        )
        e2e = self._e2e[:self._n_frames]
        for i, (s, m) in enumerate(
            zip(self._chain_slices, self._n_chains)
        ):
            unit_vectors = e2e[:, s] / np.linalg.norm(
                e2e[:, s], axis=-1, keepdims=True
            )
            self.results.acf[i] = np.asarray(
                acf_fn(
                    unit_vectors.reshape(
                        self._n_blocks, -1, int(m), 3
                    ),
                    average=True,
                    vector=True,
                )
            )

    def calculate_relaxation_time(self) -> None:
        """Stretched-exponential relaxation times per group and block.
        Parity: ``analysis/polymer.py:783-803``."""

        if self.results.acf is None:
            raise RuntimeError(
                "Call EndToEndVector.run() before "
                "EndToEndVector.calculate_relaxation_time()."
            )
        self.results.relaxation_times = np.empty(
            (self._n_groups, self._n_blocks)
        )
        self.results.units["results.relaxation_times"] = ureg.picosecond
        for i, group_acf in enumerate(self.results.acf):
            for j, acf in enumerate(group_acf):
                valid = np.where(acf >= 0)[0]
                self.results.relaxation_times[i, j] = (
                    calculate_relaxation_time(
                        self.results.times[valid], acf[valid]
                    )
                )


class SingleChainStructureFactor(_PolymerAnalysisBase):
    r"""Single-chain structure factor of a homopolymer:

    .. math::

       S_\mathrm{sc}(q) = \frac{1}{MN_p}\left\langle\sum_\mathrm{chains}
       \left[\left(\sum_j \cos\mathbf{q}\cdot\mathbf{r}_j\right)^2
       + \left(\sum_j \sin\mathbf{q}\cdot\mathbf{r}_j\right)^2\right]
       \right\rangle

    Parity: ``analysis/polymer.py:805-1130``.  The per-chain trig sums
    are one phase matmul reshaped to (chains, monomers) and reduced.
    """

    def __init__(
        self,
        group,
        grouping: str = "atoms",
        n_points: int = 32,
        *,
        n_chains: int = None,
        n_monomers: int = None,
        dimensions=None,
        unwrap: bool = False,
        parallel: bool = False,
        precision: str = "auto",
        verbose: bool = True,
        **kwargs,
    ) -> None:
        if precision not in {"auto", "fast", "exact"}:
            raise ValueError(
                "Invalid precision. Valid values: 'auto', 'fast', "
                "'exact'."
            )
        self._precision = precision
        super().__init__(
            group,
            grouping,
            n_chains,
            n_monomers,
            unwrap=unwrap,
            parallel=parallel,
            verbose=verbose,
            **kwargs,
        )
        if dimensions is not None:
            if len(dimensions) != 3:
                raise ValueError("'dimensions' must have length 3.")
            self._dimensions = np.asarray(
                strip_unit(dimensions, "angstrom")[0]
            )
        elif self._dimensions is None:
            raise ValueError("No system dimensions found or provided.")

        self._wavevectors = _wavevector_grid(self._dimensions, n_points)
        self._wavenumbers = np.linalg.norm(self._wavevectors, axis=1)

    def _prepare(self) -> None:
        from .structure import unique_wavenumber_groups

        self.results.wavenumbers, self._q_group = (
            unique_wavenumber_groups(self._wavenumbers)
        )
        self.results.units = {
            "results.wavenumbers": ureg.angstrom**-1
        }
        self._carry_scsf = None

        qs = jnp.asarray(self._wavevectors)
        extract = self._monomer_positions_fn(0)
        m = int(self._n_chains[0])
        n_p = int(self._n_monomers[0])
        unwrap = self._unwrap

        if unwrap:
            dtype = self._stream_dtype()
            box = jnp.asarray(self._dimensions, dtype=dtype)
            self.universe.trajectory[int(self.frames[0])]
            prev0 = jnp.asarray(
                self._initial_unwrapped_monomers(0), dtype=dtype
            )
            images0 = jnp.zeros(prev0.shape, dtype=jnp.int32)
            unwrap_state = (prev0, images0)
            step_fn = _unwrap_step(box)
        else:
            unwrap_state = (jnp.zeros(()), jnp.zeros(()))

        precision = self._precision

        def frame_scsf(monomers):
            """(M, N_p, 3) -> (N_q,) single-chain structure factor
            contribution."""

            prec = precision
            if prec == "auto":
                # Double-float exact phases for float32 coordinates
                # (unwrapped chains drift arbitrarily far from the
                # origin, so float32 phases degrade without bound).
                prec = (
                    "exact"
                    if monomers.dtype == jnp.float32
                    else "fast"
                )
            qs_t = qs.astype(monomers.dtype)  # no f64 phase promotion
            cos, sin = jax.vmap(
                lambda chain: trig_sums_frame(
                    qs_t, chain, precision=prec
                )
            )(monomers)  # (M, N_q) each
            return (cos**2 + sin**2).sum(axis=0)

        def update(carry, positions, dimensions, mask):
            del dimensions
            state, scsf = carry
            monomers = extract(positions)  # (B, M, N_p, 3)
            if unwrap:
                state, monomers = jax.lax.scan(
                    step_fn, state, (monomers, mask)
                )
            contributions = jax.vmap(frame_scsf)(monomers)
            scsf = scsf + (contributions * mask[:, None]).sum(axis=0)
            return (state, scsf)

        self._carry = (
            unwrap_state,
            jnp.zeros(len(self._wavevectors), jnp.float64),
        )
        self._update = jit_update(update)

    def _conclude(self) -> None:
        scsf = np.asarray(self._carry[1]) / (
            self._n_chains[0] * self._n_monomers[0] * self.n_frames
        )
        from .structure import group_mean_last_axis

        self.results.scsf = group_mean_last_axis(
            scsf, self._q_group, len(self.results.wavenumbers)
        )

    def calculate_guinier_radius(
        self, *, q_max_rg: float = 1.3
    ) -> float:
        r"""Radius of gyration from the Guinier regime of
        :math:`S_\mathrm{sc}(q)` (beyond reference),

        .. math::

           \ln S_\mathrm{sc}(q) = \ln S_\mathrm{sc}(0)
           - \frac{q^2 R_\mathrm{g}^2}{3},
           \qquad q R_\mathrm{g} \lesssim 1.3,

        self-consistently: the linear ``ln S`` vs ``q^2`` fit is
        repeated, each pass restricting the window to
        :math:`q R_\mathrm{g} \le` `q_max_rg` with the previous
        pass's :math:`R_\mathrm{g}`, until the window stabilizes.
        The scattering-derived value should match the real-space
        :class:`Gyradius` average for an ideal chain — a standard
        consistency check between reciprocal- and real-space
        analyses.

        Returns
        -------
        guinier_radius : `float`
            :math:`R_\mathrm{g}` (Å), also stored as
            ``results.guinier_radius`` (with the fit window in
            ``results.guinier_fit_q``).
        """

        if getattr(self.results, "scsf", None) is None:
            raise RuntimeError(
                "Call SingleChainStructureFactor.run() before "
                "calculate_guinier_radius()."
            )
        q = np.asarray(self.results.wavenumbers, dtype=np.float64)
        s = np.asarray(self.results.scsf, dtype=np.float64)
        positive = (q > 0) & (s > 0)
        if positive.sum() < 3:
            raise ValueError(
                "Fewer than 3 positive (q, S) points for the "
                "Guinier fit; use a denser wavevector grid."
            )
        window = positive
        rg = None
        converged = False
        for _ in range(20):
            if window.sum() < 3:
                raise ValueError(
                    "The Guinier window collapsed below 3 points "
                    "(q grid too coarse for this chain size); use "
                    "a larger box or denser q grid."
                )
            slope, _ = np.polyfit(
                q[window] ** 2, np.log(s[window]), 1
            )
            if slope >= 0:
                raise ValueError(
                    "ln S(q) does not decay over the fit window; "
                    "no Guinier regime resolved."
                )
            new_rg = float(np.sqrt(-3.0 * slope))
            new_window = positive & (q * new_rg <= q_max_rg)
            stable = rg is not None and (
                abs(new_rg - rg) <= 1e-10 * rg
                or (new_window == window).all()
            )
            rg, window = new_rg, new_window
            if stable:
                converged = True
                break
        if not converged:
            warnings.warn(
                "The Guinier window iteration did not converge in "
                "20 passes (the q grid straddles the q*Rg cutoff); "
                "returning the last iterate — inspect "
                "results.guinier_fit_q before trusting the fit."
            )
        self.results.guinier_radius = rg
        self.results.guinier_fit_q = q[window]
        units = getattr(self.results, "units", None)
        if units is not None:
            units["results.guinier_radius"] = ureg.angstrom
        return rg


class RouseModes(_PolymerAnalysisBase):
    r"""Rouse normal-mode amplitudes, autocorrelations, and relaxation
    times for linear homopolymer chains.

    .. math::

       \mathbf{X}_p(t) = \frac{1}{N_\mathrm{p}}\sum_{n=0}^{N_\mathrm{p}-1}
       \mathbf{r}_n(t)\cos\left[\frac{p\pi}{N_\mathrm{p}}
       \left(n + \tfrac{1}{2}\right)\right]

    (the discrete Rouse modes of Doi & Edwards for a bead chain with
    free ends).  For an ideal Rouse chain the mode autocorrelations
    decay as :math:`\exp(-t/\tau_p)` with :math:`\tau_p \propto
    \sin^{-2}(p\pi/2N_\mathrm{p})`, and the mean-square amplitudes obey
    :math:`\langle X_p^2\rangle \propto \sin^{-2}(p\pi/2N_\mathrm{p})`.

    This analysis has no counterpart in the reference package (the
    benchmark suite requests it alongside the polymer analyses in
    ``analysis/polymer.py``); the API follows
    :class:`EndToEndVector`.  TPU formulation: the mode transform is a
    static ``(n_modes, N_p)`` cosine matrix contracted against the
    ``(B, M, N_p, 3)`` monomer batch in a single einsum (MXU), with the
    optional image-flag unwrap running as a :func:`jax.lax.scan` carry
    shared across streamed chunks.

    Parameters
    ----------
    groups : `AtomGroup` or array-like
        Group(s) of polymer atoms.
    groupings : `str` or array-like, default ``"atoms"``
        ``"atoms"`` (every atom a bead) or ``"residues"`` (residue COM
        beads).
    n_chains, n_monomers : `int` or array-like, optional
        Chain topology per group (inferred from residues when omitted).
    n_modes : `int`, keyword-only, optional
        Number of modes :math:`p = 1, \ldots, n_\mathrm{modes}` to
        keep (default: ``n_monomers - 1``, the full spectrum).  Mode 0
        (the chain center of mass) is excluded from ACFs since it does
        not relax.
    n_blocks : `int`, keyword-only, default 1
        Independent trajectory blocks for error estimation.
    dt : `float`, keyword-only, optional
        Time between frames (defaults to the trajectory's ``dt``).
    fft : `bool`, keyword-only, default True
        Wiener–Khinchin FFT autocorrelation (vs direct shift sum).
    unwrap : `bool`, keyword-only, default True
        Unwrap monomer positions across boundaries (required for
        physically meaningful modes; disable only for pre-unwrapped
        trajectories).

    Results
    -------
    results.times : `numpy.ndarray`
        Lag times, shape ``(N_t/n_blocks,)``.
    results.acf : `numpy.ndarray`
        Normalized mode autocorrelations
        :math:`\langle\mathbf{X}_p(t)\cdot\mathbf{X}_p(0)\rangle /
        \langle X_p^2\rangle`, shape
        ``(N_g, n_modes, n_blocks, N_t/n_blocks)``.
    results.mean_square_amplitudes : `numpy.ndarray`
        :math:`\langle X_p^2\rangle` per group and mode, shape
        ``(N_g, n_modes)``.
    """

    def __init__(
        self,
        groups,
        groupings: Union[str, tuple] = "atoms",
        n_chains=None,
        n_monomers=None,
        *,
        n_modes: int = None,
        n_blocks: int = 1,
        dt=None,
        fft: bool = True,
        unwrap: bool = True,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        kwargs.pop("parallel", None)
        super().__init__(
            groups,
            groupings,
            n_chains,
            n_monomers,
            unwrap=unwrap,
            parallel=False,
            verbose=verbose,
            **kwargs,
        )
        max_modes = int(self._n_monomers.min()) - 1
        if n_modes is None:
            n_modes = max_modes
        if not 1 <= n_modes <= max_modes:
            raise ValueError(
                f"'n_modes' must be between 1 and {max_modes} "
                "(n_monomers - 1)."
            )
        self._n_modes = int(n_modes)
        self._n_blocks = n_blocks
        self._dt = strip_unit(dt or self._trajectory.dt, "picosecond")[0]
        self._fft = fft

    def _mode_matrix(self, i: int) -> np.ndarray:
        """(n_modes, N_p) cosine transform matrix for group i."""

        n_p = int(self._n_monomers[i])
        p = np.arange(1, self._n_modes + 1)[:, None]
        n = np.arange(n_p)[None, :] + 0.5
        return np.cos(p * np.pi * n / n_p) / n_p

    def _prepare(self) -> None:
        self._n_frames_block = self.n_frames // self._n_blocks
        self._n_frames = self._n_blocks * self._n_frames_block
        extra = self.n_frames - self._n_frames
        if extra > 0:
            warnings.warn(
                f"The trajectory is not divisible into "
                f"{self._n_blocks:,} blocks, so the last {extra:,} "
                "frame(s) will be discarded."
            )

        df = np.diff(self.frames)
        step = int(df[0]) if len(df) else 1
        self.results.times = (
            step * self._dt * np.arange(self._n_frames_block)
        )
        self.results.units = {"results.times": ureg.picosecond}

        # Host store of per-frame mode amplitudes, (N_t, G, M_max?, ...)
        # kept per group because chain counts can differ.
        self._amps = [
            np.empty(
                (self.n_frames, int(m), self._n_modes, 3)
            )
            for m in self._n_chains
        ]
        self._store_offset = 0

        self._host_pipeline = self._resolve_polymer_host()
        if self._host_pipeline:
            self._prepare_host()
            self._carry = np.zeros(())
            return

        extractors = [
            self._monomer_positions_fn(i) for i in range(self._n_groups)
        ]
        dtype = self._stream_dtype()
        mode_mats = [
            jnp.asarray(self._mode_matrix(i), dtype=dtype)
            for i in range(self._n_groups)
        ]
        unwrap = self._unwrap

        if unwrap:
            box = jnp.asarray(self._dimensions, dtype=dtype)
            self.universe.trajectory[int(self.frames[0])]
            prev0 = [
                jnp.asarray(
                    self._initial_unwrapped_monomers(i), dtype=dtype
                )
                for i in range(self._n_groups)
            ]
            images0 = [
                jnp.zeros(p.shape, dtype=jnp.int32) for p in prev0
            ]
            self._carry = (tuple(prev0), tuple(images0))
            step_fn = _unwrap_step(box)

            def update(carry, positions, dimensions, mask):
                del dimensions
                prevs, imagess = carry
                new_prevs, new_imagess, amps = [], [], []
                for extract, mat, prev, images in zip(
                    extractors, mode_mats, prevs, imagess
                ):
                    monomers = extract(positions)  # (B, M, N_p, 3)
                    (prev, images), unwrapped = jax.lax.scan(
                        step_fn, (prev, images), (monomers, mask)
                    )
                    new_prevs.append(prev)
                    new_imagess.append(images)
                    amps.append(
                        jnp.einsum(
                            "pn,bmnd->bmpd", mat, unwrapped,
                            precision=jax.lax.Precision.HIGHEST,
                        )
                    )
                return (tuple(new_prevs), tuple(new_imagess)), amps

        else:
            self._carry = (jnp.zeros(()), jnp.zeros(()))

            def update(carry, positions, dimensions, mask):
                del dimensions, mask
                amps = [
                    jnp.einsum(
                        "pn,bmnd->bmpd", mat, extract(positions),
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    for extract, mat in zip(extractors, mode_mats)
                ]
                return carry, amps

        self._update = jax.jit(update)

    def _prepare_host(self) -> None:
        extractors = [
            self._host_monomer_extractor(i)
            for i in range(self._n_groups)
        ]
        mode_mats = [
            self._mode_matrix(i) for i in range(self._n_groups)
        ]
        if self._unwrap:
            self._init_host_unwrap()

        def host_update(batch) -> None:
            positions = self._host_chunk_positions(batch)
            amps = []
            for i, (extract, mat) in enumerate(
                zip(extractors, mode_mats)
            ):
                monomers = extract(positions)
                if self._unwrap:
                    monomers = self._host_unwrap(i, monomers)
                amps.append(
                    np.einsum("pn,bmnd->bmpd", mat, monomers)
                )
            self._store_chunk(amps, batch)

        self._host_update_fn = host_update

    def _store_chunk(self, amps, batch) -> None:
        n_real = batch.n_real
        lo = self._store_offset
        for store, amp in zip(self._amps, amps):
            store[lo:lo + n_real] = np.asarray(amp)[:n_real]
        self._store_offset += n_real

    def _conclude(self) -> None:
        acf_fn = correlation_fft if self._fft else correlation_shift
        self.results.acf = np.empty(
            (
                self._n_groups,
                self._n_modes,
                self._n_blocks,
                self._n_frames_block,
            )
        )
        self.results.mean_square_amplitudes = np.empty(
            (self._n_groups, self._n_modes)
        )
        for i, store in enumerate(self._amps):
            amps = store[:self._n_frames]  # (N_t, M, P, 3)
            self.results.mean_square_amplitudes[i] = (
                (amps**2).sum(axis=-1).mean(axis=(0, 1))
            )
            for p in range(self._n_modes):
                x = amps[:, :, p].reshape(
                    self._n_blocks, self._n_frames_block, -1, 3
                )
                acf = np.asarray(
                    acf_fn(x, average=True, vector=True)
                )
                self.results.acf[i, p] = acf / acf[..., (0,)]

    def calculate_relaxation_time(self) -> None:
        r"""Per-mode stretched-exponential relaxation times
        :math:`\tau_p`; shape ``(N_g, n_modes, n_blocks)`` in
        ``results.relaxation_times``."""

        if self.results.acf is None:
            raise RuntimeError(
                "Call RouseModes.run() before "
                "RouseModes.calculate_relaxation_time()."
            )
        self.results.relaxation_times = np.empty(
            (self._n_groups, self._n_modes, self._n_blocks)
        )
        self.results.units["results.relaxation_times"] = ureg.picosecond
        for i in range(self._n_groups):
            for p in range(self._n_modes):
                for j, acf in enumerate(self.results.acf[i, p]):
                    valid = np.where(acf >= 0)[0]
                    self.results.relaxation_times[i, p, j] = (
                        calculate_relaxation_time(
                            self.results.times[valid], acf[valid]
                        )
                    )


class PersistenceLength(_PolymerAnalysisBase):
    r"""Bond-vector orientational correlation along chain contour and
    the persistence length (beyond reference; parity target:
    ``MDAnalysis.analysis.polymer.PersistenceLength``).

    For each chain the normalized bond vectors :math:`\hat{u}_i
    \propto \mathbf{r}_{i+1} - \mathbf{r}_i` form the contour
    correlation.  With ``unwrap=False`` (default) bonds are folded by
    the minimum image — exact for ``groupings="atoms"`` where a bond
    never spans more than half a box.  With ``groupings="residues"``
    on a wrapped trajectory a boundary-straddling residue's COM lands
    mid-box and no per-bond fold can repair it — pass ``unwrap=True``
    to unwrap monomer positions (image-flag scan seeded by an
    edge-unwrap of the first frame, as in :class:`Gyradius`) before
    the bonds are formed.

    .. math::

       C(s) = \langle \hat{u}_i \cdot \hat{u}_{i+s}
       \rangle_{i,\,\mathrm{chains},\,t},

    from which the persistence length follows by the exponential-decay
    fit :math:`C(s) = e^{-s\,\bar{l}_b / l_p}` with :math:`\bar{l}_b`
    the mean bond length.

    TPU formulation: the per-frame work is one Gram-matrix einsum
    ``(M, N_b, 3) x (M, N_b, 3) -> (N_b, N_b)`` per group on the MXU;
    the contour average over the :math:`i` diagonal offsets happens at
    conclusion on the host.  The accumulation is order-independent, so
    ``parallel=True`` frame sharding is supported.

    Parameters
    ----------
    groups : `AtomGroup` or array-like
        Polymer groups, one per chain type.
    groupings : `str` or array-like, keyword-only, default "atoms"
        ``"atoms"`` or ``"residues"`` (monomers = residue COMs).
    n_chains, n_monomers : `int` or array-like, optional
        Explicit chain/monomer counts when the universe carries no
        segment information.
    unwrap : `bool`, keyword-only, default False
        Unwrap monomer positions before forming bonds (required for
        ``groupings="residues"`` on wrapped trajectories; forces
        sequential streaming).
    parallel : `bool`, keyword-only, default False
        Shard frame batches over the device mesh.

    Results
    -------
    ``results.bond_acf``
        List (per group) of contour correlations :math:`C(s)`,
        each of length ``n_monomers - 1`` with :math:`C(0) = 1`.
    ``results.bond_lengths``
        Mean bond length :math:`\bar{l}_b` per group (Angstrom).
    ``results.persistence_lengths``, ``results.fit``
        (after :meth:`calculate_persistence_length`) fitted
        :math:`l_p` per group and the fitted curves.
    """

    def __init__(
        self,
        groups,
        groupings: Union[str, tuple] = "atoms",
        n_chains=None,
        n_monomers=None,
        *,
        unwrap: bool = False,
        parallel: bool = False,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        super().__init__(
            groups,
            groupings,
            n_chains,
            n_monomers,
            unwrap=unwrap,
            parallel=parallel,
            verbose=verbose,
            **kwargs,
        )
        if (self._n_monomers < 3).any():
            raise ValueError(
                "PersistenceLength needs chains of at least 3 "
                "monomers (2 bonds)."
            )
        if unwrap and (
            self._dimensions is None
            or not (np.asarray(self._dimensions) > 0).all()
        ):
            raise ValueError(
                "unwrap=True requires a universe with box dimensions."
            )
        self._setup_periodic_box()

    def _prepare(self) -> None:
        self.results.units = {
            "results.bond_lengths": ureg.angstrom,
        }
        self._carry = {
            "frames": jnp.zeros((), dtype=jnp.float64),
            "gram": tuple(
                jnp.zeros(
                    (int(n_p) - 1, int(n_p) - 1), dtype=jnp.float64
                )
                for n_p in self._n_monomers
            ),
            "blen": tuple(
                jnp.zeros((), dtype=jnp.float64)
                for _ in range(self._n_groups)
            ),
        }

        self._host_pipeline = self._resolve_polymer_host()
        if self._host_pipeline:
            # The streaming driver threads (and re-assigns) the carry
            # itself, so host-pipeline accumulation lives in a
            # dedicated attribute and the carry is a passthrough.
            self._host_state = {
                "frames": 0.0,
                "gram": [
                    np.zeros((int(n_p) - 1, int(n_p) - 1))
                    for n_p in self._n_monomers
                ],
                "blen": [0.0] * self._n_groups,
            }
            self._carry = np.zeros(())
            self._prepare_host()
            return

        from ..ops.histogram import _min_image_vectors

        extractors = [
            self._monomer_positions_fn(i) for i in range(self._n_groups)
        ]
        hi = jax.lax.Precision.HIGHEST

        def gram_blen(vectors, mask, gram0, blen0):
            """(B, M, N_b, 3) bond vectors -> accumulated Gram matrix
            and summed bond length."""
            norms = jnp.sqrt(
                jnp.maximum(
                    (vectors * vectors).sum(axis=-1),
                    jnp.finfo(vectors.dtype).tiny,
                )
            )  # (B, M, N_b)
            unit = vectors / norms[..., None]
            w = mask.astype(vectors.dtype)
            gram = jnp.einsum(
                "b,bmia,bmja->ij", w, unit, unit, precision=hi
            )
            blen = (norms * w[:, None, None]).sum()
            return (
                gram0 + gram.astype(jnp.float64),
                blen0 + blen.astype(jnp.float64),
            )

        if self._unwrap:
            dtype = self._stream_dtype()
            box = jnp.asarray(self._dimensions, dtype=dtype)
            self.universe.trajectory[int(self.frames[0])]
            prev0 = tuple(
                jnp.asarray(
                    self._initial_unwrapped_monomers(i), dtype=dtype
                )
                for i in range(self._n_groups)
            )
            images0 = tuple(
                jnp.zeros(p.shape, dtype=jnp.int32) for p in prev0
            )
            self._carry["unwrap"] = (prev0, images0)
            step = _unwrap_step(box)

            def update(carry, positions, dimensions, mask):
                del dimensions
                prevs, imagess = carry["unwrap"]
                grams, blens = [], []
                new_prevs, new_imagess = [], []
                for extract, gram0, blen0, prev, images in zip(
                    extractors,
                    carry["gram"],
                    carry["blen"],
                    prevs,
                    imagess,
                ):
                    monomers = extract(positions)  # (B, M, N_p, 3)
                    (prev, images), unwrapped = jax.lax.scan(
                        step, (prev, images), (monomers, mask)
                    )
                    new_prevs.append(prev)
                    new_imagess.append(images)
                    bonds = (
                        unwrapped[:, :, 1:] - unwrapped[:, :, :-1]
                    )
                    gram, blen = gram_blen(bonds, mask, gram0, blen0)
                    grams.append(gram)
                    blens.append(blen)
                frames = carry["frames"] + mask.sum().astype(
                    jnp.float64
                )
                return {
                    "frames": frames,
                    "gram": tuple(grams),
                    "blen": tuple(blens),
                    "unwrap": (tuple(new_prevs), tuple(new_imagess)),
                }

        else:
            frame_boxes = self._frame_boxes

            def update(carry, positions, dimensions, mask):
                boxes = frame_boxes(dimensions)
                grams, blens = [], []
                for extract, gram0, blen0 in zip(
                    extractors, carry["gram"], carry["blen"]
                ):
                    monomers = extract(positions)  # (B, M, N_p, 3)
                    bonds = monomers[:, :, 1:] - monomers[:, :, :-1]
                    vectors = jax.vmap(_min_image_vectors)(
                        bonds, boxes.astype(bonds.dtype)
                    )
                    gram, blen = gram_blen(
                        vectors, mask, gram0, blen0
                    )
                    grams.append(gram)
                    blens.append(blen)
                frames = carry["frames"] + mask.sum().astype(
                    jnp.float64
                )
                return {
                    "frames": frames,
                    "gram": tuple(grams),
                    "blen": tuple(blens),
                }

        self._update = jit_update(update)

    def _prepare_host(self) -> None:
        from ..algorithm.topology import minimize_vectors

        extractors = [
            self._host_monomer_extractor(i)
            for i in range(self._n_groups)
        ]
        if self._unwrap:
            self._init_host_unwrap()

        def accumulate(state, i, v) -> None:
            norms = np.maximum(
                np.linalg.norm(v, axis=-1),
                np.finfo(v.dtype).tiny,
            )
            unit = v / norms[..., None]
            state["gram"][i] += np.einsum("mia,mja->ij", unit, unit)
            state["blen"][i] += norms.sum()

        def host_update(batch) -> None:
            positions = self._host_chunk_positions(batch)
            dims_all = np.asarray(
                batch.host_dimensions[: batch.n_real],
                dtype=np.float64,
            )
            state = self._host_state
            for i, extract in enumerate(extractors):
                monomers = extract(positions)  # (B, M, N_p, 3)
                if self._unwrap:
                    monomers = self._host_unwrap(i, monomers)
                    bonds = monomers[:, :, 1:] - monomers[:, :, :-1]
                    for f in range(batch.n_real):
                        accumulate(state, i, bonds[f])
                else:
                    bonds = monomers[:, :, 1:] - monomers[:, :, :-1]
                    for f in range(batch.n_real):
                        accumulate(
                            state,
                            i,
                            np.asarray(
                                minimize_vectors(
                                    bonds[f], dims_all[f]
                                )
                            ),
                        )
            state["frames"] += float(batch.n_real)

        self._host_update_fn = host_update

    def _conclude(self) -> None:
        carry = (
            self._host_state if self._host_pipeline else self._carry
        )
        frames = float(np.asarray(carry["frames"]))
        self.results.bond_acf = []
        self.results.bond_lengths = np.empty(self._n_groups)
        for i in range(self._n_groups):
            gram = np.asarray(carry["gram"][i], dtype=np.float64)
            m = float(self._n_chains[i])
            n_b = gram.shape[0]
            samples = frames * m
            acf = np.array(
                [
                    np.trace(gram, offset=s) / ((n_b - s) * samples)
                    for s in range(n_b)
                ]
            )
            self.results.bond_acf.append(acf)
            self.results.bond_lengths[i] = (
                float(np.asarray(carry["blen"][i]))
                / (samples * n_b)
            )

    def calculate_persistence_length(self) -> None:
        r"""Fit :math:`C(s) = e^{-s\,\bar{l}_b / l_p}` per group,
        storing ``results.persistence_lengths`` (Angstrom) and the
        fitted curves in ``results.fit``."""

        if getattr(self.results, "bond_acf", None) is None:
            raise RuntimeError(
                "Call PersistenceLength.run() before "
                "PersistenceLength.calculate_persistence_length()."
            )
        self.results.persistence_lengths = np.empty(self._n_groups)
        self.results.fit = []
        self.results.units["results.persistence_lengths"] = (
            ureg.angstrom
        )
        for i, acf in enumerate(self.results.bond_acf):
            lb = self.results.bond_lengths[i]
            x = lb * np.arange(len(acf))
            # fit only the leading positive run: the noisy,
            # sign-flipping tail of short/flexible chains otherwise
            # dominates the least squares
            negative = np.where(acf <= 0)[0]
            stop = int(negative[0]) if len(negative) else len(acf)
            stop = max(stop, 2)
            (lp,), _ = optimize.curve_fit(
                lambda s, lp: np.exp(-s / lp),
                x[:stop],
                acf[:stop],
                p0=max(lb, 1e-3),
                bounds=(1e-12, np.inf),
            )
            self.results.persistence_lengths[i] = lp
            self.results.fit.append(np.exp(-x / lp))


class MeanSquareInternalDistance(_PolymerAnalysisBase):
    r"""Mean-square internal distances along the chain contour
    (beyond reference; the standard polymer-melt equilibration
    diagnostic — Auhl et al., *J. Chem. Phys.* **119**, 12718 (2003)):

    .. math::

       \mathrm{MSID}(s) = \left\langle
       \left|\mathbf{r}_{i+s} - \mathbf{r}_i\right|^2
       \right\rangle_{i,\,\mathrm{chains},\,t},
       \qquad s = 1, \ldots, N_\mathrm{p} - 1.

    A well-equilibrated ideal melt shows a flat
    :math:`\mathrm{MSID}(s)/s` plateau at :math:`C_\infty
    \bar{l}_b^2`; over-compressed starting states dip at
    intermediate :math:`s`.

    TPU formulation: each chain is made whole *per frame* by a
    chain walk — minimum-image folding of every consecutive bond
    followed by a cumulative sum — so no sequential unwrap carry is
    needed (frames may shard, ``parallel=True``).  The chunk update
    accumulates one chain-centered Gram matrix
    :math:`G_{ij} = \sum \mathbf{r}_i \cdot \mathbf{r}_j` per group
    on the MXU (HIGHEST precision, float64 carry) plus the squared
    norms :math:`A_i`; the conclusion reads
    :math:`\mathrm{MSID}(s)` off the offset-:math:`s` diagonals,
    :math:`A_i + A_{i+s} - 2 G_{i,i+s}`.  Bond folding goes through
    the shared per-frame minimum-image helpers (orthorhombic and
    triclinic cells, per-frame NPT boxes, per-axis aperiodic
    zero-length dimensions), so the chain walk is exact whenever
    every *bond* (not the internal distance itself) is shorter than
    half the box — the usual bonded minimum-image contract;
    pre-unwrapped or box-less coordinates pass through unchanged.

    Parameters
    ----------
    groups : `AtomGroup` or array-like
        Polymer groups, one per chain type.
    groupings : `str` or array-like, default :code:`"atoms"`
        ``"atoms"`` or ``"residues"`` (monomers = residue COMs).
    n_chains, n_monomers : `int` or array-like, optional
        Explicit chain/monomer counts when the universe carries no
        segment information.
    parallel : `bool`, keyword-only, default :code:`False`
        Shard frame batches over the device mesh.

    Results
    -------
    ``results.separations``
        Contour separations ``1 .. n_monomers - 1``: an
        ``(N_g, N_p - 1)`` array when all groups share a chain
        length, else a list of per-group arrays.
    ``results.msid``
        Mean-square internal distances (Angstrom^2), same shape.
    """

    def __init__(
        self,
        groups,
        groupings: Union[str, tuple] = "atoms",
        n_chains=None,
        n_monomers=None,
        *,
        parallel: bool = False,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        super().__init__(
            groups,
            groupings,
            n_chains,
            n_monomers,
            unwrap=False,
            parallel=parallel,
            verbose=verbose,
            **kwargs,
        )
        if (self._n_monomers < 2).any():
            raise ValueError(
                "MeanSquareInternalDistance needs chains of at "
                "least 2 monomers."
            )
        self._setup_periodic_box()

    def _prepare(self) -> None:
        self.results.units = {"results.msid": ureg.angstrom**2}
        self._carry = {
            "gram": tuple(
                jnp.zeros(
                    (int(n_p), int(n_p)), dtype=jnp.float64
                )
                for n_p in self._n_monomers
            ),
            "auto": tuple(
                jnp.zeros((int(n_p),), dtype=jnp.float64)
                for n_p in self._n_monomers
            ),
        }

        self._host_pipeline = self._resolve_polymer_host()
        if self._host_pipeline:
            self._host_state = {
                "gram": [
                    np.zeros((int(n_p), int(n_p)))
                    for n_p in self._n_monomers
                ],
                "auto": [
                    np.zeros(int(n_p)) for n_p in self._n_monomers
                ],
            }
            self._carry = np.zeros(())
            self._prepare_host()
            return

        from ..ops.histogram import _min_image_vectors

        extractors = [
            self._monomer_positions_fn(i)
            for i in range(self._n_groups)
        ]
        frame_boxes = self._frame_boxes
        hi = jax.lax.Precision.HIGHEST

        def walk_center(monomers, box):
            """(B, M, P, 3) wrapped monomers + per-frame boxes ->
            chain-centered whole chains via the bond-fold cumulative
            sum (shared min-image helpers: orthorhombic, triclinic,
            per-axis aperiodic zero lengths)."""

            bonds = monomers[..., 1:, :] - monomers[..., :-1, :]
            folded = jax.vmap(
                lambda v, bx: _min_image_vectors(
                    v.reshape(-1, 3), bx.astype(v.dtype)
                )
            )(bonds, box).reshape(bonds.shape)
            internal = jnp.concatenate(
                [
                    jnp.zeros_like(monomers[..., :1, :]),
                    jnp.cumsum(folded, axis=-2),
                ],
                axis=-2,
            )
            return internal - internal.mean(axis=-2, keepdims=True)

        def update(carry, positions, dimensions, mask):
            box = frame_boxes(dimensions)
            grams, autos = [], []
            for extract, gram0, auto0 in zip(
                extractors, carry["gram"], carry["auto"]
            ):
                monomers = extract(positions)
                x = walk_center(monomers, box)
                w = mask.astype(x.dtype)
                gram = jnp.einsum(
                    "b,bmid,bmjd->ij", w, x, x, precision=hi
                )
                a2 = ((x * x).sum(axis=-1) * w[:, None, None]).sum(
                    axis=(0, 1)
                )
                grams.append(gram0 + gram.astype(jnp.float64))
                autos.append(auto0 + a2.astype(jnp.float64))
            return {"gram": tuple(grams), "auto": tuple(autos)}

        self._update = jax.jit(update)

    def _prepare_host(self) -> None:
        from ..algorithm.topology import minimize_vectors

        extractors = [
            self._host_monomer_extractor(i)
            for i in range(self._n_groups)
        ]

        def host_update(batch) -> None:
            positions = self._host_chunk_positions(batch)
            n_real = batch.n_real
            dims_all = np.asarray(
                batch.host_dimensions[:n_real], dtype=np.float64
            )
            for i, extract in enumerate(extractors):
                monomers = extract(positions)[:n_real]
                bonds = np.diff(monomers, axis=-2)
                shape = bonds.shape
                bonds = np.stack(
                    [
                        np.asarray(
                            minimize_vectors(
                                bonds[f].reshape(-1, 3),
                                dims_all[f],
                            )
                        ).reshape(shape[1:])
                        for f in range(n_real)
                    ]
                )
                internal = np.concatenate(
                    [
                        np.zeros_like(monomers[..., :1, :]),
                        np.cumsum(bonds, axis=-2),
                    ],
                    axis=-2,
                )
                x = internal - internal.mean(
                    axis=-2, keepdims=True
                )
                self._host_state["gram"][i] += np.einsum(
                    "bmid,bmjd->ij", x, x
                )
                self._host_state["auto"][i] += (
                    (x * x).sum(axis=-1).sum(axis=(0, 1))
                )

        self._host_update_fn = host_update

    def _conclude(self) -> None:
        state = (
            self._host_state
            if self._host_pipeline
            else self._carry
        )
        separations, msids = [], []
        for i in range(self._n_groups):
            n_p = int(self._n_monomers[i])
            m = int(self._n_chains[i])
            gram = np.asarray(state["gram"][i], dtype=np.float64)
            auto = np.asarray(state["auto"][i], dtype=np.float64)
            weight = float(self.n_frames) * m
            prefix = np.cumsum(auto)
            total = prefix[-1]
            s = np.arange(1, n_p)
            head = np.flip(prefix[: n_p - 1])  # sum_{i<=P-1-s} A_i
            tail = total - prefix[: n_p - 1]   # sum_{i>=s} A_i
            diag = np.array(
                [np.trace(gram, offset=k) for k in range(1, n_p)]
            )
            msid = (head + tail - 2.0 * diag) / (
                weight * (n_p - s)
            )
            separations.append(s)
            msids.append(msid)
        if len(set(map(int, self._n_monomers))) == 1:
            self.results.separations = np.stack(separations)
            self.results.msid = np.stack(msids)
        else:
            self.results.separations = separations
            self.results.msid = msids
