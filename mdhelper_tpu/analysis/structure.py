r"""
Bulk structural analysis
========================

Radial distribution functions, static structure factors and
intermediate scattering functions (reference:
``/root/reference/src/mdhelper/analysis/structure.py``), rebuilt on the
TPU streaming runtime: per-frame Python loops become mask-weighted
batched kernels (:mod:`mdhelper_tpu.ops.histogram`,
:mod:`mdhelper_tpu.ops.scattering`) folded over sharded frame chunks.
"""

import warnings
from numbers import Real
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import simpson
from scipy.signal import argrelextrema
from scipy.special import jv

from .. import Q_, ureg
from ..algorithm.unit import strip_unit
from itertools import combinations_with_replacement

from ..algorithm.topology import triclinic_matrices
from ..algorithm.utility import get_closest_factors
from ..ops.histogram import (
    _bin_distances,
    _min_image_distance,
    displacement_histogram_frame,
    radial_histogram_batch,
    radial_histogram_frame,
)
from ..ops.scattering import trig_sums_frame
from .base import (
    DynamicAnalysisBase,
    NumbaAnalysisBase,
    SerialAnalysisBase,
    jit_update,
)

__all__ = [
    "radial_histogram",
    "zeroth_order_hankel_transform",
    "radial_fourier_transform",
    "calculate_coordination_numbers",
    "calculate_structure_factor",
    "RadialDistributionFunction",
    "StructureFactor",
    "IntermediateScatteringFunction",
    "VanHoveFunction",
]


def radial_histogram(
    pos1: np.ndarray,
    pos2: np.ndarray,
    n_bins: int,
    range: tuple,
    dims: np.ndarray,
    *,
    exclusion: tuple = None,
) -> np.ndarray:
    r"""Radial histogram of minimum-image pair distances.

    Parity: ``analysis/structure.py:32-104`` (``capped_distance`` +
    ``numpy.histogram``), evaluated on-device as a tiled brute-force
    pair sweep.  `dims` may be ``(3,)`` lengths or ``(6,)`` with
    90-degree angles (orthorhombic boxes only).

    Parameters
    ----------
    pos1, pos2 : `numpy.ndarray`
        Positions, shapes ``(N_1, 3)`` / ``(N_2, 3)``.
    n_bins : `int`
        Number of histogram bins.
    range : array-like
        ``(r_min, r_max)``.
    dims : array-like
        Box lengths (+ optional angles).
    exclusion : array-like, keyword-only, optional
        ``(e0, e1)``: drop pairs with ``i // e0 == j // e1`` (e.g.
        ``(1, 1)`` removes self-pairs).

    Returns
    -------
    histogram : `numpy.ndarray`
        Counts, shape ``(n_bins,)``.
    """

    dims = np.asarray(dims, dtype=float)
    if dims.shape[-1] == 6:
        if not np.allclose(dims[3:], 90.0):
            # Triclinic cell: minimum image via the box matrix
            # (reference delegates to MDAnalysis ``capped_distance``,
            # ``analysis/structure.py:92-104``).
            dims = triclinic_matrices(dims)
        else:
            dims = dims[:3]
    # TPU: stream float32 and bin in double-float ("exact") — f64-grade
    # counts without touching the ~100x-slower emulated-f64 device
    # path.  Elsewhere (x64 CPU) native f64 "fast" binning IS the
    # float64 reference semantics.
    if jax.default_backend() == "tpu":
        dtype, precision = jnp.float32, "exact"
    else:
        dtype, precision = jnp.float64, "fast"
    edges = jnp.linspace(range[0], range[1], n_bins + 1)
    counts = radial_histogram_batch(
        jnp.asarray(pos1, dtype=dtype)[None],
        jnp.asarray(pos2, dtype=dtype)[None],
        jnp.asarray(dims, dtype=dtype)[None],
        jnp.ones(1),
        edges,
        exclusion=tuple(exclusion) if exclusion is not None else None,
        precision=precision,
    )
    return np.asarray(counts).astype(np.int64)


def zeroth_order_hankel_transform(
    r: np.ndarray, f: np.ndarray, q: np.ndarray
) -> np.ndarray:
    r"""Zeroth-order Hankel transform
    :math:`F_0(q) = 2\pi\int f(r) J_0(qr) r\,dr` of discrete data.
    Parity: ``analysis/structure.py:106-146``."""

    q = np.asarray(q, dtype=float)
    ht = 2 * np.pi * simpson(f * r * jv(0, np.outer(q, r)), x=r)
    if 0 in q:
        ht[q == 0] = 2 * np.pi * simpson(f * r, x=r)
    return ht


def radial_fourier_transform(
    r: np.ndarray, f: np.ndarray, q: np.ndarray
) -> np.ndarray:
    r"""Radial Fourier transform
    :math:`\hat{f}(q) = \frac{4\pi}{q}\int f(r)\,r\sin(qr)\,dr` of
    discrete data.  Parity: ``analysis/structure.py:148-188``."""

    q = np.asarray(q, dtype=float)
    with np.errstate(divide="ignore", invalid="ignore"):
        rft = 4 * np.pi * np.divide(
            simpson(f * r * np.sin(np.outer(q, r)), x=r), q
        )
    if 0 in q:
        rft[q == 0] = 4 * np.pi * simpson(f * r**2, x=r)
    return rft


def calculate_coordination_numbers(
    bins: np.ndarray,
    rdf: np.ndarray,
    rho: float,
    *,
    n_coord_nums: int = 2,
    n_dims: int = 3,
    threshold: float = 0.1,
) -> np.ndarray:
    r"""Coordination numbers from a radial distribution function:
    :math:`n_k = 4\pi\rho_j \int_{r_{k-1}}^{r_k} r^2 g_{ij}(r)\,dr`
    (3-D) or :math:`2\pi\rho_j \int r\,g_{ij}(r)\,dr` (2-D), with the
    shell boundaries at local minima of :math:`g_{ij}(r)`.

    Parity: ``analysis/structure.py:190-285`` (including NaN padding
    when fewer than `n_coord_nums` minima exist and the `threshold`
    filter on minimum depth).
    """

    if n_dims not in {2, 3}:
        raise ValueError("Invalid number of dimensions.")

    def shell_integral(r_slice, g_slice):
        if n_dims == 3:
            return 4 * np.pi * rho * simpson(r_slice**2 * g_slice,
                                             x=r_slice)
        return 2 * np.pi * rho * simpson(r_slice * g_slice, x=r_slice)

    coord_nums = np.full(n_coord_nums, np.nan)
    (minima,) = argrelextrema(rdf, np.less)
    minima = minima[rdf[minima] >= threshold]
    if not len(minima):
        warnings.warn("No local minima found.")
        return coord_nums

    stops = [0, *(int(i) + 1 for i in minima)]
    for k in range(min(n_coord_nums, len(minima))):
        lo = 0 if k == 0 else stops[k] - 1
        hi = stops[k + 1]
        coord_nums[k] = shell_integral(bins[lo:hi], rdf[lo:hi])
    return coord_nums


def calculate_structure_factor(
    r: np.ndarray,
    g: np.ndarray,
    equal: bool,
    rho: float,
    x_i: float = 1,
    x_j: float = None,
    q: np.ndarray = None,
    *,
    q_lower: float = None,
    q_upper: float = None,
    n_q: int = 1_000,
    n_dims: int = 3,
    formalism: str = "FZ",
) -> tuple[np.ndarray, np.ndarray]:
    r"""(Partial) static structure factor from :math:`g_{ij}(r)` for an
    isotropic fluid, in the Faber–Ziman (``"FZ"``), Ashcroft–Langreth
    (``"AL"``) or ``"general"`` formalism.

    Parity: ``analysis/structure.py:287-442``.
    """

    if q is None:
        if q_lower is None:
            q_lower = 2 * np.pi / r[-1]
        if q_upper is None:
            q_upper = 2 * np.pi / r[0]
        q = np.linspace(
            q_lower,
            q_upper,
            int((q_upper - q_lower) / q_lower) if n_q is None else n_q,
        )

    if n_dims == 3:
        transform = radial_fourier_transform
    elif n_dims == 2:
        transform = zeroth_order_hankel_transform
    else:
        raise ValueError("Invalid number of dimensions.")

    rho_sft = rho * transform(r, g - 1, q)
    if equal or formalism == "FZ":
        return q, 1 + rho_sft
    if formalism == "AL":
        return q, (x_i == x_j) + np.sqrt(x_i * x_j) * rho_sft
    if formalism == "general":
        return q, 1 + x_i * x_j * rho_sft
    raise ValueError("Invalid formalism.")


def _validate_groupings(groupings) -> list[str]:
    valid = {"atoms", "residues", "segments"}
    if isinstance(groupings, str):
        if groupings not in valid:
            raise ValueError(
                f"Invalid grouping '{groupings}'. The options are "
                "'atoms', 'residues', and 'segments'."
            )
        return [groupings, groupings]
    groupings = list(groupings)
    for g in groupings:
        if g not in valid:
            raise ValueError(
                f"Invalid grouping '{g}'. The options are 'atoms', "
                "'residues', and 'segments'."
            )
    return groupings * 2 if len(groupings) == 1 else groupings


def _group_segment_ids(ag, grouping: str) -> tuple[np.ndarray, int]:
    """Relabeled 0..G-1 segment ids for COM reduction of a group."""

    if grouping == "atoms":
        return None, ag.n_atoms
    labels = (
        ag.resindices if grouping == "residues" else ag.segindices
    )
    _, ids = np.unique(labels, return_inverse=True)
    return ids.astype(np.int32), int(ids.max()) + 1


def _identity_selection(sel, n_cols) -> bool:
    """Does `sel` select every one of `n_cols` columns in order?"""

    sel = np.asarray(sel)
    return len(sel) == n_cols and np.array_equal(
        sel, np.arange(n_cols)
    )


def _column_selector(sel, n_cols):
    """Batch column gather ``(B, n_cols, 3) -> (B, len(sel), 3)``,
    elided when `sel` is the identity — a 100k-index identity gather
    per chunk is pure overhead on TPU."""

    if _identity_selection(sel, n_cols):
        return lambda positions: positions
    sel_dev = jnp.asarray(np.asarray(sel))
    return lambda positions: positions[:, sel_dev]


def _com_positions(positions, masses, segment_ids, n_groups):
    """Per-frame centers of mass via segment reduction (device).
    `positions`: (B, N, 3); returns (B, G, 3)."""

    # The reduction runs in the stream dtype: f64 masses must not
    # promote f32 position streams (TPU f64 is emulated).
    masses = masses.astype(positions.dtype)
    weighted = positions * masses[None, :, None]
    total = jax.vmap(
        lambda w: jax.ops.segment_sum(w, segment_ids, n_groups)
    )(weighted)
    mass_sums = jax.ops.segment_sum(masses, segment_ids, n_groups)
    return total / mass_sums[None, :, None]


def _pallas_plan_extents(dimensions, triclinic):
    """Per-axis extents a Pallas cell plan sees: orthorhombic box
    lengths, or the perpendicular widths of the f32-rounded triclinic
    cell (the same rounding the kernel's shift table uses —
    split-sensitive, keep ONE definition)."""

    dims = np.asarray(dimensions, np.float64)
    if not triclinic:
        return dims[:3]
    from ..ops.pallas_cell_histogram import (
        triclinic_perpendicular_widths,
    )

    h32 = np.asarray(triclinic_matrices(dims), np.float64).astype(
        np.float32
    )
    return np.asarray(
        triclinic_perpendicular_widths(h32), np.float64
    )


class RadialDistributionFunction(DynamicAnalysisBase):
    r"""Radial distribution function :math:`g_{ij}(r)` for two- and
    three-dimensional systems.

    .. math::

       g_{ij}^\mathrm{3D}(r) = \frac{V}{4\pi r^2 N_i N_j}
       \sum_\alpha \sum_\beta \langle \delta(|\mathbf{r}_\alpha -
       \mathbf{r}_\beta| - r)\rangle

    Parity: ``analysis/structure.py:444-1032`` — serial and parallel
    modes, ``norm`` of ``"rdf"``/``"density"``/``None``, ``drop_axis``
    2-D analysis, tile ``exclusion``, COM ``groupings``, and the
    post-hoc :meth:`calculate_coordination_numbers`,
    :meth:`calculate_pmf` and :meth:`calculate_structure_factor`.
    "Parallel" shards the frame batch across the device mesh; the
    reference's ``n_batches`` memory knob is subsumed by the kernel's
    static atom tiling and is accepted but ignored.

    Parameters
    ----------
    ag1, ag2 : `AtomGroup`
        Atom groups :math:`i` and :math:`j` (``ag2`` defaults to
        ``ag1``).
    n_bins : `int`, default 201
        Number of histogram bins.
    range : array-like, default ``(0.0, 15.0)``
        Radii range (should stay below half the box).
    drop_axis : `int` or `str`, keyword-only, optional
        Axis ignored in a 2-D analysis (``0``/``'x'``, ``1``/``'y'``,
        ``2``/``'z'``).
    norm : `str`, keyword-only, default ``"rdf"``
        ``"rdf"``, ``"density"`` or ``None`` (raw counts).
    exclusion : array-like, keyword-only, optional
        ``(e0, e1)`` tile exclusion, e.g. ``(1, 1)`` for
        self-interactions.
    groupings : `str` or array-like, keyword-only, default ``"atoms"``
        ``"atoms"``, ``"residues"`` or ``"segments"`` (COM positions).
    reduced : `bool`, keyword-only, default False
        Data is in reduced (LJ) units.
    parallel : `bool`, keyword-only, default False
        Shard frame batches over all local devices.
    """

    def __init__(
        self,
        ag1,
        ag2=None,
        n_bins: int = 201,
        range: tuple = (0.0, 15.0),
        *,
        drop_axis: Union[int, str] = None,
        norm: str = "rdf",
        exclusion: tuple = None,
        groupings: Union[str, tuple] = "atoms",
        reduced: bool = False,
        n_batches: int = None,
        parallel: bool = False,
        shard: str = None,
        capacity_sigmas: float = 4.0,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        self.ag1 = ag1
        self.ag2 = ag1 if ag2 is None else ag2
        self.universe = self.ag1.universe
        if shard not in {None, "frames", "atoms"}:
            raise ValueError(
                "Invalid shard. Valid values: None, 'frames', 'atoms'."
            )
        if shard == "frames":
            parallel = True
        super().__init__(
            self.universe.trajectory, parallel, verbose, **kwargs
        )
        self._shard = shard
        if shard == "atoms":
            # Self-RDFs stream ONE atom-sharded copy of the group's
            # columns; cross-group RDFs stream both groups' columns
            # replicated and shard per group inside the update (the
            # ring rotates the second group's shards).
            self._shard_axis = (
                "atoms" if self.ag2 is self.ag1 else "replicated"
            )
            if (isinstance(groupings, str) and groupings != "atoms") or (
                not isinstance(groupings, str)
                and any(g != "atoms" for g in groupings)
            ):
                raise ValueError(
                    "shard='atoms' requires groupings='atoms' (center-"
                    "of-mass reduction would cross atom shards)."
                )

        self._groupings = _validate_groupings(groupings)
        self._drop_axis = (
            ord(drop_axis) - 120
            if isinstance(drop_axis, str)
            else drop_axis
        )
        if self._drop_axis not in {0, 1, 2, None}:
            raise ValueError("Invalid axis to drop.")

        self._require_box("RadialDistributionFunction")
        self._setup_periodic_box()
        if self._triclinic:
            if self._drop_axis is not None:
                raise ValueError(
                    "drop_axis (2-D analysis) requires an orthorhombic "
                    "box."
                )
            if shard == "atoms":
                raise ValueError(
                    "shard='atoms' currently supports orthorhombic "
                    "boxes only."
                )

        self._n_bins = n_bins
        self._range = tuple(range)
        self._norm = norm
        self._exclusion = (
            tuple(int(e) for e in exclusion)
            if exclusion is not None
            else None
        )
        self._reduced = reduced
        #: Pallas cell-list capacity headroom in Poisson sigmas; raise
        #: it if a long/clustered trajectory trips the overflow check.
        self._capacity_sigmas = float(capacity_sigmas)
        if n_batches is not None:
            warnings.warn(
                "n_batches is accepted for API compatibility but has "
                "no effect: the TPU kernel tiles the pair sweep "
                "statically."
            )
        self._verbose = verbose

        # Host->device column selection: read both groups' atoms only.
        if self.ag2 is self.ag1:
            # One copy of the group's columns: for the atom-sharded
            # ring the j-side is the ppermute-rotated shard, and for a
            # self-RDF both sides select the same columns (streaming
            # the group twice would double host->HBM traffic).
            self._atom_indices = np.asarray(self.ag1.ix)
            self._sel1 = np.arange(self.ag1.n_atoms)
            self._sel2 = self._sel1
        else:
            self._atom_indices = np.concatenate(
                (self.ag1.ix, self.ag2.ix)
            )
            self._sel1 = np.arange(self.ag1.n_atoms)
            self._sel2 = self.ag1.n_atoms + np.arange(self.ag2.n_atoms)
        self._seg1, self._n1 = _group_segment_ids(
            self.ag1, self._groupings[0]
        )
        self._seg2, self._n2 = _group_segment_ids(
            self.ag2, self._groupings[1]
        )

    def _prepare(self) -> None:
        self.results.edges = np.linspace(*self._range, self._n_bins + 1)
        self.results.bins = (
            self.results.edges[:-1] + self.results.edges[1:]
        ) / 2
        self.results.units = {
            "results.bins": ureg.angstrom,
            "results.edges": ureg.angstrom,
        }

        self._carry = {
            "counts": jnp.zeros(self._n_bins, dtype=jnp.float64),
            "volume": jnp.zeros((), dtype=jnp.float64),
        }

        if self._shard == "atoms":
            self._prepare_ring()
            return

        if self._use_pallas_cell_kernel():
            self._prepare_pallas_cell()
            return

        edges = jnp.asarray(self.results.edges)
        n_cols = len(self._atom_indices)
        take1 = _column_selector(self._sel1, n_cols)
        take2 = _column_selector(self._sel2, n_cols)
        seg1 = None if self._seg1 is None else jnp.asarray(self._seg1)
        seg2 = None if self._seg2 is None else jnp.asarray(self._seg2)
        m1 = jnp.asarray(self.ag1.masses)
        m2 = jnp.asarray(self.ag2.masses)
        n1, n2 = self._n1, self._n2
        drop = self._drop_axis
        exclusion = self._exclusion
        triclinic = self._triclinic
        # f32 streams (the TPU configuration) bin in double-float so
        # the integer counts match the f64 reference exactly —
        # orthorhombic AND triclinic boxes (the latter via the
        # 27-candidate double-float image search,
        # `ops/histogram._exact_d2_triclinic`).
        precision = (
            "exact" if self._stream_dtype() == np.float32 else "fast"
        )
        # The reference tracks volume only for norm="rdf"
        # (structure.py:747-748) but _get_rdf needs it regardless; the
        # reduction is one fused multiply-add, so always accumulate.
        track_volume = True

        # XLA brute-sweep chunk cap (same per-execution budget as the
        # Pallas/VanHove routing): at 100k atoms a default 128 MB
        # chunk packs ~100 tiled O(N^2) frame sweeps (~1 min) into
        # ONE execution — past the ~20 s tunnel watchdog that kills
        # the device worker.  Cells don't need this (their sweeps are
        # ~20x cheaper and the 8-frame bench chunks sit well under).
        if jax.default_backend() == "tpu":
            import os as _os

            budget = float(
                _os.environ.get("MDTPU_EXEC_BUDGET_S", 20.0)
            )
            # ~3.3e9 exact pairs/s orthorhombic; the triclinic
            # 27-image double-float search runs ~4.5x slower
            # (round-3 ledger: 1.84 fps at 20k = 7.4e8 pairs/s).
            rate = 7.4e8 if triclinic else 3.3e9
            est_frame = (self._n1 * self._n2) / rate
            max_frames = max(1, int(budget / max(1e-9, est_frame)))
            frame_bytes = (
                len(self._atom_indices) * 3
                * np.dtype(self._stream_dtype()).itemsize
            )
            self._chunk_bytes = min(
                self._chunk_bytes, max_frames * frame_bytes
            )

        def update(carry, positions, dimensions, mask):
            pos1 = take1(positions)
            pos2 = take2(positions)
            if seg1 is not None:
                pos1 = _com_positions(pos1, m1, seg1, n1)
            if seg2 is not None:
                pos2 = _com_positions(pos2, m2, seg2, n2)
            if triclinic:
                box = triclinic_matrices(dimensions)  # (B, 3, 3)
                # Lower-triangular box matrix: det = diagonal product.
                vol = box[:, 0, 0] * box[:, 1, 1] * box[:, 2, 2]
            else:
                box = dimensions[:, :3]
                if drop is not None:
                    pos1 = pos1.at[:, :, drop].set(0.0)
                    pos2 = pos2.at[:, :, drop].set(0.0)
                    box = box.at[:, drop].set(box.max(axis=1))
                    vol = box.prod(axis=1) / box[:, drop]
                else:
                    vol = box.prod(axis=1)
            counts = carry["counts"] + radial_histogram_batch(
                pos1, pos2, box, mask, edges, exclusion=exclusion,
                precision=precision,
            )
            if track_volume:
                volume = carry["volume"] + (vol * mask).sum()
            else:
                volume = carry["volume"]
            return {"counts": counts, "volume": volume}

        self._update = jit_update(update)


    def _n_shards(self) -> int:
        if self._shard == "atoms":
            import jax as _jax

            return max(1, min(len(_jax.devices()), self.ag1.n_atoms))
        return super()._n_shards()

    def _prepare_ring(self) -> None:
        """Atom-sharded (context-parallel) update: each device holds an
        i-shard of the frame's atoms fixed while j-shards rotate around
        the ICI ring via ``ppermute`` (SURVEY.md section 5.7;
        :mod:`mdhelper_tpu.parallel.ring`).  The user-facing path to
        RDFs whose atom count outgrows one chip."""

        import functools

        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import get_mesh
        from ..parallel.ring import _local_ring_histogram

        cross = self.ag2 is not self.ag1
        n1 = self.ag1.n_atoms
        n2 = self.ag2.n_atoms if cross else n1
        self._mesh = get_mesh(self._n_shards(), axis_name="atoms")
        n_shards = self._mesh.devices.size
        shard_i = -(-n1 // n_shards)
        shard_j = -(-n2 // n_shards)
        pad_i = shard_i * n_shards - n1
        pad_j = shard_j * n_shards - n2

        body = functools.partial(
            _local_ring_histogram,
            axis_name="atoms",
            n_shards=n_shards,
            shard_size=shard_i,
            n_real=n1,
            exclusion=self._exclusion,
            n_bins=self._n_bins,
            precision=(
                "exact"
                if self._stream_dtype() == np.float32
                else "fast"
            ),
            shard_size_j=shard_j,
            n_real_j=n2,
        )
        ring = jax.shard_map(
            body,
            mesh=self._mesh,
            in_specs=(P("atoms"), P("atoms"), P(), P()),
            out_specs=P(),
        )
        edges = jnp.asarray(self.results.edges)
        drop = self._drop_axis

        def update(carry, positions, dimensions, mask):
            if drop is not None:
                positions = positions.at[:, :, drop].set(0.0)

            def frame(c, inputs):
                pos, dims, valid = inputs
                box = dims[:3]
                if drop is not None:
                    box = box.at[drop].set(box.max())
                    vol = box.prod() / box[drop]
                else:
                    vol = box.prod()
                if cross:
                    # Split the replicated [group1 | group2] columns
                    # and pad each side to its shard multiple; the
                    # ring masks padded rows by global index.
                    p1 = jnp.pad(pos[:n1], ((0, pad_i), (0, 0)))
                    p2 = jnp.pad(pos[n1:], ((0, pad_j), (0, 0)))
                else:
                    p1 = p2 = pos
                counts = ring(p1, p2, box, edges)
                return {
                    "counts": c["counts"] + counts * valid,
                    "volume": c["volume"] + vol * valid,
                }, None

            carry, _ = jax.lax.scan(
                frame, carry, (positions, dimensions, mask)
            )
            return carry

        self._update = jax.jit(update)

    def _use_pallas_cell_kernel(self) -> bool:
        """Route the hot RDF cases through the hand-tiled Pallas
        cell-list kernels: uniform bins (any ``range``;
        ``range[0] > 0`` uses the offset-grid boundary convention),
        ANY periodic box size — boxes of at least 3 cutoffs per
        (perpendicular-width) axis ride the classic reach-1
        half-shell/27 sweeps; smaller or subdivided grids ride the
        generalized deduped-table sweeps (per-axis ``reach``, ordered
        small-box mode, per-pair 27-candidate triclinic minimum image
        — round 5); 2-D ``drop_axis`` RDFs ride the same kernels on a
        grid over the two kept axes.  Per-frame NPT boxes are fine:
        the kernel takes the box at runtime and NaN-poisons if a
        frame's box invalidates the planned cell grid.  The XLA tiled
        sweep remains only for non-TPU backends, overlapping cross
        groups, and aperiodic (zero-extent) axes."""

        import jax as _jax

        if _jax.default_backend() != "tpu":
            return False
        if self.ag2 is self.ag1 and self._groupings[0] == self._groupings[1]:
            # Self-RDF: exclusion=None (reference default) is served
            # by adding the n1 self-pairs back into bin 0 (their
            # distance is exactly 0); (e, e) tiles ride the symmetric
            # half-shell mask; asymmetric (e0, e1) tiles ride the
            # kernel's ordered-multiplicity weights (round 4) or the
            # plain ordered mask (small-box mode).
            pass
        else:
            # Cross-RDF: disjoint groups; (e0, e1) exclusion rides
            # the id rows of the slot tables.
            if np.intersect1d(self.ag1.ix, self.ag2.ix).size:
                return False
        dims = self.universe.dimensions
        if dims is None:
            return False
        # Aperiodic axes (zero extents by convention) need the XLA
        # sweep's per-axis periodicity guard; the cell grid assumes
        # periodic wrapping on every grid axis.
        return bool(np.all(self._cell_plan_box() > 0))

    def _cell_plan_box(self):
        """Extents the cell plan spans: 3 box lengths (perpendicular
        widths for triclinic cells), or the two KEPT extents for 2-D
        ``drop_axis`` grids."""

        ext = _pallas_plan_extents(
            self.universe.dimensions, self._triclinic
        )
        if self._drop_axis is not None:
            keep = [a for a in range(3) if a != self._drop_axis]
            return ext[keep]
        return ext

    def _searched_cell_plan(self):
        from ..ops.pallas_cell_histogram import pallas_cell_plan_search

        if getattr(self, "_cell_plan_cache", None) is None:
            cross = not (
                self.ag2 is self.ag1
                and self._groupings[0] == self._groupings[1]
            )
            self._cell_plan_cache = pallas_cell_plan_search(
                self._n1,
                self._cell_plan_box(),
                float(self._range[1]),
                n_atoms2=self._n2 if cross else None,
                capacity_sigmas=self._capacity_sigmas,
                triclinic=self._triclinic,
            )
        return self._cell_plan_cache

    def _prepare_pallas_cell(self) -> None:
        from ..ops.pallas_cell_histogram import (
            cell_pair_histogram_pallas,
            cross_pair_histogram_pallas,
        )

        r_max = float(self._range[1])
        r_min = float(self._range[0])
        cross = not (
            self.ag2 is self.ag1
            and self._groupings[0] == self._groupings[1]
        )
        # Cost-searched grid (coarser cells when the lane-snapped
        # capacity would mostly pad); cross groups share one grid.
        plan = self._searched_cell_plan()
        exclusion = self._exclusion
        # Self-RDF with no exclusion (reference default): the kernel
        # always drops identical-atom pairs, whose distance is exactly
        # 0, so they are added back into bin 0 after the sweep —
        # unless the range starts above 0 (then they are out of
        # range, like the reference's lower-bound capped_distance).
        self_pairs = (
            0
            if cross or exclusion is not None or r_min > 0
            else self._n1
        )
        kernel_exclusion = (1, 1) if exclusion is None else exclusion

        self._carry["max_occ"] = jnp.full((), -(2**30), jnp.int32)

        n_cols = len(self._atom_indices)
        take1 = _column_selector(self._sel1, n_cols)
        seg1 = None if self._seg1 is None else jnp.asarray(self._seg1)
        m1 = jnp.asarray(self.ag1.masses)
        n1 = self._n1
        n_bins = self._n_bins

        if cross:
            take2 = _column_selector(self._sel2, n_cols)
            seg2 = (
                None if self._seg2 is None else jnp.asarray(self._seg2)
            )
            m2 = jnp.asarray(self.ag2.masses)
            n2 = self._n2

        triclinic = self._triclinic
        drop = self._drop_axis
        axes = (
            (0, 1, 2)
            if drop is None
            else tuple(a for a in range(3) if a != drop)
        )

        # Per-execution chunk cap (same ~20 s tunnel-watchdog budget
        # as the XLA sweep): classic reach-1 plans are ~20x cheaper
        # per pair than the brute sweep and never came close, but the
        # GENERALIZED small-box plans can approach all-pairs padded
        # work — and the triclinic per-pair mode runs its 27-candidate
        # search per pair (~27x the ortho distance math).  Estimate a
        # frame from the plan's padded-pair cost and shrink the chunk
        # so one execution stays under the budget.
        if jax.default_backend() == "tpu":
            import os as _os

            from ..ops.pallas_cell_histogram import plan_is_tri_pp

            budget = float(
                _os.environ.get("MDTPU_EXEC_BUDGET_S", 20.0)
            )
            rate = (
                7.0e8
                if plan_is_tri_pp(plan, triclinic)
                else 1.5e10
            )
            est_frame = plan["_cost"] / rate
            max_frames = max(1, int(budget / max(1e-9, est_frame)))
            frame_bytes = (
                len(self._atom_indices) * 3
                * np.dtype(self._stream_dtype()).itemsize
            )
            self._chunk_bytes = min(
                self._chunk_bytes, max_frames * frame_bytes
            )

        def kernel_box(dims):
            # Orthorhombic: the (3,) lengths; triclinic: the (3, 3)
            # lower-triangular box matrix (per-neighbor-block lattice
            # image shifts, or the per-pair small-box search).  2-D
            # drop_axis grids pass the full (3,) lengths — the kernel
            # reads only its grid axes.
            if triclinic:
                return triclinic_matrices(dims).astype(jnp.float32)
            return dims[:3].astype(jnp.float32)

        def frame_volume(dims):
            if triclinic:
                h = triclinic_matrices(dims)
                return h[0, 0] * h[1, 1] * h[2, 2]
            if drop is not None:
                # 2-D analysis: the normalization extent is the AREA
                # of the kept axes (XLA route parity).
                return dims[:3].prod() / dims[drop]
            return dims[:3].prod()

        def update(carry, positions, dimensions, mask):
            pos1 = take1(positions)
            if seg1 is not None:
                pos1 = _com_positions(pos1, m1, seg1, n1)
            if cross:
                pos2 = take2(positions)
                if seg2 is not None:
                    pos2 = _com_positions(pos2, m2, seg2, n2)

            def frame(c, inputs):
                # Per-frame (NPT) boxes: the kernel takes the box at
                # runtime and NaN-poisons the counts if a frame's box
                # shrinks below the planned cell grid.
                if cross:
                    pos, pos_b, dims, valid = inputs
                    counts, occ1, occ2 = cross_pair_histogram_pallas(
                        pos.astype(jnp.float32),
                        pos_b.astype(jnp.float32),
                        box=kernel_box(dims),
                        r_max=r_max, r_min=r_min,
                        n_cells_dim=plan["n_cells_dim"],
                        capacity1=plan["capacity"],
                        capacity2=plan["capacity2"],
                        n_bins=n_bins, precision="exact",
                        exclusion=exclusion,
                        axes=axes, reach=plan["reach"],
                    )
                    occ = jnp.maximum(
                        occ1 - np.int32(plan["capacity"]),
                        occ2 - np.int32(plan["capacity2"]),
                    )
                else:
                    pos, dims, valid = inputs
                    counts, occ = cell_pair_histogram_pallas(
                        pos.astype(jnp.float32),
                        box=kernel_box(dims),
                        r_max=r_max, r_min=r_min,
                        n_cells_dim=plan["n_cells_dim"],
                        capacity=plan["capacity"],
                        n_bins=n_bins, precision="exact",
                        exclusion=kernel_exclusion,
                        axes=axes, reach=plan["reach"],
                    )
                    if self_pairs:
                        counts = counts.at[0].add(
                            jnp.float32(self_pairs)
                        )
                    occ = occ - np.int32(plan["capacity"])
                # Padding frames (valid == 0) are all-zero positions
                # — every atom lands in cell 0 — so their occupancy
                # must not trip the overflow check.  `occ` carries the
                # occupancy EXCESS over capacity (> 0 means overflow).
                occ = jnp.where(
                    valid > 0, occ, np.int32(-(2**30))
                ).astype(jnp.int32)
                # jnp.where, not `counts * valid`: a padding frame's
                # fabricated box can NaN-poison the kernel output, and
                # NaN * 0 is NaN (e.g. a multi-host block that is all
                # padding on one host streams dimensions of ones).
                counts = jnp.where(valid > 0, counts, np.float32(0.0))
                return {
                    "counts": c["counts"] + counts,
                    "volume": c["volume"]
                    + frame_volume(dims) * valid,
                    "max_occ": jnp.maximum(c["max_occ"], occ),
                }, None

            xs = (
                (pos1, pos2, dimensions, mask)
                if cross
                else (pos1, dimensions, mask)
            )
            carry, _ = jax.lax.scan(frame, carry, xs)
            return carry

        self._update = jax.jit(update)

    def run(self, *args, **kwargs):
        """Run, auto-escalating the Pallas cell plan's slot capacity
        on the rare statistical overflow: the cost-searched plan
        leaves ~4 sigma of headroom above the mean cell occupancy
        (optimal padded work), so very long runs over many
        (cell, frame) occupancy draws can trip it.  Each retry
        re-plans with ``capacity_sigmas += 2`` (one recompile) and
        re-streams; two escalations bound the recursion."""

        from ..ops.pallas_cell_histogram import CellCapacityOverflow

        try:
            return super().run(*args, **kwargs)
        except CellCapacityOverflow:
            retries = getattr(self, "_capacity_retries", 0)
            if retries >= 2:
                raise
            self._capacity_retries = retries + 1
            self._capacity_sigmas += 2.0
            self._cell_plan_cache = None
            warnings.warn(
                "Pallas cell capacity overflow (a density "
                "fluctuation exceeded the planned slot count); "
                f"re-planning with capacity_sigmas="
                f"{self._capacity_sigmas} and re-running."
            )
            return self.run(*args, **kwargs)

    def _check_pallas_carry(self) -> None:
        if "max_occ" not in self._carry:
            return
        excess = int(self._carry.pop("max_occ"))
        if excess > 0:
            from ..ops.pallas_cell_histogram import (
                CellCapacityOverflow,
            )

            raise CellCapacityOverflow(
                f"cell capacity overflow (by {excess} atoms): a cell "
                "exceeded its planned slot count (a density "
                "fluctuation or clustering). Re-run with a larger "
                "capacity_sigmas= (default 4.0) or a non-TPU backend."
            )
        if np.isnan(np.asarray(self._carry["counts"])).any():
            raise RuntimeError(
                "A frame's box shrank below the planned cell grid "
                "(reach * box / n_cells_dim under r_max on some "
                "axis — perpendicular widths for triclinic cells); "
                "the neighbor sweep would miss pairs. Re-plan "
                "against the smallest box along the trajectory or "
                "use a non-TPU backend."
            )

    def _conclude(self) -> None:
        self._check_pallas_carry()
        self.results.counts = np.asarray(self._carry["counts"]).astype(
            np.int64
        )
        self._area_or_volume = float(self._carry["volume"])

        norm = self.n_frames
        if self._norm is not None:
            if self._drop_axis is None:
                norm = norm * (
                    4 * np.pi * np.diff(self.results.edges**3) / 3
                )
            else:
                norm = norm * np.pi * np.diff(self.results.edges**2)
            if self._norm == "rdf":
                n2 = self._n2
                if self._exclusion:
                    n2 -= self._exclusion[1]
                norm = norm * (
                    self._n1 * n2 * self.n_frames / self._area_or_volume
                )
        self.results.rdf = self.results.counts / norm

    def _get_rdf(self) -> np.ndarray:
        """The RDF regardless of the `norm` the analysis ran with.
        Parity: ``analysis/structure.py:864-891``."""

        if self._norm == "rdf":
            return self.results.rdf
        n2 = self._n2
        if self._exclusion:
            n2 -= self._exclusion[1]
        if self._drop_axis is None:
            shell = 4 * np.diff(self.results.edges**3) / 3
        else:
            shell = np.diff(self.results.edges**2)
        return self._area_or_volume * self.results.counts / (
            np.pi * self.n_frames**2 * self._n1 * n2 * shell
        )

    def calculate_coordination_numbers(
        self,
        rho: float,
        *,
        n_coord_nums: int = 2,
        threshold: float = 0.1,
    ) -> None:
        """Coordination numbers :math:`n_k` from the computed RDF.
        Parity: ``analysis/structure.py:893-923``."""

        self.results.coordination_numbers = (
            calculate_coordination_numbers(
                self.results.bins,
                self._get_rdf(),
                rho,
                n_coord_nums=n_coord_nums,
                n_dims=2 + (self._drop_axis is None),
                threshold=threshold,
            )
        )

    def calculate_pmf(self, temperature: Union[float, Q_]) -> None:
        r"""Potential of mean force
        :math:`w_{ij}(r) = -k_\mathrm{B}T\ln g_{ij}(r)`.
        Parity: ``analysis/structure.py:925-959``."""

        self.results.units["results.pmf"] = ureg.kilojoule / ureg.mole
        temperature, unit_ = strip_unit(temperature, "kelvin")
        if self._reduced:
            # Raise on actual unit OBJECTS only: a plain float passes
            # the target string through strip_unit.  (The reference's
            # check is inverted and rejects the documented plain-float
            # usage, analysis/structure.py:948-952 — not replicated.)
            if not isinstance(unit_, (str, type(None))):
                raise ValueError(
                    "'temperature' cannot have units when reduced=True."
                )
            kbt = temperature
        else:
            kbt = (
                ureg.avogadro_constant
                * ureg.boltzmann_constant
                * temperature
                * ureg.kelvin
            ).m_as(self.results.units["results.pmf"])
        with np.errstate(divide="ignore"):
            self.results.pmf = -kbt * np.log(self._get_rdf())

    def calculate_structure_factor(
        self,
        rho: float,
        x_i: float = None,
        x_j: float = None,
        q: np.ndarray = None,
        *,
        q_lower: float = None,
        q_upper: float = None,
        n_q: int = 1_000,
        formalism: str = "FZ",
    ) -> None:
        """S(q) from the computed RDF.
        Parity: ``analysis/structure.py:961-1032``."""

        self.results.wavenumbers, self.results.ssf = (
            calculate_structure_factor(
                self.results.bins,
                self._get_rdf(),
                self.ag1 == self.ag2,
                rho,
                x_i,
                x_j,
                q=q,
                q_lower=q_lower,
                q_upper=q_upper,
                n_q=n_q,
                n_dims=2 + (self._drop_axis is None),
                formalism=formalism,
            )
        )


def _wavevector_grid(
    dimensions: np.ndarray,
    n_points: int,
    n_surfaces: int = None,
    n_surface_points: int = 8,
) -> np.ndarray:
    r"""Scattering wavevector grid :math:`2\pi\mathbf{n}/L` with
    optional extra spherical-surface points for cubic boxes.

    Parity: ``analysis/structure.py:1375-1410`` (meshgrid ordering and
    the first-octant surface-point construction are preserved exactly,
    since ``unique=False`` exposes the raw ordering).
    """

    dimensions = np.asarray(dimensions, dtype=float)
    if np.allclose(dimensions, dimensions[0]):
        grid = 2 * np.pi * np.arange(n_points) / dimensions[0]
        wavevectors = np.stack(
            np.meshgrid(grid, grid, grid), axis=-1
        ).reshape(-1, 3)
        if n_surfaces:
            n_theta, n_phi = get_closest_factors(
                n_surface_points, 2, reverse=True
            )
            theta = np.linspace(
                np.pi / (2 * n_theta + 4),
                np.pi / 2 - np.pi / (2 * n_theta + 4),
                n_theta,
            )
            phi = np.linspace(
                np.pi / (2 * n_phi + 4),
                np.pi / 2 - np.pi / (2 * n_phi + 4),
                n_phi,
            )
            directions = np.stack(
                (
                    np.sin(theta) * np.cos(phi)[:, None],
                    np.sin(theta) * np.sin(phi)[:, None],
                    np.tile(np.cos(theta)[None, :], (n_phi, 1)),
                ),
                axis=-1,
            )
            surface = np.einsum(
                "o,tpd->otpd", grid[1:n_surfaces + 1], directions
            ).reshape(n_surfaces * n_surface_points, 3)
            wavevectors = np.vstack((wavevectors, surface))
    else:
        if n_surfaces:
            warnings.warn(
                "Spherical-surface wavevectors require a cubic box; "
                "n_surfaces is ignored."
            )
        wavevectors = np.stack(
            np.meshgrid(
                *[2 * np.pi * np.arange(n_points) / L for L in dimensions]
            ),
            axis=-1,
        ).reshape(-1, 3)
    return wavevectors


def unique_wavenumber_groups(
    wavenumbers: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Unique wavenumbers (rounded to 11 decimals, matching the
    reference's grouping tolerance, ``analysis/structure.py:1536-1541``)
    plus each wavevector's group index — precomputed once so concluding
    a run is a segment reduction instead of an
    O(n_unique * n_q) ``isclose`` sweep."""

    unique, inverse = np.unique(
        np.asarray(wavenumbers).round(11), return_inverse=True
    )
    return unique, inverse.ravel()


def group_mean_last_axis(
    values: np.ndarray, group: np.ndarray, n_unique: int
) -> np.ndarray:
    """Mean of `values` over last-axis segments defined by `group`."""

    moved = np.ascontiguousarray(np.moveaxis(values, -1, 0))
    sums = np.zeros((n_unique,) + moved.shape[1:], dtype=np.float64)
    np.add.at(sums, group, moved)
    counts = np.bincount(group, minlength=n_unique)
    sums /= counts.reshape((-1,) + (1,) * (sums.ndim - 1))
    return np.moveaxis(sums, 0, -1)


class StructureFactor(NumbaAnalysisBase):
    r"""Static structure factor :math:`S(q)` and partial structure
    factors :math:`S_{\alpha\beta}(q)` computed directly from particle
    positions.

    .. math::

       S(q) = \frac{1}{N}\left\langle\left(\sum_j
       \cos(\mathbf{q}\cdot\mathbf{r}_j)\right)^2 + \left(\sum_j
       \sin(\mathbf{q}\cdot\mathbf{r}_j)\right)^2\right\rangle

    Parity: ``analysis/structure.py:1034-1550``.  The reference's
    Numba :math:`\sum_j \exp(i\mathbf{q}\cdot\mathbf{r}_j)` kernels
    (``accelerated.py:81-165``) become an ``(N_q, 3) @ (3, N)`` MXU
    matmul with fused cos/sin reductions on the VPU
    (:mod:`mdhelper_tpu.ops.scattering`).  The ``form`` parameter is
    accepted for API compatibility; both the ``"exp"`` and ``"trig"``
    expressions evaluate the identical trig-sum kernel here (they only
    differed in rounding in the reference, and complex arrays cannot be
    materialized on TPU).  With ``parallel=True`` frame batches are
    sharded over the device mesh.

    Parameters
    ----------
    groups : `AtomGroup` or array-like
        Group(s) of atoms sharing a grouping type.  With
        ``mode=None`` the groups must jointly contain every atom in the
        universe; with ``mode="pair"`` exactly one or two groups.
    groupings : `str` or array-like, default ``"atoms"``
        ``"atoms"`` or ``"residues"`` (COM positions).
    mode : `str`, keyword-only, optional
        ``None`` (total S(q)), ``"pair"`` or ``"partial"``.
    form : `str`, keyword-only, default ``"exp"``
        Accepted for parity; see above.
    dimensions : array-like, keyword-only, optional
        Box lengths (defaults to the trajectory's first frame).
    n_points : `int`, keyword-only, default 32
        Wavevector grid points per axis.
    n_surfaces, n_surface_points : `int`, keyword-only
        Extra spherical-surface wavevectors (cubic boxes).
    q_max : `float`, keyword-only, optional
        Wavenumber cutoff.
    wavevectors : `numpy.ndarray`, keyword-only, optional
        Explicit wavevectors (overrides the grid).
    sort, unique : `bool`, keyword-only, default True
        Sort by wavenumber / average equal-magnitude wavevectors.
    parallel : `bool`, keyword-only, default False
        Shard frame batches across all local devices.
    precision : `str`, keyword-only, default ``"auto"``
        Phase-evaluation precision (:func:`mdhelper_tpu.ops.scattering.
        trig_sums_frame`).  ``"auto"`` uses double-float (two-float32)
        exact phases when positions are float32 (the TPU fast path —
        naive float32 phases lose several per-cent at 100k-atom box
        scales) and the plain path when positions are already float64.
        ``"fast"`` / ``"exact"`` force either mode.
    method : `str`, keyword-only, default ``"auto"``
        ``"direct"`` evaluates the trig sums exactly per wavevector.
        ``"factor"`` exploits the reciprocal-lattice structure of grid
        wavevectors to separate the phase factor by axis
        (:mod:`mdhelper_tpu.ops.factor_scattering`) — an order of
        magnitude faster than the direct sweep at 100k-atom scales at
        the same double-float fidelity (~5e-7 median relative error on
        :math:`\rho(q)`); requires lattice wavevectors
        :math:`2\pi\mathbf{n}/L` (no spherical surfaces or custom
        non-lattice wavevectors; any box, ``q_max`` subsets fine).
        ``"mesh"`` uses Kaiser-Bessel gridding + FFT
        (:mod:`mdhelper_tpu.ops.mesh_scattering`) at ~5e-6 relative
        accuracy; requires the default grid wavevectors (no
        ``n_surfaces``, no explicit ``wavevectors``, cubic box).
        ``"auto"`` (default) uses ``"factor"`` when the wavevectors are
        lattice-compatible and positions are float32, falling back to
        ``"direct"`` otherwise (float64 positions keep the direct
        sweep's full float64 phases off-TPU).
    """

    def __init__(
        self,
        groups,
        groupings="atoms",
        *,
        mode: str = None,
        form: str = "exp",
        dimensions=None,
        n_points: int = 32,
        n_surfaces: int = None,
        n_surface_points: int = 8,
        q_max=None,
        wavevectors: np.ndarray = None,
        sort: bool = True,
        unique: bool = True,
        parallel: bool = False,
        shard: str = None,
        precision: str = "auto",
        method: str = "auto",
        verbose: bool = True,
        **kwargs,
    ) -> None:
        self._groups = (
            [groups] if hasattr(groups, "universe") else list(groups)
        )
        self.universe = self._groups[0].universe
        if shard not in {None, "frames", "q"}:
            raise ValueError(
                "Invalid shard. Valid values: None, 'frames', 'q'."
            )
        if shard == "frames":
            parallel = True
        if shard == "q":
            if method in {"mesh", "factor"}:
                raise ValueError(
                    "shard='q' applies to the direct wavevector sweep; "
                    f"method='{method}' distributes over frames instead."
                )
            # Positions replicate over the mesh; the wavevector axis is
            # the sharded (tensor-parallel-style) axis.
            self._shard_axis = "replicated"
        self._shard = shard
        super().__init__(self.universe.trajectory, verbose, **kwargs)

        self._n_groups = len(self._groups)
        valid_groupings = {"atoms", "residues"}
        if isinstance(groupings, str):
            if groupings not in valid_groupings:
                raise ValueError(
                    f"Invalid grouping '{groupings}'. Valid values: "
                    f"{', '.join(sorted(valid_groupings))}."
                )
            self._groupings = self._n_groups * [groupings]
        else:
            if self._n_groups != len(groupings):
                raise ValueError(
                    "The number of grouping values is not equal to the "
                    "number of groups."
                )
            for g in groupings:
                if g not in valid_groupings:
                    raise ValueError(
                        f"Invalid grouping '{g}'. Valid values: "
                        f"{', '.join(sorted(valid_groupings))}."
                    )
            self._groupings = list(groupings)

        if form not in {"exp", "trig"}:
            raise ValueError("Invalid form. Valid values: 'exp', 'trig'.")
        self._form = form
        if method not in {"auto", "direct", "factor", "mesh"}:
            raise ValueError(
                "Invalid method. Valid values: 'auto', 'direct', "
                "'factor', 'mesh'."
            )
        self._method = method

        self._mode = mode
        if mode == "pair" and not 1 <= self._n_groups <= 2:
            raise ValueError(
                "There must be exactly one or two groups when "
                "mode='pair'."
            )
        if mode is None and sum(
            g.n_atoms for g in self._groups
        ) != self.universe.atoms.n_atoms:
            raise ValueError(
                "The provided atom groups do not contain all atoms in "
                "the universe."
            )
        if mode not in {None, "pair", "partial"}:
            raise ValueError("Invalid mode.")

        if dimensions is not None:
            if len(dimensions) != 3:
                raise ValueError("'dimensions' must have length 3.")
            self._dimensions = np.asarray(
                strip_unit(dimensions, "angstrom")[0]
            )
        elif self.universe.dimensions is not None:
            self._dimensions = self.universe.dimensions[:3].copy()
        elif wavevectors is None:
            raise ValueError("No system dimensions found or provided.")
        if wavevectors is None and not (
            np.asarray(self._dimensions) > 0
        ).all():
            raise ValueError(
                "The wavevector grid needs a periodic box with "
                "non-zero dimensions (pass explicit wavevectors= "
                "for box-less systems)."
            )

        if wavevectors is not None:
            self._wavevectors = np.asarray(wavevectors, dtype=float)
        else:
            self._wavevectors = _wavevector_grid(
                self._dimensions, n_points, n_surfaces, n_surface_points
            )
        self._wavenumbers = np.linalg.norm(self._wavevectors, axis=1)

        if q_max is not None:
            q_max = strip_unit(q_max, "angstrom**-1")[0]
            keep = self._wavenumbers <= q_max
            self._wavevectors = self._wavevectors[keep]
            self._wavenumbers = self._wavenumbers[keep]

        # Group bookkeeping: column selection + per-group COM reduction.
        self._atom_indices = np.concatenate(
            [g.ix for g in self._groups]
        )
        self._sels, self._segs, self._Ns = [], [], []
        offset = 0
        for group, grouping in zip(self._groups, self._groupings):
            self._sels.append(offset + np.arange(group.n_atoms))
            seg, n = _group_segment_ids(group, grouping)
            self._segs.append(seg)
            self._Ns.append(n)
            offset += group.n_atoms
        self._Ns = np.asarray(self._Ns)
        self._N = int(self._Ns.sum())

        self._sort = sort
        self._unique = unique
        self._parallel = parallel
        if precision not in {"auto", "fast", "exact"}:
            raise ValueError(
                "Invalid precision. Valid values: 'auto', 'fast', "
                "'exact'."
            )
        self._precision = precision
        self._verbose = verbose

    def _n_shards(self) -> int:
        if not getattr(self, "_parallel", False):
            return 1
        import jax as _jax

        return max(1, min(len(_jax.devices()), self.n_frames or 1))

    def _resolve_precision(self, positions) -> str:
        if self._precision != "auto":
            return self._precision
        return "exact" if positions.dtype == jnp.float32 else "fast"

    def _factor_setup(self):
        """Build (or refuse) the factorized-lattice plan for the
        current wavevector set; see
        :func:`mdhelper_tpu.ops.factor_scattering.factor_plan`.

        Mixed sets — a reciprocal-lattice grid plus off-grid extras
        (the reference's ``n_surfaces`` sphere samples,
        ``analysis/structure.py:1090-1130``) — are SPLIT: the lattice
        subset rides the factorized kernel and only the extras pay the
        direct per-wavevector sweep (``self._factor_split``)."""

        from ..ops.factor_scattering import factor_plan

        self._factor_split = None
        method = getattr(self, "_method", "direct")
        if (
            method not in {"auto", "factor"}
            or getattr(self, "_shard", None) == "q"
            or getattr(self, "_dimensions", None) is None
        ):
            if method == "factor" and getattr(
                self, "_dimensions", None
            ) is None:
                raise ValueError(
                    "method='factor' requires box dimensions."
                )
            return None
        try:
            return factor_plan(self._wavevectors, self._dimensions)
        except ValueError as exc:
            full_set_error = exc
        # Partition on-grid vs off-grid wavevectors.
        qs = np.asarray(self._wavevectors, np.float64)
        dims = np.asarray(self._dimensions, np.float64)
        n_float = qs * dims / (2 * np.pi)
        n_int = np.rint(n_float)
        on_grid = (
            np.isclose(n_float, n_int, atol=1e-8).all(axis=1)
            & (n_int >= 0).all(axis=1)
        )
        idx_grid = np.nonzero(on_grid)[0]
        idx_rest = np.nonzero(~on_grid)[0]
        # Below ~64 lattice points the factorized tables cost more
        # than they save; run everything direct.
        if len(idx_grid) < 64 or len(idx_rest) == 0:
            if method == "factor":
                raise full_set_error
            return None
        order = np.concatenate((idx_grid, idx_rest))
        self._factor_split = {
            "qs_rest": qs[idx_rest],
            "inv_perm": np.argsort(order).astype(np.int32),
        }
        return factor_plan(qs[idx_grid], dims)

    def _use_factor(self, positions) -> bool:
        """Route through the factorized kernel?  Explicit
        ``method='factor'`` always; ``'auto'`` only for float32
        positions (float64 inputs keep the direct sweep's native-f64
        phases off-TPU, which the f32-grade factor tables would
        forfeit)."""

        return getattr(self, "_factor", None) is not None and (
            self._method == "factor"
            or positions.dtype == jnp.float32
        )

    def _group_trig_sums(self, positions, qs):
        """Per-group (cos, sin) sums for one frame batch: returns a pair
        of ``(B, G, N_q)`` arrays."""

        prec = self._resolve_precision(positions)
        # No qs cast here: trig_sums_frame runs in the positions'
        # dtype internally and splits f64 wavevectors hi + lo on the
        # exact path, so no q precision is lost.
        if self._use_factor(positions):
            from ..ops.factor_scattering import factor_trig_sums

            plan = self._factor
            flat = jnp.asarray(plan["flat_idx"])
            split = getattr(self, "_factor_split", None)
            if split is not None:
                qs_rest = jnp.asarray(split["qs_rest"])
                inv_perm = jnp.asarray(split["inv_perm"])

            def frame_sums(p):
                c, s = factor_trig_sums(
                    p, k=plan["k"], box=plan["box"], precision=prec
                )
                c, s = c[flat], s[flat]
                if split is None:
                    return c, s
                # Off-grid extras (sphere-surface samples) pay the
                # direct sweep; the permutation gather restores the
                # caller's wavevector order.
                cr, sr = trig_sums_frame(qs_rest, p, precision=prec)
                return (
                    jnp.concatenate((c, cr))[inv_perm],
                    jnp.concatenate((s, sr))[inv_perm],
                )

        else:

            def frame_sums(p):
                return trig_sums_frame(qs, p, precision=prec)

        cos_all, sin_all = [], []
        n_cols = len(self._atom_indices)
        for group, grouping, sel, seg, n in zip(
            self._groups, self._groupings, self._sels, self._segs,
            self._Ns,
        ):
            pos = _column_selector(sel, n_cols)(positions)
            if seg is not None:
                pos = _com_positions(
                    pos, jnp.asarray(group.masses), jnp.asarray(seg), n
                )
            # Sequential over frames (NOT vmap): the phase sweeps hold
            # (N_q-tile, N)-scale double-float intermediates PER frame
            # — batching them across the chunk multiplies that by B,
            # spills HBM, and runs ~6x slower at 100k atoms / 13.8k q.
            c, s = jax.lax.map(frame_sums, pos)
            cos_all.append(c)
            sin_all.append(s)
        return jnp.stack(cos_all, axis=1), jnp.stack(sin_all, axis=1)

    def _mesh_setup(self):
        """Map every wavevector to integer grid coordinates n = q L /
        (2 pi) and build the gridding plan; mesh evaluation covers
        exactly the axis-aligned grid (any ordering or q_max subset of
        it), not spherical-surface extras or non-grid custom
        wavevectors."""

        from ..ops.mesh_scattering import mesh_plan

        dims = np.asarray(self._dimensions, np.float64)
        n_float = self._wavevectors * dims / (2 * np.pi)
        n_int = np.rint(n_float).astype(int)
        if not np.allclose(n_float, n_int, atol=1e-8):
            raise ValueError(
                "method='mesh' requires grid wavevectors q = 2*pi*n/L "
                "(no spherical surfaces or custom wavevectors)."
            )
        if n_int.min() < 0:
            raise ValueError(
                "method='mesh' requires non-negative grid indices."
            )
        n_points = int(n_int.max()) + 1
        flat_idx = jnp.asarray(
            n_int[:, 0] * n_points * n_points
            + n_int[:, 1] * n_points
            + n_int[:, 2]
        )
        return mesh_plan(n_points, dims), flat_idx, n_points

    def _prepare_mesh(self) -> None:
        from ..ops.mesh_scattering import mesh_trig_sums

        if self._n_groups != 1 or self._mode is not None:
            raise ValueError(
                "method='mesh' currently supports a single group with "
                "mode=None."
            )
        plan, flat_idx, n_points = self._mesh_setup()
        group = self._groups[0]
        take = _column_selector(self._sels[0], len(self._atom_indices))
        seg = (
            None if self._segs[0] is None else jnp.asarray(self._segs[0])
        )
        masses = jnp.asarray(group.masses)
        n_entities = self._Ns[0]

        def update(carry, positions, dimensions, mask):
            del dimensions
            pos = take(positions)
            if seg is not None:
                pos = _com_positions(pos, masses, seg, n_entities)

            def frame(c, inputs):
                p, valid = inputs
                cos, sin = mesh_trig_sums(
                    p.astype(jnp.float32),
                    n_points=n_points,
                    mesh=plan["mesh"],
                    width=plan["width"],
                    beta=plan["beta"],
                    box=plan["box"],
                    deconv=plan["deconv"],
                )
                ssf_grid = (cos**2 + sin**2).reshape(-1)
                frame_ssf = ssf_grid[flat_idx].reshape(1, -1)
                return {"ssf": c["ssf"] + frame_ssf * valid}, None

            carry, _ = jax.lax.scan(frame, carry, (pos, mask))
            return carry

        self._update = jit_update(update)

    def _prepare(self) -> None:
        self.results.pairs = (
            tuple(combinations_with_replacement(range(self._n_groups), 2))
            if self._mode == "partial"
            else ((0, self._n_groups - 1),)
            if self._mode == "pair"
            else ((None, None),)
        )
        if self._unique:
            self.results.wavenumbers, self._q_group = (
                unique_wavenumber_groups(self._wavenumbers)
            )
        else:
            self.results.wavenumbers = self._wavenumbers
        self.results.units = {
            "results.wavenumbers": ureg.angstrom**-1
        }

        n_pairs = len(self.results.pairs)
        n_q = len(self._wavenumbers)
        self._n_q_real = n_q
        self._factor = self._factor_setup()

        if getattr(self, "_shard", None) == "q":
            # TP-style sharding of the wavevector axis: each device owns
            # a q-tile and sees every atom (positions replicated), so no
            # inter-device reduction is needed until unique-|q| grouping
            # on the host (SURVEY.md section 5.7).  Pad q to a shard
            # multiple with zero vectors (XLA requires even shards).
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import get_mesh

            self._mesh = get_mesh(
                max(1, min(len(jax.devices()), n_q)), axis_name="q"
            )
            n_shards = self._mesh.devices.size
            pad = (-n_q) % n_shards
            wavevectors = np.concatenate(
                (self._wavevectors, np.zeros((pad, 3)))
            )
            qs = jax.device_put(
                jnp.asarray(wavevectors),
                NamedSharding(self._mesh, P("q", None)),
            )
            # The q-tile table rides the CARRY (returned unchanged by
            # the update) rather than being closed over: a closed-over
            # global array is illegal in multi-host jit ("Closing over
            # jax.Array that spans non-addressable devices").
            self._carry = {
                "ssf": jax.device_put(
                    jnp.zeros((n_pairs, n_q + pad), jnp.float64),
                    NamedSharding(self._mesh, P(None, "q")),
                ),
                "qs": qs,
            }
        else:
            self._carry = {
                "ssf": jnp.zeros((n_pairs, n_q), jnp.float64)
            }
            if getattr(self, "_method", "direct") == "mesh":
                self._prepare_mesh()
                return
            qs = jnp.asarray(self._wavevectors)
        pairs = self.results.pairs
        mode = self._mode

        q_in_carry = getattr(self, "_shard", None) == "q"

        def update(carry, positions, dimensions, mask):
            del dimensions
            qs_run = carry["qs"] if q_in_carry else qs
            cos, sin = self._group_trig_sums(
                positions, qs_run
            )  # (B, G, Nq)
            if mode is None:
                total_c = cos.sum(axis=1)
                total_s = sin.sum(axis=1)
                frame_ssf = (total_c**2 + total_s**2)[:, None, :]
            else:
                rows = []
                for j, k in pairs:
                    if j == k:
                        rows.append(cos[:, j] ** 2 + sin[:, j] ** 2)
                    else:
                        rows.append(
                            2 * (cos[:, j] * cos[:, k]
                                 + sin[:, j] * sin[:, k])
                        )
                frame_ssf = jnp.stack(rows, axis=1)  # (B, P, Nq)
            ssf = carry["ssf"] + (
                frame_ssf * mask[:, None, None]
            ).sum(axis=0)
            if q_in_carry:
                return {"ssf": ssf, "qs": carry["qs"]}
            return {"ssf": ssf}

        self._update = jit_update(update)

    def _conclude(self) -> None:
        from ..parallel.mesh import fetch_global

        ssf = fetch_global(self._carry["ssf"])[
            :, : getattr(self, "_n_q_real", None)
        ] / (self.n_frames * self._N)

        if self._unique:
            ssf = group_mean_last_axis(
                ssf, self._q_group, len(self.results.wavenumbers)
            )
        if self._sort:
            order = np.argsort(self.results.wavenumbers)
            self.results.wavenumbers = self.results.wavenumbers[order]
            ssf = ssf[:, order]
        self.results.ssf = ssf

    def calculate_weighted_sum(
        self, weights, *, normalization: str = "b2"
    ) -> np.ndarray:
        r"""Recombine the partial rows into a scattering-weighted
        total (beyond reference),

        .. math::

           S_w(q) = \frac{1}{\mathcal{N}} \sum_{\alpha\beta}
           b_\alpha b_\beta\,\mathrm{Re}\,\langle
           \rho_\alpha(\mathbf{q})\rho_\beta^*(\mathbf{q})\rangle / N

        — e.g. the neutron-weighted total with coherent scattering
        lengths, or X-ray weighting with per-species form-factor
        values at a chosen :math:`q`.  With unit weights and
        ``normalization="none"`` this reproduces the unweighted total
        ``results.ssf`` row sum exactly.

        Parameters
        ----------
        weights : array-like
            Per-group scattering weights :math:`b_\alpha` — shape
            ``(n_groups,)`` for constants (neutron coherent
            lengths), or ``(n_groups, n_wavenumbers)`` for
            q-dependent X-ray form factors :math:`f_\alpha(q)`
            evaluated on ``results.wavenumbers``.
        normalization : `str`, keyword-only, default ``"b2"``
            :math:`\mathcal{N}`: ``"b2"`` — the mean squared weight
            :math:`\langle b^2 \rangle = \sum_\alpha x_\alpha
            b_\alpha^2`; ``"b_mean_sq"`` — :math:`\langle b
            \rangle^2`; ``"none"`` — 1.

        Returns
        -------
        weighted : `numpy.ndarray`
            Weighted total, also stored as
            ``results.weighted_ssf``.
        """

        self.results.weighted_ssf = self._recombine_partials(
            weights, normalization
        )
        return self.results.weighted_ssf

    def _recombine_partials(
        self, weights, normalization: str
    ) -> np.ndarray:
        """Weight-recombine the partial rows WITHOUT touching
        ``results`` (shared by :meth:`calculate_weighted_sum` and
        :meth:`calculate_charge_structure_factor`)."""

        if self._mode != "partial":
            raise ValueError(
                "Weighted recombination needs mode='partial' (every "
                "pair row must be available)."
            )
        weights = np.asarray(
            strip_unit(weights, None)[0], dtype=np.float64
        )
        n_q = self.results.ssf.shape[1]
        if weights.shape not in ((self._n_groups,),
                                 (self._n_groups, n_q)):
            raise ValueError(
                "weights must have shape (n_groups,) or "
                "(n_groups, n_wavenumbers) — the latter for "
                "q-dependent X-ray form factors f(q)."
            )
        if weights.ndim == 1:
            weights = np.broadcast_to(
                weights[:, None], (self._n_groups, n_q)
            )
        rows = np.zeros(n_q)
        for row, (j, k) in zip(
            self.results.ssf, self.results.pairs
        ):
            rows = rows + weights[j] * weights[k] * row
        # scattering-ENTITY counts (COM groupings scatter per
        # residue/segment, not per atom)
        fractions = self._Ns / self._Ns.sum()
        if normalization == "b2":
            norm = (fractions[:, None] * weights**2).sum(axis=0)
        elif normalization == "b_mean_sq":
            norm = (fractions[:, None] * weights).sum(axis=0) ** 2
        elif normalization == "none":
            norm = 1.0
        else:
            raise ValueError(
                "Invalid normalization. Valid values: 'b2', "
                "'b_mean_sq', 'none'."
            )
        return rows / norm

    def calculate_charge_structure_factor(
        self, charges=None
    ) -> np.ndarray:
        r"""Charge–charge structure factor from the partial rows
        (beyond reference),

        .. math::

           S_{ZZ}(q) = \frac{1}{N} \left\langle \left|
           \sum_i z_i e^{i\mathbf{q}\cdot\mathbf{r}_i}
           \right|^2 \right\rangle
           = \sum_{\alpha\beta} z_\alpha z_\beta\,
           \mathrm{Re}\,\langle \rho_\alpha(\mathbf{q})
           \rho_\beta^*(\mathbf{q})\rangle / N

        — the electrolyte/ionic-liquid screening observable.  The
        Stillinger–Lovett conditions require
        :math:`S_{ZZ}(q \to 0) \to 0` (perfect screening) with
        leading :math:`q^2` growth; see
        :meth:`calculate_screening_length`.

        Parameters
        ----------
        charges : array-like, optional
            Per-group entity charges :math:`z_\alpha` (e).  `None`
            resolves each group's uniform entity charge from the
            topology (atom charges, or residue/segment totals for
            COM groupings); non-uniform groups raise.

        Returns
        -------
        charge_ssf : `numpy.ndarray`
            :math:`S_{ZZ}(q)`, also stored as
            ``results.charge_ssf``.
        """

        from .profile import _resolve_group_charges

        if self._mode != "partial":
            raise ValueError(
                "The charge structure factor needs mode='partial' "
                "(every pair row must be available)."
            )
        z = _resolve_group_charges(
            self._groups, self._groupings, charges, False,
            what="charge structure factor",
        )
        if z is None:
            raise ValueError(
                "A group has non-uniform entity charges; pass "
                "charges=[z_1, ...] explicitly."
            )
        self.results.charge_ssf = self._recombine_partials(
            z, "none"
        )
        return self.results.charge_ssf

    def calculate_screening_length(
        self, *, q_max=None, charges=None
    ) -> float:
        r"""Charge screening length from the low-:math:`q` charge
        structure factor (beyond reference): fit

        .. math::

           S_{ZZ}(q) = \frac{A\,q^2}{q^2 + \kappa^2},
           \qquad \lambda_\mathrm{s} = 1/\kappa

        — the Debye–Hückel form (for which :math:`A = \langle z^2
        \rangle` and :math:`\kappa` is the inverse Debye length);
        concentrated electrolytes deviate (underscreening:
        :math:`\lambda_\mathrm{s}` *grows* with concentration past
        the Kirkwood point, e.g. Lee et al., *Phys. Rev. Lett.*
        **119**, 026002 (2017)).

        Parameters
        ----------
        q_max : `float` or unit-bearing quantity, keyword-only, \
        optional
            Fit window upper edge (Å⁻¹).  Defaults to the tenth
            smallest positive wavenumber — the Debye :math:`q^2`
            form only holds at low :math:`q`, well below the
            charge-ordering peak; set `q_max` explicitly below that
            peak for production fits.
        charges : array-like, keyword-only, optional
            Forwarded to :meth:`calculate_charge_structure_factor`
            when ``results.charge_ssf`` is absent.

        Returns
        -------
        screening_length : `float`
            :math:`\lambda_\mathrm{s} = 1/\kappa` (Å), also stored
            as ``results.screening_length`` (with
            ``results.charge_ssf_fit`` holding ``(A, kappa)`` and
            the fit window + fitted curve in
            ``results.charge_ssf_fit_q`` /
            ``results.charge_ssf_fit_curve``).
        """

        from scipy import optimize

        if getattr(self.results, "charge_ssf", None) is None:
            self.calculate_charge_structure_factor(charges)
        if q_max is not None and not isinstance(q_max, Real):
            q_max = strip_unit(q_max, "1/angstrom")[0]
        q = np.asarray(self.results.wavenumbers, dtype=np.float64)
        s = np.asarray(self.results.charge_ssf, dtype=np.float64)
        if q_max is None:
            positive = np.sort(q[q > 0])
            if len(positive) == 0:
                raise ValueError("No positive wavenumbers.")
            q_max = float(positive[min(9, len(positive) - 1)])
        window = (q > 0) & (q <= q_max)
        if window.sum() < 3:
            raise ValueError(
                "Fewer than 3 wavenumbers below q_max; increase "
                "q_max, use a larger box, or a denser wavevector "
                "grid."
            )
        qf, sf = q[window], s[window]
        a0 = max(float(sf[-1]), 1e-6)
        (a, kappa), _ = optimize.curve_fit(
            lambda x, a, k: a * x * x / (x * x + k * k),
            qf,
            sf,
            p0=(a0, max(float(qf[0]), 1e-3)),
            bounds=(0, np.inf),
            maxfev=10000,
        )
        if kappa <= 1e-3 * float(qf[0]):
            # an inverse length far below the smallest resolvable
            # wavenumber is indistinguishable from zero suppression
            raise ValueError(
                "The fit resolved no q^2 suppression in the window "
                "(kappa -> 0): S_ZZ is flat there — either the "
                "window sits past the low-q regime (decrease "
                "q_max) or the system shows no charge screening "
                "over the accessible wavenumbers."
            )
        self.results.charge_ssf_fit = np.array([a, kappa])
        self.results.charge_ssf_fit_q = qf
        self.results.charge_ssf_fit_curve = (
            a * qf * qf / (qf * qf + kappa * kappa)
        )
        self.results.screening_length = float(1.0 / kappa)
        units = getattr(self.results, "units", None)
        if units is not None:
            units["results.screening_length"] = ureg.angstrom
        return self.results.screening_length


def _resolve_lag_values(spec, n_lags, n_frames):
    """Resolve a ``lags=`` specification against the ring length
    ``n_lags`` (``None`` = analyzed frame count) — shared by the ISF
    lag ring and the van Hove ring.  Returns ``(lag_values, n_lags)``
    with ``lag_values`` an ascending `numpy` array of frame offsets.
    """

    resolved = n_lags or n_frames
    if resolved > n_frames:
        resolved = n_frames
    if spec is None:
        lag_values = np.arange(resolved)
    elif isinstance(spec, str):
        if spec != "log":
            raise ValueError(f"Invalid lags specification: {spec!r}.")
        # Every lag through 8, then quarter-octave geometric
        # spacing; always include the longest resident lag.
        short = np.arange(min(resolved, 9))
        if resolved > 9:
            geometric = np.round(
                2.0 ** np.arange(3.0, np.log2(resolved - 1) + 0.25,
                                 0.25)
            ).astype(np.int64)
            lag_values = np.union1d(
                np.union1d(short, geometric[geometric < resolved]),
                [resolved - 1],
            )
        else:
            lag_values = short
    else:
        lag_values = np.unique(np.asarray(spec, dtype=np.int64))
        if len(lag_values) == 0 or lag_values[0] < 0:
            raise ValueError(
                "lags must be non-negative frame offsets."
            )
        if n_lags is None:
            resolved = min(int(lag_values[-1]) + 1, n_frames)
        dropped = lag_values[lag_values >= resolved]
        if len(dropped):
            raise ValueError(
                f"lags {dropped.tolist()} are not below n_lags "
                f"({resolved}; n_lags is capped at the analyzed "
                f"frame count {n_frames}) — the ring holds "
                "lags 0..n_lags - 1 only."
            )
    return lag_values, resolved


def _check_even_frame_spacing(frames) -> int:
    """Validate evenly spaced, forward-in-time frame selections (lag
    rings index time in frame steps); returns the frame step."""

    df = np.diff(frames)
    if len(df) and (df[0] <= 0 or not np.allclose(df, df[0])):
        raise ValueError(
            "The selected frames must be evenly spaced and proceed "
            "forward in time."
        )
    return int(df[0]) if len(df) else 1


class IntermediateScatteringFunction(StructureFactor):
    r"""Coherent :math:`F(q, t)`, partial :math:`F_{\alpha\beta}(q,t)`
    and incoherent (self) :math:`F_s(q, t)` intermediate scattering
    functions.

    Parity: ``analysis/structure.py:1552-2127``.  The reference keeps a
    host-side ring buffer of per-frame :math:`\sum_j e^{iqr_j}` values
    of length ``n_lags`` and cross-multiplies against all resident lags
    every frame; here the ring buffer is a device-resident
    ``(n_lags, G, N_q)`` carry updated inside a :func:`jax.lax.scan`
    over the frame axis, with the per-frame lag products vectorized as
    a gather + elementwise contraction.  The update is order-dependent,
    so execution is always single-device (``_sequential``).

    Extra parameters over :class:`StructureFactor`:

    dt : `float`, keyword-only, optional
        Time between frames (defaults to the trajectory's ``dt``).
    n_lags : `int`, keyword-only, optional
        Number of time lags (defaults to the analyzed frame count).
    lags : `str` or array-like, keyword-only, optional
        Subset of lag indices to evaluate (all of ``0..n_lags - 1``
        by default).  ``"log"`` selects a logarithmic grid (every lag
        through 8, then quarter-octave spacing) — the standard
        correlator layout for dynamics spanning decades in time, and
        an :math:`O(n_\mathrm{lags}) \to O(\log n_\mathrm{lags})`
        cut of the per-frame cost on the ring path (each incoherent
        lag costs a full displacement trig sweep).  An explicit
        integer array selects exactly those lags; with no ``n_lags``
        the ring shrinks to ``max(lags) + 1`` frames.
    incoherent : `bool`, keyword-only, default False
        Also compute :math:`F_s(q, t)` (keeps an ``(n_lags, N, 3)``
        position ring buffer on device).
    fft : `bool`, keyword-only, optional
        Coherent-only runs default to the Wiener-Khinchin time-FFT
        estimator: per-frame :math:`\rho(\mathbf{q})` sums stream to
        a host store and every lag's correlation evaluates as one FFT
        per (group, q) — the identical triangular-normalized
        statistics of the lag ring at :math:`O(1)` instead of
        :math:`O(n_\mathrm{lags})` per-frame cost, without the
        sequential constraint (``parallel=True`` works).
        ``fft=False`` forces the reference-parity ring buffer;
        ``incoherent=True`` implies the ring (the self part needs
        per-particle phases at every lag).
    """

    _sequential = True

    def __init__(
        self,
        groups,
        groupings="atoms",
        *,
        mode: str = None,
        form: str = "exp",
        dimensions=None,
        dt=None,
        n_points: int = 32,
        n_surfaces: int = None,
        n_surface_points: int = 8,
        q_max=None,
        wavevectors: np.ndarray = None,
        sort: bool = True,
        unique: bool = True,
        n_lags: int = None,
        lags=None,
        incoherent: bool = False,
        fft: bool = None,
        parallel: bool = False,
        precision: str = "auto",
        verbose: bool = True,
        **kwargs,
    ) -> None:
        super().__init__(
            groups,
            groupings,
            mode=mode,
            form=form,
            dimensions=dimensions,
            n_points=n_points,
            n_surfaces=n_surfaces,
            n_surface_points=n_surface_points,
            q_max=q_max,
            wavevectors=wavevectors,
            sort=sort,
            unique=unique,
            parallel=parallel,
            precision=precision,
            verbose=verbose,
            **kwargs,
        )
        if getattr(self, "_shard", None) is not None:
            # The ISF update is order-dependent (the lag ring buffer
            # is a sequential scan carry), so neither frame- nor
            # q-sharding applies; silently ignoring the request would
            # hand back an undistributed run.
            raise ValueError(
                "IntermediateScatteringFunction does not support "
                "shard= (the lag ring buffer is sequential)."
            )
        self._dt = strip_unit(dt or self._trajectory.dt, "picosecond")[0]
        self._n_lags = n_lags
        self._lag_spec = lags
        self._incoherent = incoherent
        if fft and incoherent:
            raise ValueError(
                "fft=True requires incoherent=False: the self part "
                "needs per-particle phases at every lag (the ring "
                "buffer bounds that memory; a time FFT would need "
                "the full (N_t, N_q, N) phase history)."
            )
        # Coherent-only runs default to the Wiener-Khinchin time-FFT
        # estimator: rho(q, t) streams to a host store and ALL-lag
        # correlations evaluate as one FFT per (group, q) in the
        # conclusion — identical triangular-normalized statistics to
        # the reference's ring buffer at O(1) per-frame cost instead
        # of O(n_lags), and without the sequential constraint (frame
        # sharding works).  fft=False restores the ring path.
        self._time_fft = (
            not incoherent if fft is None else bool(fft)
        )
        if self._time_fft:
            self._sequential = False

    def _prepare(self) -> None:
        lag_values, n_lags = _resolve_lag_values(
            self._lag_spec, self._n_lags, self.n_frames
        )
        self._lag_values = lag_values
        self._lags = len(lag_values)
        step = _check_even_frame_spacing(self.frames)

        self.results.pairs = (
            tuple(combinations_with_replacement(range(self._n_groups), 2))
            if self._mode == "partial"
            else ((0, self._n_groups - 1),)
            if self._mode == "pair"
            else ((None, None),)
        )
        self.results.times = step * self._dt * lag_values
        if self._unique:
            self.results.wavenumbers, self._q_group = (
                unique_wavenumber_groups(self._wavenumbers)
            )
        else:
            self.results.wavenumbers = self._wavenumbers
        self.results.units = {
            "results.times": ureg.picosecond,
            "results.wavenumbers": ureg.angstrom**-1,
        }

        n_q = len(self._wavenumbers)
        n_groups = 1 if self._mode is None else self._n_groups
        n_pairs = 1 if self._mode is None else len(self.results.pairs)
        qs = jnp.asarray(self._wavevectors)
        pairs = self.results.pairs
        mode = self._mode
        incoherent = self._incoherent

        # Rings live in the STREAM dtype: on TPU the per-frame trig
        # sums are float32 (double-float exactness applies inside the
        # sweep, the returned sums are f32-rounded), so float64 rings
        # would only add emulated-f64 ring traffic without precision
        # (lag products of f32 values err ~1e-7 relative, well under
        # the phase fidelity); the cisf/iisf ACCUMULATORS stay f64.
        # On CPU (f64 streams) the rings remain f64.
        ring_dtype = jnp.dtype(self._stream_dtype())
        self._carry = {
            "ring_cos": jnp.zeros((n_lags, n_groups, n_q), ring_dtype),
            "ring_sin": jnp.zeros((n_lags, n_groups, n_q), ring_dtype),
            "cisf": jnp.zeros(
                (len(lag_values), n_pairs, n_q), jnp.float64
            ),
            "frame": jnp.zeros((), jnp.int64),
        }
        if incoherent:
            self._carry["ring_pos"] = jnp.zeros(
                (n_lags, self._N, 3), ring_dtype
            )
            self._carry["iisf"] = jnp.zeros(
                (len(lag_values), n_groups, n_q), jnp.float64
            )

        group_slices = []
        offset = 0
        for n in self._Ns:
            group_slices.append((offset, int(n)))
            offset += int(n)

        n_cols_isf = len(self._atom_indices)

        def frame_positions(positions):
            """(B, N_sel, 3) -> (B, N_grouped, 3) group-ordered
            positions (COMs where requested)."""

            parts = []
            for group, grouping, sel, seg, n in zip(
                self._groups, self._groupings, self._sels, self._segs,
                self._Ns,
            ):
                pos = _column_selector(sel, n_cols_isf)(positions)
                if seg is not None:
                    pos = _com_positions(
                        pos, jnp.asarray(group.masses),
                        jnp.asarray(seg), n,
                    )
                parts.append(pos)
            return jnp.concatenate(parts, axis=1)

        lag_range = jnp.asarray(lag_values)

        use_mesh = getattr(self, "_method", "direct") == "mesh"
        if use_mesh:
            from ..ops.mesh_scattering import mesh_trig_sums

            mesh_plan_, mesh_idx, mesh_np = self._mesh_setup()
        self._factor = self._factor_setup()
        if self._factor is not None:
            from ..ops.factor_scattering import factor_trig_sums

            factor_plan_ = self._factor
            factor_idx = jnp.asarray(factor_plan_["flat_idx"])
            factor_split = getattr(self, "_factor_split", None)
            if factor_split is not None:
                factor_qs_rest = jnp.asarray(factor_split["qs_rest"])
                factor_inv = jnp.asarray(factor_split["inv_perm"])

        def group_sums(pos, prec, qs_t):
            """Per-group (G, Nq) cos/sin sums for one frame's grouped
            positions — direct trig sums, factorized lattice sums, or
            mesh gridding."""

            def one(p):
                if use_mesh:
                    cos, sin = mesh_trig_sums(
                        p.astype(jnp.float32),
                        n_points=mesh_np,
                        mesh=mesh_plan_["mesh"],
                        width=mesh_plan_["width"],
                        beta=mesh_plan_["beta"],
                        box=mesh_plan_["box"],
                        deconv=mesh_plan_["deconv"],
                    )
                    return (
                        cos.reshape(-1)[mesh_idx],
                        sin.reshape(-1)[mesh_idx],
                    )
                if self._use_factor(p):
                    cos, sin = factor_trig_sums(
                        p,
                        k=factor_plan_["k"],
                        box=factor_plan_["box"],
                        precision=prec,
                    )
                    cos, sin = cos[factor_idx], sin[factor_idx]
                    if factor_split is None:
                        return cos, sin
                    cr, sr = trig_sums_frame(
                        factor_qs_rest, p, precision=prec
                    )
                    return (
                        jnp.concatenate((cos, cr))[factor_inv],
                        jnp.concatenate((sin, sr))[factor_inv],
                    )
                return trig_sums_frame(qs_t, p, precision=prec)

            if mode is None:
                c, s = one(pos)
                return jnp.stack([c]), jnp.stack([s])
            cos_rows, sin_rows = [], []
            for lo, n in group_slices:
                c, s = one(jax.lax.dynamic_slice_in_dim(pos, lo, n))
                cos_rows.append(c)
                sin_rows.append(s)
            return jnp.stack(cos_rows), jnp.stack(sin_rows)

        if self._time_fft:
            # Wiener-Khinchin path (coherent only): stream per-frame
            # rho(q) sums to a host store; correlations evaluate in
            # _conclude as one FFT per (group, q).  No lag products,
            # no sequential carry — frames may shard.
            self._rho = np.empty((self.n_frames, n_groups, n_q, 2))
            self._store_offset = 0
            self._store_chunk = self._store_rho
            # the rho store is the only mid-stream state on this path
            self._checkpointable_stores = True
            self._checkpoint_attrs = lambda: ("_rho",)
            self._carry = jnp.zeros(())

            def fft_update(carry, positions, dimensions, mask):
                del dimensions, mask
                grouped = frame_positions(positions)

                def one_frame(pos):
                    prec = self._resolve_precision(pos)
                    cos, sin = group_sums(pos, prec, qs)
                    return jnp.stack((cos, sin), axis=-1)

                rho = jax.lax.map(one_frame, grouped)
                return carry, rho

            self._update = jit_update(fft_update)
            return

        self._store_chunk = None
        # The ring scan program tolerates device-resident carry chains
        # (unlike the RDF Pallas program, which collapses >8x without
        # the host round trip): a one-leaf fetch bounds the dispatch
        # queue without paying the multi-MB ring transfer per chunk —
        # interleaved tunnel A/B measured 10.3 vs 8.0 frames/s
        # (one-leaf vs full-fetch, both pairs; RDF measured 2.1 vs
        # 21.7 the other way, so this stays a ring-local policy).
        self._sync_carry_bytes = 0

        def scan_step(carry, inputs):
            pos, valid = inputs  # (N, 3), scalar mask
            prec = self._resolve_precision(pos)
            # trig_sums_frame runs in pos.dtype internally (f64 qs are
            # split hi + lo on the exact path, so no q precision loss).
            qs_t = qs
            fi = carry["frame"]
            rcfi = (fi % n_lags).astype(jnp.int32)

            # Current frame's per-group trig sums, shape (G, Nq).
            cur_cos, cur_sin = group_sums(pos, prec, qs_t)

            ring_cos = jnp.where(
                valid > 0,
                carry["ring_cos"].at[rcfi].set(cur_cos),
                carry["ring_cos"],
            )
            ring_sin = jnp.where(
                valid > 0,
                carry["ring_sin"].at[rcfi].set(cur_sin),
                carry["ring_sin"],
            )

            # Resident lags: rifi[i] = (fi - lag_i) mod n_lags for
            # each selected lag value, valid when lag_i <= fi.
            rifi = ((fi - lag_range) % n_lags).astype(jnp.int32)
            lag_ok = (
                (lag_range <= fi) & (valid > 0)
            ).astype(jnp.float64)
            past_cos = ring_cos[rifi]  # (n_lags, G, Nq)
            past_sin = ring_sin[rifi]

            if mode is None:
                contrib = (
                    past_cos[:, 0] * cur_cos[0]
                    + past_sin[:, 0] * cur_sin[0]
                )[:, None, :]
            else:
                rows = []
                for j, k in pairs:
                    if j == k:
                        rows.append(
                            past_cos[:, j] * cur_cos[j]
                            + past_sin[:, j] * cur_sin[j]
                        )
                    else:
                        rows.append(
                            past_cos[:, j] * cur_cos[k]
                            + past_sin[:, j] * cur_sin[k]
                            + past_cos[:, k] * cur_cos[j]
                            + past_sin[:, k] * cur_sin[j]
                        )
                contrib = jnp.stack(rows, axis=1)
            cisf = carry["cisf"] + contrib * lag_ok[:, None, None]

            new_carry = {
                "ring_cos": ring_cos,
                "ring_sin": ring_sin,
                "cisf": cisf,
                "frame": fi + (valid > 0),
            }

            if incoherent:
                ring_pos = jnp.where(
                    valid > 0,
                    carry["ring_pos"].at[rcfi].set(pos),
                    carry["ring_pos"],
                )

                # One factorized displacement sweep per selected lag.
                # Batching 8 lags under vmap was tried and REVERTED:
                # bracketed tunnel A/B measured it ~7% SLOWER (4.51 /
                # 4.46 vs 4.82 / 4.77 frames/s, both pairs) — the
                # sweep loop is not the phase's bottleneck (the
                # sequential frame scan + ring bookkeeping is), and
                # the batched tables only added HBM traffic.
                # Displacement phases are small, so the fast path is
                # accurate; the mesh path wraps deltas periodically
                # (e^{iq.dr} is box-periodic).
                def lag_body(lag, iisf):
                    past = ring_pos[rifi[lag]]
                    delta = pos - past
                    rows, _ = group_sums(delta, "fast", qs_t)
                    return iisf.at[lag].add(rows * lag_ok[lag])

                new_carry["iisf"] = jax.lax.fori_loop(
                    0, len(lag_values), lag_body, carry["iisf"]
                )
                new_carry["ring_pos"] = ring_pos
            return new_carry, None

        def update(carry, positions, dimensions, mask):
            del dimensions
            grouped = frame_positions(positions)
            carry, _ = jax.lax.scan(scan_step, carry, (grouped, mask))
            return carry

        self._update = jit_update(update)

    def _store_rho(self, rho, batch) -> None:
        rho = np.asarray(rho)
        n_real = batch.n_real
        self._rho[
            self._store_offset:self._store_offset + n_real
        ] = rho[:n_real]
        self._store_offset += n_real

    def _conclude_time_fft(self) -> np.ndarray:
        """All-lag coherent F(q, t) from the stored rho(q, t) series
        via the Fast Correlation Algorithm — the same
        triangular-normalized estimator the lag ring accumulates
        (every (t0, t0+t) window position), evaluated as one FFT per
        (group, q) instead of n_lags products per frame."""

        from ..algorithm import correlation

        z = self._rho[..., 0] + 1j * self._rho[..., 1]  # (T, G, Nq)
        rows = []
        for j, k in self.results.pairs:
            if j is None:
                j = k = 0
            if j == k:
                corr = correlation.correlation_fft(z[:, j], axis=0)
            else:
                # Symmetric cross term: the folded (double) CCF is
                # exactly the ring's j<->k product sum.
                corr = correlation.correlation_fft(
                    z[:, j], z[:, k], axis=0, double=True
                )
            rows.append(np.real(np.asarray(corr))[self._lag_values])
        return np.stack(rows, axis=1) / self._N

    def _conclude(self) -> None:
        if self._time_fft:
            cisf = self._conclude_time_fft()
            iisf = None
        else:
            # Triangular normalization: lag l averages over the
            # n_frames - l windows that contain it.
            normalization = (
                self._N
                * (self.n_frames - self._lag_values)[:, None, None]
            )
            cisf = np.asarray(self._carry["cisf"]) / normalization
            iisf = (
                np.asarray(self._carry["iisf"]) / normalization
                if self._incoherent
                else None
            )

        if self._unique:
            n_unique = len(self.results.wavenumbers)
            cisf = group_mean_last_axis(cisf, self._q_group, n_unique)
            if iisf is not None:
                iisf = group_mean_last_axis(
                    iisf, self._q_group, n_unique
                )
        if self._sort:
            order = np.argsort(self.results.wavenumbers)
            self.results.wavenumbers = self.results.wavenumbers[order]
            cisf = cisf[:, :, order]
            if iisf is not None:
                iisf = iisf[:, :, order]

        self.results.cisf = cisf
        if iisf is not None:
            self.results.iisf = iisf

    def calculate_dynamic_structure_factor(
        self,
        *,
        t_max: Union[float, "Q_"] = None,
        window: str = None,
    ) -> None:
        r"""Dynamic structure factor :math:`S(q, \omega)` — the time
        Fourier transform of the computed :math:`F(q, t)` (beyond
        reference; the reference stops at :math:`F(q, t)`,
        ``analysis/structure.py:1552-2127``):

        .. math::

           S(q, \omega) = \frac{1}{2\pi} \int_{-\infty}^{\infty}
           F(q, t)\, e^{-i\omega t}\, dt
           = \frac{1}{\pi} \int_0^{\infty} F(q, t) \cos(\omega t)\,dt

        using the classical even extension :math:`F(q, -t) = F(q, t)`
        (the streamed estimator is real).  The one-sided cosine
        transform evaluates as a trapezoid-weighted real FFT on the
        ``rfftfreq`` angular grid, so :math:`\sum_j S(q, \omega_j)
        \Delta\omega \approx F(q, 0)` (the sum rule) holds to
        quadrature accuracy.

        Requires a DENSE, evenly spaced lag grid (the default
        ``lags=None``); a ``lags="log"`` run cannot be transformed
        (the FFT needs uniform sampling).

        Parameters
        ----------
        t_max : `float` or `pint.Quantity`, keyword-only, optional
            Truncate :math:`F(q, t)` at this lag time (ps) before the
            transform.  The triangular-normalized estimator is
            noise-dominated at lags approaching the window length;
            a few relaxation times is the usual choice.  Default:
            the full lag window.
        window : `str`, keyword-only, optional
            Apodization applied to the positive-lag data before the
            transform: ``None`` (default, plain trapezoid) or
            ``"hann"`` (half-Hann taper, suppressing truncation
            ringing when :math:`F` has not fully decayed at the last
            kept lag).

        Returns
        -------
        Populates ``results.angular_frequencies`` (rad/ps, the
        non-negative half), ``results.dsf`` with shape
        ``(N_freq, N_pairs, N_q)`` aligned with ``results.cisf``'s
        trailing axes, and — for ``incoherent=True`` runs —
        ``results.idsf`` from ``results.iisf``.
        """

        if "cisf" not in self.results:
            raise RuntimeError(
                "Call run() before "
                "calculate_dynamic_structure_factor()."
            )
        times = np.asarray(self.results.times, dtype=np.float64)
        if len(times) < 2:
            raise ValueError(
                "The dynamic structure factor needs at least two "
                "time lags."
            )
        dt_lag = np.diff(times)
        if not np.allclose(dt_lag, dt_lag[0]):
            raise ValueError(
                "calculate_dynamic_structure_factor() requires a "
                "dense, evenly spaced lag grid — rerun with the "
                "default lags=None (a 'log' or index-subset lag grid "
                "cannot be Fourier transformed)."
            )
        dt_lag = float(dt_lag[0])

        def transform(f):
            f = np.asarray(f, dtype=np.float64)
            if t_max is not None:
                keep_t, _ = strip_unit(t_max, "picosecond")
                keep = max(2, min(len(f), int(round(keep_t / dt_lag)) + 1))
                f = f[:keep]
            n_t = f.shape[0]
            # Trapezoid end-point halving; optional half-Hann taper.
            weights = np.ones(n_t)
            if window is not None:
                if window != "hann":
                    raise ValueError(
                        f"Invalid window: {window!r}. Valid values: "
                        "None, 'hann'."
                    )
                k = np.arange(n_t)
                weights = 0.5 * (1.0 + np.cos(np.pi * k / (n_t - 1)))
            weights[0] *= 0.5
            weights[-1] *= 0.5
            spec = np.fft.rfft(
                weights[:, None, None] * f, axis=0
            ).real
            return (dt_lag / np.pi) * spec, n_t

        dsf, n_t = transform(self.results.cisf)
        self.results.angular_frequencies = (
            2.0 * np.pi * np.fft.rfftfreq(n_t, dt_lag)
        )
        self.results.dsf = dsf
        self.results.units["results.angular_frequencies"] = (
            ureg.picosecond**-1
        )
        self.results.units["results.dsf"] = ureg.picosecond
        if "iisf" in self.results:
            self.results.idsf, _ = transform(self.results.iisf)
            self.results.units["results.idsf"] = ureg.picosecond


class VanHoveFunction(SerialAnalysisBase):
    r"""Van Hove space–time correlation function :math:`G(r, t)`.

    .. math::

       G(r, t) = \underbrace{\frac{1}{N}\Bigl\langle\sum_i
       \delta\bigl(r - |\mathbf{r}_i(t) - \mathbf{r}_i(0)|\bigr)
       \Bigr\rangle}_{G_\mathrm{s}(r,t)\ \text{(self)}}
       + \underbrace{\frac{1}{N}\Bigl\langle\sum_{i \ne j}
       \delta\bigl(r - |\mathbf{r}_j(t) - \mathbf{r}_i(0)|\bigr)
       \Bigr\rangle}_{G_\mathrm{d}(r,t)\ \text{(distinct)}}

    A beyond-reference capability: the reference computes only the
    :math:`t = 0` limit (`RadialDistributionFunction`, reference
    ``analysis/structure.py:444-1032``) and the reciprocal-space
    transform (`IntermediateScatteringFunction`, reference
    ``analysis/structure.py:1552-2127``); the real-space
    :math:`G(r, t)` reuses both of this framework's device designs —
    the :class:`IntermediateScatteringFunction` position ring buffer
    (an ``(n_lags, N, 3)`` carry in a :func:`jax.lax.scan` over the
    frame axis) and the RDF's tiled MXU one-hot pair binning
    (:func:`mdhelper_tpu.ops.histogram.radial_histogram_frame`).
    Each streamed frame cross-histograms against every resident lag,
    so the per-frame cost is ``len(lags)`` pair sweeps — use
    ``lags="log"`` (the multiple-tau correlator grid) for dynamics
    spanning decades in time.

    Results (lag rows follow ``results.times``):

    - ``results.counts_self`` — raw displacement counts,
      ``(n_lags, n_bins)``.
    - ``results.counts_distinct`` — raw distinct-pair counts (ordered
      pairs, ``i != j``).
    - ``results.gs`` — :math:`G_\mathrm{s}(r, t)` normalized as a
      probability density: :math:`\int G_\mathrm{s}\,4\pi r^2 dr = 1`
      when every displacement falls inside `range`.
    - ``results.gd`` — the distinct part normalized like a time-lagged
      RDF: :math:`g_\mathrm{d}(r, 0) = g(r)` and
      :math:`g_\mathrm{d}(r, t) \to 1` as :math:`r \to \infty`.
    - ``results.msd`` — the displacement second moment
      :math:`\langle r^2(t)\rangle` (accumulated exactly from the
      minimum-image displacements, not from the binned histogram).
    - ``results.alpha2`` — the non-Gaussian parameter
      :math:`\alpha_2(t) = 3\langle r^4\rangle /
      (5\langle r^2\rangle^2) - 1`, the standard companion to
      :math:`G_\mathrm{s}` for dynamic-heterogeneity analysis.

    Minimum-image caveat (shared with every wrapped-trajectory
    :math:`G_\mathrm{s}` estimator): displacements are meaningful
    while :math:`|\Delta\mathbf{r}| < L/2` per axis between the two
    frames of a lag — use lag times short enough that particles do
    not diffuse half a box.

    Kernel routing: on a real TPU with a box at least 3 histogram
    ranges per axis (perpendicular widths for triclinic cells; any
    uniform ``range``, incl. ``range[0] > 0`` via offset-grid
    binning), the distinct part rides the Pallas cross cell kernel
    and the chunk size is capped so one device execution stays ~20 s
    (the brute :math:`O(N^2)` sweep at 100k atoms x a dense lag grid
    packs minutes of work into one execution, which tunnel-attached
    runtimes kill; bisected in BASELINE.md round 3).
    ``MDTPU_VANHOVE_IMPL=xla`` forces the brute sweep (boxes under 3
    ranges per axis also use it); when even one frame's selected-lag
    brute sweep exceeds the budget, the lag grid splits across
    executions of one compiled step (with a warning) — no
    configuration packs an execution past the watchdog.  The two
    exact paths
    implement two self-consistent float64 bin-boundary conventions
    (``np.histogram(range=...)`` vs explicit edges) that can differ
    on exact-tie pairs by ~1e-7 of the counts — adjacent-bin
    straddles only, physically irrelevant.

    Parameters
    ----------
    group : `AtomGroup`
        Atoms (or grouping entities) to analyze.
    n_bins : `int`, default 201
        Number of radial histogram bins.
    range : array-like, default ``(0.0, 15.0)``
        Radii range (should stay below half the box).
    grouping : `str`, keyword-only, default ``"atoms"``
        ``"atoms"``, ``"residues"`` or ``"segments"`` (COM positions).
    dt : `float` or `pint.Quantity`, keyword-only, optional
        Time between frames (defaults to the trajectory's ``dt``).
    n_lags : `int`, keyword-only, optional
        Ring length in frames (defaults to the analyzed frame count).
    lags : `str` or array-like, keyword-only, optional
        Lag subset — ``"log"`` or explicit frame offsets (see
        :class:`IntermediateScatteringFunction`).
    self_part, distinct_part : `bool`, keyword-only, default True
        Which parts to accumulate (the distinct part pays the
        per-lag pair sweep; the self part is :math:`O(N)`).
    reduced : `bool`, keyword-only, default False
        Data is in reduced (LJ) units (affects ``results.units``
        only; the histogram math is unitless).
    """

    _sequential = True

    def __init__(
        self,
        group,
        n_bins: int = 201,
        range: tuple = (0.0, 15.0),
        *,
        grouping: str = "atoms",
        dt=None,
        n_lags: int = None,
        lags=None,
        self_part: bool = True,
        distinct_part: bool = True,
        capacity_sigmas: float = 4.0,
        reduced: bool = False,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        self.group = group
        self.universe = group.universe
        super().__init__(self.universe.trajectory, verbose, **kwargs)
        self._capacity_sigmas = float(capacity_sigmas)

        if not (self_part or distinct_part):
            raise ValueError(
                "At least one of self_part/distinct_part is required."
            )
        self._grouping = _validate_groupings(grouping)[0]
        self._n_bins = int(n_bins)
        self._range = tuple(range)
        self._self_part = bool(self_part)
        self._distinct_part = bool(distinct_part)
        self._reduced = reduced
        self._n_lags = n_lags
        self._lag_spec = lags
        self._dt = strip_unit(dt or self._trajectory.dt, "picosecond")[0]

        self._require_box(type(self).__name__)
        self._setup_periodic_box()

        self._atom_indices = np.asarray(group.ix)
        self._seg, self._n = _group_segment_ids(group, self._grouping)

    def _use_cell_kernel(self) -> bool:
        """Route the distinct-part pair sweeps through the Pallas
        cross cell kernel (same eligibility as the RDF: real TPU, ANY
        periodic box — generalized reach / per-pair triclinic
        minimum image for boxes under 3 histogram ranges per axis —
        any uniform ``range``, incl. ``range[0] > 0`` via the
        offset-grid binning).  ``MDTPU_VANHOVE_IMPL=xla`` forces the
        brute tiled sweep."""

        import os

        if os.environ.get("MDTPU_VANHOVE_IMPL") == "xla":
            return False
        if jax.default_backend() != "tpu":
            return False
        if not self._distinct_part:
            return False
        dims = self.universe.dimensions
        if dims is None:
            return False
        return bool(np.all(self._cell_plan_box() > 0))

    def _cell_plan_box(self):
        return _pallas_plan_extents(
            self.universe.dimensions, self._triclinic
        )

    def _prepare(self) -> None:
        lag_values, n_lags = _resolve_lag_values(
            self._lag_spec, self._n_lags, self.n_frames
        )
        self._lag_values = lag_values
        step = _check_even_frame_spacing(self.frames)

        self.results.edges = np.linspace(*self._range, self._n_bins + 1)
        self.results.bins = (
            self.results.edges[:-1] + self.results.edges[1:]
        ) / 2
        self.results.times = step * self._dt * lag_values
        self.results.units = {}
        if not self._reduced:
            self.results.units = {
                "results.bins": ureg.angstrom,
                "results.edges": ureg.angstrom,
                "results.times": ureg.picosecond,
                "results.gs": ureg.angstrom**-3,
            }

        n_sel = len(lag_values)
        ring_dtype = jnp.dtype(self._stream_dtype())
        self._carry = {
            "ring": jnp.zeros((n_lags, self._n, 3), ring_dtype),
            "self": jnp.zeros((n_sel, self._n_bins), jnp.float64),
            "distinct": jnp.zeros((n_sel, self._n_bins), jnp.float64),
            "m2": jnp.zeros(n_sel, jnp.float64),
            "m4": jnp.zeros(n_sel, jnp.float64),
            "origins": jnp.zeros(n_sel, jnp.float64),
            "volume": jnp.zeros((), jnp.float64),
            "frame": jnp.zeros((), jnp.int64),
        }
        # Ring-program sync policy: like the ISF ring (and unlike the
        # RDF Pallas program), the scan chains cleanly — a one-leaf
        # fetch bounds the dispatch queue without shipping the
        # multi-MB position ring per chunk (CLAUDE.md invariants;
        # A/Bs in BASELINE.md "Ring-carry sync policy").
        self._sync_carry_bytes = 0
        self._store_chunk = None

        edges = jnp.asarray(self.results.edges)
        seg = None if self._seg is None else jnp.asarray(self._seg)
        masses = jnp.asarray(self.group.masses)
        n_entities = self._n
        triclinic = self._triclinic
        self_part = self._self_part
        distinct_part = self._distinct_part
        lag_range = jnp.asarray(lag_values)
        precision = (
            "exact" if self._stream_dtype() == np.float32 else "fast"
        )

        # Distinct-part kernel routing: the brute tiled sweep costs
        # ~N^2/3.3e9 s per (lag, frame) on the chip — at 100k atoms a
        # dense lag grid packs minutes of device work into ONE chunk
        # execution, which the tunnel's execution watchdog kills (the
        # worker dies with "kernel fault"; bisected in round 3).  The
        # Pallas cross cell kernel is ~20x cheaper per sweep, and the
        # chunk size is capped so one execution stays ~20 s.
        use_cell = self._use_cell_kernel()
        self._use_cell = use_cell
        split_lags = None
        if distinct_part:
            if use_cell:
                from ..ops.pallas_cell_histogram import (
                    pallas_cell_plan_search,
                )

                # Cross kernel over the same group at two times: a
                # joint (equal-count) grid search (triclinic grids
                # plan against the perpendicular widths).
                plan = pallas_cell_plan_search(
                    n_entities,
                    self._cell_plan_box(),
                    float(self._range[1]),
                    n_atoms2=n_entities,
                    capacity_sigmas=self._capacity_sigmas,
                    triclinic=self._triclinic,
                )
            if use_cell:
                self._cell_plan = plan
                self._carry["max_occ"] = jnp.full(
                    (), -(2**30), jnp.int32
                )
                # Padded-pair plan cost over the kernel rate: classic
                # reach-1 plans reproduce the old n/6e5 heuristic
                # within ~2x; generalized small-box plans (near
                # all-pairs work, or the ~27x-slower triclinic
                # per-pair search) are far costlier per sweep and the
                # lag-split/chunk caps must see that.
                from ..ops.pallas_cell_histogram import (
                    plan_is_tri_pp,
                )

                rate = (
                    7.0e8
                    if plan_is_tri_pp(plan, self._triclinic)
                    else 1.5e10
                )
                est_sweep = plan["_cost"] / rate
            else:
                est_sweep = n_entities * n_entities / 3.3e9
            import os as _os

            # seconds of device work per execution (the tunnel
            # watchdog budget; MDTPU_EXEC_BUDGET_S overrides — tests
            # shrink it to force the lag-split path on CPU)
            budget = float(
                _os.environ.get("MDTPU_EXEC_BUDGET_S", 20.0)
            )
            max_frames = max(
                1, int(budget / max(1e-9, n_sel * est_sweep))
            )
            frame_bytes = (
                n_entities * 3
                * np.dtype(self._stream_dtype()).itemsize
            )
            self._chunk_bytes = min(
                self._chunk_bytes, max_frames * frame_bytes
            )
            # When even ONE frame's full selected-lag sweep exceeds
            # the budget (brute path at large N x many lags — the
            # round-3 watchdog kill; round 5: also the generalized
            # small-box cell plans, whose padded work approaches
            # all-pairs), split the LAG GRID across executions of one
            # compiled step (below).
            lags_per_exec = max(
                1, int(budget / max(1e-9, est_sweep))
            )
            if lags_per_exec < n_sel:
                split_lags = lags_per_exec

        if use_cell:
            from ..ops.pallas_cell_histogram import (
                cross_pair_histogram_pallas,
            )

            cell_plan = self._cell_plan
            cell_r_max = float(self._range[1])
            cell_r_min = float(self._range[0])
            cell_cap = int(cell_plan["capacity"])
            cell_dims = cell_plan["n_cells_dim"]

        def scan_step(carry, inputs):
            pos, box, vol, valid = inputs  # (N, 3), box, scalar mask
            if use_cell and not triclinic:
                # The orthorhombic cell kernel needs wrapped
                # coordinates (cell ids clip at the grid edges); the
                # triclinic kernel folds fractionally inside.  Padded
                # frames carry zero boxes — guard the fold; their
                # results are masked.
                boxf = box.astype(pos.dtype)
                safe = jnp.where(boxf > 0, boxf, 1.0)
                pos = pos - safe * jnp.floor(pos / safe)
            fi = carry["frame"]
            rcfi = (fi % n_lags).astype(jnp.int32)
            ring = jnp.where(
                valid > 0, carry["ring"].at[rcfi].set(pos), carry["ring"]
            )
            rifi = ((fi - lag_range) % n_lags).astype(jnp.int32)
            lag_ok = (
                (lag_range <= fi) & (valid > 0)
            ).astype(jnp.float64)

            def lag_body(lag, acc):
                counts_s, counts_d, m2, m4, occ = acc
                past = ring[rifi[lag]]
                ok = lag_ok[lag]
                if self_part:
                    # One minimum-image pass serves both the moments
                    # (<r^2>, <r^4> — exact values, not re-binned
                    # histogram estimates; per-atom math in the
                    # stream dtype, per-lag sums in f64) and the
                    # fast-path histogram.  Exact-precision binning
                    # needs the double-float pipeline and keeps its
                    # own pass (O(N) — negligible next to the
                    # distinct part's pair sweep).
                    dmin = _min_image_distance(
                        pos - past, box.astype(pos.dtype)
                    )
                    r2 = dmin * dmin
                    m2 = m2.at[lag].add(
                        r2.sum().astype(jnp.float64) * ok
                    )
                    m4 = m4.at[lag].add(
                        (r2 * r2).sum().astype(jnp.float64) * ok
                    )
                    if precision == "exact":
                        cs = displacement_histogram_frame(
                            pos, past, box, edges,
                            precision=precision,
                        )
                    else:
                        cs = _bin_distances(
                            dmin, edges,
                            jnp.ones(dmin.shape, jnp.float32),
                            self._n_bins,
                        )
                    counts_s = counts_s.at[lag].add(cs * ok)
                if distinct_part:
                    if use_cell:
                        # Orthorhombic: (3,) lengths; triclinic: the
                        # frame's (3, 3) box matrix (per-block
                        # lattice-image shifts inside the kernel).
                        kbox = (
                            box if triclinic else box[:3]
                        ).astype(jnp.float32)
                        cd32, occ1, occ2 = (
                            cross_pair_histogram_pallas(
                                past.astype(jnp.float32),
                                pos.astype(jnp.float32),
                                box=kbox,
                                r_max=cell_r_max,
                                r_min=cell_r_min,
                                n_cells_dim=cell_dims,
                                capacity1=cell_cap,
                                capacity2=cell_cap,
                                n_bins=self._n_bins,
                                precision=precision,
                                exclusion=(1, 1),
                                reach=cell_plan["reach"],
                            )
                        )
                        cd = cd32.astype(jnp.float64)
                        excess = jnp.maximum(occ1, occ2) - np.int32(
                            cell_cap
                        )
                        # invalid lags sweep a zero-filled ring slot
                        # (all atoms in one cell) — their occupancy
                        # must not trip the overflow check
                        occ = jnp.maximum(
                            occ,
                            jnp.where(
                                ok > 0, excess, np.int32(-(2**30))
                            ),
                        )
                    else:
                        cd = radial_histogram_frame(
                            past, pos, box, edges, exclusion=(1, 1),
                            precision=precision,
                        )
                    # select (not multiply): a masked frame's counts
                    # may be NaN-poisoned (zero padded box) and
                    # NaN * 0 would leak
                    counts_d = counts_d.at[lag].add(
                        jnp.where(ok > 0, cd, 0.0)
                    )
                return counts_s, counts_d, m2, m4, occ

            occ0 = (
                carry["max_occ"]
                if use_cell
                else jnp.zeros((), jnp.int32)
            )
            counts_s, counts_d, m2, m4, occ = jax.lax.fori_loop(
                0, len(lag_values), lag_body,
                (
                    carry["self"], carry["distinct"],
                    carry["m2"], carry["m4"], occ0,
                ),
            )
            new_carry = {
                "ring": ring,
                "self": counts_s,
                "distinct": counts_d,
                "m2": m2,
                "m4": m4,
                "origins": carry["origins"] + lag_ok,
                "volume": carry["volume"]
                + vol.astype(jnp.float64) * (valid > 0),
                "frame": fi + (valid > 0),
            }
            if use_cell:
                new_carry["max_occ"] = occ
            return new_carry, None

        def update(carry, positions, dimensions, mask):
            # The stream already narrows columns to the group's atoms.
            pos = positions
            if seg is not None:
                pos = _com_positions(pos, masses, seg, n_entities)
            if triclinic:
                box = triclinic_matrices(dimensions)  # (B, 3, 3)
                vol = box[:, 0, 0] * box[:, 1, 1] * box[:, 2, 2]
            else:
                box = dimensions[:, :3]
                vol = box.prod(axis=1)
            carry, _ = jax.lax.scan(
                scan_step, carry, (pos, box, vol, mask)
            )
            return carry

        if split_lags is None:
            self._update = jit_update(update)
        else:
            self._prepare_lag_split(
                split_lags, n_sel, n_lags, lag_range, edges, seg,
                masses, n_entities, triclinic, self_part, precision,
                cell_plan=self._cell_plan if use_cell else None,
            )

    def _prepare_lag_split(
        self, lags_per_exec, n_sel, n_lags, lag_range, edges, seg,
        masses, n_entities, triclinic, self_part, precision,
        cell_plan=None,
    ) -> None:
        """Watchdog escape for over-budget frames: one compiled
        per-frame step parameterized by a traced LAG SUBSET, executed
        ``ceil(n_sel / k)`` times per frame so no single device
        execution exceeds the ~20 s budget that kills the tunnel
        worker (round-3 bisection).  ``advance=1`` on the first group
        performs the ring/frame/volume bookkeeping; later groups only
        sweep their lags against the already-updated ring.
        ``cell_plan`` switches the distinct sweep from the brute
        tiled pass to the Pallas cross cell kernel (round 5: the
        generalized small-box plans can also exceed the budget)."""

        import warnings

        warnings.warn(
            "VanHoveFunction distinct-part sweep exceeds the "
            f"per-execution budget; splitting the {n_sel}-lag grid "
            f"into groups of {lags_per_exec} across executions "
            "(slower per frame).",
            stacklevel=2,
        )
        k = int(lags_per_exec)
        groups = []
        for g0 in range(0, n_sel, k):
            grp = np.arange(g0, min(g0 + k, n_sel), dtype=np.int32)
            groups.append(
                np.pad(
                    grp, (0, k - len(grp)), constant_values=n_sel
                )
            )
        groups = [jnp.asarray(g) for g in groups]
        n_bins = self._n_bins
        use_cell = cell_plan is not None
        if use_cell:
            from ..ops.pallas_cell_histogram import (
                cross_pair_histogram_pallas,
            )

            cell_cap = int(cell_plan["capacity"])
            cell_r_max = float(self._range[1])
            cell_r_min = float(self._range[0])

        def split_step(carry, pos, box, vol, valid, lag_sub, advance):
            if use_cell and not triclinic:
                # wrapped coordinates for the cell build (see
                # scan_step); padded frames carry zero boxes
                boxf = box.astype(pos.dtype)
                safe = jnp.where(boxf > 0, boxf, 1.0)
                pos = pos - safe * jnp.floor(pos / safe)
            adv = advance > 0
            took = jnp.logical_and(
                jnp.logical_not(adv), valid > 0
            ).astype(carry["frame"].dtype)
            fi = carry["frame"] - took  # the frame being processed
            rcfi = (fi % n_lags).astype(jnp.int32)
            ring = jnp.where(
                adv & (valid > 0),
                carry["ring"].at[rcfi].set(pos),
                carry["ring"],
            )
            rifi = ((fi - lag_range) % n_lags).astype(jnp.int32)
            lag_ok = (
                (lag_range <= fi) & (valid > 0)
            ).astype(jnp.float64)

            def lag_body(i, acc):
                counts_s, counts_d, m2, m4, occ = acc
                raw = lag_sub[i]
                inb = (raw < np.int32(n_sel)).astype(jnp.float64)
                lag = jnp.minimum(raw, np.int32(n_sel - 1))
                past = ring[rifi[lag]]
                ok = lag_ok[lag] * inb
                if self_part:
                    dmin = _min_image_distance(
                        pos - past, box.astype(pos.dtype)
                    )
                    r2 = dmin * dmin
                    m2 = m2.at[lag].add(
                        r2.sum().astype(jnp.float64) * ok
                    )
                    m4 = m4.at[lag].add(
                        (r2 * r2).sum().astype(jnp.float64) * ok
                    )
                    if precision == "exact":
                        cs = displacement_histogram_frame(
                            pos, past, box, edges,
                            precision=precision,
                        )
                    else:
                        cs = _bin_distances(
                            dmin, edges,
                            jnp.ones(dmin.shape, jnp.float32),
                            n_bins,
                        )
                    counts_s = counts_s.at[lag].add(cs * ok)
                if use_cell:
                    kbox = (
                        box if triclinic else box[:3]
                    ).astype(jnp.float32)
                    cd32, occ1, occ2 = cross_pair_histogram_pallas(
                        past.astype(jnp.float32),
                        pos.astype(jnp.float32),
                        box=kbox,
                        r_max=cell_r_max,
                        r_min=cell_r_min,
                        n_cells_dim=cell_plan["n_cells_dim"],
                        capacity1=cell_cap,
                        capacity2=cell_cap,
                        n_bins=n_bins,
                        precision=precision,
                        exclusion=(1, 1),
                        reach=cell_plan["reach"],
                    )
                    cd = cd32.astype(jnp.float64)
                    excess = jnp.maximum(occ1, occ2) - np.int32(
                        cell_cap
                    )
                    occ = jnp.maximum(
                        occ,
                        jnp.where(
                            ok > 0, excess, np.int32(-(2**30))
                        ),
                    )
                else:
                    cd = radial_histogram_frame(
                        past, pos, box, edges, exclusion=(1, 1),
                        precision=precision,
                    )
                counts_d = counts_d.at[lag].add(
                    jnp.where(ok > 0, cd, 0.0)
                )
                return counts_s, counts_d, m2, m4, occ

            occ0 = (
                carry["max_occ"]
                if use_cell
                else jnp.zeros((), jnp.int32)
            )
            counts_s, counts_d, m2, m4, occ = jax.lax.fori_loop(
                0, k, lag_body,
                (
                    carry["self"], carry["distinct"],
                    carry["m2"], carry["m4"], occ0,
                ),
            )
            advf = adv.astype(jnp.float64)
            new_carry = {
                "ring": ring,
                "self": counts_s,
                "distinct": counts_d,
                "m2": m2,
                "m4": m4,
                "origins": carry["origins"] + lag_ok * advf,
                "volume": carry["volume"]
                + vol.astype(jnp.float64) * (valid > 0) * advf,
                "frame": fi + (valid > 0),
            }
            if use_cell:
                new_carry["max_occ"] = occ
            return new_carry

        inner = jax.jit(split_step)

        def update(carry, positions, dimensions, mask):
            pos = positions
            if seg is not None:
                pos = _com_positions(pos, masses, seg, n_entities)
            if triclinic:
                box = triclinic_matrices(dimensions)
                vol = box[:, 0, 0] * box[:, 1, 1] * box[:, 2, 2]
            else:
                box = dimensions[:, :3]
                vol = box.prod(axis=1)
            for b in range(positions.shape[0]):
                for gi, grp in enumerate(groups):
                    carry = inner(
                        carry, pos[b], box[b], vol[b], mask[b],
                        grp, np.int32(1 if gi == 0 else 0),
                    )
                    # Tiny host fetch between executions: bounds the
                    # dispatch queue (the tunnel degrades on chained
                    # device-resident sequences) and keeps every
                    # execution under the watchdog budget.
                    np.asarray(carry["frame"])
            return carry

        self._update = update

    def run(self, *args, **kwargs):
        """Run, auto-escalating the cross cell kernel's slot capacity
        on the rare statistical overflow (the plan leaves ~4 sigma of
        occupancy headroom; see RadialDistributionFunction.run)."""

        from ..ops.pallas_cell_histogram import CellCapacityOverflow

        try:
            return super().run(*args, **kwargs)
        except CellCapacityOverflow:
            retries = getattr(self, "_capacity_retries", 0)
            if retries >= 2:
                raise
            self._capacity_retries = retries + 1
            self._capacity_sigmas += 2.0
            warnings.warn(
                "Pallas cell capacity overflow (a density "
                "fluctuation exceeded the planned slot count); "
                f"re-planning with capacity_sigmas="
                f"{self._capacity_sigmas} and re-running."
            )
            return self.run(*args, **kwargs)

    def _conclude(self) -> None:
        if "max_occ" in self._carry:
            excess = int(self._carry.pop("max_occ"))
            if excess > 0:
                from ..ops.pallas_cell_histogram import (
                    CellCapacityOverflow,
                )

                raise CellCapacityOverflow(
                    f"cell capacity overflow (by {excess} atoms): a "
                    "cell exceeded its planned slot count (a density "
                    "fluctuation or clustering). Re-run with "
                    "MDTPU_VANHOVE_IMPL=xla or a non-TPU backend."
                )
            if np.isnan(
                np.asarray(self._carry["distinct"])
            ).any():
                raise RuntimeError(
                    "A frame's box shrank below the planned cell "
                    "grid (n_cells_dim * r_max); the 27-cell sweep "
                    "would miss pairs. Re-run with "
                    "MDTPU_VANHOVE_IMPL=xla."
                )
        counts_s = np.asarray(self._carry["self"])
        counts_d = np.asarray(self._carry["distinct"])
        origins = np.asarray(self._carry["origins"])
        volume_mean = float(self._carry["volume"]) / self.n_frames
        shell = 4 * np.pi * np.diff(self.results.edges**3) / 3
        n = self._n

        if self._self_part:
            self.results.counts_self = counts_s.astype(np.int64)
            self.results.gs = counts_s / (
                origins[:, None] * n * shell
            )
            m2 = np.asarray(self._carry["m2"]) / (origins * n)
            m4 = np.asarray(self._carry["m4"]) / (origins * n)
            self.results.msd = m2
            with np.errstate(divide="ignore", invalid="ignore"):
                self.results.alpha2 = 3 * m4 / (5 * m2**2) - 1
            if not self._reduced:
                self.results.units["results.msd"] = ureg.angstrom**2
        if self._distinct_part:
            self.results.counts_distinct = counts_d.astype(np.int64)
            self.results.gd = counts_d * volume_mean / (
                origins[:, None] * n * (n - 1) * shell
            )
