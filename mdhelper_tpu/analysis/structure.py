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
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import simpson
from scipy.signal import argrelextrema
from scipy.special import jv

from .. import Q_, ureg
from ..algorithm.unit import strip_unit
from ..ops.histogram import radial_histogram_batch
from .base import DynamicAnalysisBase

__all__ = [
    "radial_histogram",
    "zeroth_order_hankel_transform",
    "radial_fourier_transform",
    "calculate_coordination_numbers",
    "calculate_structure_factor",
    "RadialDistributionFunction",
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
            raise ValueError(
                "Only orthorhombic boxes are supported by the TPU "
                "radial histogram kernel."
            )
        dims = dims[:3]
    edges = jnp.linspace(range[0], range[1], n_bins + 1)
    counts = radial_histogram_batch(
        jnp.asarray(pos1, dtype=jnp.float64)[None],
        jnp.asarray(pos2, dtype=jnp.float64)[None],
        jnp.asarray(dims)[None],
        jnp.ones(1),
        edges,
        exclusion=tuple(exclusion) if exclusion is not None else None,
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


def _com_positions(positions, masses, segment_ids, n_groups):
    """Per-frame centers of mass via segment reduction (device).
    `positions`: (B, N, 3); returns (B, G, 3)."""

    weighted = positions * masses[None, :, None]
    total = jax.vmap(
        lambda w: jax.ops.segment_sum(w, segment_ids, n_groups)
    )(weighted)
    mass_sums = jax.ops.segment_sum(masses, segment_ids, n_groups)
    return total / mass_sums[None, :, None]


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
        verbose: bool = True,
        **kwargs,
    ) -> None:
        self.ag1 = ag1
        self.ag2 = ag1 if ag2 is None else ag2
        self.universe = self.ag1.universe
        super().__init__(
            self.universe.trajectory, parallel, verbose, **kwargs
        )

        self._groupings = _validate_groupings(groupings)
        self._drop_axis = (
            ord(drop_axis) - 120
            if isinstance(drop_axis, str)
            else drop_axis
        )
        if self._drop_axis not in {0, 1, 2, None}:
            raise ValueError("Invalid axis to drop.")

        self._n_bins = n_bins
        self._range = tuple(range)
        self._norm = norm
        self._exclusion = (
            tuple(int(e) for e in exclusion)
            if exclusion is not None
            else None
        )
        self._reduced = reduced
        if n_batches is not None:
            warnings.warn(
                "n_batches is accepted for API compatibility but has "
                "no effect: the TPU kernel tiles the pair sweep "
                "statically."
            )
        self._verbose = verbose

        # Host->device column selection: read both groups' atoms only.
        self._atom_indices = np.concatenate((self.ag1.ix, self.ag2.ix))
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

        edges = jnp.asarray(self.results.edges)
        sel1, sel2 = jnp.asarray(self._sel1), jnp.asarray(self._sel2)
        seg1 = None if self._seg1 is None else jnp.asarray(self._seg1)
        seg2 = None if self._seg2 is None else jnp.asarray(self._seg2)
        m1 = jnp.asarray(self.ag1.masses)
        m2 = jnp.asarray(self.ag2.masses)
        n1, n2 = self._n1, self._n2
        drop = self._drop_axis
        exclusion = self._exclusion
        # The reference tracks volume only for norm="rdf"
        # (structure.py:747-748) but _get_rdf needs it regardless; the
        # reduction is one fused multiply-add, so always accumulate.
        track_volume = True

        def update(carry, positions, dimensions, mask):
            box = dimensions[:, :3]
            pos1 = positions[:, sel1]
            pos2 = positions[:, sel2]
            if seg1 is not None:
                pos1 = _com_positions(pos1, m1, seg1, n1)
            if seg2 is not None:
                pos2 = _com_positions(pos2, m2, seg2, n2)
            if drop is not None:
                pos1 = pos1.at[:, :, drop].set(0.0)
                pos2 = pos2.at[:, :, drop].set(0.0)
                box = box.at[:, drop].set(box.max(axis=1))
            counts = carry["counts"] + radial_histogram_batch(
                pos1, pos2, box, mask, edges, exclusion=exclusion
            )
            if track_volume:
                if drop is None:
                    vol = box.prod(axis=1)
                else:
                    vol = box.prod(axis=1) / box[:, drop]
                volume = carry["volume"] + (vol * mask).sum()
            else:
                volume = carry["volume"]
            return {"counts": counts, "volume": volume}

        self._update = jax.jit(update, donate_argnums=0)

    def _batched_update(self, carry, batch):
        return self._update(
            carry, batch.positions, batch.dimensions, batch.mask
        )

    def _conclude(self) -> None:
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
            if isinstance(unit_, str):
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
