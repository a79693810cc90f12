r"""
Bonded-structure distributions
==============================

Bond-length and bond-angle distributions from the topology's
connectivity — the everyday force-field validation observables.  A
beyond-reference capability (the reference has no bonded analysis;
its closest surface is the LAMMPS data-file writer's bonded sections,
reference ``lammps/topology.py:29-203``).

TPU formulation: bonded terms are fixed index lists, so each frame is
a column gather + an elementwise minimum-image kernel — lengths ride
:func:`mdhelper_tpu.ops.histogram.displacement_histogram_frame`
(double-float exact binning on float32 streams), angles are two
min-image displacement vectors and an `arccos`.  Triclinic cells are
supported everywhere: vectors fold through the box-matrix 27-image
search (:func:`mdhelper_tpu.ops.histogram._min_image_vectors`), the
same contract as the radial kernels.  The counts carry is
order-independent, so ``parallel=True`` shards frames over the mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .. import ureg
from ..ops.histogram import (
    _bin_distances,
    _min_image_distance,
    _min_image_vectors,
    displacement_histogram_frame,
)
from .base import DynamicAnalysisBase, jit_update

__all__ = [
    "derive_angles",
    "derive_dihedrals",
    "BondLengthDistribution",
    "BondAngleDistribution",
    "DihedralDistribution",
]


def derive_angles(bonds: np.ndarray) -> np.ndarray:
    """All angle triples ``(i, j, k)`` (vertex ``j``) implied by a
    bond list: every unordered pair of bonds sharing an atom."""

    bonds = np.asarray(bonds, dtype=np.int64).reshape(-1, 2)
    neighbors = {}
    for a, b in bonds:
        neighbors.setdefault(int(a), []).append(int(b))
        neighbors.setdefault(int(b), []).append(int(a))
    triples = []
    for j, nbrs in sorted(neighbors.items()):
        nbrs = sorted(set(nbrs))
        for x in range(len(nbrs)):
            for y in range(x + 1, len(nbrs)):
                triples.append((nbrs[x], j, nbrs[y]))
    return np.asarray(triples, dtype=np.int64).reshape(-1, 3)


class _BondedBase(DynamicAnalysisBase):
    """Shared scaffolding: a fixed ``(M, k)`` atom-index term list,
    streamed columns restricted to the involved atoms, a histogram
    counts carry."""

    def __init__(
        self, group, terms, n_bins, range, *,
        reduced, parallel, verbose, **kwargs,
    ):
        self.group = group
        self.universe = group.universe
        super().__init__(
            self.universe.trajectory, parallel, verbose, **kwargs
        )
        terms = np.asarray(terms, dtype=np.int64)
        if terms.size == 0:
            raise ValueError(
                "No bonded terms: the topology has no bonds within "
                "the group (pass bonds=/angles= explicitly)."
            )
        self._terms = terms
        self._n_bins = int(n_bins)
        self._range = tuple(range)
        self._reduced = reduced

        # Stream only the involved atoms' columns; remap term indices
        # to column positions.
        unique, inverse = np.unique(terms, return_inverse=True)
        self._atom_indices = unique
        self._cols = inverse.reshape(terms.shape)

        self._setup_periodic_box()

    def _prepare(self) -> None:
        self.results.edges = np.linspace(
            *self._range, self._n_bins + 1
        )
        self.results.bins = (
            self.results.edges[:-1] + self.results.edges[1:]
        ) / 2
        self._carry = {
            "counts": jnp.zeros(self._n_bins, jnp.float64),
        }

    def _conclude(self) -> None:
        counts = np.asarray(self._carry["counts"])
        self.results.counts = counts.astype(np.int64)
        widths = np.diff(self.results.edges)
        total = counts.sum()
        # Probability density over the analyzed range.
        self.results.probability = (
            counts / (total * widths) if total else counts
        )


class BondLengthDistribution(_BondedBase):
    r"""Histogram of bonded pair distances (minimum image).

    Parameters
    ----------
    group : `AtomGroup`
        Atoms considered; by default every topology bond with both
        endpoints in the group contributes.
    n_bins : `int`, default 201
        Number of bins.
    range : array-like, default ``(0.0, 3.0)``
        Length range (Angstrom).
    bonds : array-like, keyword-only, optional
        Explicit ``(M, 2)`` absolute atom-index pairs (overrides the
        topology).
    reduced : `bool`, keyword-only, default False
        Reduced (LJ) units (omits ``results.units``).
    parallel : `bool`, keyword-only, default False
        Shard frame batches over the device mesh.

    Results: ``results.bins``/``edges``, raw ``results.counts``,
    ``results.probability`` (density over the range), ``results.mean``
    and ``results.std`` (exact moments, not re-binned).
    """

    def __init__(
        self,
        group,
        n_bins: int = 201,
        range: tuple = (0.0, 3.0),
        *,
        bonds=None,
        reduced: bool = False,
        parallel: bool = False,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        if bonds is None:
            topo_bonds = group.universe._topology.bonds
            in_group = np.isin(topo_bonds, group.ix).all(axis=1)
            bonds = topo_bonds[in_group]
        super().__init__(
            group, bonds, n_bins, range,
            reduced=reduced, parallel=parallel, verbose=verbose,
            **kwargs,
        )

    def _prepare(self) -> None:
        super()._prepare()
        self._carry["m1"] = jnp.zeros((), jnp.float64)
        self._carry["m2"] = jnp.zeros((), jnp.float64)
        self._carry["n"] = jnp.zeros((), jnp.float64)
        if not self._reduced:
            self.results.units = {
                "results.bins": ureg.angstrom,
                "results.edges": ureg.angstrom,
                "results.mean": ureg.angstrom,
                "results.std": ureg.angstrom,
            }
        self._make_update()

    def _make_update(self) -> None:
        edges = jnp.asarray(self.results.edges)
        i_col = jnp.asarray(self._cols[:, 0])
        j_col = jnp.asarray(self._cols[:, 1])
        n_terms = self._terms.shape[0]
        frame_boxes = self._frame_boxes
        precision = (
            "exact" if self._stream_dtype() == np.float32 else "fast"
        )

        def update(carry, positions, dimensions, mask):
            box = frame_boxes(dimensions)

            def frame(args):
                pos_f, box_f = args
                p1 = pos_f[i_col]
                p2 = pos_f[j_col]
                counts = displacement_histogram_frame(
                    p1, p2, box_f, edges, precision=precision
                )
                d = _min_image_distance(
                    p1 - p2, box_f.astype(pos_f.dtype)
                )
                return (
                    counts,
                    d.sum().astype(jnp.float64),
                    (d * d).sum().astype(jnp.float64),
                )

            counts, s1, s2 = jax.lax.map(frame, (positions, box))
            return {
                "counts": carry["counts"]
                + (counts * mask[:, None]).sum(axis=0),
                "m1": carry["m1"] + (s1 * mask).sum(),
                "m2": carry["m2"] + (s2 * mask).sum(),
                "n": carry["n"] + mask.sum() * n_terms,
            }

        self._update = jit_update(update)

    def _conclude(self) -> None:
        super()._conclude()
        n = float(self._carry["n"])
        mean = float(self._carry["m1"]) / n
        var = float(self._carry["m2"]) / n - mean**2
        self.results.mean = mean
        self.results.std = float(np.sqrt(max(var, 0.0)))


class BondAngleDistribution(_BondedBase):
    r"""Histogram of bond angles :math:`\theta_{ijk}` (degrees,
    vertex :math:`j`), with the angle triples derived from the bond
    connectivity by default (:func:`derive_angles`).

    Parameters mirror :class:`BondLengthDistribution`; `range` is in
    degrees (default the full ``(0, 180)``).  Angle arithmetic runs
    in the stream dtype (float32 on TPU — angles are statistical
    observables, so double-float binning is not applied).

    Results: ``results.bins``/``edges`` (degrees), ``results.counts``,
    ``results.probability``, ``results.mean``/``std`` (degrees).
    """

    def __init__(
        self,
        group,
        n_bins: int = 181,
        range: tuple = (0.0, 180.0),
        *,
        angles=None,
        reduced: bool = False,
        parallel: bool = False,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        if angles is None:
            topo_bonds = group.universe._topology.bonds
            in_group = np.isin(topo_bonds, group.ix).all(axis=1)
            angles = derive_angles(topo_bonds[in_group])
        super().__init__(
            group, angles, n_bins, range,
            reduced=reduced, parallel=parallel, verbose=verbose,
            **kwargs,
        )

    def _prepare(self) -> None:
        super()._prepare()
        self._carry["m1"] = jnp.zeros((), jnp.float64)
        self._carry["m2"] = jnp.zeros((), jnp.float64)
        self._carry["n"] = jnp.zeros((), jnp.float64)
        if not self._reduced:
            self.results.units = {
                "results.bins": ureg.degree,
                "results.edges": ureg.degree,
                "results.mean": ureg.degree,
                "results.std": ureg.degree,
            }
        self._make_update()

    def _make_update(self) -> None:
        edges = jnp.asarray(self.results.edges)
        i_col = jnp.asarray(self._cols[:, 0])
        j_col = jnp.asarray(self._cols[:, 1])
        k_col = jnp.asarray(self._cols[:, 2])
        n_terms = self._terms.shape[0]
        n_bins = self._n_bins
        frame_boxes = self._frame_boxes

        def update(carry, positions, dimensions, mask):
            box = frame_boxes(dimensions)

            def frame(args):
                pos_f, box_f = args
                b = box_f.astype(pos_f.dtype)
                v1 = _min_image_vectors(pos_f[i_col] - pos_f[j_col], b)
                v2 = _min_image_vectors(pos_f[k_col] - pos_f[j_col], b)
                cos = (v1 * v2).sum(axis=-1) / jnp.sqrt(
                    (v1 * v1).sum(axis=-1) * (v2 * v2).sum(axis=-1)
                )
                theta = jnp.degrees(
                    jnp.arccos(jnp.clip(cos, -1.0, 1.0))
                )
                counts = _bin_distances(
                    theta, edges,
                    jnp.ones(theta.shape, jnp.float32), n_bins,
                )
                return (
                    counts,
                    theta.sum().astype(jnp.float64),
                    (theta * theta).sum().astype(jnp.float64),
                )

            counts, s1, s2 = jax.lax.map(frame, (positions, box))
            return {
                "counts": carry["counts"]
                + (counts * mask[:, None]).sum(axis=0),
                "m1": carry["m1"] + (s1 * mask).sum(),
                "m2": carry["m2"] + (s2 * mask).sum(),
                "n": carry["n"] + mask.sum() * n_terms,
            }

        self._update = jit_update(update)

    def _conclude(self) -> None:
        super()._conclude()
        n = float(self._carry["n"])
        mean = float(self._carry["m1"]) / n
        var = float(self._carry["m2"]) / n - mean**2
        self.results.mean = mean
        self.results.std = float(np.sqrt(max(var, 0.0)))


def derive_dihedrals(bonds: np.ndarray) -> np.ndarray:
    """All proper-dihedral quadruples ``(i, j, k, l)`` implied by a
    bond list: every bond ``(j, k)`` extended by distinct neighbors
    ``i`` of ``j`` and ``l`` of ``k``."""

    bonds = np.asarray(bonds, dtype=np.int64).reshape(-1, 2)
    neighbors = {}
    for a, b in bonds:
        neighbors.setdefault(int(a), set()).add(int(b))
        neighbors.setdefault(int(b), set()).add(int(a))
    quads = []
    for j, k in sorted(
        (int(a), int(b)) for a, b in bonds
    ):
        for i in sorted(neighbors[j] - {k}):
            for l in sorted(neighbors[k] - {j}):
                if i != l:
                    quads.append((i, j, k, l))
    return np.asarray(quads, dtype=np.int64).reshape(-1, 4)


class DihedralDistribution(_BondedBase):
    r"""Histogram of proper dihedral (torsion) angles
    :math:`\phi_{ijkl}` in degrees over ``(-180, 180]`` (IUPAC sign
    convention: the angle from the ``i-j-k`` plane to the ``j-k-l``
    plane, positive clockwise looking down ``j -> k``), with the
    quadruples derived from the bond connectivity by default
    (:func:`derive_dihedrals`).

    Parameters mirror :class:`BondLengthDistribution` (`dihedrals`
    overrides the derived quadruples).  Results:
    ``results.bins``/``edges`` (degrees), ``results.counts``,
    ``results.probability``.
    """

    def __init__(
        self,
        group,
        n_bins: int = 181,
        range: tuple = (-180.0, 180.0),
        *,
        dihedrals=None,
        reduced: bool = False,
        parallel: bool = False,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        if dihedrals is None:
            topo_bonds = group.universe._topology.bonds
            in_group = np.isin(topo_bonds, group.ix).all(axis=1)
            dihedrals = derive_dihedrals(topo_bonds[in_group])
        super().__init__(
            group, dihedrals, n_bins, range,
            reduced=reduced, parallel=parallel, verbose=verbose,
            **kwargs,
        )

    def _prepare(self) -> None:
        super()._prepare()
        if not self._reduced:
            self.results.units = {
                "results.bins": ureg.degree,
                "results.edges": ureg.degree,
            }
        self._make_update()

    def _make_update(self) -> None:
        edges = jnp.asarray(self.results.edges)
        cols = [jnp.asarray(self._cols[:, c]) for c in range(4)]
        n_bins = self._n_bins
        frame_boxes = self._frame_boxes

        def update(carry, positions, dimensions, mask):
            box = frame_boxes(dimensions)

            def frame(args):
                pos_f, box_f = args
                b = box_f.astype(pos_f.dtype)

                def mi(v):
                    return _min_image_vectors(v, b)

                b1 = mi(pos_f[cols[1]] - pos_f[cols[0]])
                b2 = mi(pos_f[cols[2]] - pos_f[cols[1]])
                b3 = mi(pos_f[cols[3]] - pos_f[cols[2]])
                n1 = jnp.cross(b1, b2)
                n2 = jnp.cross(b2, b3)
                m1 = jnp.cross(
                    n1, b2 / jnp.linalg.norm(b2, axis=-1)[:, None]
                )
                x = (n1 * n2).sum(axis=-1)
                y = (m1 * n2).sum(axis=-1)
                phi = jnp.degrees(jnp.arctan2(y, x))
                return _bin_distances(
                    phi, edges,
                    jnp.ones(phi.shape, jnp.float32), n_bins,
                )

            counts = jax.lax.map(frame, (positions, box))
            return {
                "counts": carry["counts"]
                + (counts * mask[:, None]).sum(axis=0),
            }

        self._update = jit_update(update)
