r"""
Hydrogen-bond analysis
======================

Geometric hydrogen-bond detection per frame — the MDAnalysis
``HydrogenBondAnalysis`` criterion (donor-acceptor distance AND
donor-hydrogen-acceptor angle), streamed through the chunked update
protocol.  A beyond-reference capability (the reference has no
hydrogen-bond module).

Criterion (defaults follow the MDAnalysis convention):

* :math:`d(D, A) \le d_\mathrm{DA}` (default 3.0 Angstrom), and
* :math:`\angle(D, H, A) \ge \theta_\mathrm{DHA}` (default 150 deg),
* the acceptor is not the donor itself.

TPU formulation: donor-hydrogen pairs are fixed index lists (derived
from the topology's bonds), so each frame is a column gather + one
dense ``(n_DH, n_A)`` minimum-image sweep — distances and the angle
cosine evaluate in a single fused elementwise program (orthorhombic
or triclinic cells), and the count/occupancy reductions are
mask sums.  The occupancy carry is order-independent, so
``parallel=True`` shards frames over the mesh.  Memory scales as
:math:`O(n_{DH} \cdot n_A)` per frame.
"""

from numbers import Real

import jax
import jax.numpy as jnp
import numpy as np

from .. import ureg
from ..algorithm.unit import strip_unit
from ..ops.histogram import _min_image_vectors
from .base import DynamicAnalysisBase, existence_lifetimes

__all__ = ["HydrogenBondAnalysis"]


class HydrogenBondAnalysis(DynamicAnalysisBase):
    r"""Per-frame hydrogen-bond counts and donor-hydrogen occupancies.

    Parameters
    ----------
    universe : `Universe`
        Universe with positions and (unless `donor_hydrogen_pairs` is
        given) topology bonds to pair hydrogens with their donors.
    hydrogens_sel : `str`, keyword-only, default ``"name H*"``
        Selection for hydrogen atoms.
    acceptors_sel : `str`, keyword-only, default ``"name O* N* F*"``
        Selection for acceptor atoms.
    donors_sel : `str`, keyword-only, optional
        Restrict donors to this selection (by default any heavy atom
        bonded to a selected hydrogen donates).
    donor_hydrogen_pairs : array-like, keyword-only, optional
        Explicit ``(n, 2)`` absolute ``(donor, hydrogen)`` atom-index
        pairs; overrides the bond-derived pairing (for topologies
        without bonds).
    d_a_cutoff : `float`, keyword-only, default 3.0
        Donor-acceptor distance cutoff (Angstrom).
    d_h_a_angle_cutoff : `float`, keyword-only, default 150.0
        Donor-hydrogen-acceptor angle cutoff (degrees).
    pair_counts : `bool`, keyword-only, default False
        Accumulate the full ``(n_DH, n_A)`` per-pair bond-count
        matrix (memory: one extra ``n_DH x n_A`` carry).
    lifetimes : `bool`, keyword-only, default False
        Store the per-frame bond-existence matrix and compute the
        intermittent hydrogen-bond time-correlation function
        :math:`c(t) = \langle h(0)h(t) \rangle / \langle h \rangle`
        (Luzar & Chandler 1996) over all pairs ever bonded, via the
        Wiener-Khinchin engine.  Memory: ``n_frames x n_DH x n_A``
        bools on the host.
    reduced : `bool`, keyword-only, default False
        Reduced (LJ) units (omits ``results.units``).
    parallel : `bool`, keyword-only, default False
        Shard frame batches over the device mesh.

    Results
    -------
    ``results.pairs``
        ``(n_DH, 2)`` absolute ``(donor, hydrogen)`` indices.
    ``results.acceptors``
        ``(n_A,)`` absolute acceptor indices.
    ``results.counts``
        Per-frame hydrogen-bond count, shape ``(n_frames,)``.
    ``results.mean_count``
        Time-averaged count.
    ``results.occupancies``
        Fraction of frames each donor-hydrogen pair donates to *any*
        acceptor, shape ``(n_DH,)``.
    ``results.pair_counts``
        (only with ``pair_counts=True``) per-(D-H, A) bonded-frame
        counts, shape ``(n_DH, n_A)``.
    ``results.lifetime``, ``results.lifetime_times``
        (only with ``lifetimes=True``) intermittent bond correlation
        :math:`c(t)` (normalized to :math:`c(0) = 1`) and its lag
        times (ps).
    ``results.survival``
        (only with ``lifetimes=True``) continuous (strict) bond
        survival :math:`S(t) = \langle h(0) H(t) \rangle / \langle
        h \rangle`, where :math:`H(t) = 1` only if the bond existed
        at *every* sample in :math:`[0, t]` — evaluated exactly from
        the bonded run lengths.
    ``results.times``
        Frame times (ps).
    """

    _checkpointable_stores = True

    def _checkpoint_attrs(self) -> tuple:
        return ("_existence",) if self._lifetimes else ()

    def __init__(
        self,
        universe,
        *,
        hydrogens_sel: str = "name H*",
        acceptors_sel: str = "name O* N* F*",
        donors_sel: str = None,
        donor_hydrogen_pairs=None,
        d_a_cutoff: float = 3.0,
        d_h_a_angle_cutoff: float = 150.0,
        pair_counts: bool = False,
        lifetimes: bool = False,
        reduced: bool = False,
        parallel: bool = False,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        self.universe = universe
        super().__init__(
            universe.trajectory, parallel, verbose, **kwargs
        )

        if not isinstance(d_a_cutoff, Real):
            d_a_cutoff = strip_unit(d_a_cutoff, "angstrom")[0]
        if d_a_cutoff <= 0:
            raise ValueError("'d_a_cutoff' must be positive.")
        if not 0 < d_h_a_angle_cutoff <= 180:
            raise ValueError(
                "'d_h_a_angle_cutoff' must be in (0, 180] degrees."
            )
        self._d_a_cutoff = float(d_a_cutoff)
        self._angle_cutoff = float(d_h_a_angle_cutoff)

        acceptors = universe.select_atoms(acceptors_sel)
        if acceptors.n_atoms == 0:
            raise ValueError(
                f"No acceptors match '{acceptors_sel}'."
            )
        self._acceptor_ix = acceptors.ix

        if donor_hydrogen_pairs is not None:
            pairs = np.asarray(
                donor_hydrogen_pairs, dtype=np.int64
            ).reshape(-1, 2)
        else:
            hydrogens = universe.select_atoms(hydrogens_sel)
            if hydrogens.n_atoms == 0:
                raise ValueError(
                    f"No hydrogens match '{hydrogens_sel}'."
                )
            bonds = universe._topology.bonds
            if bonds is None or len(bonds) == 0:
                raise ValueError(
                    "The topology has no bonds to pair hydrogens "
                    "with donors; pass 'donor_hydrogen_pairs'."
                )
            h_set = set(int(i) for i in hydrogens.ix)
            donor_ok = None
            if donors_sel is not None:
                donor_ok = set(
                    int(i)
                    for i in universe.select_atoms(donors_sel).ix
                )
            pairs = []
            for a, b in np.asarray(bonds, dtype=np.int64):
                a, b = int(a), int(b)
                for d, h in ((a, b), (b, a)):
                    if h in h_set and d not in h_set and (
                        donor_ok is None or d in donor_ok
                    ):
                        pairs.append((d, h))
            pairs = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
        if pairs.size == 0:
            raise ValueError("No donor-hydrogen pairs found.")
        self._pairs = pairs
        self._pair_counts = bool(pair_counts)
        self._lifetimes = bool(lifetimes)
        self._reduced = reduced

        # Stream only the involved atoms' columns.
        involved = np.unique(
            np.concatenate([pairs.ravel(), self._acceptor_ix])
        )
        self._atom_indices = involved
        col_of = {int(g): c for c, g in enumerate(involved)}
        self._d_col = np.fromiter(
            (col_of[int(i)] for i in pairs[:, 0]), dtype=np.int64,
            count=len(pairs),
        )
        self._h_col = np.fromiter(
            (col_of[int(i)] for i in pairs[:, 1]), dtype=np.int64,
            count=len(pairs),
        )
        self._a_col = np.fromiter(
            (col_of[int(i)] for i in self._acceptor_ix),
            dtype=np.int64, count=len(self._acceptor_ix),
        )

        self._setup_periodic_box()

    def _prepare(self) -> None:
        n_dh = len(self._pairs)
        n_a = len(self._acceptor_ix)
        self.results.pairs = self._pairs.copy()
        self.results.acceptors = self._acceptor_ix.copy()
        self.results.counts = np.empty(self.n_frames, dtype=int)
        self.results.times = self.frames * self._trajectory.dt
        if not self._reduced:
            self.results.units = {"results.times": ureg.picosecond}
        self._store_offset = 0
        if self._lifetimes:
            self._existence = np.zeros(
                (self.n_frames, n_dh, n_a), dtype=bool
            )
        # On tunnel-attached TPUs (or forced via MDTPU_HOST_PIPELINE)
        # the per-chunk detection runs host-side with a KD-tree
        # candidate search — also the large-N path (the device
        # formulation is a dense (n_DH, n_A) sweep).
        self._host_pipeline = (
            not getattr(self, "_parallel", False)
            and self._resolve_host_pipeline()
        )
        if self._host_pipeline:
            self._prepare_host()
            self._carry = np.zeros(())
            return
        self._carry = {
            "bonded_frames": jnp.zeros(n_dh, dtype=jnp.float64),
        }
        if self._pair_counts:
            self._carry["pair_counts"] = jnp.zeros(
                (n_dh, n_a), dtype=jnp.float64
            )
        self._make_update()

    def _prepare_host(self) -> None:
        from scipy.spatial import cKDTree

        from ..algorithm.topology import minimize_vectors
        from .cluster import _wrap_periodic_axes

        n_dh = len(self._pairs)
        n_a = len(self._acceptor_ix)
        d_col, h_col, a_col = self._d_col, self._h_col, self._a_col
        # donor == acceptor exclusion on absolute indices (per
        # sparse candidate pair — a dense (n_dh, n_a) mask would
        # cost gigabytes at 100k-atom water scale)
        d_atoms = np.asarray(self._pairs[:, 0])
        a_atoms = np.asarray(self._acceptor_ix)
        cutoff = self._d_a_cutoff
        cos_cut = float(np.cos(np.radians(self._angle_cutoff)))
        triclinic = self._triclinic
        track_pairs = self._pair_counts
        lifetimes = self._lifetimes
        self._host_bonded = np.zeros(n_dh)
        if track_pairs:
            self._host_pair_counts = np.zeros((n_dh, n_a))

        def min_image(v, dims):
            # shared per-axis min-image (zero-length axes aperiodic;
            # triclinic 27-shift): algorithm.topology.minimize_vectors
            shape = v.shape
            return np.asarray(
                minimize_vectors(v.reshape(-1, 3), dims)
            ).reshape(shape)

        def host_update(batch) -> None:
            positions = self._host_chunk_positions(batch)
            dims_all = np.asarray(
                batch.host_dimensions[: batch.n_real],
                dtype=np.float64,
            )
            n_real = batch.n_real
            counts = np.empty(n_real, dtype=np.int64)
            lo = self._store_offset
            for f in range(n_real):
                pos = positions[f]
                dims = dims_all[f]
                D, H, A = pos[d_col], pos[h_col], pos[a_col]
                box = dims[:3]
                if not triclinic and (box > 0).any():
                    wrapped_a, boxsize = _wrap_periodic_axes(A, box)
                    wrapped_d, _ = _wrap_periodic_axes(D, box)
                    tree = (
                        cKDTree(wrapped_a)
                        if boxsize is None
                        else cKDTree(wrapped_a, boxsize=boxsize)
                    )
                    cand = tree.query_ball_point(wrapped_d, cutoff)
                    rows = np.repeat(
                        np.arange(n_dh),
                        [len(c) for c in cand],
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
                    # blocked dense fallback (triclinic / fully
                    # box-less): O(block x n_a) memory per slab
                    block = 1024
                    r_parts, c_parts = [], []
                    for lo in range(0, n_dh, block):
                        hi = min(lo + block, n_dh)
                        vDA = min_image(
                            A[None, :, :] - D[lo:hi, None, :],
                            dims,
                        )
                        within = (vDA**2).sum(-1) <= cutoff**2
                        r, c = np.nonzero(within)
                        r_parts.append(r + lo)
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
                if rows.size:
                    keep = d_atoms[rows] != a_atoms[cols]
                    rows, cols = rows[keep], cols[keep]
                if rows.size:
                    vhd = min_image(D[rows] - H[rows], dims)
                    vha = min_image(A[cols] - H[rows], dims)
                    den2 = (vhd**2).sum(-1) * (vha**2).sum(-1)
                    num = (vhd * vha).sum(-1)
                    ok = (den2 > 0) & (
                        num <= cos_cut * np.sqrt(den2)
                    )
                    # the KD-tree candidates still need the distance
                    # test in min-image space (ball query used the
                    # wrapped points; equivalent for orthorhombic)
                    rows, cols = rows[ok], cols[ok]
                counts[f] = rows.size
                if rows.size:
                    self._host_bonded[
                        np.unique(rows)
                    ] += 1
                    if track_pairs:
                        np.add.at(
                            self._host_pair_counts, (rows, cols), 1
                        )
                    if lifetimes:
                        self._existence[lo + f, rows, cols] = True
            self.results.counts[lo:lo + n_real] = counts
            self._store_offset += n_real

        self._host_update_fn = host_update

    def _make_update(self) -> None:
        d_col = jnp.asarray(self._d_col)
        h_col = jnp.asarray(self._h_col)
        a_col = jnp.asarray(self._a_col)
        # absolute indices for donor==acceptor exclusion
        d_ix = jnp.asarray(self._pairs[:, 0])
        a_ix = jnp.asarray(self._acceptor_ix)
        not_self = d_ix[:, None] != a_ix[None, :]
        cutoff = self._d_a_cutoff
        cos_cut = float(np.cos(np.radians(self._angle_cutoff)))
        frame_boxes = self._frame_boxes
        track_pairs = self._pair_counts
        lifetimes = self._lifetimes
        need_hb = track_pairs or lifetimes

        def hbonds_frame(args):
            pos_f, box_f = args
            b = box_f.astype(pos_f.dtype)
            cut2 = jnp.asarray(cutoff * cutoff, dtype=pos_f.dtype)
            cmax = jnp.asarray(cos_cut, dtype=pos_f.dtype)

            D = pos_f[d_col]
            H = pos_f[h_col]
            A = pos_f[a_col]
            vDA = _min_image_vectors(
                A[None, :, :] - D[:, None, :], b
            )
            within = (vDA * vDA).sum(axis=-1) <= cut2
            vHD = _min_image_vectors(D - H, b)
            vHA = _min_image_vectors(
                A[None, :, :] - H[:, None, :], b
            )
            num = (vHD[:, None, :] * vHA).sum(axis=-1)
            den2 = (vHD * vHD).sum(axis=-1)[:, None] * (
                vHA * vHA
            ).sum(axis=-1)
            # angle(D,H,A) >= cutoff  <=>  cos(angle) <= cos(cutoff),
            # compared multiplicatively to avoid the division
            # (den2 > 0 guards the A == H degenerate column).
            angle_ok = (num <= cmax * jnp.sqrt(den2)) & (den2 > 0)
            hb = within & angle_ok & not_self
            count = hb.sum(dtype=jnp.int32)
            bonded = hb.any(axis=1)
            if need_hb:
                return count, bonded, hb
            return count, bonded, count

        def update(carry, positions, dimensions, mask):
            box = frame_boxes(dimensions)
            counts, bonded, hb = jax.lax.map(
                hbonds_frame, (positions, box)
            )
            # int32 reduces over the batch axis (f64 is emulated on
            # TPU); widened to f64 only at the accumulator.
            valid = mask > 0
            new = {
                "bonded_frames": carry["bonded_frames"]
                + (bonded & valid[:, None]).sum(
                    axis=0, dtype=jnp.int32
                ).astype(jnp.float64),
            }
            if track_pairs:
                new["pair_counts"] = carry["pair_counts"] + (
                    hb & valid[:, None, None]
                ).sum(axis=0, dtype=jnp.int32).astype(jnp.float64)
            if lifetimes:
                return new, (counts, hb)
            return new, counts

        self._update = jax.jit(update)

    def _store_chunk(self, extras, batch) -> None:
        if self._lifetimes:
            counts, hb = extras
        else:
            counts, hb = extras, None
        n_real = batch.n_real
        lo = self._store_offset
        self.results.counts[lo:lo + n_real] = np.asarray(counts)[
            :n_real
        ]
        if hb is not None:
            self._existence[lo:lo + n_real] = np.asarray(hb)[:n_real]
        self._store_offset += n_real

    def _conclude(self) -> None:
        self.results.mean_count = float(
            self.results.counts.mean()
        )
        bonded = (
            self._host_bonded
            if self._host_pipeline
            else np.asarray(self._carry["bonded_frames"])
        )
        self.results.occupancies = bonded / self.n_frames
        if self._pair_counts:
            pair = (
                self._host_pair_counts
                if self._host_pipeline
                else np.asarray(self._carry["pair_counts"])
            )
            self.results.pair_counts = pair.astype(np.int64)
        if self._lifetimes:
            self._conclude_lifetimes()

    def _conclude_lifetimes(self) -> None:
        """Intermittent bond correlation c(t) and continuous survival
        S(t) over every (D-H, A) pair ever bonded (shared engine:
        :func:`mdhelper_tpu.analysis.base.existence_lifetimes`)."""

        T = self.n_frames
        h = self._existence.reshape(T, -1)
        # lag grid: stride-aware and uniformity-checked (the WK
        # correlator and the run-length survival assume even spacing)
        lag_dt = self._uniform_lag_dt("Hydrogen-bond lifetimes")
        self.results.lifetime_times = np.arange(T) * lag_dt
        self.results.lifetime, self.results.survival = (
            existence_lifetimes(h)
        )
        if not self._reduced:
            self.results.units[
                "results.lifetime_times"
            ] = ureg.picosecond
