r"""
Velocity dynamics
=================

Velocity autocorrelation and the vibrational density of states — the
standard dynamic observables a velocity-carrying trajectory (TRR,
in-memory arrays) supports.  A beyond-reference capability (the
reference's correlation engine, reference
``algorithm/correlation.py:17-226``, is position-only at the analysis
layer).

The stream's coordinate payload is switched to velocities
(``SerialAnalysisBase._payload``), so chunking, padding, frame
sharding and prefetch all work unchanged; the per-chunk device work
is a passthrough store, and the correlations evaluate at conclusion
with the Wiener-Khinchin engine:

.. math::

   C_{vv}(t) = \frac{1}{N}\sum_i \langle \mathbf{v}_i(t_0) \cdot
   \mathbf{v}_i(t_0 + t) \rangle_{t_0},
   \qquad
   D(\nu) = 2 \Delta t \sum_i m_i \int C_{vv,i}(t)
   \cos(2\pi\nu t)\,dt .
"""

import warnings
from numbers import Real

import jax
import jax.numpy as jnp
import numpy as np

from .. import ureg
from ..algorithm.unit import strip_unit
from ..ops.histogram import _min_image_vectors
from .base import DynamicAnalysisBase, existence_lifetimes

__all__ = [
    "ElectricCurrentAutocorrelation",
    "OverlapFunction",
    "SurvivalProbability",
    "VelocityAutocorrelation",
]


class VelocityAutocorrelation(DynamicAnalysisBase):
    r"""Velocity autocorrelation function and vibrational density of
    states.

    Parameters
    ----------
    group : `AtomGroup`
        Atoms whose velocities are analyzed; the trajectory must
        store velocities (in-memory arrays or TRR).
    n_blocks : `int`, keyword-only, default 1
        Statistical blocks: the time axis splits into `n_blocks`
        segments whose ACFs are averaged (shorter FFTs, error bars).
    vdos : `bool`, keyword-only, default True
        Also compute the mass-weighted vibrational density of states
        (cosine transform of the per-atom ACFs).
    reduced : `bool`, keyword-only, default False
        Reduced (LJ) units (omits ``results.units``).
    parallel : `bool`, keyword-only, default False
        Shard frame batches over the device mesh.

    Results
    -------
    ``results.times``
        Lag times (ps), length ``n_frames // n_blocks``.
    ``results.vacf``
        Raw entity-averaged ACF, (Angstrom/ps)^2.
    ``results.acf``
        ``vacf`` normalized to 1 at :math:`t = 0`.
    ``results.frequencies``, ``results.vdos``
        (with ``vdos=True``) frequency grid (1/ps = THz) and the
        mass-weighted density of states (amu Angstrom^2/ps).
    """

    _payload = "velocities"
    _checkpointable_stores = True

    def _checkpoint_attrs(self) -> tuple:
        return ("_store",)

    def __init__(
        self,
        group,
        *,
        n_blocks: int = 1,
        vdos: bool = True,
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
        if not getattr(self._trajectory, "has_velocities", False):
            raise ValueError(
                "The trajectory stores no velocities; "
                "VelocityAutocorrelation needs a velocity-carrying "
                "format (in-memory arrays with velocities=, TRR)."
            )
        if n_blocks < 1:
            raise ValueError("'n_blocks' must be positive.")
        self._n_blocks = int(n_blocks)
        self._vdos = bool(vdos)
        self._reduced = reduced
        self._atom_indices = group.ix

    def _prepare(self) -> None:
        n = self.group.n_atoms
        self._store = np.empty((self.n_frames, n, 3))
        self._store_offset = 0
        # conclusion-heavy analysis: the carry is a passthrough
        # scalar (the streaming driver keys on its presence)
        self._carry = jnp.zeros(())

        # The per-chunk work is a pure host store: on a
        # tunnel-attached TPU the device round trip (upload +
        # passthrough + fetch) is all cost and no compute, so the
        # stage runs host-side there (like the Onsager pipeline).
        self._host_pipeline = (
            not getattr(self, "_parallel", False)
            and self._resolve_host_pipeline()
        )
        if self._host_pipeline:

            def host_update(batch) -> None:
                velocities = self._host_chunk_positions(batch)
                self._store_chunk(velocities, batch)

            self._host_update_fn = host_update
            return

        def update(carry, positions, dimensions, mask):
            # `positions` IS the velocity payload; the device step is
            # a passthrough (the analysis is conclusion-heavy).
            del dimensions, mask
            return carry, positions

        self._update = jax.jit(update)

    def _store_chunk(self, velocities, batch) -> None:
        n_real = batch.n_real
        lo = self._store_offset
        self._store[lo:lo + n_real] = np.asarray(velocities)[
            :n_real
        ]
        self._store_offset += n_real

    def _conclude(self) -> None:
        from ..algorithm.correlation import correlation_fft

        n_blocks = self._n_blocks
        per_block = self.n_frames // n_blocks
        if per_block < 2:
            raise ValueError(
                "Too few frames per block for a correlation."
            )
        extra = self.n_frames - n_blocks * per_block
        if extra:
            warnings.warn(
                f"The trajectory is not divisible into {n_blocks:,} "
                f"blocks, so the last {extra:,} frame(s) will be "
                "discarded."
            )
        v = self._store[: n_blocks * per_block].reshape(
            n_blocks, per_block, -1, 3
        )
        # per-atom ACFs, block-averaged: (blocks, t, atoms)
        per_atom = np.asarray(
            correlation_fft(v, axis=1, vector=True)
        ).mean(axis=0)
        self.results.vacf = per_atom.mean(axis=1)
        self.results.acf = self.results.vacf / self.results.vacf[0]
        dt = self._uniform_lag_dt("VelocityAutocorrelation")
        self.results.times = np.arange(per_block) * dt
        if not self._reduced:
            self.results.units = {
                "results.times": ureg.picosecond,
                "results.vacf": (ureg.angstrom / ureg.picosecond)
                ** 2,
            }
        if not self._vdos:
            return
        masses = np.asarray(self.group.masses, dtype=np.float64)
        weighted = per_atom @ masses  # (t,)
        # cosine transform: D(nu) = 2 dt [C(0)/2 + sum C(t) cos(...)]
        half = weighted.copy()
        half[0] *= 0.5
        self.results.vdos = 2.0 * dt * np.fft.rfft(half).real
        self.results.frequencies = np.fft.rfftfreq(per_block, dt)
        if not self._reduced:
            self.results.units["results.frequencies"] = (
                1 / ureg.picosecond
            )
            self.results.units["results.vdos"] = (
                ureg.unified_atomic_mass_unit
                * ureg.angstrom**2
                / ureg.picosecond
            )


class ElectricCurrentAutocorrelation(DynamicAnalysisBase):
    r"""Charge-current autocorrelation and the Green-Kubo ionic
    conductivity (beyond reference; the time-domain complement of the
    Einstein-route
    :meth:`~mdhelper_tpu.analysis.transport.Onsager.calculate_conductivity`):

    .. math::

       \mathbf{J}(t) = \sum_i q_i\,\mathbf{v}_i(t), \qquad
       \sigma = \frac{1}{3 V k_\mathrm{B}T} \int_0^\infty \langle
       \mathbf{J}(0)\cdot\mathbf{J}(t)\rangle\,dt .

    The per-frame reduction is one :math:`O(N)` charge-weighted sum
    streamed to a tiny ``(n_frames, 3)`` host store; all lags evaluate
    at conclusion with the Wiener-Khinchin engine through
    :func:`~mdhelper_tpu.analysis.thermodynamics.calculate_ionic_conductivity`.

    Parameters
    ----------
    group : `AtomGroup`
        Charged atoms; the trajectory must store velocities
        (in-memory arrays with ``velocities=``, TRR).
    temperature : `float` or `pint.Quantity`
        System temperature (K), or the LJ energy scale
        :math:`k_\mathrm{B}T` when ``reduced=True``.
    charges : array-like, keyword-only, optional
        Per-atom charges (e); defaults to the topology's.
    n_blocks : `int`, keyword-only, default 1
        Statistical blocks (block-averaged ACF).
    reduced : `bool`, keyword-only, default False
        Reduced (LJ) units (omits ``results.units``).
    parallel : `bool`, keyword-only, default False
        Shard frame batches over the device mesh.

    Results
    -------
    ``results.times``
        Lag times (ps), length ``n_frames // n_blocks``.
    ``results.current``
        Charge-current series :math:`\mathbf{J}(t)`, shape
        ``(n_frames, 3)`` (e Angstrom/ps).
    ``results.acf``
        Component-averaged current ACF ((e Angstrom/ps)^2).
    ``results.running_conductivity``, ``results.conductivity``
        Cumulative Green-Kubo integral and its full-window value
        (S/m).
    """

    _checkpointable_stores = True
    _payload = "velocities"

    def _checkpoint_attrs(self) -> tuple:
        return ("_current",)

    def __init__(
        self,
        group,
        temperature,
        *,
        charges=None,
        n_blocks: int = 1,
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
        if not getattr(self._trajectory, "has_velocities", False):
            raise ValueError(
                "The trajectory stores no velocities; "
                "ElectricCurrentAutocorrelation needs a "
                "velocity-carrying format (in-memory arrays with "
                "velocities=, TRR)."
            )
        if n_blocks < 1:
            raise ValueError("'n_blocks' must be positive.")
        self._require_box("ElectricCurrentAutocorrelation")
        self._n_blocks = int(n_blocks)
        self._temperature, _ = strip_unit(
            temperature, None if reduced else "kelvin"
        )
        if charges is None:
            charges = group.charges
        else:
            charges, _ = strip_unit(
                charges, None if reduced else "elementary_charge"
            )
        charges = np.asarray(charges, dtype=np.float64)
        if charges.shape != (group.n_atoms,):
            raise ValueError(
                "'charges' must have one value per atom in 'group'."
            )
        if not charges.any():
            warnings.warn(
                "All charges are zero; the current (and "
                "conductivity) will vanish."
            )
        self._charges = charges
        self._reduced = reduced
        self._atom_indices = group.ix

    def _prepare(self) -> None:
        self._current = np.empty((self.n_frames, 3))
        self._store_offset = 0
        self._carry = jnp.zeros(())

        # O(N) per-frame reduction: host-side on tunnel-attached TPUs
        # (like VelocityAutocorrelation).
        self._host_pipeline = (
            not getattr(self, "_parallel", False)
            and self._resolve_host_pipeline()
        )
        if self._host_pipeline:
            charges = self._charges

            def host_update(batch) -> None:
                velocities = self._host_chunk_positions(batch)
                self._store_chunk(
                    np.einsum("n,bnd->bd", charges, velocities),
                    batch,
                )

            self._host_update_fn = host_update
            return

        charges = jnp.asarray(self._charges)

        def update(carry, positions, dimensions, mask):
            # `positions` IS the velocity payload.
            del dimensions, mask
            current = jnp.einsum(
                "n,bnd->bd",
                charges.astype(positions.dtype),
                positions,
                precision=jax.lax.Precision.HIGHEST,
            )
            return carry, current

        self._update = jax.jit(update)

    def _store_chunk(self, current, batch) -> None:
        n_real = batch.n_real
        lo = self._store_offset
        self._current[lo:lo + n_real] = np.asarray(current)[:n_real]
        self._store_offset += n_real

    def _conclude(self) -> None:
        from .thermodynamics import calculate_ionic_conductivity

        n_blocks = self._n_blocks
        per_block = self.n_frames // n_blocks
        if per_block < 2:
            raise ValueError(
                "Too few frames per block for a correlation."
            )
        extra = self.n_frames - n_blocks * per_block
        if extra:
            warnings.warn(
                f"The trajectory is not divisible into {n_blocks:,} "
                f"blocks, so the last {extra:,} frame(s) will be "
                "discarded."
            )
        from ..algorithm.topology import box_volume

        volume = box_volume(self.universe.dimensions)
        dt = self._uniform_lag_dt("ElectricCurrentAutocorrelation")
        self.results.current = self._current
        blocks = [
            calculate_ionic_conductivity(
                self._current[b * per_block:(b + 1) * per_block],
                volume,
                self._temperature,
                dt,
                reduced=self._reduced,
            )
            for b in range(n_blocks)
        ]
        self.results.times = blocks[0].times
        self.results.acf = np.mean([b.acf for b in blocks], axis=0)
        self.results.running_conductivity = np.mean(
            [b.running_conductivity for b in blocks], axis=0
        )
        self.results.conductivity = float(
            np.mean([b.conductivity for b in blocks])
        )
        if not self._reduced:
            units = blocks[0].units
            self.results.units = {
                "results.times": units.times,
                "results.current": (
                    ureg.elementary_charge
                    * ureg.angstrom
                    / ureg.picosecond
                ),
                "results.acf": units.acf,
                "results.running_conductivity": (
                    units.running_conductivity
                ),
                "results.conductivity": units.conductivity,
            }


class SurvivalProbability(DynamicAnalysisBase):
    r"""Residence dynamics of a group in a spatial zone: the
    intermittent correlation :math:`c(t) = \langle h(0)h(t) \rangle /
    \langle h \rangle` and the continuous survival :math:`S(t)`
    (atoms counted only while *continuously* inside), the water-shell
    / slab residence observables (MDAnalysis
    ``waterdynamics.SurvivalProbability`` territory; beyond
    reference).

    Per frame the zone membership of each atom is one fused
    elementwise test; the boolean series streams to the host and both
    lifetime functions evaluate at conclusion with the shared
    existence engine (WK ACF + run-length survival,
    :func:`mdhelper_tpu.analysis.base.existence_lifetimes`).

    Parameters
    ----------
    group : `AtomGroup`
        Atoms whose residence is tracked.
    zone : `tuple`
        Zone specification:

        * ``("slab", axis, lo, hi)`` — wrapped coordinate along
          ``axis`` (``"x"/"y"/"z"``) in ``[lo, hi)`` (orthorhombic
          cells only);
        * ``("sphere", center, radius)`` — minimum-image distance to
          a fixed point;
        * ``("shell", other_group, radius)`` — minimum-image distance
          to ANY atom of ``other_group`` (solvation-shell residence).
    reduced : `bool`, keyword-only, default False
        Reduced (LJ) units (omits ``results.units``).
    parallel : `bool`, keyword-only, default False
        Shard frame batches over the device mesh.

    Results
    -------
    ``results.times``
        Lag times (ps).
    ``results.intermittent``
        :math:`c(t)`, normalized to 1.
    ``results.survival``
        Continuous :math:`S(t)`, normalized to 1.
    ``results.n_in_zone``
        Per-frame member count, shape ``(n_frames,)``.
    """

    _checkpointable_stores = True

    def _checkpoint_attrs(self) -> tuple:
        return ("_membership",)

    def __init__(
        self,
        group,
        zone,
        *,
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
        self._reduced = reduced
        self._setup_periodic_box()

        if not isinstance(zone, (tuple, list)) or not zone:
            raise ValueError(
                "zone must be ('slab', axis, lo, hi), "
                "('sphere', center, radius) or "
                "('shell', group, radius)."
            )
        kind = zone[0]
        self._shell_group = None

        def _length(value, what):
            value = strip_unit(value, "angstrom")[0]
            if not isinstance(value, Real):
                raise ValueError(f"{what} must be a scalar length.")
            return float(value)

        if kind == "slab":
            if self._triclinic:
                raise ValueError(
                    "Slab zones need an orthorhombic cell."
                )
            _, axis, lo, hi = zone
            if axis not in ("x", "y", "z"):
                raise ValueError("Slab axis must be 'x', 'y' or 'z'.")
            lo = _length(lo, "Slab lower bound")
            hi = _length(hi, "Slab upper bound")
            if not lo < hi:
                raise ValueError(
                    "Slab bounds must satisfy lo < hi."
                )
            self._zone = ("slab", "xyz".index(axis), lo, hi)
        elif kind == "sphere":
            _, center, radius = zone
            center = np.asarray(
                strip_unit(center, "angstrom")[0], dtype=np.float64
            )
            if center.shape != (3,):
                raise ValueError("Sphere center must have shape (3,).")
            radius = _length(radius, "Sphere radius")
            if radius <= 0:
                raise ValueError("Sphere radius must be positive.")
            self._zone = ("sphere", center, radius)
        elif kind == "shell":
            _, other, radius = zone
            if not hasattr(other, "universe"):
                raise ValueError(
                    "'shell' zones take an AtomGroup."
                )
            radius = _length(radius, "Shell radius")
            if radius <= 0:
                raise ValueError("Shell radius must be positive.")
            self._shell_group = other
            self._zone = ("shell", None, radius)
        else:
            raise ValueError(f"Unknown zone kind: {kind!r}.")

        cols = [group.ix]
        if self._shell_group is not None:
            cols.append(self._shell_group.ix)
        involved = np.unique(np.concatenate(cols))
        self._atom_indices = involved
        col_of = {int(g): c for c, g in enumerate(involved)}
        self._g_col = np.fromiter(
            (col_of[int(i)] for i in group.ix), dtype=np.int64,
            count=group.n_atoms,
        )
        if self._shell_group is not None:
            self._s_col = np.fromiter(
                (col_of[int(i)] for i in self._shell_group.ix),
                dtype=np.int64, count=self._shell_group.n_atoms,
            )

    # slab zones consume ONE coordinate axis: stream only that column
    # (the CLAUDE.md _coord_axes invariant; sphere/shell need all 3)
    @property
    def _coord_axes(self):
        if self._zone[0] == "slab":
            return [self._zone[1]]
        return None

    def _prepare(self) -> None:
        n = self.group.n_atoms
        self._membership = np.empty((self.n_frames, n), dtype=bool)
        self.results.n_in_zone = np.empty(self.n_frames, dtype=int)
        self._store_offset = 0
        self._carry = jnp.zeros(())
        # O(N) membership tests (KD candidates for shells): host-side
        # on tunnel-attached TPUs like the other cheap-per-frame
        # stages
        self._host_pipeline = (
            not getattr(self, "_parallel", False)
            and self._resolve_host_pipeline()
        )
        if self._host_pipeline:
            self._prepare_host()
            return
        self._make_update()

    def _prepare_host(self) -> None:
        from scipy.spatial import cKDTree

        from ..algorithm.topology import minimize_vectors
        from .cluster import _wrap_periodic_axes

        g_col = self._g_col
        kind = self._zone[0]
        triclinic = self._triclinic
        if kind == "slab":
            _, axis, lo_b, hi_b = self._zone
        elif kind == "sphere":
            _, center, radius = self._zone
        else:
            s_col = self._s_col
            radius = self._zone[2]

        def host_update(batch) -> None:
            positions = self._host_chunk_positions(batch)
            dims_all = np.asarray(
                batch.host_dimensions[: batch.n_real],
                dtype=np.float64,
            )
            n_real = batch.n_real
            lo = self._store_offset
            for f in range(n_real):
                pos = positions[f]
                dims = dims_all[f]
                pts = pos[g_col]
                if kind == "slab":
                    # host chunks carry all three coordinate columns
                    # (the _coord_axes slice applies to the device
                    # stream only)
                    coord = pts[:, axis] % dims[axis]
                    member = (coord >= lo_b) & (coord < hi_b)
                elif kind == "sphere":
                    d = np.asarray(
                        minimize_vectors(pts - center, dims)
                    )
                    member = (d**2).sum(-1) <= radius * radius
                else:
                    shell = pos[s_col]
                    box = dims[:3]
                    if not triclinic and (box > 0).any():
                        wrapped_s, boxsize = _wrap_periodic_axes(
                            shell, box
                        )
                        wrapped_g, _ = _wrap_periodic_axes(pts, box)
                        tree = (
                            cKDTree(wrapped_s)
                            if boxsize is None
                            else cKDTree(wrapped_s, boxsize=boxsize)
                        )
                        member = np.zeros(len(pts), dtype=bool)
                        hits = tree.query_ball_point(
                            wrapped_g, radius
                        )
                        member[:] = [len(h) > 0 for h in hits]
                    else:
                        d = np.asarray(
                            minimize_vectors(
                                (
                                    pts[:, None, :]
                                    - shell[None, :, :]
                                ).reshape(-1, 3),
                                dims,
                            )
                        ).reshape(len(pts), len(shell), 3)
                        member = (
                            (d**2).sum(-1) <= radius * radius
                        ).any(axis=1)
                self._membership[lo + f] = member
                self.results.n_in_zone[lo + f] = int(member.sum())
            self._store_offset += n_real

        self._host_update_fn = host_update

    def _make_update(self) -> None:
        g_col = jnp.asarray(self._g_col)
        kind = self._zone[0]
        frame_boxes = self._frame_boxes
        if kind == "slab":
            _, axis, lo, hi = self._zone
            # the stream delivers only the slab column (_coord_axes)
            stream_axis = 0
        elif kind == "sphere":
            _, center_np, radius = self._zone
        else:
            s_col = jnp.asarray(self._s_col)
            radius = self._zone[2]

        def member_frame(args):
            pos_f, box_f = args
            b = box_f.astype(pos_f.dtype)
            pts = pos_f[g_col]
            if kind == "slab":
                coord = pts[:, stream_axis] % b[axis]
                return (coord >= lo) & (coord < hi)
            if kind == "sphere":
                center = jnp.asarray(center_np, dtype=pos_f.dtype)
                d = _min_image_vectors(pts - center, b)
                return (d * d).sum(axis=-1) <= radius * radius
            shell = pos_f[s_col]
            d = _min_image_vectors(
                pts[:, None, :] - shell[None, :, :], b
            )
            d2 = (d * d).sum(axis=-1)
            return (d2 <= radius * radius).any(axis=1)

        def update(carry, positions, dimensions, mask):
            del mask
            box = frame_boxes(dimensions)
            member = jax.lax.map(
                member_frame, (positions, box)
            )
            counts = member.sum(axis=1, dtype=jnp.int32)
            return carry, (member, counts)

        self._update = jax.jit(update)

    def _store_chunk(self, extras, batch) -> None:
        member, counts = extras
        n_real = batch.n_real
        lo = self._store_offset
        self._membership[lo:lo + n_real] = np.asarray(member)[
            :n_real
        ]
        self.results.n_in_zone[lo:lo + n_real] = np.asarray(counts)[
            :n_real
        ]
        self._store_offset += n_real

    def _conclude(self) -> None:
        T = self.n_frames
        lag_dt = self._uniform_lag_dt("SurvivalProbability")
        self.results.times = np.arange(T) * lag_dt
        self.results.intermittent, self.results.survival = (
            existence_lifetimes(self._membership)
        )
        if not self._reduced:
            self.results.units = {
                "results.times": ureg.picosecond,
            }


class OverlapFunction(DynamicAnalysisBase):
    r"""Self-overlap function :math:`Q(t)` and the four-point dynamic
    susceptibility :math:`\chi_4(t)`.

    .. math::

       Q(t) = \frac{1}{N} \sum_i w\bigl(|\mathbf{r}_i(t_0 + t) -
       \mathbf{r}_i(t_0)|\bigr), \qquad
       \chi_4(t) = N \bigl[ \langle Q(t)^2 \rangle_{t_0} -
       \langle Q(t) \rangle_{t_0}^2 \bigr],

    with :math:`w(d) = \Theta(a - d)` the overlap window of width
    `a` (commonly :math:`0.3\sigma`).  :math:`\chi_4` peaks at the
    structural relaxation time and measures the volume of
    dynamically correlated regions — the standard dynamic-
    heterogeneity observable for glassy systems (a beyond-reference
    capability; the reference has no four-point analysis).

    TPU-first design: the same device-resident position ring buffer
    as the :class:`~mdhelper_tpu.analysis.structure.
    IntermediateScatteringFunction` (an ``(n_lags, N, 3)``
    :func:`jax.lax.scan` carry), with an :math:`O(N)` minimum-image
    pass per resident lag per frame — no pair sweeps, so a dense lag
    grid costs almost nothing next to the streaming.

    Parameters
    ----------
    group : `AtomGroup`
        Atoms (or grouping entities) to analyze.
    a : `float`, default 1.0
        Overlap window (Å): displacements below `a` count as
        overlapping.
    grouping : `str`, keyword-only, default ``"atoms"``
        ``"atoms"``, ``"residues"`` or ``"segments"`` (COM
        positions).
    dt : `float` or `pint.Quantity`, keyword-only, optional
        Time between frames (defaults to the trajectory's ``dt``).
    n_lags : `int`, keyword-only, optional
        Ring length in frames (defaults to the analyzed frame
        count).
    lags : `str` or array-like, keyword-only, optional
        Lag subset — ``"log"`` or explicit frame offsets (see
        :class:`~mdhelper_tpu.analysis.structure.
        IntermediateScatteringFunction`).
    reduced : `bool`, keyword-only, default False
        Reduced (LJ) units (omits ``results.units``).

    Results
    -------
    ``results.times``
        Lag times (ps).
    ``results.Q``
        Mean overlap :math:`\langle Q(t) \rangle`, shape
        ``(n_sel,)``.
    ``results.chi4``
        Four-point susceptibility, shape ``(n_sel,)``.
    ``results.origins``
        Time origins entering each lag's averages.

    Minimum-image caveat: like every wrapped-trajectory displacement
    estimator, lags must be short enough that particles do not
    diffuse half a box (see
    :class:`~mdhelper_tpu.analysis.structure.VanHoveFunction`).
    """

    _sequential = True

    def __init__(
        self,
        group,
        a: float = 1.0,
        *,
        grouping: str = "atoms",
        dt=None,
        n_lags: int = None,
        lags=None,
        reduced: bool = False,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        from .structure import _group_segment_ids, _validate_groupings

        self.group = group
        self.universe = group.universe
        super().__init__(
            self.universe.trajectory, False, verbose, **kwargs
        )
        if not isinstance(a, Real):
            a = strip_unit(a, "angstrom")[0]
        if a <= 0:
            raise ValueError("'a' must be positive.")
        self._a = float(a)
        self._grouping = _validate_groupings(grouping)[0]
        self._reduced = reduced
        self._n_lags = n_lags
        self._lag_spec = lags
        self._dt = strip_unit(
            dt or self._trajectory.dt, "picosecond"
        )[0]
        self._require_box(type(self).__name__)
        self._setup_periodic_box()
        self._atom_indices = np.asarray(group.ix)
        self._seg, self._n = _group_segment_ids(
            group, self._grouping
        )

    def _prepare(self) -> None:
        from ..ops.histogram import _min_image_distance
        from .structure import (
            _check_even_frame_spacing,
            _com_positions,
            _resolve_lag_values,
            triclinic_matrices,
        )

        lag_values, n_lags = _resolve_lag_values(
            self._lag_spec, self._n_lags, self.n_frames
        )
        self._lag_values = lag_values
        step = _check_even_frame_spacing(self.frames)
        self.results.times = step * self._dt * lag_values
        self.results.units = {}
        if not self._reduced:
            self.results.units = {
                "results.times": ureg.picosecond,
            }

        n_sel = len(lag_values)
        ring_dtype = jnp.dtype(self._stream_dtype())
        self._carry = {
            "ring": jnp.zeros((n_lags, self._n, 3), ring_dtype),
            "q1": jnp.zeros(n_sel, jnp.float64),
            "q2": jnp.zeros(n_sel, jnp.float64),
            "origins": jnp.zeros(n_sel, jnp.float64),
            "frame": jnp.zeros((), jnp.int64),
        }
        # ring program: one-leaf carry sync (see the ISF ring A/Bs)
        self._sync_carry_bytes = 0
        self._store_chunk = None

        seg = None if self._seg is None else jnp.asarray(self._seg)
        masses = jnp.asarray(self.group.masses)
        n_entities = self._n
        triclinic = self._triclinic
        lag_range = jnp.asarray(lag_values)
        a = self._a

        def scan_step(carry, inputs):
            pos, box, valid = inputs
            fi = carry["frame"]
            rcfi = (fi % n_lags).astype(jnp.int32)
            ring = jnp.where(
                valid > 0,
                carry["ring"].at[rcfi].set(pos),
                carry["ring"],
            )
            rifi = ((fi - lag_range) % n_lags).astype(jnp.int32)
            lag_ok = (
                (lag_range <= fi) & (valid > 0)
            ).astype(jnp.float64)

            def lag_body(lag, acc):
                q1, q2 = acc
                past = ring[rifi[lag]]
                d = _min_image_distance(
                    pos - past, box.astype(pos.dtype)
                )
                q = (
                    d < jnp.asarray(a, dtype=d.dtype)
                ).mean(dtype=pos.dtype).astype(jnp.float64)
                ok = lag_ok[lag]
                return (
                    q1.at[lag].add(q * ok),
                    q2.at[lag].add(q * q * ok),
                )

            q1, q2 = jax.lax.fori_loop(
                0, n_sel, lag_body, (carry["q1"], carry["q2"])
            )
            return {
                "ring": ring,
                "q1": q1,
                "q2": q2,
                "origins": carry["origins"] + lag_ok,
                "frame": fi + (valid > 0),
            }, None

        def update(carry, positions, dimensions, mask):
            pos = positions
            if seg is not None:
                pos = _com_positions(
                    pos, masses, seg, n_entities
                )
            if triclinic:
                box = triclinic_matrices(dimensions)
            else:
                box = dimensions[:, :3]
            carry, _ = jax.lax.scan(
                scan_step, carry, (pos, box, mask)
            )
            return carry

        self._update = jax.jit(update)

    def _conclude(self) -> None:
        q1 = np.asarray(self._carry["q1"])
        q2 = np.asarray(self._carry["q2"])
        origins = np.asarray(self._carry["origins"])
        self.results.origins = origins.astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            q_mean = q1 / origins
            q2_mean = q2 / origins
        self.results.Q = q_mean
        self.results.chi4 = self._n * (q2_mean - q_mean**2)
