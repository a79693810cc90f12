r"""
Flow / temperature profiles
===========================

Axis-resolved hydrodynamic fields for non-equilibrium MD (shear flow,
Poiseuille flow, thermal gradients): number and mass density,
mass-weighted streaming velocity :math:`u_\alpha(z)`, and kinetic
temperature :math:`T(z)`, binned along one box axis.  A
beyond-reference capability (the reference profiles densities only,
``/root/reference/src/mdhelper/analysis/profile.py:287-996``); the
observables match LAMMPS' ``fix ave/chunk vx vy vz temp`` /
``compute temp/profile`` workflow.

TPU formulation: the streaming base concatenates positions and
velocities into one ``(B, N, 6)`` payload
(``SerialAnalysisBase._payload = "positions+velocities"``) and
``_coord_axes`` slices it to the four consumed columns (the profiled
coordinate + three velocity components), so chunking, padding,
frame sharding, and prefetch are shared with every other analysis.
Per chunk one fused elementwise program feeds six one-hot MXU
histograms (:func:`mdhelper_tpu.ops.profiles.axis_histogram_batch`)
per frame — count, :math:`\sum m`, :math:`\sum m v_x`, :math:`\sum m
v_y`, :math:`\sum m v_z`, :math:`\sum m |v|^2` — accumulated in
float64 across frames, so serial and frame-sharded parallel runs are
bit-equal.

The kinetic temperature removes the per-bin streaming velocity by
default (the NEMD convention; LAMMPS ``compute temp/profile``):

.. math::

   \frac{3 (N_b - 1)}{2} k_\mathrm{B} T_b = \frac{1}{2} \left(
   \sum_{i \in b} m_i |\mathbf{w}_i|^2 - \frac{|\sum_{i \in b} m_i
   \mathbf{w}_i|^2}{\sum_{i \in b} m_i} \right),
   \qquad
   \mathbf{w}_i = \mathbf{v}_i - \mathbf{u}_\mathrm{com}(t_i),

with the per-bin sums running over atoms *and* frames (the
stationary-flow assumption: one time-averaged streaming velocity per
bin) and :math:`\mathbf{u}_\mathrm{com}(t)` the instantaneous global
mass-weighted mean velocity of the group (``compute temp/com``
semantics).  The per-frame centering is a *numerical* preconditioner
as much as a physical one: the drift-removed kinetic energy is a
small difference of histogram sums, and centering keeps those sums
at the thermal scale so the device's float32 binning never has to
cancel :math:`|u|^2`-sized terms (for a rigid boost the two
estimators coincide exactly; they differ only by the frame-to-frame
fluctuation of the global center-of-mass velocity).  The reported
streaming velocity and the ``remove_drift=False`` temperature are
reconstructed from the centered sums plus exact per-frame
:math:`\mathbf{u}_\mathrm{com}` correction terms accumulated in
float64, so they keep raw-laboratory-frame semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .. import ureg
from ..ops.profiles import axis_histogram_batch
from .base import DynamicAnalysisBase, jit_update

__all__ = ["FlowProfile"]


class FlowProfile(DynamicAnalysisBase):
    r"""Axis-binned hydrodynamic profiles: number/mass density,
    streaming velocity, and kinetic temperature.

    Parameters
    ----------
    group : `AtomGroup`
        Atoms to profile.  Masses come from the topology.
    axis : `str`, default :code:`"z"`
        Profiled box axis (``"x"``, ``"y"`` or ``"z"``).
    n_bins : `int`, default 100
        Bins along the axis.
    remove_drift : `bool`, keyword-only, default True
        Subtract the instantaneous global center-of-mass velocity
        and the per-bin (time-averaged) residual streaming velocity
        from the kinetic temperature, counting three degrees of
        freedom per bin (``dof = 3 (N_b - 1)``); with ``False``, the
        raw laboratory-frame kinetic energy is used
        (``dof = 3 N_b``).
    reduced : `bool`, keyword-only, default False
        Reduced (LJ) units: :math:`k_\mathrm{B} = 1` and no
        ``results.units``.
    parallel : `bool`, keyword-only, default False
        Shard frame batches over the device mesh.

    Results
    -------
    ``results.bins``
        Bin centers (Å).
    ``results.counts``
        Per-bin atom counts summed over frames.
    ``results.number_density``, ``results.mass_density``
        Time-averaged densities (Å⁻³ and u·Å⁻³; initialization-box
        bin volume, the profile-class convention).
    ``results.velocity``
        Mass-weighted streaming velocity per bin, shape
        ``(n_bins, 3)`` (Å/ps; NaN in empty bins).
    ``results.temperature``
        Kinetic temperature per bin (K, or
        :math:`k_\mathrm{B} T / \epsilon` when reduced; NaN where the
        degrees of freedom vanish).

    Notes
    -----
    Bond/constraint degrees of freedom are not deducted (atoms are
    treated as free particles, like LAMMPS ``compute temp`` without
    ``fix rattle``); rigid-molecule temperatures need the per-bin dof
    corrected by the caller.

    With ``remove_drift=True`` the per-frame global-COM centering
    consumes 3 dof per frame, but only the 3 per-bin streaming-mean
    dof are deducted (``dof = 3 (N_b - 1)``): the global COM-removal
    dof are NOT spread across bins, so T is biased low by
    ~:math:`1/N_\mathrm{atoms}` relative to LAMMPS ``compute
    temp/com`` on the whole system.  Documented convention: the
    centering here is primarily numerical (it keeps the drift-removed
    kinetic energy at the thermal scale in float32), and a per-bin
    redistribution of 3 global dof has no unique definition.
    """

    _payload = "positions+velocities"

    def __init__(
        self,
        group,
        axis: str = "z",
        n_bins: int = 100,
        *,
        remove_drift: bool = True,
        reduced: bool = False,
        parallel: bool = False,
        verbose: bool = True,
        **kwargs,
    ) -> None:
        self.universe = group.universe
        super().__init__(
            self.universe.trajectory, parallel, verbose, **kwargs
        )
        if group.n_atoms == 0:
            raise ValueError("Empty atom group.")
        if not getattr(self._trajectory, "has_velocities", False):
            raise ValueError(
                "FlowProfile needs a trajectory with velocities."
            )
        self._setup_periodic_box()
        if self._triclinic:
            raise ValueError(
                "FlowProfile needs an orthorhombic cell."
            )
        self._require_box("FlowProfile")
        if axis not in ("x", "y", "z"):
            raise ValueError("axis must be 'x', 'y' or 'z'.")
        self._axis = "xyz".index(axis)
        if int(n_bins) < 1:
            raise ValueError("'n_bins' must be positive.")
        self._n_bins = int(n_bins)
        self._atom_indices = np.asarray(group.ix)
        self._masses = np.asarray(
            group.masses, dtype=np.float64
        )
        self._remove_drift = bool(remove_drift)
        self._reduced = reduced
        self._dimensions = np.asarray(
            self.universe.dimensions[:3], dtype=np.float64
        )

    def _prepare(self) -> None:
        # stream only the profiled coordinate + the three velocity
        # components of the (B, N, 6) concatenated payload
        self._coord_axes = np.asarray(
            [self._axis, 3, 4, 5], dtype=np.int64
        )
        length = self._dimensions[self._axis]
        self._edges = np.linspace(0.0, length, self._n_bins + 1)
        self.results.bins = (self._edges[:-1] + self._edges[1:]) / 2
        if not self._reduced:
            self.results.units = {
                "results.bins": ureg.angstrom,
                "results.number_density": ureg.angstrom**-3,
                "results.mass_density": (
                    ureg.unified_atomic_mass_unit * ureg.angstrom**-3
                ),
                "results.velocity": (
                    ureg.angstrom / ureg.picosecond
                ),
                "results.temperature": ureg.kelvin,
            }
        zeros = lambda: jnp.zeros(self._n_bins, dtype=jnp.float64)
        # centered per-bin moments (mw*, mw2) + exact float64
        # laboratory-frame correction terms (drift*, boost) — see the
        # module docstring for the estimator algebra
        self._carry = {
            k: zeros()
            for k in (
                "n", "m", "mwx", "mwy", "mwz", "mw2",
                "driftx", "drifty", "driftz", "boost",
            )
        }
        self._make_update()

    def _make_update(self) -> None:
        dtype = self._stream_dtype()
        edges = jnp.asarray(self._edges, dtype=dtype)
        masses = jnp.asarray(self._masses, dtype=dtype)
        m_total = float(self._masses.sum())
        ax = self._axis

        def update(carry, positions, dimensions, mask):
            # positions is the sliced (B, N, 4) payload: column 0 is
            # the profiled coordinate, columns 1:4 the velocity
            coord = positions[..., 0]
            vel = positions[..., 1:4]
            # wrap with each frame's own box length (NPT-safe); the
            # bin grid stays the initialization-time cell (the
            # profile-class convention)
            length = dimensions[:, ax, None].astype(coord.dtype)
            coord = jnp.where(
                length > 0,
                coord - length * jnp.floor(coord / length),
                coord,
            )
            # per-frame global COM velocity, then centered residuals:
            # keeps the histogram sums at the thermal scale so the
            # drift-removed kinetic energy never cancels |u|^2 terms
            u_com = (masses[None, :, None] * vel).sum(
                axis=1
            ) / m_total  # (B, 3)
            w = vel - u_com[:, None, :]
            mw = masses[None, :, None] * w  # (B, N, 3)
            mw2 = (mw * w).sum(axis=-1)  # (B, N)

            # per-FRAME histograms (f32 on the TPU stream, f64 on
            # CPU), f64 cross-frame accumulation.  Unlike the
            # pure-histogram classes (whose f32-valued per-frame
            # terms sum exactly in f64, making sharded runs
            # bit-equal), the f64 correction products below make the
            # frame sum genuinely non-associative: serial and
            # parallel runs agree to f64 rounding, not bitwise
            def per_frame(args):
                coord_f, mw_f, mw2_f, m_f = args
                hist = lambda weights: axis_histogram_batch(
                    coord_f[None], m_f[None], edges,
                    weights=weights,
                )
                return (
                    hist(None),
                    hist(masses[None]),
                    hist(mw_f[None, :, 0]),
                    hist(mw_f[None, :, 1]),
                    hist(mw_f[None, :, 2]),
                    hist(mw2_f[None]),
                )

            # Batched map (ADVICE r3): plain lax.map ran the six
            # per-frame histograms as a sequential scan — thousands
            # of tiny matmuls per chunk on TPU; batch_size vectorizes
            # 8 frames per step while bounding the one-hot memory to
            # ~8x a single frame (the reason this is not a full vmap).
            sums = jax.lax.map(
                per_frame, (coord, mw, mw2, mask), batch_size=8
            )
            n_f, m_f, mwx_f, mwy_f, mwz_f, mw2_f = (
                s.astype(jnp.float64) for s in sums
            )
            # exact per-frame laboratory-frame corrections (float64):
            # drift_a = sum_f u_com[f, a] m_f(bin) recovers the raw
            # streaming velocity; boost reconstructs the raw second
            # moment, sum m|v|^2 = mw2 + 2 u.mw + |u|^2 m per frame
            u64 = u_com.astype(jnp.float64)  # (B, 3)
            mw64 = jnp.stack([mwx_f, mwy_f, mwz_f], axis=1)
            drift = (u64[:, :, None] * m_f[:, None, :]).sum(axis=0)
            boost = (
                2.0 * (u64[:, :, None] * mw64).sum(axis=1)
                + (u64 * u64).sum(axis=1)[:, None] * m_f
            ).sum(axis=0)
            new = {
                "n": n_f.sum(axis=0),
                "m": m_f.sum(axis=0),
                "mwx": mwx_f.sum(axis=0),
                "mwy": mwy_f.sum(axis=0),
                "mwz": mwz_f.sum(axis=0),
                "mw2": mw2_f.sum(axis=0),
                "driftx": drift[0],
                "drifty": drift[1],
                "driftz": drift[2],
                "boost": boost,
            }
            return {k: carry[k] + v for k, v in new.items()}

        self._update = jit_update(update)

    def _conclude(self) -> None:
        carry = {
            k: np.asarray(v) for k, v in self._carry.items()
        }
        n, m, mw2 = carry["n"], carry["m"], carry["mw2"]
        mw = np.stack(
            [carry["mwx"], carry["mwy"], carry["mwz"]], axis=-1
        )
        drift = np.stack(
            [carry["driftx"], carry["drifty"], carry["driftz"]],
            axis=-1,
        )
        self.results.counts = n
        volume = np.prod(self._dimensions)
        denom = self._n_bins / (volume * self.n_frames)
        self.results.number_density = n * denom
        self.results.mass_density = m * denom
        with np.errstate(divide="ignore", invalid="ignore"):
            m_safe = np.maximum(m, 1e-300)
            self.results.velocity = np.where(
                m[:, None] > 0,
                (mw + drift) / m_safe[:, None],
                np.nan,
            )
            if self._remove_drift:
                kinetic = mw2 - (mw * mw).sum(axis=-1) / m_safe
                dof = 3.0 * (n - 1.0)
            else:
                kinetic = mw2 + carry["boost"]
                dof = 3.0 * n
            # k_B in u Å² ps⁻² K⁻¹ so that m[u] |v|²[Å²/ps²] / k_B
            # lands in kelvin; reduced units take k_B = 1
            k_B = (
                1.0
                if self._reduced
                else ureg.boltzmann_constant.m_as(
                    ureg.unified_atomic_mass_unit
                    * ureg.angstrom**2
                    / ureg.picosecond**2
                    / ureg.kelvin
                )
            )
            self.results.temperature = np.where(
                dof > 0, kinetic / (dof * k_B), np.nan
            )

    def calculate_shear_rate(
        self, component: str = "x", *, window=None
    ) -> float:
        r"""Fit the shear rate :math:`\dot\gamma = \partial
        u_\alpha / \partial z` from the streaming-velocity profile
        (weighted linear least squares over the occupied bins; the
        NEMD viscosity workflow's numerator is the imposed momentum
        flux, its denominator this slope).

        Parameters
        ----------
        component : `str`, default :code:`"x"`
            Velocity component whose gradient along the profiled
            axis is fitted.
        window : slice or array-like, keyword-only, optional
            Bin subset to fit (e.g. ``slice(10, 50)`` to exclude
            wall layers in a confined geometry).  Default: every
            occupied bin.

        Returns
        -------
        shear_rate : `float`
            :math:`\dot\gamma` in ps⁻¹ (stored with units in
            ``results.units`` unless reduced).
        """

        if component not in ("x", "y", "z"):
            raise ValueError("component must be 'x', 'y' or 'z'.")
        if getattr(self.results, "velocity", None) is None:
            raise RuntimeError("Call run() first.")
        comp = "xyz".index(component)
        bins = self.results.bins
        u = self.results.velocity[:, comp]
        counts = self.results.counts
        if window is not None:
            bins = bins[window]
            u = u[window]
            counts = counts[window]
        ok = np.isfinite(u) & (counts > 0)
        if ok.sum() < 2:
            raise ValueError(
                "Fewer than two occupied bins in the fit window."
            )
        # per-bin sample counts weight the fit (sparse bins carry
        # noisier velocity means)
        slope = np.polyfit(bins[ok], u[ok], 1, w=np.sqrt(counts[ok]))[0]
        self.results.shear_rate = float(slope)
        if not self._reduced:
            self.results.units["results.shear_rate"] = (
                ureg.picosecond**-1
            )
        return self.results.shear_rate
