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

import jax
import jax.numpy as jnp
import numpy as np

from .. import ureg
from .base import DynamicAnalysisBase

__all__ = ["VelocityAutocorrelation"]


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
