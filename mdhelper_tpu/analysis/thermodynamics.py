r"""
Thermodynamics
==============

Constant-volume heat capacity from energy fluctuations (reference:
``/root/reference/src/mdhelper/analysis/thermodynamics.py``):

.. math::

   C_V = \frac{\langle U^2\rangle - \langle U\rangle^2}
   {k_\mathrm{B}T^2}

Host-only: parses LAMMPS or OpenMM log files (column auto-detection)
with pandas, or accepts raw energy series.
"""

import warnings
from io import StringIO
from pathlib import Path
from typing import Union

import numpy as np
import pandas as pd

from .. import Q_, ureg
from ..algorithm.unit import strip_unit
from .base import Hash

__all__ = [
    "ConstantVolumeHeatCapacity",
    "calculate_ionic_conductivity",
    "calculate_shear_viscosity",
    "calculate_thermal_conductivity",
]


class ConstantVolumeHeatCapacity:
    r"""Constant-volume heat capacity :math:`C_V` from total-energy
    fluctuations.

    Parity: ``analysis/thermodynamics.py:25-257`` — LAMMPS/OpenMM log
    parsing with the same column-priority rules (total energy, else
    kinetic + potential, else kinetic + per-term sums), temperature
    from the log or given explicitly, and reduced-unit support.

    Parameters
    ----------
    log_file : `str` or `Path`, optional
        LAMMPS or OpenMM log/state-data file.
    log_format : `str`, optional
        ``"lammps"`` or ``"openmm"`` (auto-detected if omitted).
    energies : array-like, keyword-only, optional
        Raw total-energy series (kJ/mol) instead of a log file.
    temperature : `float`, keyword-only, optional
        System temperature (K); defaults to the log's mean temperature.
    reduced : `bool`, keyword-only, default False
        Reduced (LJ) units.
    sep : `str`, keyword-only, default ``","``
        Column separator for OpenMM state-data files.
    """

    _COLUMNS = {
        "lammps": {
            "energy": [
                "TotEng", "KinEng", "PotEng", "E_angle", "E_bond",
                "E_coul", "E_dihed", "E_impro", "E_long", "E_vdwl",
            ],
            "temperature": "Temp",
        },
        "openmm": {
            "energy": [
                "Total Energy (kJ/mole)",
                "Kinetic Energy (kJ/mole)",
                "Potential Energy (kJ/mole)",
            ],
            "temperature": "Temperature (K)",
        },
    }

    def __init__(
        self,
        log_file: Union[str, Path] = None,
        log_format: str = None,
        *,
        energies=None,
        temperature: Union[float, Q_] = None,
        reduced: bool = False,
        sep: str = ",",
    ) -> None:
        self.results = Hash(units={})
        self._reduced = reduced
        df = None

        if energies is not None:
            # (The reference only sets a mis-keyed "results.energy"
            # here, thermodynamics.py:117, so its run() would KeyError
            # on raw-energy input; set both units properly.)
            self.results.units["results.energies"] = (
                ureg.kilojoule / ureg.mole
            )
            self.results.units["results.heat_capacity"] = (
                ureg.kilojoule / ureg.kelvin
            )
            self.results.energies = np.asarray(
                strip_unit(
                    energies, self.results.units["results.energies"]
                )[0]
            )
        elif log_file:
            self._file = Path(log_file)
            with open(self._file) as f:
                log = f.read()

            if log_format is None:
                for fmt, cols in self._COLUMNS.items():
                    if any(c in log for c in cols["energy"]):
                        log_format = fmt
                        break
                else:
                    raise ValueError(
                        "Could not determine log file format."
                    )
            self._format = log_format

            if self._format == "lammps":
                if "minimize" in log:
                    log = log[log.index("Minimization stats:"):]
                lines = log.split("\n")
                for i, line in enumerate(lines):
                    if "Step" in line:
                        lines = lines[i:]
                        break
                else:
                    raise ValueError(
                        "No thermodynamic data found in log file "
                        f"'{log_file}'."
                    )
                log = "\n".join(lines)
                if "Loop time of " in log:
                    log = log[:log.index("Loop time of ")]
                read_kwargs = {"sep": r"\s+"}
                self.results.units["results.energies"] = (
                    ureg.kilocalorie / ureg.mole
                )
                self.results.units["results.heat_capacity"] = (
                    ureg.kilocalorie / ureg.kelvin
                )
            elif self._format == "openmm":
                read_kwargs = {"sep": sep}
                if reduced:
                    warnings.warn(
                        "OpenMM simulations always use real units."
                    )
                self.results.units["results.energies"] = (
                    ureg.kilojoule / ureg.mole
                )
                self.results.units["results.heat_capacity"] = (
                    ureg.kilojoule / ureg.kelvin
                )
            else:
                raise ValueError(f"Invalid log format '{log_format}'.")

            catalog = self._COLUMNS[self._format]["energy"]
            if catalog[0] in log:
                cols = catalog[:1]
            elif catalog[1] in log:
                cols = catalog[1:2]
                if catalog[2] in log:
                    cols.append(catalog[2])
                elif any(e in log for e in catalog[3:]):
                    cols.extend(e for e in catalog[3:] if e in log)
                else:
                    raise ValueError(
                        "Potential energy column not found."
                    )
            else:
                raise ValueError(
                    "Total or kinetic energy column not found."
                )

            df = pd.read_csv(StringIO(log), **read_kwargs)
            self.results.energies = df[cols].sum(axis=1).to_numpy()
        else:
            raise ValueError("No log file or energy values provided.")

        if temperature is not None:
            self.temperature, unit_ = strip_unit(temperature)
            self.results.units["temperature"] = (
                ureg.kelvin if unit_ is None else unit_
            )
        elif df is None:
            raise ValueError(
                "No log file or temperature value provided."
            )
        else:
            self.temperature = df[
                self._COLUMNS[self._format]["temperature"]
            ].mean()
            self.results.units["temperature"] = ureg.kelvin

    def run(
        self,
        start: int = None,
        stop: int = None,
        step: int = None,
        frames=None,
    ) -> "ConstantVolumeHeatCapacity":
        """Compute :math:`C_V` over the selected energy samples."""

        if frames is None:
            frames = np.arange(
                start or 0,
                stop if stop is not None else len(self.results.energies),
                step,
            )
        U = self.results.energies[frames]
        if self._reduced:
            self.results.heat_capacity = (
                (U**2).mean() - U.mean() ** 2
            ) / self.temperature**2
        else:
            Uq = U * self.results.units["results.energies"]
            self.results.heat_capacity = strip_unit(
                ((Uq**2).mean() - Uq.mean() ** 2)
                / (
                    ureg.avogadro_constant**2
                    * ureg.boltzmann_constant
                    * (
                        self.temperature
                        * self.results.units["temperature"]
                    )
                    ** 2
                ),
                self.results.units["results.heat_capacity"],
            )[0]
        return self


def calculate_shear_viscosity(
    pressures,
    volume: float,
    temperature: float,
    dt: float,
    *,
    method: str = "green-kubo",
    fit_interval: tuple = (0.01, 0.1),
    reduced: bool = False,
) -> Hash:
    r"""Shear viscosity from off-diagonal pressure-tensor
    fluctuations (beyond reference; pairs with the LAMMPS/OpenMM log
    parsing the heat-capacity class provides).

    ``method="green-kubo"`` (default) integrates the stress ACF:

    .. math::

       \eta = \frac{V}{k_\mathrm{B}T} \int_0^\infty \langle
       P_{\alpha\beta}(0)\,P_{\alpha\beta}(t)\rangle\,dt

    averaged over the supplied independent components (typically
    :math:`P_{xy}, P_{xz}, P_{yz}`).  The ACF evaluates with the
    Wiener-Khinchin engine; the running (cumulative-trapezoid)
    integral is returned so the plateau can be chosen by eye or fit.

    ``method="einstein"`` uses the equivalent Einstein–Helfand form —
    the slope of the "mean-squared displacement" of the Helfand
    moment :math:`G_{\alpha\beta}(t) = \int_0^t
    P_{\alpha\beta}(t')\,dt'`:

    .. math::

       \eta = \frac{V}{2 k_\mathrm{B}T} \lim_{t\to\infty}
       \frac{d}{dt} \bigl\langle [G_{\alpha\beta}(t_0 + t) -
       G_{\alpha\beta}(t_0)]^2 \bigr\rangle_{t_0}

    evaluated with the same :math:`O(N\log N)` FCA engine as the
    particle MSDs (``algorithm/correlation.py``).  The two estimators
    agree in the long-series limit; Einstein–Helfand avoids choosing
    an ACF integration plateau (a linear fit over ``fit_interval``
    replaces it) and is often better behaved on noisy stress data.

    Parameters
    ----------
    pressures : array-like
        Off-diagonal pressure series, shape ``(N_t,)`` or
        ``(N_t, C)`` (components averaged), in atmospheres — or a
        full ``(N_t, 3, 3)`` tensor series, from which the three
        off-diagonal components are taken.  LJ pressure units when
        ``reduced=True``.
    volume : `float`
        System volume (Angstrom^3; LJ volume when reduced).
    temperature : `float`
        Temperature (K), or the LJ energy scale
        :math:`k_\mathrm{B}T` when reduced.
    dt : `float`
        Series time step (ps; LJ time when reduced).
    method : `str`, keyword-only, default ``"green-kubo"``
        ``"green-kubo"`` or ``"einstein"`` (Einstein–Helfand).
    fit_interval : `tuple`, keyword-only, default ``(0.01, 0.1)``
        Einstein–Helfand only: fractional ``(start, stop)`` of the
        lag window over which the Helfand MSD slope is fit.  Lags
        below the stress relaxation time are ballistic/correlated;
        the time-averaged MSD's relative statistical error grows as
        :math:`\sqrt{t/T}`, so lags approaching the window length
        are noise-dominated — pick the interval a few relaxation
        times above zero and well below the series length.

    Returns
    -------
    results : `Hash`
        For ``"green-kubo"``: ``times`` (ps), ``acf`` ((atm)^2,
        component-averaged), ``running_viscosity`` (mPa s; the
        cumulative integral), ``viscosity`` (mPa s; the full-window
        integral), and ``units`` (omitted when reduced).  For
        ``"einstein"``: ``times``, ``helfand_msd`` ((atm ps)^2,
        component-averaged), ``running_viscosity`` (mPa s; the
        half-derivative of the Helfand MSD), ``viscosity`` (mPa s;
        the ``fit_interval`` slope), and ``units``.
    """

    if method not in ("green-kubo", "einstein"):
        raise ValueError(
            f"Invalid method: {method!r}. Valid values: "
            "'green-kubo', 'einstein'."
        )
    lo_frac, hi_frac = fit_interval
    if not (0.0 <= lo_frac < hi_frac <= 1.0):
        raise ValueError(
            "fit_interval must be an increasing (start, stop) "
            f"fraction pair within [0, 1]; got {fit_interval!r}."
        )

    pressures, _ = strip_unit(pressures, "atmosphere")
    pressures = np.asarray(pressures, dtype=np.float64)
    if pressures.ndim == 3:
        if pressures.shape[1:] != (3, 3):
            raise ValueError(
                "A tensor series must have shape (N_t, 3, 3)."
            )
        pressures = np.stack(
            [
                pressures[:, 0, 1],
                pressures[:, 0, 2],
                pressures[:, 1, 2],
            ],
            axis=-1,
        )
    elif pressures.ndim == 1:
        pressures = pressures[:, None]
    elif pressures.ndim != 2:
        raise ValueError(
            "pressures must have shape (N_t,), (N_t, C) or "
            "(N_t, 3, 3)."
        )
    volume, _ = strip_unit(volume, "angstrom**3")
    temperature, _ = strip_unit(temperature, "kelvin")
    dt, _ = strip_unit(dt, "picosecond")

    if reduced:
        scale = volume / temperature
    else:
        scale = (
            (
                1
                * ureg.atmosphere**2
                * ureg.angstrom**3
                * ureg.picosecond
                / (ureg.boltzmann_constant * ureg.kelvin)
            )
            .to("millipascal * second")
            .magnitude
            * volume
            / temperature
        )

    if method == "einstein":
        # Helfand moment G(t) = int_0^t P dt' (trapezoid cumulative),
        # one column per stress component; its component-averaged MSD
        # evaluates with the FCA engine.
        helfand = np.concatenate(
            (
                np.zeros((1, pressures.shape[1])),
                np.cumsum(
                    dt * (pressures[1:] + pressures[:-1]) / 2, axis=0
                ),
            )
        )
        msd = _scalar_msd_fft(helfand)
        times = np.arange(len(msd)) * dt
        running = scale * 0.5 * np.gradient(msd, dt)
        lo = int(round(fit_interval[0] * len(msd)))
        hi = int(round(fit_interval[1] * len(msd)))
        lo = max(1, lo)
        hi = max(lo + 2, hi)
        slope = np.polyfit(times[lo:hi], msd[lo:hi], 1)[0]
        results = Hash(
            times=times,
            helfand_msd=msd,
            running_viscosity=running,
            viscosity=float(scale * 0.5 * slope),
        )
        if not reduced:
            results.units = Hash(
                times=ureg.picosecond,
                helfand_msd=(ureg.atmosphere * ureg.picosecond) ** 2,
                running_viscosity=ureg.millipascal * ureg.second,
                viscosity=ureg.millipascal * ureg.second,
            )
        return results

    times, acf, integral = _green_kubo_running(pressures, dt)
    results = Hash(
        times=times,
        acf=acf,
        running_viscosity=scale * integral,
        viscosity=float(scale * integral[-1]),
    )
    if not reduced:
        results.units = Hash(
            times=ureg.picosecond,
            acf=ureg.atmosphere**2,
            running_viscosity=ureg.millipascal * ureg.second,
            viscosity=ureg.millipascal * ureg.second,
        )
    return results


def _scalar_msd_fft(series: np.ndarray) -> np.ndarray:
    """Component-averaged mean-squared displacement of a scalar
    ``(N_t, C)`` series via :func:`~mdhelper_tpu.algorithm.\
correlation.msd_fft` (each column is a one-component "particle";
    the entity average recovers the component mean)."""

    from ..algorithm.correlation import msd_fft

    # one scalar "component" per column: feed (N_t, C, 1) positions
    # and average over the C entity axis
    return np.asarray(msd_fft(series[:, :, None], axis=0))


def _green_kubo_running(series: np.ndarray, dt: float):
    """Component-averaged WK ACF of a (N_t,) / (N_t, C) series and
    its cumulative-trapezoid running integral."""

    from ..algorithm.correlation import correlation_fft

    if series.ndim == 1:
        series = series[:, None]
    elif series.ndim != 2:
        raise ValueError(
            "The flux series must have shape (N_t,) or (N_t, C)."
        )
    acf = np.asarray(correlation_fft(series, axis=0, average=True))
    times = np.arange(len(acf)) * dt
    integral = np.concatenate(
        ([0.0], np.cumsum((acf[1:] + acf[:-1]) / 2) * dt)
    )
    return times, acf, integral


def calculate_thermal_conductivity(
    heat_flux,
    volume: float,
    temperature: float,
    dt: float,
    *,
    reduced: bool = False,
) -> Hash:
    r"""Green-Kubo thermal conductivity from heat-flux fluctuations
    (beyond reference):

    .. math::

       \lambda = \frac{V}{k_\mathrm{B}T^2} \int_0^\infty \langle
       J_\alpha(0)\,J_\alpha(t)\rangle\,dt

    averaged over the supplied components (the usual isotropic
    :math:`1/3\,\langle\mathbf{J}(0)\cdot\mathbf{J}(t)\rangle` when
    all three are given).  Running integral returned for plateau
    selection, like :func:`calculate_shear_viscosity`.

    Parameters
    ----------
    heat_flux : array-like
        Heat-flux (per volume) series, shape ``(N_t, 3)`` or
        ``(N_t,)``, in kcal/(mol Angstrom^2 ps) — LAMMPS real-units
        ``compute heat/flux`` output divided by the cell volume.  LJ
        flux units when ``reduced=True``.
    volume : `float`
        System volume (Angstrom^3; LJ volume when reduced).
    temperature : `float`
        Temperature (K), or the LJ energy scale when reduced.
    dt : `float`
        Series time step (ps; LJ time when reduced).

    Returns
    -------
    results : `Hash`
        ``times`` (ps), ``acf`` (component-averaged),
        ``running_conductivity``/``conductivity`` (W/(m K)), and
        ``units`` (omitted when reduced).
    """

    # Quantity inputs convert to the documented working unit (a bare
    # magnitude would silently mis-scale the result).
    heat_flux = np.asarray(
        strip_unit(
            heat_flux,
            "kilocalorie / mole / angstrom**2 / picosecond",
        )[0],
        dtype=np.float64,
    )
    volume, _ = strip_unit(volume, "angstrom**3")
    temperature, _ = strip_unit(temperature, "kelvin")
    dt, _ = strip_unit(dt, "picosecond")
    times, acf, integral = _green_kubo_running(heat_flux, dt)
    if reduced:
        scale = volume / temperature**2
        return Hash(
            times=times,
            acf=acf,
            running_conductivity=scale * integral,
            conductivity=float(scale * integral[-1]),
        )
    flux_unit = ureg.kilocalorie / ureg.mole / (
        ureg.angstrom**2 * ureg.picosecond
    )
    scale = (
        (
            (1 * flux_unit / ureg.avogadro_constant) ** 2
            * ureg.angstrom**3
            * ureg.picosecond
            / (ureg.boltzmann_constant * ureg.kelvin**2)
        )
        .to("watt / (meter * kelvin)")
        .magnitude
        * volume
        / temperature**2
    )
    wmk = ureg.watt / (ureg.meter * ureg.kelvin)
    return Hash(
        times=times,
        acf=acf,
        running_conductivity=scale * integral,
        conductivity=float(scale * integral[-1]),
        units=Hash(
            times=ureg.picosecond,
            acf=flux_unit**2,
            running_conductivity=wmk,
            conductivity=wmk,
        ),
    )


def calculate_ionic_conductivity(
    current,
    volume: float,
    temperature: float,
    dt: float,
    *,
    reduced: bool = False,
) -> Hash:
    r"""Green-Kubo ionic conductivity from charge-current fluctuations
    (beyond reference; the time-domain complement of the Einstein-route
    :func:`mdhelper_tpu.analysis.transport.calculate_conductivity`):

    .. math::

       \sigma = \frac{1}{3 V k_\mathrm{B}T} \int_0^\infty \langle
       \mathbf{J}(0)\cdot\mathbf{J}(t)\rangle\,dt,
       \qquad \mathbf{J}(t) = \sum_i q_i\,\mathbf{v}_i(t),

    evaluated as the component-averaged ACF (the usual isotropic
    :math:`1/3\,\langle\mathbf{J}\cdot\mathbf{J}\rangle` when all
    three components are given) with the Wiener-Khinchin engine; the
    running (cumulative-trapezoid) integral is returned so the plateau
    can be chosen by eye or fit, like
    :func:`calculate_shear_viscosity`.

    Parameters
    ----------
    current : array-like
        Total charge-current series :math:`\sum_i q_i \mathbf{v}_i`,
        shape ``(N_t, 3)`` or ``(N_t,)`` (a single component), in
        elementary charge x Angstrom/picosecond.  LJ charge-velocity
        units when ``reduced=True``.
    volume : `float`
        System volume (Angstrom^3; LJ volume when reduced).
    temperature : `float`
        Temperature (K), or the LJ energy scale
        :math:`k_\mathrm{B}T` when reduced.
    dt : `float`
        Series time step (ps; LJ time when reduced).

    Returns
    -------
    results : `Hash`
        ``times`` (ps), ``acf`` ((e Angstrom/ps)^2,
        component-averaged), ``running_conductivity`` /
        ``conductivity`` (S/m), and ``units`` (omitted when reduced).
    """

    current = np.asarray(
        strip_unit(
            current, "elementary_charge * angstrom / picosecond"
        )[0],
        dtype=np.float64,
    )
    if current.ndim == 2 and current.shape[1] not in (1, 3):
        raise ValueError(
            "current must have shape (N_t,), (N_t, 1) or (N_t, 3)."
        )
    volume, _ = strip_unit(volume, "angstrom**3")
    temperature, _ = strip_unit(temperature, "kelvin")
    dt, _ = strip_unit(dt, "picosecond")
    times, acf, integral = _green_kubo_running(current, dt)
    if reduced:
        scale = 1.0 / (volume * temperature)
        return Hash(
            times=times,
            acf=acf,
            running_conductivity=scale * integral,
            conductivity=float(scale * integral[-1]),
        )
    current_unit = (
        ureg.elementary_charge * ureg.angstrom / ureg.picosecond
    )
    scale = (
        (
            1
            * current_unit**2
            * ureg.picosecond
            / (
                ureg.angstrom**3
                * ureg.boltzmann_constant
                * ureg.kelvin
            )
        )
        .to("siemens / meter")
        .magnitude
        / (volume * temperature)
    )
    sm = ureg.siemens / ureg.meter
    return Hash(
        times=times,
        acf=acf,
        running_conductivity=scale * integral,
        conductivity=float(scale * integral[-1]),
        units=Hash(
            times=ureg.picosecond,
            acf=current_unit**2,
            running_conductivity=sm,
            conductivity=sm,
        ),
    )
