"""Tests for mdhelper_tpu.analysis.thermodynamics."""

import numpy as np
import pytest

from mdhelper_tpu.analysis.thermodynamics import (
    ConstantVolumeHeatCapacity,
)

rng = np.random.default_rng(53)


def test_heat_capacity_from_energies_reduced():
    U = rng.normal(100.0, 2.0, 5000)
    cv = ConstantVolumeHeatCapacity(
        energies=U, temperature=2.0, reduced=True
    ).run()
    ref = ((U**2).mean() - U.mean() ** 2) / 4.0
    assert np.isclose(cv.results.heat_capacity, ref)


def test_heat_capacity_from_energies_real_units():
    U = rng.normal(-500.0, 5.0, 2000)  # kJ/mol
    temp = 300.0
    cv = ConstantVolumeHeatCapacity(
        energies=U, temperature=temp
    ).run()
    na = 6.02214076e23
    kb = 1.380649e-23
    var = (U**2).mean() - U.mean() ** 2  # (kJ/mol)^2
    ref = var * 1e6 / (na**2 * kb * temp**2) / 1000  # kJ/K
    assert np.isclose(cv.results.heat_capacity, ref)


def test_heat_capacity_openmm_log(tmp_path):
    log = tmp_path / "state.csv"
    U = rng.normal(-100.0, 1.0, 500)
    temps = rng.normal(300.0, 3.0, 500)
    lines = ['#"Step","Total Energy (kJ/mole)","Temperature (K)"']
    lines += [
        f"{i},{u:.6f},{t:.4f}"
        for i, (u, t) in enumerate(zip(U, temps))
    ]
    log.write_text("\n".join(lines))
    cv = ConstantVolumeHeatCapacity(log)
    assert cv._format == "openmm"
    assert np.allclose(cv.results.energies, U, atol=1e-5)
    assert np.isclose(cv.temperature, temps.mean(), atol=1e-3)
    cv.run()
    assert np.isfinite(cv.results.heat_capacity)


def test_heat_capacity_lammps_log(tmp_path):
    log = tmp_path / "log.lammps"
    U = rng.normal(-40.0, 0.5, 200)
    temps = rng.normal(1.2, 0.01, 200)
    rows = "\n".join(
        f"{i} {t:.6f} {u:.6f}"
        for i, (t, u) in enumerate(zip(temps, U))
    )
    log.write_text(
        "LAMMPS (fake)\nrun 200\n"
        f"Step Temp TotEng\n{rows}\nLoop time of 1.0 on 1 procs\n"
    )
    cv = ConstantVolumeHeatCapacity(log, temperature=1.2, reduced=True)
    assert cv._format == "lammps"
    assert np.allclose(cv.results.energies, U, atol=1e-5)
    cv.run()
    ref = ((U**2).mean() - U.mean() ** 2) / 1.2**2
    assert np.isclose(cv.results.heat_capacity, ref)


def test_heat_capacity_validation():
    with pytest.raises(ValueError):
        ConstantVolumeHeatCapacity()
    with pytest.raises(ValueError):
        ConstantVolumeHeatCapacity(energies=np.ones(10))  # no temp


def test_green_kubo_shear_viscosity():
    """OU-process pressure fluctuations: eta = V sigma^2 tau / kT,
    recovered from the running Green-Kubo integral; reduced units
    give the bare integral; tensor input takes the off-diagonals."""

    import numpy as np

    from mdhelper_tpu import ureg
    from mdhelper_tpu.analysis.thermodynamics import (
        calculate_shear_viscosity,
    )

    r = np.random.default_rng(13)
    T_steps, dt, tau, sigma = 60_000, 0.01, 0.4, 12.0
    theta = dt / tau
    p = np.empty((T_steps, 3))
    p[0] = sigma * r.standard_normal(3)
    drive = sigma * np.sqrt(2 * theta)
    for t in range(1, T_steps):
        p[t] = p[t - 1] * (1 - theta) + drive * r.standard_normal(3)

    volume, temperature = 30_000.0, 300.0
    out = calculate_shear_viscosity(p, volume, temperature, dt)
    # plateau of the running integral ~ eta
    window = (out.times > 4 * tau) & (out.times < 20 * tau)
    eta = out.running_viscosity[window].mean()
    scale = (
        (1 * ureg.atmosphere**2 * ureg.angstrom**3 * ureg.picosecond
         / (ureg.boltzmann_constant * ureg.kelvin))
        .to("millipascal * second").magnitude
    )
    expected = scale * volume / temperature * sigma**2 * tau
    assert abs(eta - expected) / expected < 0.15, (eta, expected)
    assert out.units["running_viscosity"] == (
        ureg.millipascal * ureg.second
    )

    # reduced: bare V/T * integral, no units entry
    red = calculate_shear_viscosity(
        p, volume, temperature, dt, reduced=True
    )
    assert "units" not in red
    np.testing.assert_allclose(
        red.running_viscosity / (volume / temperature),
        out.running_viscosity / (scale * volume / temperature),
        rtol=1e-12,
    )

    # tensor input equals explicit off-diagonal columns
    tens = np.zeros((T_steps, 3, 3))
    tens[:, 0, 1], tens[:, 0, 2], tens[:, 1, 2] = p.T
    out2 = calculate_shear_viscosity(tens, volume, temperature, dt)
    np.testing.assert_allclose(out2.acf, out.acf, rtol=1e-12)


def test_green_kubo_thermal_conductivity():
    """OU-process heat flux: lambda = V sigma^2 tau / (kB T^2) in the
    chosen units, recovered from the running integral."""

    import numpy as np

    from mdhelper_tpu import ureg
    from mdhelper_tpu.analysis.thermodynamics import (
        calculate_thermal_conductivity,
    )

    r = np.random.default_rng(21)
    T_steps, dt, tau, sigma = 60_000, 0.01, 0.3, 0.02
    theta = dt / tau
    j = np.empty((T_steps, 3))
    j[0] = sigma * r.standard_normal(3)
    drive = sigma * np.sqrt(2 * theta)
    for t in range(1, T_steps):
        j[t] = j[t - 1] * (1 - theta) + drive * r.standard_normal(3)

    volume, temperature = 25_000.0, 350.0
    out = calculate_thermal_conductivity(
        j, volume, temperature, dt
    )
    window = (out.times > 4 * tau) & (out.times < 20 * tau)
    lam = out.running_conductivity[window].mean()
    flux_unit = ureg.kilocalorie / ureg.mole / (
        ureg.angstrom**2 * ureg.picosecond
    )
    scale = (
        ((1 * flux_unit / ureg.avogadro_constant) ** 2
         * ureg.angstrom**3 * ureg.picosecond
         / (ureg.boltzmann_constant * ureg.kelvin**2))
        .to("watt / (meter * kelvin)").magnitude
    )
    expected = scale * volume / temperature**2 * sigma**2 * tau
    assert abs(lam - expected) / expected < 0.15, (lam, expected)

    red = calculate_thermal_conductivity(
        j, volume, temperature, dt, reduced=True
    )
    assert "units" not in red
    np.testing.assert_allclose(
        red.running_conductivity * scale,
        out.running_conductivity,
        rtol=1e-12,
    )


def test_thermal_conductivity_quantity_input_converts():
    """A Quantity heat flux converts to the working unit instead of
    being silently treated as a raw magnitude."""

    import numpy as np

    from mdhelper_tpu import Q_, ureg
    from mdhelper_tpu.analysis.thermodynamics import (
        calculate_thermal_conductivity,
    )

    r = np.random.default_rng(3)
    j = r.standard_normal((512, 3)) * 0.01
    raw = calculate_thermal_conductivity(j, 1e4, 300.0, 0.01)
    flux_unit = ureg.kilocalorie / ureg.mole / (
        ureg.angstrom**2 * ureg.picosecond
    )
    # same data expressed in a scaled compatible unit (cal instead of
    # kcal -> magnitudes x1000)
    scaled = Q_(
        j * 1000.0,
        ureg.calorie / ureg.mole / (
            ureg.angstrom**2 * ureg.picosecond
        ),
    )
    quantity = calculate_thermal_conductivity(
        scaled, 1e4, 300.0, 0.01
    )
    np.testing.assert_allclose(
        quantity.conductivity, raw.conductivity, rtol=1e-12
    )


def test_einstein_helfand_viscosity():
    """Einstein-Helfand slope agrees with the Green-Kubo plateau on
    an OU stress series; the FCA Helfand MSD matches a brute-force
    O(N^2) oracle; validation paths."""

    import numpy as np

    from mdhelper_tpu import ureg
    from mdhelper_tpu.analysis.thermodynamics import (
        _scalar_msd_fft,
        calculate_shear_viscosity,
    )

    # FCA MSD == brute-force oracle on a short series
    r = np.random.default_rng(7)
    short = r.standard_normal((40, 2))
    msd = _scalar_msd_fft(short)
    brute = np.zeros(40)
    g = np.cumsum(short, axis=0)  # any series works for the identity
    for m in range(40):
        brute[m] = np.mean(
            [
                ((short[t + m] - short[t]) ** 2).mean()
                for t in range(40 - m)
            ]
        )
    np.testing.assert_allclose(msd, brute, rtol=1e-9, atol=1e-12)

    # OU stress: eta = V sigma^2 tau / kT from the EH slope
    T_steps, dt, tau, sigma = 60_000, 0.01, 0.4, 12.0
    theta = dt / tau
    p = np.empty((T_steps, 3))
    p[0] = sigma * r.standard_normal(3)
    drive = sigma * np.sqrt(2 * theta)
    for t in range(1, T_steps):
        p[t] = p[t - 1] * (1 - theta) + drive * r.standard_normal(3)

    volume, temperature = 30_000.0, 300.0
    out = calculate_shear_viscosity(
        p, volume, temperature, dt, method="einstein",
        fit_interval=(0.005, 0.04),
    )
    scale = (
        (1 * ureg.atmosphere**2 * ureg.angstrom**3 * ureg.picosecond
         / (ureg.boltzmann_constant * ureg.kelvin))
        .to("millipascal * second").magnitude
    )
    expected = scale * volume / temperature * sigma**2 * tau
    assert abs(out.viscosity - expected) / expected < 0.2, (
        out.viscosity, expected,
    )
    # the two estimators agree on the same data
    gk = calculate_shear_viscosity(p, volume, temperature, dt)
    window = (gk.times > 4 * tau) & (gk.times < 20 * tau)
    eta_gk = gk.running_viscosity[window].mean()
    assert abs(out.viscosity - eta_gk) / eta_gk < 0.2
    assert out.units["viscosity"] == ureg.millipascal * ureg.second
    assert out.units["helfand_msd"] == (
        ureg.atmosphere * ureg.picosecond
    ) ** 2
    # running derivative plateaus at the same value (mid-window)
    mid = (out.times > 2 * tau) & (out.times < 10 * tau)
    assert abs(out.running_viscosity[mid].mean() - expected) / (
        expected
    ) < 0.25

    red = calculate_shear_viscosity(
        p, volume, temperature, dt, method="einstein",
        fit_interval=(0.005, 0.04), reduced=True,
    )
    assert "units" not in red
    np.testing.assert_allclose(
        red.viscosity / (volume / temperature),
        out.viscosity / (scale * volume / temperature),
        rtol=1e-12,
    )

    import pytest

    with pytest.raises(ValueError, match="method"):
        calculate_shear_viscosity(
            p, volume, temperature, dt, method="bogus"
        )
