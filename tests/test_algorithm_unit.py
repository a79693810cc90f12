"""Tests for mdhelper_tpu.algorithm.unit (parity:
/root/reference/tests/test_algorithm_unit.py, minus the OpenMM branches
because OpenMM is not installed in this environment)."""

import numpy as np

from mdhelper_tpu import ureg
from mdhelper_tpu.algorithm.unit import (
    get_lj_scaling_factors,
    get_scaling_factors,
    strip_unit,
)


def test_func_get_lj_scaling_factors():
    factors = get_lj_scaling_factors({
        "mass": 39.948 * ureg.gram / ureg.mole,
        "energy": 3.9520829798737548e-25 * ureg.kilocalorie,
        "length": 3.4 * ureg.angstrom,
    })

    # Independent evaluation of the LJ scales for argon.
    na = 6.02214076e23
    kb = 1.380649e-23
    eps0 = 8.8541878128e-12
    m_kg = 39.948e-3 / na
    sigma = 3.4e-10
    eps_j = 3.9520829798737548e-25 * 4184

    tau = np.sqrt(m_kg * sigma**2 / eps_j)
    assert np.isclose(factors["time"].m_as("second"), tau)
    assert np.isclose(
        factors["temperature"].m_as("kelvin"), eps_j / kb
    )
    assert np.isclose(
        factors["pressure"].m_as("pascal"), eps_j / sigma**3
    )
    assert np.isclose(
        factors["charge"].m_as("coulomb"),
        np.sqrt(4 * np.pi * eps0 * sigma * eps_j),
    )
    assert np.isclose(
        factors["velocity"].m_as("meter/second"), sigma / tau
    )
    assert np.isclose(
        factors["mass_density"].m_as("kilogram/meter**3"),
        m_kg / sigma**3,
    )
    # molar force definition (molar_energy / length)
    assert np.isclose(
        factors["force"].m_as("joule/(mole*meter)"),
        eps_j * na / sigma,
    )


def test_func_get_scaling_factors_other():
    factors = get_lj_scaling_factors(
        {
            "mass": 1.0 * ureg.gram / ureg.mole,
            "energy": 1.0e-21 * ureg.joule,
            "length": 1.0 * ureg.nanometer,
        },
        {"diffusivity": (("length", 2), ("time", -1))},
    )
    assert np.isclose(
        factors["diffusivity"].m_as("meter**2/second"),
        (factors["length"] ** 2 / factors["time"]).m_as("meter**2/second"),
    )


def test_func_strip_unit():
    # Non-Quantity passthrough.
    assert strip_unit(90.0, "deg") == (90.0, "deg")
    assert strip_unit(90.0, ureg.degree) == (90.0, ureg.degree)

    # Quantity without target unit.
    k_ = 1.380649e-23
    assert strip_unit(k_) == (k_, None)
    value, unit_ = strip_unit(k_ * ureg.joule * ureg.kelvin**-1)
    assert value == k_ and unit_ == ureg.joule / ureg.kelvin

    # Quantity with compatible target unit.
    g_ = 32.17404855643044
    g = 9.80665 * ureg.meter / ureg.second**2
    value, unit_ = strip_unit(g, "foot/second**2")
    assert np.isclose(value, g_) and unit_ == ureg.foot / ureg.second**2
    value, unit_ = strip_unit(g, ureg.foot / ureg.second**2)
    assert np.isclose(value, g_) and unit_ == ureg.foot / ureg.second**2

    # String target parsed into a Unit.
    assert strip_unit(g_, "foot/second**2") == (
        g_, ureg.foot / ureg.second**2
    )
