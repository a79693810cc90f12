"""Tests for the self-contained unit engine (mdhelper_tpu.units)."""

import numpy as np
import pytest

from mdhelper_tpu import Q_, ureg
from mdhelper_tpu.units import UnitsError


def test_unit_algebra_and_equality():
    assert ureg.meter / ureg.second**2 == ureg.Unit("meter/second**2")
    assert ureg.foot / ureg.second**2 == "foot/second**2"
    assert str(ureg.joule / ureg.kelvin) == "joule / kelvin"
    assert (ureg.meter**2) ** 0.5 == ureg.meter


def test_quantity_conversion():
    g = 9.80665 * ureg.meter / ureg.second**2
    assert np.isclose(g.m_as(ureg.foot / ureg.second**2), 32.17404855643044)
    assert np.isclose(
        (1.0 * ureg.kilocalorie).m_as(ureg.kilojoule), 4.184
    )
    assert np.isclose((1.0 * ureg.angstrom).m_as("nanometer"), 0.1)
    # incompatible conversion
    with pytest.raises(UnitsError):
        (1.0 * ureg.meter).to(ureg.second)


def test_quantity_algebra():
    e = 0.238 * ureg.kilocalorie / ureg.mole
    na = ureg.avogadro_constant
    per_particle = e / na
    assert np.isclose(
        per_particle.m_as(ureg.joule), 0.238 * 4184 / 6.02214076e23
    )
    # sqrt of a quantity
    t = (1.0 * ureg.meter / (ureg.meter / ureg.second**2)).sqrt()
    assert t.units == ureg.second
    assert np.isclose(t.m_as(ureg.second), 1.0)
    # np.sqrt dispatch through __array_ufunc__
    t2 = np.sqrt(4.0 * ureg.second**2)
    assert np.isclose(t2.m_as("second"), 2.0)


def test_constants():
    kb = ureg.boltzmann_constant
    assert np.isclose(kb.m_as("joule/kelvin"), 1.380649e-23)
    r = (kb * ureg.avogadro_constant).m_as("joule/(kelvin*mole)")
    assert np.isclose(r, 8.31446261815324)
    eps0 = ureg.vacuum_permittivity
    assert np.isclose(eps0.m_as("farad/meter"), 8.8541878128e-12)


def test_array_quantities():
    arr = np.arange(3.0) * ureg.angstrom
    assert isinstance(arr, Q_)
    assert np.allclose(arr.m_as("nanometer"), np.arange(3.0) / 10)


def test_parse_errors():
    with pytest.raises(UnitsError):
        ureg.Unit("not_a_real_unit_xyz")
    with pytest.raises(UnitsError):
        ureg.Unit("import os")
