"""OpenMM-layer tests for surfaces that work without OpenMM installed
(parity: /root/reference/tests/test_openmm_unit.py and the pure-math
helpers of openmm/system.py, openmm/utility.py)."""

import itertools

import numpy as np
import pytest

from mdhelper_tpu import ureg
from mdhelper_tpu.openmm import system, unit, utility


def test_vacuum_permittivity_fallback():
    eps0 = unit.VACUUM_PERMITTIVITY
    assert np.isclose(eps0.magnitude, 8.854187812813e-12)
    # e^2 / (eps0 * kT * length) should reduce to dimensionless.
    e = 1.602176634e-19 * ureg.coulomb
    kT = 1.380649e-23 * 300 * ureg.joule
    bjerrum = (e**2 / (4 * np.pi * eps0 * kT)).to(ureg.nanometer)
    # Vacuum Bjerrum length at 300 K is ~55.7 nm (the familiar
    # ~0.7 nm value is for water's eps_r ~ 80).
    assert np.isclose(bjerrum.magnitude, 55.7, rtol=0.01)


def test_fft_legal_mesh_sizes():
    """cuFFT rule: prime factors {2,3,5,7} with at most one 11 or 13."""

    sizes = list(itertools.islice(utility._fft_legal_mesh_sizes(), 40))
    ns = [n for n, _ in sizes]
    assert 17 not in ns and 19 not in ns and 23 not in ns
    assert 22 in ns and 26 in ns  # 2*11, 2*13 allowed
    for n, pure in sizes:
        check = n
        for f in (2, 3, 5, 7):
            while check % f == 0:
                check //= f
        assert check in (1, 11, 13)
        assert pure == (check == 1)


def test_ic_beta_lattice_sum():
    """beta(gamma, x): gamma=0 reduces to Hurwitz-zeta differences;
    symmetric midpoint uses the zeta(3) form."""

    from scipy import special

    # gamma = 0: no image-charge ladder, pure zeta form.
    x = 0.25
    expected = (
        special.zeta(2, 2 - x) - special.zeta(2, 1 + x)
    ) / (2 * x - 1)
    assert np.isclose(system._ic_beta(0.0, x), expected)
    assert np.isclose(
        system._ic_beta(0.0, 0.5), 2 * special.zeta(3, 1.5)
    )
    # |gamma| < 1 converges and is finite.
    assert np.isfinite(system._ic_beta(-0.8, 0.3))
    with pytest.raises(ValueError):
        system._ic_beta(-0.5, 1.5)


def test_openmm_gated_functions_raise():
    with pytest.raises(ImportError, match="OpenMM"):
        system.register_particles(None, None)
    with pytest.raises(ImportError, match="OpenMM"):
        system.add_electric_field(None, None, 1.0)
    with pytest.raises(ImportError, match="OpenMM"):
        system.estimate_pressure_tensor(None)
