"""OpenMM-free assertions on every pair/bond factory's energy
expression, mixing rules and per-particle parameter tables (VERDICT
round-1 item 7).  Expected strings are the reference's
(`/root/reference/src/mdhelper/openmm/pair.py:266-268, :372, :522-524,
:868-880, :1011, :1262-1264`; `openmm/bond.py:100`)."""

import numpy as np
import pytest

from mdhelper_tpu.openmm import expressions as ex


def test_coul_gauss_default():
    energy, per = ex.coul_gauss_energy()
    assert energy == (
        "ONE_4PI_EPS0*q1*q2*(erf(alpha12*r)-erf(G_EWALD*r))/r;"
        "alpha12=alpha1*alpha2/sqrt(alpha1^2+alpha2^2);"
    )
    assert per == ["alpha"]


def test_coul_gauss_core():
    energy, per = ex.coul_gauss_energy("core")
    assert energy == (
        "ONE_4PI_EPS0*q1*q2*(erf(alpha12*r)-erf(G_EWALD*r))/r;"
        f"alpha12=sqrt({np.pi}/(2*(a1^2+a2^2)));"
    )
    assert per == ["a"]


def test_coul_gauss_custom_mix_passthrough():
    energy, per = ex.coul_gauss_energy("alpha12=0.5;", ["zeta"])
    assert energy.endswith(";alpha12=0.5;")
    assert per == ["zeta"]


def test_ewald_g_and_pme_mesh():
    g = ex.ewald_g(1.2, 1e-4)
    assert np.isclose(g, np.sqrt(-np.log(2e-4)) / 1.2)
    mesh = ex.pme_mesh_dimensions(g, np.array([4.0, 4.0, 8.0]), 1e-4)
    expected = np.ceil(
        2 * g * np.array([4.0, 4.0, 8.0]) / (3 * (1e-4) ** 0.2)
    )
    np.testing.assert_array_equal(mesh, expected)


def test_dpd():
    assert ex.dpd_energy(1.0) == "0.5*A12*1.0*(1-r/1.0)^2;"
    assert (
        ex.dpd_energy(1.0, "A12=sqrt(A1*A2);")
        == "0.5*A12*1.0*(1-r/1.0)^2;A12=sqrt(A1*A2);"
    )


def test_gauss_geometric_shifted():
    energy, per = ex.gauss_energy(2.0, 1.5)
    assert energy == (
        "step(1.5-r)*(alpha12*exp(-beta12*r^2)"
        "-ucut);ucut=alpha12*exp(-beta12*1.5^2);"
        "alpha12=sqrt(alpha1*alpha2);beta12=sqrt(beta1*beta2);"
    )
    assert per == ["alpha", "beta"]


def test_gauss_arithmetic_unshifted_same_cutoff():
    energy, per = ex.gauss_energy(2.0, 2.0, shift=False,
                                  mix="arithmetic")
    assert energy == (
        "(alpha12*exp(-beta12*r^2));"
        "alpha12=sqrt(alpha1*alpha2);beta12=2/(1/beta1+1/beta2);"
    )
    assert per == ["alpha", "beta"]


def test_gauss_core_template():
    # NB: the reference's "Global parameter 'A' not specified" check
    # (pair.py:540-541) is vacuous — the substituted template itself
    # contains "A" — so, for parity, no error is raised here either.
    energy, per = ex.gauss_energy(
        2.0, 2.0, mix="core", known_globals=("A",)
    )
    assert (
        f"alpha12=A*(beta12/{np.pi})^(3/2);"
        "beta12=3/(2*sigma12sq);sigma12sq=sigma1^2+sigma2^2;"
    ) in energy
    assert per == ["sigma"]


def test_ljts_arithmetic_shifted():
    energy, per = ex.ljts_energy(3.0, 2.5)
    assert energy == (
        "step(2.5-r)*(4*epsilon12*(1*(sigma12/r)^12-1*(sigma12/r)^6)"
        "-ucut);ucut=4*epsilon12*(1*(sigma12/2.5)^12"
        "-1*(sigma12/2.5)^6);"
        "sigma12=(sigma1+sigma2)/2;epsilon12=sqrt(epsilon1*epsilon2);"
    )
    assert per == ["sigma", "epsilon"]


def test_ljts_sixthpower_mix():
    energy, _ = ex.ljts_energy(3.0, 3.0, shift=False, mix="sixthpower")
    assert (
        "sigma12=((sigma1^6+sigma2^6)/2)^(1/6);"
        "epsilon12=2*sqrt(epsilon1*epsilon2)*sigma1^3*sigma2^3"
        "/(sigma1^6+sigma2^6);"
    ) in energy


def test_mie_coefficient():
    energy, _ = ex.ljts_energy(
        3.0, 3.0, shift=False, mie=True, powers=(14, 7)
    )
    coef = 14 / 7 * (14 / 7) ** (7 / 7)  # p/(p-q) * (p/q)^(q/(p-q))
    assert energy.startswith(f"({coef}*epsilon12*(1*(sigma12/r)^14")


def test_wca_prefix_and_minimum_shift():
    energy, per = ex.ljts_energy(3.0, 3.0, wca=True)
    cutoff_wca = 2 ** (1 / 6)
    assert energy.startswith(f"step({cutoff_wca}*sigma12-r)*(")
    assert energy.endswith(
        "+epsilon12);"
        "sigma12=(sigma1+sigma2)/2;epsilon12=sqrt(epsilon1*epsilon2);"
    )
    assert "4.0*epsilon12" in energy  # coef_mie = 4 for (12, 6)
    assert per == ["sigma", "epsilon"]


def test_ljts_mie_wca_conflict():
    with pytest.raises(ValueError, match="mie"):
        ex.ljts_energy(3.0, 3.0, mie=True, wca=True)


def test_solvation_has_statement_separator():
    energy, per = ex.solvation_energy(2.0)
    assert energy == (
        "-S12*((sigma12/r)^4-(sigma12/cut)^4);"
        "sigma12=(sigma1+sigma2)/2;S12=sqrt(S1*S2);"
    )
    assert per == ["sigma", "S"]
    # The reference concatenates root and mix without ';'
    # (pair.py:1020) — an expression-syntax bug we fix, so guard it.
    assert ")sigma12" not in energy


def test_yukawa_geometric_requires_kappa():
    with pytest.raises(ValueError, match="kappa"):
        ex.yukawa_energy(2.0, 2.0)
    energy, per = ex.yukawa_energy(
        2.0, 1.5, known_globals=("kappa",)
    )
    assert energy == (
        "step(1.5-r)*(alpha12*exp(-kappa*r)/r"
        "-ucut);ucut=alpha12*exp(-kappa*1.5)/1.5;"
        "alpha12=sqrt(alpha1*alpha2);"
    )
    assert per == ["alpha"]


def test_yukawa_kappa_in_mix():
    energy, per = ex.yukawa_energy(
        2.0, 2.0, shift=False, mix="geometric;kappa=2.5"
    )
    assert energy == (
        "(alpha12*exp(-kappa*r)/r);"
        "alpha12=sqrt(alpha1*alpha2);kappa=2.5;"
    )
    assert per == ["alpha"]


def test_fene():
    assert ex.fene_energy() == "-0.5*k*r0^2*log(1-(r/r0)^2)"
