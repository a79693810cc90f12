"""Tests for mdhelper_tpu.analysis.electrostatics (parity:
/root/reference/tests/test_analysis_electrostatics.py, which validated
against MDAnalysis DielectricConstant; direct NumPy oracles here)."""

import numpy as np
import pytest

from mdhelper_tpu.analysis import electrostatics
from mdhelper_tpu.core import Universe

rng = np.random.default_rng(43)

T, N_RES = 12, 15
N = 2 * N_RES  # two atoms (+q, -q) per residue
BOX = 10.0


@pytest.fixture(scope="module")
def universe():
    positions = rng.random((T, N, 3)) * BOX
    charges = np.tile([0.5, -0.5], N_RES)
    return Universe.from_arrays(
        positions,
        np.array([BOX] * 3),
        charges=charges,
        resindices=np.repeat(np.arange(N_RES), 2),
        bonds=[[2 * i, 2 * i + 1] for i in range(N_RES)],
        dt=1.0,
    )


def test_dipole_moment(universe):
    dm = electrostatics.DipoleMoment(universe.atoms,
                                     verbose=False).run()
    traj = universe.trajectory._positions
    q = universe.atoms.charges
    ref = np.einsum("a,tad->td", q, traj)
    assert dm.results.dipoles.shape == (T, 1, 3)
    assert np.allclose(dm.results.dipoles[:, 0], ref)
    assert np.allclose(dm.results.volumes, BOX**3)


def test_dipole_moment_average(universe):
    dm = electrostatics.DipoleMoment(
        universe.atoms, average=True, verbose=False
    ).run()
    assert dm.results.dipoles.shape == (1, 3)
    assert np.isclose(dm.results.volumes, BOX**3)


def test_dipole_moment_explicit_charges(universe):
    dm = electrostatics.DipoleMoment(
        universe.atoms, charges=[np.ones(N)], verbose=False
    ).run()
    traj = universe.trajectory._positions
    assert np.allclose(
        dm.results.dipoles[:, 0], traj.sum(axis=1)
    )


def test_permittivity_matches_oracle(universe):
    dm = electrostatics.DipoleMoment(universe.atoms,
                                     verbose=False).run()
    dm.calculate_relative_permittivity(300.0)

    M = dm.results.dipoles[:, 0]
    fluct = (M**2 - M.mean(axis=0) ** 2).mean()
    e = 1.602176634e-19
    eps0 = 8.8541878128e-12
    kb = 1.380649e-23
    scale = (e * 1e-10) ** 2 / (eps0 * 1e-30 * kb)
    ref = 1 + scale * fluct / (BOX**3 * 300.0)
    assert np.isclose(dm.results.dielectric, ref)


def test_permittivity_guards(universe):
    dm_avg = electrostatics.DipoleMoment(
        universe.atoms, average=True, verbose=False
    ).run()
    with pytest.raises(RuntimeError):
        dm_avg.calculate_relative_permittivity(300.0)

    # Charged residues require neutralize=True.
    u_ions = Universe.from_arrays(
        universe.trajectory._positions,
        np.array([BOX] * 3),
        charges=np.tile([1.0, -0.5], N_RES),
        resindices=np.repeat(np.arange(N_RES), 2),
    )
    dm_ions = electrostatics.DipoleMoment(
        u_ions.atoms, verbose=False
    ).run()
    with pytest.raises(RuntimeError):
        dm_ions.calculate_relative_permittivity(300.0)
    # With neutralization it works, and the neutralized dipoles are
    # origin-independent (per-residue net charge removed at COM).
    dm_neutral = electrostatics.DipoleMoment(
        u_ions.atoms, neutralize=True, verbose=False
    ).run()
    dm_neutral.calculate_relative_permittivity(300.0)
    assert np.isfinite(dm_neutral.results.dielectric)

    shifted = Universe.from_arrays(
        universe.trajectory._positions + 5.0,
        np.array([BOX] * 3),
        charges=np.tile([1.0, -0.5], N_RES),
        resindices=np.repeat(np.arange(N_RES), 2),
    )
    dm_shifted = electrostatics.DipoleMoment(
        shifted.atoms, neutralize=True, verbose=False
    ).run()
    assert np.allclose(
        dm_neutral.results.dipoles, dm_shifted.results.dipoles
    )


def test_dipole_unwrap():
    """Unwrapped dipoles follow continuous particle motion."""

    steps = rng.normal(0, 1.0, (T, 4, 3))
    true_traj = np.cumsum(steps, axis=0) + BOX / 2
    wrapped = true_traj - BOX * np.floor(true_traj / BOX)
    charges = np.array([1.0, -1.0, 1.0, -1.0])
    u = Universe.from_arrays(
        wrapped, np.array([BOX] * 3), charges=charges,
        resindices=np.zeros(4, dtype=int),
    )
    dm = electrostatics.DipoleMoment(
        u.atoms, unwrap=True, verbose=False
    ).run()
    # Up to a constant offset per particle (from the first-frame
    # unwrap), the dipole time series must match the true one.
    ref = np.einsum("a,tad->td", charges, true_traj)
    delta = dm.results.dipoles[:, 0] - ref
    assert np.allclose(delta - delta[0], 0, atol=1e-9)


def test_dipole_host_pipeline(monkeypatch):
    """Host-pipeline DipoleMoment (forced via MDTPU_HOST_PIPELINE)
    matches the device path, including unwrap and neutralization."""

    rng2 = np.random.default_rng(5)
    T2, N2, BOX2 = 8, 30, 12.0
    walk = (
        np.cumsum(rng2.normal(0, 0.4, (T2, N2, 3)), axis=0)
        + rng2.random((1, N2, 3)) * BOX2
    )
    wrapped = walk - BOX2 * np.floor(walk / BOX2)
    u = Universe.from_arrays(
        wrapped,
        np.array([BOX2] * 3),
        charges=rng2.standard_normal(N2),
        resindices=np.repeat(np.arange(N2 // 2), 2),
        dt=1.0,
    )
    results = []
    for knob in ("0", "1"):
        monkeypatch.setenv("MDTPU_HOST_PIPELINE", knob)
        dm = electrostatics.DipoleMoment(
            u.atoms, average=False, neutralize=True, unwrap=True,
            verbose=False,
        )
        dm._chunk_bytes = 3 * N2 * 3 * 8
        dm.run()
        results.append(dm)
    monkeypatch.delenv("MDTPU_HOST_PIPELINE")
    device, host = results
    assert host._host_pipeline and not device._host_pipeline
    np.testing.assert_allclose(
        host.results.dipoles, device.results.dipoles,
        rtol=1e-10, atol=1e-12,
    )
    np.testing.assert_allclose(
        host.results.volumes, device.results.volumes, rtol=1e-12
    )


def test_dielectric_spectrum_debye_oracle():
    """An OU dipole process is a Debye liquid: eps(w) - 1 =
    d_eps/(1 + i w tau), with the loss peak at w = 1/tau."""

    from mdhelper_tpu.analysis.electrostatics import (
        calculate_dielectric_spectrum,
        calculate_relative_permittivity,
    )

    r = np.random.default_rng(67)
    T_steps, dt, tau, sigma = 120_000, 0.02, 0.8, 6.0
    theta = dt / tau
    M = np.empty((T_steps, 3))
    M[0] = sigma * r.standard_normal(3)
    drive = sigma * np.sqrt(2 * theta)
    for t in range(1, T_steps):
        M[t] = M[t - 1] * (1 - theta) + drive * r.standard_normal(3)

    volume, temperature = 20_000.0, 300.0
    out = calculate_dielectric_spectrum(
        M, temperature, volume, dt, t_max=25 * tau
    )
    # static strength matches the fluctuation formula
    eps_static = calculate_relative_permittivity(
        M, temperature, volume
    )
    np.testing.assert_allclose(
        out.delta_epsilon, eps_static - 1, rtol=0.02
    )
    # Debye form at a few frequencies spanning the relaxation
    omega = 2 * np.pi * out.frequencies
    debye = out.delta_epsilon / (1 + 1j * omega * tau)
    # stay below omega*dt ~ 0.25: beyond that the discrete OU
    # process's geometric ACF and the midpoint rule both bias
    # the tiny real tail
    sel = (omega > 0.2 / tau) & (omega < 10 / tau)
    # tolerances sized to the correlated ACF sampling noise
    # (T/tau = 3000 windows; omega * Im L amplifies ACF noise in the
    # dispersive part)
    np.testing.assert_allclose(
        out.epsilon[sel].real, debye[sel].real,
        rtol=0.12, atol=0.08 * out.delta_epsilon,
    )
    np.testing.assert_allclose(
        -out.epsilon[sel].imag, -debye[sel].imag,
        rtol=0.12, atol=0.04 * out.delta_epsilon,
    )
    # loss peak at omega ~ 1/tau
    loss = -out.epsilon.imag
    peak = omega[np.argmax(loss)]
    assert abs(peak - 1 / tau) / (1 / tau) < 0.25

    with pytest.raises(ValueError):
        calculate_dielectric_spectrum(
            M[:, :2], temperature, volume, dt
        )
