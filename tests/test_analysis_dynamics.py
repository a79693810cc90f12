"""Velocity autocorrelation + vibrational density of states vs NumPy
oracles and an analytic oscillator — beyond-reference capability
(velocity payload streaming)."""

import numpy as np
import pytest

from mdhelper_tpu.analysis.dynamics import VelocityAutocorrelation
from mdhelper_tpu.core.universe import Universe

rng = np.random.default_rng(37)


def _universe(velocities, dt=0.5, masses=None):
    T, n, _ = velocities.shape
    pos = rng.random((T, n, 3)) * 10.0
    kwargs = dict(
        types=np.array(["A"] * n, dtype=object), dt=dt,
        velocities=velocities,
    )
    if masses is not None:
        kwargs["masses"] = masses
    return Universe.from_arrays(pos, np.array([10.0] * 3), **kwargs)


def _oracle_per_atom_acf(v):
    """Triangular-normalized per-atom vector ACF, (T, N)."""

    T, n, _ = v.shape
    acf = np.zeros((T, n))
    for t in range(T):
        acf[t] = (
            (v[: T - t] * v[t:]).sum(axis=-1).sum(axis=0) / (T - t)
        )
    return acf


def test_vacf_random_oracle():
    T, n = 24, 6
    v = rng.standard_normal((T, n, 3))
    masses = np.abs(rng.standard_normal(n)) + 0.5
    u = _universe(v, masses=masses)
    vacf = VelocityAutocorrelation(u.atoms, verbose=False).run()

    per_atom = _oracle_per_atom_acf(v)
    np.testing.assert_allclose(
        vacf.results.vacf, per_atom.mean(axis=1), rtol=1e-10
    )
    np.testing.assert_allclose(vacf.results.acf[0], 1.0)
    np.testing.assert_allclose(
        vacf.results.times, np.arange(T) * 0.5
    )

    # vdos oracle: cosine transform of the mass-weighted ACF
    weighted = per_atom @ masses
    half = weighted.copy()
    half[0] *= 0.5
    np.testing.assert_allclose(
        vacf.results.vdos, 2 * 0.5 * np.fft.rfft(half).real,
        rtol=1e-10,
    )

    # parallel=True bit-equality
    par = VelocityAutocorrelation(
        u.atoms, parallel=True, verbose=False
    ).run()
    np.testing.assert_allclose(
        par.results.vacf, vacf.results.vacf, rtol=1e-12
    )


def test_vacf_blocks():
    T, n = 24, 4
    v = rng.standard_normal((T, n, 3))
    u = _universe(v)
    blocked = VelocityAutocorrelation(
        u.atoms, n_blocks=2, verbose=False
    ).run()
    a = _oracle_per_atom_acf(v[:12]).mean(axis=1)
    b = _oracle_per_atom_acf(v[12:]).mean(axis=1)
    np.testing.assert_allclose(
        blocked.results.vacf, (a + b) / 2, rtol=1e-10
    )
    assert len(blocked.results.times) == 12


def test_vdos_oscillator_peak():
    """A monochromatic ensemble puts the VDOS maximum at its
    frequency."""

    T, n, dt = 256, 8, 0.1
    nu0 = 1.25  # 1/ps, on the rfft grid (1.25 = 32 / (256*0.1))
    t = np.arange(T) * dt
    phases = rng.random(n) * 2 * np.pi
    axes = rng.standard_normal((n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    v = (
        np.cos(2 * np.pi * nu0 * t[:, None] + phases[None, :])[
            ..., None
        ]
        * axes[None]
    )
    u = _universe(v, dt=dt)
    vacf = VelocityAutocorrelation(u.atoms, verbose=False).run()
    peak = vacf.results.frequencies[np.argmax(vacf.results.vdos)]
    assert abs(peak - nu0) < 1 / (T * dt) + 1e-12
    # exact vs the brute-force oracle; ~cos(w t) away from the
    # noisy triangular tail (the finite-window cross term is O(1)
    # there)
    oracle = _oracle_per_atom_acf(v).mean(axis=1)
    np.testing.assert_allclose(
        vacf.results.vacf, oracle, rtol=1e-9
    )
    half = T // 2
    np.testing.assert_allclose(
        vacf.results.acf[:half],
        np.cos(2 * np.pi * nu0 * t[:half]),
        atol=0.05,
    )


def test_vacf_requires_velocities_and_trr_roundtrip(tmp_path):
    pos = rng.random((4, 3, 3)) * 10
    u = Universe.from_arrays(
        pos, np.array([10.0] * 3),
        types=np.array(["A"] * 3, dtype=object),
    )
    with pytest.raises(ValueError, match="velocities"):
        VelocityAutocorrelation(u.atoms, verbose=False)

    # TRR velocities stream through the same class
    from mdhelper_tpu.core.trajectory import TRRReader
    from mdhelper_tpu.io.trr import write_trr

    T, n = 8, 5
    v = rng.standard_normal((T, n, 3))
    positions_nm = rng.random((T, n, 3))
    path = str(tmp_path / "vel.trr")
    write_trr(path, positions_nm, np.diag([3.0, 3.0, 3.0]),
              velocities=v)
    reader = TRRReader(path)
    assert reader.has_velocities
    np.testing.assert_allclose(
        reader.read_velocity_frames(np.arange(T)), v * 10.0,
        rtol=1e-6,
    )

    from mdhelper_tpu.core.universe import Topology

    u2 = Universe(
        Topology(n, types=np.array(["A"] * n, dtype=object)),
        reader,
    )
    vacf = VelocityAutocorrelation(u2.atoms, verbose=False).run()
    oracle = _oracle_per_atom_acf(
        reader.read_velocity_frames(np.arange(T))
    ).mean(axis=1)
    np.testing.assert_allclose(vacf.results.vacf, oracle, rtol=1e-5)


def test_vacf_host_pipeline(monkeypatch):
    """Host-pipeline VACF (forced via MDTPU_HOST_PIPELINE) matches
    the device passthrough path bit-for-bit."""

    T, n = 12, 5
    v = rng.standard_normal((T, n, 3))
    u = _universe(v)
    results = []
    for knob in ("0", "1"):
        monkeypatch.setenv("MDTPU_HOST_PIPELINE", knob)
        a = VelocityAutocorrelation(u.atoms, verbose=False)
        a._chunk_bytes = 3 * n * 3 * 8
        a.run()
        results.append(a)
    monkeypatch.delenv("MDTPU_HOST_PIPELINE")
    device, host = results
    assert host._host_pipeline and not device._host_pipeline
    np.testing.assert_allclose(
        host.results.vacf, device.results.vacf, rtol=1e-12
    )
    np.testing.assert_allclose(
        host.results.vdos, device.results.vdos, rtol=1e-12
    )


def test_survival_probability_slab_oracle():
    from mdhelper_tpu.analysis.dynamics import SurvivalProbability

    box = 10.0
    T, n = 20, 12
    pos = rng.random((T, n, 3)) * box
    u = Universe.from_arrays(
        pos, np.array([box] * 3),
        types=np.array(["A"] * n, dtype=object), dt=2.0,
    )
    sp = SurvivalProbability(
        u.atoms, ("slab", "z", 2.0, 6.0), verbose=False
    ).run()
    member = (pos[:, :, 2] >= 2.0) & (pos[:, :, 2] < 6.0)
    np.testing.assert_array_equal(
        sp.results.n_in_zone, member.sum(axis=1)
    )

    # oracle c(t) and S(t) over ever-member columns
    h = member[:, member.any(axis=0)].astype(float)
    acf = np.array(
        [
            (h[: T - t] * h[t:]).sum() / (T - t)
            for t in range(T)
        ]
    )
    np.testing.assert_allclose(
        sp.results.intermittent, acf / acf[0], rtol=1e-10,
        atol=1e-12,
    )
    surv_num = np.array(
        [
            sum(
                h[t0:t0 + t + 1, j].all()
                for j in range(h.shape[1])
                for t0 in range(T - t)
            ) / (T - t)
            for t in range(T)
        ]
    )
    np.testing.assert_allclose(
        sp.results.survival, surv_num / surv_num[0], rtol=1e-10,
        atol=1e-12,
    )
    np.testing.assert_allclose(
        sp.results.times, np.arange(T) * 2.0
    )

    par = SurvivalProbability(
        u.atoms, ("slab", "z", 2.0, 6.0), parallel=True,
        verbose=False,
    ).run()
    np.testing.assert_allclose(
        par.results.intermittent, sp.results.intermittent
    )


def test_survival_probability_shell_and_sphere():
    from mdhelper_tpu.analysis.dynamics import SurvivalProbability

    box = 12.0
    # one tracer moving in/out of the shell of a fixed central atom,
    # crossing the periodic boundary
    T = 8
    dists = np.array([1.0, 1.5, 4.0, 1.2, 5.0, 1.1, 1.3, 4.5])
    pos = np.empty((T, 2, 3))
    pos[:, 0] = [11.8, 6.0, 6.0]  # center near the box face
    for t in range(T):
        pos[t, 1] = [(11.8 + dists[t]) % box, 6.0, 6.0]
    u = Universe.from_arrays(
        pos, np.array([box] * 3),
        names=np.array(["C", "W"], dtype=object),
    )
    tracer = u.select_atoms("name W")
    center = u.select_atoms("name C")
    sp = SurvivalProbability(
        tracer, ("shell", center, 2.0), verbose=False
    ).run()
    expected = (dists <= 2.0).astype(int)
    np.testing.assert_array_equal(sp.results.n_in_zone, expected)

    sph = SurvivalProbability(
        tracer, ("sphere", np.array([11.8, 6.0, 6.0]), 2.0),
        verbose=False,
    ).run()
    np.testing.assert_array_equal(
        sph.results.n_in_zone, expected
    )


def test_survival_probability_validation():
    from mdhelper_tpu.analysis.dynamics import SurvivalProbability

    pos = rng.random((2, 4, 3)) * 10
    u = Universe.from_arrays(
        pos, np.array([10.0] * 3),
        types=np.array(["A"] * 4, dtype=object),
    )
    with pytest.raises(ValueError):
        SurvivalProbability(u.atoms, ("slab", "w", 0, 5),
                            verbose=False)
    with pytest.raises(ValueError):
        SurvivalProbability(u.atoms, ("orbit", 1), verbose=False)
    with pytest.raises(ValueError):
        SurvivalProbability(
            u.atoms, ("shell", u.atoms, -1.0), verbose=False
        )
    with pytest.raises(ValueError):
        SurvivalProbability(
            u.atoms, ("sphere", np.zeros(3), -2.0), verbose=False
        )
    with pytest.raises(ValueError, match="lo < hi"):
        SurvivalProbability(
            u.atoms, ("slab", "z", 6.0, 2.0), verbose=False
        )
    tric = Universe.from_arrays(
        pos, np.array([10, 10, 10, 80, 85, 95.0]),
        types=np.array(["A"] * 4, dtype=object),
    )
    with pytest.raises(ValueError, match="orthorhombic"):
        SurvivalProbability(
            tric.atoms, ("slab", "z", 0, 5), verbose=False
        )


def test_force_frames_readers(tmp_path):
    """Batched force reads: ArrayReader and TRR (kJ/mol/nm ->
    kJ/mol/A conversion), with clean errors when absent."""

    from mdhelper_tpu.core.trajectory import TRRReader
    from mdhelper_tpu.io.trr import write_trr

    T, n = 5, 4
    f = rng.standard_normal((T, n, 3))
    u = Universe.from_arrays(
        rng.random((T, n, 3)) * 10, np.array([10.0] * 3),
        types=np.array(["A"] * n, dtype=object), forces=f,
    )
    assert u.trajectory.has_forces
    np.testing.assert_allclose(
        u.trajectory.read_force_frames([1, 3]), f[[1, 3]]
    )
    bare = Universe.from_arrays(
        rng.random((2, n, 3)) * 10, np.array([10.0] * 3),
        types=np.array(["A"] * n, dtype=object),
    )
    assert not bare.trajectory.has_forces
    with pytest.raises(ValueError, match="forces"):
        bare.trajectory.read_force_frames([0])

    path = str(tmp_path / "f.trr")
    write_trr(path, rng.random((T, n, 3)), np.diag([3.0] * 3),
              forces=f)
    reader = TRRReader(path)
    assert reader.has_forces and not reader.has_velocities
    np.testing.assert_allclose(
        reader.read_force_frames(np.arange(T)), f / 10.0, rtol=1e-6
    )


def test_survival_host_pipeline_equals_device(monkeypatch):
    """Host-pipeline zone membership matches the device path for
    slab, sphere, and shell zones."""

    from mdhelper_tpu.analysis.dynamics import SurvivalProbability

    local = np.random.default_rng(89)
    box = 11.0
    T, n = 8, 20
    pos = local.random((T, n + 1, 3)) * box
    u = Universe.from_arrays(
        pos, np.array([box] * 3),
        names=np.array(["C"] + ["W"] * n, dtype=object),
    )
    tracer = u.select_atoms("name W")
    center = u.select_atoms("name C")

    for zone in (
        ("slab", "y", 2.0, 7.0),
        ("sphere", np.array([5.0, 5.0, 5.0]), 3.0),
        ("shell", center, 3.5),
    ):
        out = []
        for knob in ("0", "1"):
            monkeypatch.setenv("MDTPU_HOST_PIPELINE", knob)
            a = SurvivalProbability(tracer, zone, verbose=False)
            a._chunk_bytes = 3 * (n + 1) * 3 * 8
            out.append(a.run())
        monkeypatch.delenv("MDTPU_HOST_PIPELINE")
        device, host = out
        assert host._host_pipeline and not device._host_pipeline
        np.testing.assert_array_equal(
            host.results.n_in_zone, device.results.n_in_zone,
            err_msg=str(zone[0]),
        )
        np.testing.assert_allclose(
            host.results.intermittent, device.results.intermittent,
            rtol=1e-12, atol=1e-12,
        )
        np.testing.assert_allclose(
            host.results.survival, device.results.survival,
            rtol=1e-12, atol=1e-12,
        )


# -- electric current ACF / Green-Kubo conductivity --------------------------


def _charged_universe(velocities, charges, dt=0.5, box=10.0):
    T, n, _ = velocities.shape
    pos = rng.random((T, n, 3)) * box
    return Universe.from_arrays(
        pos, np.array([box] * 3),
        types=np.array(["A"] * n, dtype=object),
        charges=charges, velocities=velocities, dt=dt,
    )


def test_electric_current_acf_oracle():
    from mdhelper_tpu.analysis.dynamics import (
        ElectricCurrentAutocorrelation,
    )
    from mdhelper_tpu.analysis.thermodynamics import (
        calculate_ionic_conductivity,
    )

    T, n, dt, temp = 20, 8, 0.5, 300.0
    v = rng.standard_normal((T, n, 3))
    q = rng.standard_normal(n)
    u = _charged_universe(v, q, dt=dt)
    eca = ElectricCurrentAutocorrelation(
        u.atoms, temp, verbose=False
    ).run()

    J = np.einsum("n,tnd->td", q, v)
    np.testing.assert_allclose(
        eca.results.current, J, rtol=1e-6, atol=1e-9
    )
    ref = calculate_ionic_conductivity(J, 1000.0, temp, dt)
    np.testing.assert_allclose(
        eca.results.acf, ref.acf, rtol=1e-6
    )
    np.testing.assert_allclose(
        eca.results.running_conductivity, ref.running_conductivity,
        rtol=1e-6,
    )
    assert np.isclose(eca.results.conductivity, ref.conductivity,
                      rtol=1e-6)
    assert str(eca.results.units["results.conductivity"]) in (
        "siemens / meter", "S / m",
    )

    # direct ACF oracle (component-averaged, triangular norm)
    acf = np.array(
        [(J[: T - t] * J[t:]).mean(axis=0).mean() for t in range(T)]
    )
    np.testing.assert_allclose(eca.results.acf, acf, rtol=1e-8)

    # parallel=True equality
    par = ElectricCurrentAutocorrelation(
        u.atoms, temp, parallel=True, verbose=False
    ).run()
    np.testing.assert_allclose(
        par.results.acf, eca.results.acf, rtol=1e-10
    )


def test_ionic_conductivity_scale():
    """Constant current: the running integral is exactly
    c^2 * t * scale with the e^2/(Angstrom ps kB K) -> S/m factor."""

    from mdhelper_tpu.analysis.thermodynamics import (
        calculate_ionic_conductivity,
    )

    T, dt, vol, temp = 16, 0.25, 500.0, 350.0
    c = 2.5
    J = np.full((T, 3), c)
    res = calculate_ionic_conductivity(J, vol, temp, dt)
    np.testing.assert_allclose(res.acf, c * c, rtol=1e-12)
    factor = 18592487.783177108  # (e A/ps)^2 ps / (A^3 kB K) in S/m
    expected = factor * c * c * res.times / (vol * temp)
    np.testing.assert_allclose(
        res.running_conductivity, expected, rtol=1e-9
    )
    assert np.isclose(res.conductivity, expected[-1], rtol=1e-12)

    reduced = calculate_ionic_conductivity(
        J, vol, temp, dt, reduced=True
    )
    np.testing.assert_allclose(
        reduced.running_conductivity,
        c * c * reduced.times / (vol * temp),
        rtol=1e-12,
    )
    assert "units" not in reduced


def test_electric_current_blocks_and_validation():
    from mdhelper_tpu.analysis.dynamics import (
        ElectricCurrentAutocorrelation,
    )
    from mdhelper_tpu.analysis.thermodynamics import (
        calculate_ionic_conductivity,
    )

    T, n, dt, temp = 24, 5, 1.0, 250.0
    v = rng.standard_normal((T, n, 3))
    q = np.linspace(-1, 1, n)
    u = _charged_universe(v, q, dt=dt)
    eca = ElectricCurrentAutocorrelation(
        u.atoms, temp, n_blocks=2, verbose=False
    ).run()
    J = np.einsum("n,tnd->td", q, v)
    blocks = [
        calculate_ionic_conductivity(
            J[i * 12:(i + 1) * 12], 1000.0, temp, dt
        )
        for i in range(2)
    ]
    np.testing.assert_allclose(
        eca.results.acf,
        np.mean([b.acf for b in blocks], axis=0),
        rtol=1e-8,
    )
    assert len(eca.results.times) == 12

    # velocity-less trajectory rejected
    pos_only = Universe.from_arrays(
        rng.random((4, n, 3)) * 10.0, np.array([10.0] * 3),
        charges=q, dt=1.0,
    )
    with pytest.raises(ValueError, match="velocities"):
        ElectricCurrentAutocorrelation(
            pos_only.atoms, temp, verbose=False
        )
    # mismatched charge override rejected
    with pytest.raises(ValueError, match="one value per atom"):
        ElectricCurrentAutocorrelation(
            u.atoms, temp, charges=np.ones(3), verbose=False
        )


def test_electric_current_host_pipeline(monkeypatch):
    from mdhelper_tpu.analysis.dynamics import (
        ElectricCurrentAutocorrelation,
    )

    T, n, temp = 12, 4, 300.0
    v = rng.standard_normal((T, n, 3))
    q = rng.standard_normal(n)
    u = _charged_universe(v, q)
    results = []
    for knob in ("0", "1"):
        monkeypatch.setenv("MDTPU_HOST_PIPELINE", knob)
        eca = ElectricCurrentAutocorrelation(
            u.atoms, temp, verbose=False
        )
        eca._chunk_bytes = 5 * n * 3 * 8
        eca.run()
        results.append(eca)
    monkeypatch.delenv("MDTPU_HOST_PIPELINE")
    device, host = results
    assert not device._host_pipeline
    assert host._host_pipeline
    np.testing.assert_allclose(
        host.results.acf, device.results.acf, rtol=1e-6
    )
    np.testing.assert_allclose(
        host.results.conductivity, device.results.conductivity,
        rtol=1e-6,
    )
