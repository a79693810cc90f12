"""Tests for mdhelper_tpu.analysis.transport (parity:
/root/reference/tests/test_analysis_transport.py).

The reference validates against MDAnalysis EinsteinMSD and a literal
re-implementation of the Fong et al. (2020) FFT algorithm; the oracles
below are the equivalent direct NumPy implementations.
"""

import numpy as np
import pytest

from mdhelper_tpu.analysis import transport
from mdhelper_tpu.core import Universe

rng = np.random.default_rng(31)

T, NA, NB = 64, 12, 8
N = NA + NB
BOX = 15.0


def direct_msd(traj):
    """Window-averaged per-particle MSD, shape (T,)."""

    n_t = traj.shape[0]
    out = np.zeros(n_t)
    for m in range(n_t):
        d = traj[m:] - traj[: n_t - m if m else None]
        out[m] = (d**2).sum(-1).mean()
    return out


def direct_cross(traj1, traj2):
    """Window-averaged summed cross displacement, shape (T,)."""

    n_t = traj1.shape[0]
    s1 = traj1.sum(axis=1)
    s2 = traj2.sum(axis=1)
    out = np.zeros(n_t)
    for m in range(n_t):
        d1 = s1[m:] - s1[: n_t - m if m else None]
        d2 = s2[m:] - s2[: n_t - m if m else None]
        out[m] = (d1 * d2).sum(-1).mean()
    return out


@pytest.fixture(scope="module")
def walk():
    """Unwrapped random-walk trajectory for two species."""

    steps = rng.normal(0, 0.3, (T, N, 3))
    traj = np.cumsum(steps, axis=0) + rng.random((1, N, 3)) * BOX
    return traj


@pytest.fixture(scope="module")
def universe(walk):
    return Universe.from_arrays(
        walk,
        np.array([BOX] * 3),
        types=np.array(["A"] * NA + ["B"] * NB, dtype=object),
        charges=np.array([1.0] * NA + [-1.0] * NB),
        dt=0.1,
    )


def test_onsager_msd_self_and_cross(walk, universe):
    ag_a = universe.select_atoms("type A")
    ag_b = universe.select_atoms("type B")
    onsager = transport.Onsager(
        [ag_a, ag_b], temperature=300, verbose=False
    ).run()

    assert onsager.results.pairs == ((0, 0), (0, 1), (1, 1))
    # Self MSDs match the direct per-particle oracle (/6 for 3-D).
    np.testing.assert_allclose(
        onsager.results.msd_self[0, 0],
        direct_msd(walk[:, :NA]) / 6,
        rtol=1e-8,
        atol=1e-10,
    )
    np.testing.assert_allclose(
        onsager.results.msd_self[1, 0],
        direct_msd(walk[:, NA:]) / 6,
        rtol=1e-8,
        atol=1e-10,
    )
    # Cross displacement matches the Fong et al. oracle.
    np.testing.assert_allclose(
        onsager.results.msd_cross[1, 0],
        direct_cross(walk[:, :NA], walk[:, NA:]) / 6,
        rtol=1e-7,
        atol=1e-8,
    )
    assert np.allclose(
        onsager.results.times, 0.1 * np.arange(T)
    )


def test_onsager_unwrap(walk, universe):
    """Wrapped trajectory + unwrap=True reproduces the unwrapped MSD."""

    wrapped = walk - BOX * np.floor(walk / BOX)
    u_wrapped = Universe.from_arrays(
        wrapped,
        np.array([BOX] * 3),
        types=np.array(["A"] * NA + ["B"] * NB, dtype=object),
        dt=0.1,
    )
    onsager = transport.Onsager(
        u_wrapped.select_atoms("type A"),
        temperature=300,
        unwrap=True,
        verbose=False,
    ).run()
    # Unwrapping recovers displacements up to a constant per particle.
    np.testing.assert_allclose(
        onsager.results.msd_self[0, 0],
        direct_msd(walk[:, :NA]) / 6,
        rtol=1e-8,
        atol=1e-10,
    )


def test_onsager_blocks(walk, universe):
    ag_a = universe.select_atoms("type A")
    onsager = transport.Onsager(
        ag_a, temperature=300, n_blocks=2, verbose=False
    ).run()
    assert onsager.results.msd_self.shape == (1, 2, T // 2)
    np.testing.assert_allclose(
        onsager.results.msd_self[0, 0],
        direct_msd(walk[: T // 2, :NA]) / 6,
        rtol=1e-8,
        atol=1e-10,
    )
    np.testing.assert_allclose(
        onsager.results.msd_self[0, 1],
        direct_msd(walk[T // 2:, :NA]) / 6,
        rtol=1e-8,
        atol=1e-10,
    )


def test_onsager_center(walk, universe):
    """COM drift removal: displacements relative to system COM."""

    ag_a = universe.select_atoms("type A")
    ag_b = universe.select_atoms("type B")
    onsager = transport.Onsager(
        [ag_a, ag_b], temperature=300, center=True, verbose=False
    ).run()
    com = walk.mean(axis=1, keepdims=True)  # unit masses
    centered = walk - com
    np.testing.assert_allclose(
        onsager.results.msd_self[0, 0],
        direct_msd(centered[:, :NA]) / 6,
        rtol=1e-8,
        atol=1e-10,
    )


def test_onsager_residue_grouping(walk):
    """residues grouping computes per-residue COMs before the MSD."""

    u = Universe.from_arrays(
        walk,
        np.array([BOX] * 3),
        resindices=np.repeat(np.arange(N // 2), 2),
        dt=0.1,
    )
    onsager = transport.Onsager(
        u.atoms, "residues", temperature=300, verbose=False
    ).run()
    coms = walk.reshape(T, N // 2, 2, 3).mean(axis=2)
    np.testing.assert_allclose(
        onsager.results.msd_self[0, 0],
        direct_msd(coms) / 6,
        rtol=1e-8,
        atol=1e-10,
    )


def test_transport_coefficients_linear():
    """Perfectly linear MSDs recover exact slopes."""

    times = np.arange(100.0)
    slope_cross = np.array([[4.0], [1.0], [3.0]])  # (pairs, 1, T) below
    msd_cross = slope_cross[:, :, None] * times
    msd_self = np.array([[2.0], [1.5]])[:, :, None] * times
    dims = np.array([10.0, 10.0, 10.0])
    kbt = 2.0
    L_ij, L_ii_self, D_i = transport.calculate_transport_coefficients(
        times, msd_cross, msd_self, np.array([5, 7]), dims, kbt,
        scale="linear",
    )
    denom = kbt * 1000.0
    assert np.allclose(
        L_ij[0], np.array([[4.0, 1.0], [1.0, 3.0]]) / denom
    )
    assert np.allclose(D_i[0], [2.0, 1.5])
    assert np.allclose(L_ii_self[0], np.array([5, 7]) * D_i[0] / denom)


def test_transport_coefficients_log_enforced():
    times = np.arange(50.0)
    msd = 3.0 * times
    out = transport.calculate_transport_coefficients(
        times,
        msd[None, None],
        msd[None, None],
        np.array([4]),
        np.array([5.0, 5.0, 5.0]),
        1.0,
        scale="log",
    )
    # log-log fit with slope 1 recovers the prefactor 3/denom.
    assert np.allclose(out[0][0, 0, 0], 3.0 / 125.0)


def test_conductivity_and_friends():
    L_ij = np.array([[[2.0, -0.5], [-0.5, 1.0]]])
    z = np.array([1.0, -1.0])
    kappa_reduced = transport.calculate_conductivity(
        L_ij, z, reduced=True
    )
    assert np.allclose(kappa_reduced, 2.0 + 1.0 + 2 * 0.5)
    # Unit-ful version scales by N_A e^2 (mol/C^2 folded in).
    kappa = transport.calculate_conductivity(L_ij, z)
    factor = 6.02214076e23 * (1.602176634e-19) ** 2
    assert np.allclose(kappa, kappa_reduced * factor)

    ts = transport.calculate_transference_number(L_ij, z)
    s = z * (L_ij * z).sum(-1)
    assert np.allclose(ts, s / s.sum(-1))

    rho = np.array([0.1, 0.2])
    mu_reduced = transport.calculate_electrophoretic_mobility(
        L_ij, z, rho, reduced=True
    )
    assert np.allclose(
        mu_reduced, (L_ij * z / rho[:, None]).sum(-1)
    )


def test_onsager_conductivity_pipeline():
    # Correlated motion (common drift) keeps the cross displacement
    # positive so the fits do not hit the reference's NaN path.
    drift = np.cumsum(rng.normal(0, 0.5, (T, 1, 3)), axis=0)
    traj = np.cumsum(rng.normal(0, 0.1, (T, N, 3)), axis=0) + drift
    u = Universe.from_arrays(
        traj,
        np.array([BOX] * 3),
        types=np.array(["A"] * NA + ["B"] * NB, dtype=object),
        charges=np.array([1.0] * NA + [-1.0] * NB),
        dt=0.1,
    )
    onsager = transport.Onsager(
        [u.select_atoms("type A"), u.select_atoms("type B")],
        temperature=300,
        verbose=False,
    ).run()
    with pytest.raises(RuntimeError):
        transport.Onsager(
            [u.select_atoms("type A")], verbose=False
        ).calculate_conductivity()
    onsager.calculate_transport_coefficients(
        start=2, stop=20, scale="linear"
    )
    assert onsager.results.L_ij.shape == (1, 2, 2)
    onsager.calculate_conductivity()
    assert onsager.results.conductivities.shape == (1,)
    onsager.calculate_transference_number()
    assert np.allclose(
        onsager.results.transference_numbers.sum(axis=-1), 1.0
    )
    onsager.calculate_electrophoretic_mobility()
    assert onsager.results.electrophoretic_mobilities.shape == (1, 2)
    onsager.calculate_ionicity()
    assert onsager.results.ne_conductivities.shape == (1,)
    assert np.all(np.isfinite(onsager.results.ionicity))
    assert np.allclose(
        onsager.results.haven_ratios * onsager.results.ionicity, 1.0
    )
    # regression: ionicity recomputes BOTH kappas with the passed
    # charges — uniform charge scaling must leave it invariant (the
    # cached-numerator bug made it differ by the ratio squared)
    alpha = onsager.results.ionicity.copy()
    onsager.calculate_ionicity(charges=[2.0, -2.0])
    np.testing.assert_allclose(
        onsager.results.ionicity, alpha, rtol=1e-12
    )


def test_nernst_einstein_algebra():
    """kappa_NE = sum z_i^2 L_ii_self; ionicity algebra exact on
    synthetic coefficients."""

    L_ii_self = np.array([[2.0, 1.5]])
    z = np.array([1.0, -2.0])
    ne_reduced = transport.calculate_nernst_einstein_conductivity(
        L_ii_self, z, reduced=True
    )
    assert np.allclose(ne_reduced, 2.0 + 4 * 1.5)
    factor = 6.02214076e23 * (1.602176634e-19) ** 2
    ne = transport.calculate_nernst_einstein_conductivity(
        L_ii_self, z
    )
    assert np.allclose(ne, ne_reduced * factor)


def test_fit_models():
    from mdhelper_tpu.fit import (
        exponential,
        fourier,
        gaussian,
        polynomial,
        power,
        distribution,
    )

    x = np.linspace(0.1, 2, 20)
    assert np.allclose(
        polynomial.poly1(x, 2.0, 1.0), 2 * x + 1
    )
    assert np.allclose(
        polynomial.poly3(x, 1.0, 0.0, -1.0, 2.0), x**3 - x + 2
    )
    assert np.allclose(
        exponential.exp2(x, 1.0, -2.0, 0.5, 1.0),
        np.exp(-2 * x) + 0.5 * np.exp(x),
    )
    assert np.allclose(
        exponential.stretched_exp(x, 2.0, 0.5),
        np.exp(-np.sqrt(x / 2)),
    )
    assert np.allclose(
        exponential.biexp(x, 1.0, 2.0, 3.0, 4.0, 5.0),
        1 + 2 * np.exp(-x / 3) + 4 * np.exp(-x / 5),
    )
    assert np.allclose(
        gaussian.gauss1(x, 2.0, 1.0, 0.5),
        2 * np.exp(-(((x - 1) / 0.5) ** 2)),
    )
    assert np.allclose(
        fourier.fourier1(x, 1.0, 2.0, 3.0, 0.5),
        1 + 2 * np.cos(0.5 * x) + 3 * np.sin(0.5 * x),
    )
    assert np.allclose(power.power2(x, 2.0, 1.5, 1.0),
                       2 * x**1.5 + 1)
    a, b = 1.5, 2.0
    assert np.allclose(
        distribution.weibull(x, a, b),
        a * b * x ** (b - 1) * np.exp(-a * x**b),
    )


def test_onsager_async_store_pipeline(walk, universe):
    """Store-type extras absorb one chunk late via the base-level
    async queue (`SerialAnalysisBase._queue_store`): during the stream
    exactly one chunk is pending, stores land in order at the right
    offsets, and the tail drains before the conclusion."""

    ag = universe.atoms
    ons = transport.Onsager(ag, temperature=300, verbose=False)
    # Force several small chunks.
    ons._chunk_bytes = 4 * ag.n_atoms * 3 * 8
    depths = []
    orig = transport.Onsager._store_chunk

    def spy(self, entities, batch):
        orig(self, entities, batch)
        depths.append(len(self._pending_stores))

    ons._store_chunk = spy.__get__(ons)
    ons.run()
    assert len(depths) >= 2  # actually chunked
    # _store_chunk runs from _drain_stores while its own entry is
    # still queued; the queue never grows beyond that one chunk.
    assert max(depths) == 1
    assert not ons._pending_stores
    # The store holds every frame's entities in order.
    np.testing.assert_allclose(
        ons._positions[0], np.asarray(walk[0]), atol=1e-12
    )
    np.testing.assert_allclose(
        ons._positions[len(walk) - 1], np.asarray(walk[-1]),
        atol=1e-12,
    )


# -- host pipeline ---------------------------------------------------------
# On tunnel-attached TPUs the whole Onsager per-frame stage runs
# host-side (`Onsager._prepare_host`); forced on here via
# MDTPU_HOST_PIPELINE, it must reproduce the device path bit-near
# across every per-frame feature (unwrap carry across chunk
# boundaries, COM drift removal, residue grouping, blocks).


def _host_device_pair(make, monkeypatch, chunk_frames=5):
    results = []
    for knob in ("0", "1"):
        monkeypatch.setenv("MDTPU_HOST_PIPELINE", knob)
        analysis = make()
        analysis._chunk_bytes = (
            chunk_frames * analysis.universe.atoms.n_atoms * 3 * 8
        )
        analysis.run()
        results.append(analysis)
    monkeypatch.delenv("MDTPU_HOST_PIPELINE")
    device, host = results
    assert not device._host_pipeline
    assert host._host_pipeline
    return device, host


def test_onsager_host_pipeline_plain(walk, universe, monkeypatch):
    ag_a = universe.select_atoms("type A")
    ag_b = universe.select_atoms("type B")
    device, host = _host_device_pair(
        lambda: transport.Onsager(
            [ag_a, ag_b], temperature=300, verbose=False
        ),
        monkeypatch,
    )
    np.testing.assert_allclose(
        host.results.msd_self, device.results.msd_self, rtol=1e-12
    )
    np.testing.assert_allclose(
        host.results.msd_cross, device.results.msd_cross,
        rtol=1e-10, atol=1e-12,
    )


def test_onsager_host_pipeline_unwrap_chunked(walk, monkeypatch):
    """The unwrap image-count carry hands off across chunk boundaries
    identically on host and device."""

    wrapped = walk - BOX * np.floor(walk / BOX)
    u = Universe.from_arrays(
        wrapped,
        np.array([BOX] * 3),
        types=np.array(["A"] * NA + ["B"] * NB, dtype=object),
        dt=0.1,
    )
    device, host = _host_device_pair(
        lambda: transport.Onsager(
            u.select_atoms("type A"), temperature=300, unwrap=True,
            verbose=False,
        ),
        monkeypatch,
        chunk_frames=7,
    )
    np.testing.assert_allclose(
        host.results.msd_self, device.results.msd_self, rtol=1e-12
    )
    # And both recover the unwrapped oracle.
    np.testing.assert_allclose(
        host.results.msd_self[0, 0],
        direct_msd(walk[:, :NA]) / 6,
        rtol=1e-8,
        atol=1e-10,
    )


def test_onsager_host_pipeline_center_groupings(walk, monkeypatch):
    """COM drift removal + residue grouping in the host pipeline."""

    u = Universe.from_arrays(
        walk,
        np.array([BOX] * 3),
        resindices=np.repeat(np.arange(N // 2), 2),
        dt=0.1,
    )
    device, host = _host_device_pair(
        lambda: transport.Onsager(
            u.atoms, "residues", temperature=300, center=True,
            n_blocks=2, verbose=False,
        ),
        monkeypatch,
    )
    np.testing.assert_allclose(
        host.results.msd_self, device.results.msd_self,
        rtol=1e-10, atol=1e-12,
    )
    np.testing.assert_allclose(
        host.results.msd_cross, device.results.msd_cross,
        rtol=1e-10, atol=1e-12,
    )


def test_onsager_host_pipeline_center_atom_wrap(walk, monkeypatch):
    """center_atom/center_wrap force full-universe streaming; the host
    path must mirror the wrapped system-COM reference."""

    u = Universe.from_arrays(
        walk,
        np.array([BOX] * 3),
        types=np.array(["A"] * NA + ["B"] * NB, dtype=object),
        dt=0.1,
    )
    device, host = _host_device_pair(
        lambda: transport.Onsager(
            u.select_atoms("type A"), temperature=300, center=True,
            center_atom=True, center_wrap=True, verbose=False,
        ),
        monkeypatch,
    )
    np.testing.assert_allclose(
        host.results.msd_self, device.results.msd_self,
        rtol=1e-10, atol=1e-12,
    )
