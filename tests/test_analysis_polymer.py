"""Tests for mdhelper_tpu.analysis.polymer (parity:
/root/reference/tests/test_analysis_polymer.py, with direct NumPy
oracles)."""

import numpy as np
import pytest

from mdhelper_tpu.analysis import polymer
from mdhelper_tpu.core import Universe

rng = np.random.default_rng(47)

T, M, N_P = 10, 6, 8  # frames, chains, monomers per chain
N = M * N_P
BOX = 20.0


def make_polymer_traj():
    """Random-walk chains drifting continuously through space
    (unwrapped; inter-frame displacements stay below half a box so
    image-flag unwrapping is well-posed)."""

    starts = rng.random((1, M, 1, 3)) * BOX / 2
    drift = np.cumsum(rng.normal(0, 0.5, (T, M, 1, 3)), axis=0)
    steps = rng.normal(0, 0.4, (T, M, N_P, 3))
    return (starts + drift + np.cumsum(steps, axis=2)).reshape(T, N, 3)


@pytest.fixture(scope="module")
def traj():
    return make_polymer_traj()


@pytest.fixture(scope="module")
def universe(traj):
    return Universe.from_arrays(
        traj,
        np.array([BOX] * 3),
        masses=np.tile(np.linspace(1, 2, N_P), M),
        segindices=np.repeat(np.arange(M), N_P),
        resindices=np.arange(N),
        dt=1.0,
    )


def oracle_rg(pos, masses, components=False):
    com = (masses[:, None] * pos).sum(0) / masses.sum()
    d2 = (pos - com) ** 2
    if components:
        total = d2.sum(1, keepdims=True)
        return np.sqrt(
            (masses[:, None] * (total - d2)).sum(0) / masses.sum()
        )
    return np.sqrt((masses[:, None] * d2).sum() / masses.sum())


def test_gyradius(universe, traj):
    gr = polymer.Gyradius(universe.atoms, verbose=False).run()
    assert gr.results.gyradii.shape == (1, T)
    masses = universe.atoms.masses.reshape(M, N_P)
    for t in (0, T // 2, T - 1):
        chains = traj[t].reshape(M, N_P, 3)
        ref = np.mean(
            [oracle_rg(c, m) for c, m in zip(chains, masses)]
        )
        assert np.isclose(gr.results.gyradii[0, t], ref)


def test_gyradius_components(universe, traj):
    gr = polymer.Gyradius(
        universe.atoms, components=True, verbose=False
    ).run()
    assert gr.results.gyradii.shape == (1, T, 3)
    masses = universe.atoms.masses.reshape(M, N_P)
    chains = traj[0].reshape(M, N_P, 3)
    ref = np.mean(
        [oracle_rg(c, m, components=True)
         for c, m in zip(chains, masses)],
        axis=0,
    )
    assert np.allclose(gr.results.gyradii[0, 0], ref)


def test_gyradius_external_counts(traj):
    """n_chains/n_monomers given explicitly (no segment info)."""

    u = Universe.from_arrays(traj, np.array([BOX] * 3), dt=1.0)
    gr = polymer.Gyradius(
        u.atoms, n_chains=M, n_monomers=N_P, verbose=False
    ).run()
    chains = traj[0].reshape(M, N_P, 3)
    ref = np.mean([oracle_rg(c, np.ones(N_P)) for c in chains])
    assert np.isclose(gr.results.gyradii[0, 0], ref)


def test_gyradius_unwrap(universe, traj):
    """Wrapped trajectory + unwrap reproduces unwrapped gyradii."""

    wrapped = traj - BOX * np.floor(traj / BOX)
    bonds = np.concatenate(
        [
            np.stack(
                [np.arange(i * N_P, (i + 1) * N_P - 1),
                 np.arange(i * N_P + 1, (i + 1) * N_P)],
                axis=1,
            )
            for i in range(M)
        ]
    )
    u = Universe.from_arrays(
        wrapped,
        np.array([BOX] * 3),
        masses=universe.atoms.masses,
        segindices=np.repeat(np.arange(M), N_P),
        bonds=bonds,
        dt=1.0,
    )
    gr = polymer.Gyradius(u.atoms, unwrap=True, verbose=False).run()
    ref = polymer.Gyradius(universe.atoms, verbose=False).run()
    assert np.allclose(
        gr.results.gyradii, ref.results.gyradii, atol=1e-9
    )


def test_end_to_end_vector(universe, traj):
    e2e = polymer.EndToEndVector(universe.atoms, verbose=False).run()
    assert e2e.results.acf.shape == (1, 1, T)
    # ACF at lag 0 of unit vectors is 1.
    assert np.isclose(e2e.results.acf[0, 0, 0], 1.0)
    # Direct oracle for lag 1.
    vecs = (
        traj.reshape(T, M, N_P, 3)[:, :, -1]
        - traj.reshape(T, M, N_P, 3)[:, :, 0]
    )
    unit = vecs / np.linalg.norm(vecs, axis=-1, keepdims=True)
    ref_lag1 = np.mean(
        [
            (unit[t] * unit[t + 1]).sum(-1).mean()
            for t in range(T - 1)
        ]
    )
    assert np.isclose(e2e.results.acf[0, 0, 1], ref_lag1)


def test_end_to_end_relaxation_time():
    """Synthetic exponential ACF recovers the decay time."""

    tau_true = 5.0
    times = np.arange(50.0)

    # Build an analysis object shell just to exercise the fit helper.
    acf = np.exp(-times / tau_true)
    tau = polymer.calculate_relaxation_time(times, acf)
    assert np.isclose(tau, tau_true, rtol=0.05)


def test_single_chain_structure_factor(universe, traj):
    scsf = polymer.SingleChainStructureFactor(
        universe.atoms, n_points=4, verbose=False
    ).run()
    qs = polymer._wavevector_grid(np.array([BOX] * 3), 4)
    mags = np.linalg.norm(qs, axis=1)
    raw = np.zeros(len(qs))
    for t in range(T):
        for chain in traj[t].reshape(M, N_P, 3):
            phases = qs @ chain.T
            raw += (
                np.cos(phases).sum(1) ** 2 + np.sin(phases).sum(1) ** 2
            )
    raw /= M * N_P * T
    uniq = np.unique(mags.round(11))
    ref = np.array([raw[np.isclose(q, mags)].mean() for q in uniq])
    assert np.allclose(scsf.results.wavenumbers, uniq)
    assert np.allclose(scsf.results.scsf, ref)
    # S_sc(q=0) = N_p (monomers per chain).
    assert np.isclose(scsf.results.scsf[0], N_P)


def test_polymer_validation(universe):
    with pytest.raises(ValueError):
        polymer.Gyradius(universe.atoms, groupings="segments",
                         verbose=False)


def oracle_rouse_amps(pos_tmn3, n_modes):
    """(T, M, N_p, 3) unwrapped beads -> (T, M, P, 3) mode amps."""

    n_p = pos_tmn3.shape[2]
    p = np.arange(1, n_modes + 1)[:, None]
    n = np.arange(n_p)[None, :] + 0.5
    mat = np.cos(p * np.pi * n / n_p) / n_p
    return np.einsum("pn,tmnd->tmpd", mat, pos_tmn3)


def test_rouse_modes_matches_oracle(universe, traj):
    from mdhelper_tpu.algorithm.correlation import correlation_fft

    n_modes = 4
    rm = polymer.RouseModes(
        universe.atoms, n_modes=n_modes, unwrap=False, verbose=False
    ).run()
    assert rm.results.acf.shape == (1, n_modes, 1, T)
    assert rm.results.mean_square_amplitudes.shape == (1, n_modes)

    amps = oracle_rouse_amps(traj.reshape(T, M, N_P, 3), n_modes)
    np.testing.assert_allclose(
        rm.results.mean_square_amplitudes[0],
        (amps**2).sum(-1).mean(axis=(0, 1)),
        rtol=1e-8,
    )
    for p in range(n_modes):
        acf = np.asarray(
            correlation_fft(
                amps[:, :, p][None], average=True, vector=True
            )
        )[0]
        np.testing.assert_allclose(
            rm.results.acf[0, p], (acf / acf[0])[None], rtol=1e-6
        )

    rm.calculate_relaxation_time()
    assert rm.results.relaxation_times.shape == (1, n_modes, 1)


def test_rouse_modes_orthogonality():
    """A pure mode-k chain shape excites only mode k (cosine basis
    orthogonality), and mode amplitudes track the driving signal."""

    k, n_p, frames = 2, 16, 12
    n = np.arange(n_p) + 0.5
    shape = np.cos(k * np.pi * n / n_p)
    amp = 1.0 + 0.5 * np.cos(2 * np.pi * np.arange(frames) / frames)
    pos = np.zeros((frames, 1, n_p, 3))
    pos[..., 0] = amp[:, None, None] * shape
    u = Universe.from_arrays(
        pos.reshape(frames, n_p, 3),
        np.array([100.0] * 3),
        dt=1.0,
    )
    rm = polymer.RouseModes(
        u.atoms, n_chains=1, n_monomers=n_p, n_modes=4,
        unwrap=False, verbose=False,
    ).run()
    msa = rm.results.mean_square_amplitudes[0]
    # <X_k^2> = <amp^2>/4; every other mode is numerically zero.
    np.testing.assert_allclose(msa[k - 1], (amp**2).mean() / 4, rtol=1e-10)
    others = np.delete(msa, k - 1)
    assert others.max() < 1e-20


def test_rouse_modes_unwrap_consistent(universe, traj):
    """Image-flag unwrapping recovers the continuous-trajectory modes
    from wrapped coordinates."""

    wrapped = traj - BOX * np.floor(traj / BOX)
    u = Universe.from_arrays(
        wrapped,
        np.array([BOX] * 3),
        masses=universe.atoms.masses,
        segindices=np.repeat(np.arange(M), N_P),
        resindices=np.arange(N),
        dt=1.0,
    )
    rm_w = polymer.RouseModes(
        u.atoms, n_modes=3, unwrap=True, verbose=False
    ).run()
    rm_u = polymer.RouseModes(
        universe.atoms, n_modes=3, unwrap=False, verbose=False
    ).run()
    # Unwrapped-from-wrapped positions differ from the raw trajectory
    # by a constant per-chain image offset (set by the first frame's
    # edge unwrap), which shifts only mode 0 — the kept modes p>=1
    # must agree.
    np.testing.assert_allclose(
        rm_w.results.acf, rm_u.results.acf, rtol=1e-6, atol=1e-9
    )


def test_rouse_modes_validation(universe):
    with pytest.raises(ValueError, match="n_modes"):
        polymer.RouseModes(universe.atoms, n_modes=N_P, verbose=False)


# -- host pipeline ---------------------------------------------------------
# On tunnel-attached TPUs the polymer per-frame stage runs host-side
# (float64 numpy, `_PolymerAnalysisBase` host helpers); forced on via
# MDTPU_HOST_PIPELINE it must reproduce the device path, including the
# residue-COM bead reduction and unwrap carry across chunk boundaries.


def _host_device_pair(make, monkeypatch, universe, chunk_frames=4):
    results = []
    for knob in ("0", "1"):
        monkeypatch.setenv("MDTPU_HOST_PIPELINE", knob)
        analysis = make()
        analysis._chunk_bytes = (
            chunk_frames * universe.atoms.n_atoms * 3 * 8
        )
        analysis.run()
        results.append(analysis)
    monkeypatch.delenv("MDTPU_HOST_PIPELINE")
    device, host = results
    assert not device._host_pipeline
    assert host._host_pipeline
    return device, host


def test_gyradius_host_pipeline(universe, traj, monkeypatch):
    device, host = _host_device_pair(
        lambda: polymer.Gyradius(
            universe.atoms, components=True, verbose=False
        ),
        monkeypatch,
        universe,
    )
    np.testing.assert_allclose(
        host.results.gyradii, device.results.gyradii, rtol=1e-12
    )


def test_gyradius_host_pipeline_residues_unwrap(traj, monkeypatch):
    wrapped = traj - BOX * np.floor(traj / BOX)
    u = Universe.from_arrays(
        wrapped,
        np.array([BOX] * 3),
        masses=np.tile(np.linspace(1, 2, N_P), M),
        segindices=np.repeat(np.arange(M), N_P),
        resindices=np.arange(N),
        dt=1.0,
    )
    device, host = _host_device_pair(
        lambda: polymer.Gyradius(
            u.atoms, "residues", unwrap=True, verbose=False
        ),
        monkeypatch,
        u,
        chunk_frames=3,
    )
    np.testing.assert_allclose(
        host.results.gyradii, device.results.gyradii, rtol=1e-10
    )


def test_end_to_end_host_pipeline(traj, monkeypatch):
    wrapped = traj - BOX * np.floor(traj / BOX)
    u = Universe.from_arrays(
        wrapped,
        np.array([BOX] * 3),
        masses=np.tile(np.linspace(1, 2, N_P), M),
        segindices=np.repeat(np.arange(M), N_P),
        resindices=np.arange(N),
        dt=1.0,
    )
    device, host = _host_device_pair(
        lambda: polymer.EndToEndVector(
            u.atoms, unwrap=True, verbose=False
        ),
        monkeypatch,
        u,
        chunk_frames=3,
    )
    np.testing.assert_allclose(
        host.results.acf, device.results.acf, rtol=1e-10, atol=1e-12
    )


def test_rouse_modes_host_pipeline(universe, traj, monkeypatch):
    device, host = _host_device_pair(
        lambda: polymer.RouseModes(
            universe.atoms, n_modes=4, unwrap=False, verbose=False
        ),
        monkeypatch,
        universe,
    )
    np.testing.assert_allclose(
        host.results.acf, device.results.acf, rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        host.results.mean_square_amplitudes,
        device.results.mean_square_amplitudes,
        rtol=1e-12,
    )


def test_gyradius_shape_descriptors(universe, traj):
    """Gyration-tensor invariants (b, c, kappa^2) vs an eigvalsh
    oracle, plus the rod and mutual-exclusion edge cases."""

    gr = polymer.Gyradius(
        universe.atoms, shape=True, verbose=False
    ).run()
    assert gr.results.asphericity.shape == (1, T)
    masses = universe.atoms.masses.reshape(M, N_P)
    for t in (0, T - 1):
        chains = traj[t].reshape(M, N_P, 3)
        bs, cs, k2s = [], [], []
        for c, m in zip(chains, masses):
            com = (m[:, None] * c).sum(0) / m.sum()
            dr = c - com
            S = np.einsum("p,pd,pe->de", m, dr, dr) / m.sum()
            l3, l2, l1 = np.linalg.eigvalsh(S)  # ascending
            bs.append(l1 - 0.5 * (l2 + l3))
            cs.append(l2 - l3)
            k2s.append(
                (bs[-1] ** 2 + 0.75 * cs[-1] ** 2)
                / (l1 + l2 + l3) ** 2
            )
        np.testing.assert_allclose(
            gr.results.asphericity[0, t], np.mean(bs), rtol=1e-8
        )
        np.testing.assert_allclose(
            gr.results.acylindricity[0, t], np.mean(cs), rtol=1e-8
        )
        np.testing.assert_allclose(
            gr.results.shape_anisotropy[0, t], np.mean(k2s),
            rtol=1e-8,
        )

    # A straight rod has kappa^2 = 1, acylindricity 0.
    n = 8
    rod = np.zeros((1, n, 3))
    rod[0, :, 0] = np.arange(n, dtype=float)
    u_rod = Universe.from_arrays(
        rod, np.array([100.0] * 3), dt=1.0
    )
    gr_rod = polymer.Gyradius(
        u_rod.atoms, n_chains=1, n_monomers=n, shape=True,
        verbose=False,
    ).run()
    np.testing.assert_allclose(
        gr_rod.results.shape_anisotropy[0, 0], 1.0, rtol=1e-10
    )
    np.testing.assert_allclose(
        gr_rod.results.acylindricity[0, 0], 0.0, atol=1e-10
    )

    with pytest.raises(ValueError):
        polymer.Gyradius(
            universe.atoms, components=True, shape=True
        )


def test_gyradius_shape_host_pipeline(universe, monkeypatch):
    device, host = _host_device_pair(
        lambda: polymer.Gyradius(
            universe.atoms, shape=True, verbose=False
        ),
        monkeypatch,
        universe,
    )
    for name in (
        "gyradii", "asphericity", "acylindricity", "shape_anisotropy"
    ):
        np.testing.assert_allclose(
            host.results[name], device.results[name], rtol=1e-10
        )


# -- persistence length ------------------------------------------------------


def oracle_bond_acf(traj_arr, m, n_p, box=None):
    """Direct f64 contour correlation C(s) and mean bond length."""

    chains = traj_arr.reshape(len(traj_arr), m, n_p, 3)
    bonds = np.diff(chains, axis=2)  # (T, M, N_b, 3)
    if box is not None:
        bonds -= box * np.round(bonds / box)
    norms = np.linalg.norm(bonds, axis=-1)
    unit = bonds / norms[..., None]
    gram = np.einsum("tmia,tmja->ij", unit, unit)
    n_b = n_p - 1
    samples = len(traj_arr) * m
    acf = np.array(
        [
            np.trace(gram, offset=s) / ((n_b - s) * samples)
            for s in range(n_b)
        ]
    )
    return acf, norms.mean()


def test_persistence_length_oracle(universe, traj):
    pl = polymer.PersistenceLength(universe.atoms, verbose=False).run()
    ref_acf, ref_lb = oracle_bond_acf(traj, M, N_P)
    assert len(pl.results.bond_acf) == 1
    np.testing.assert_allclose(
        pl.results.bond_acf[0], ref_acf, rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        pl.results.bond_lengths[0], ref_lb, rtol=1e-6
    )
    assert np.isclose(pl.results.bond_acf[0][0], 1.0)


def test_persistence_length_helix_closed_form():
    """A rigid helix has the exact contour correlation
    C(s) = r^2 cos(s*phi) + c^2 (unit bond tangents with a constant
    in-plane rotation per bond)."""

    n_p, phi = 12, 0.4
    r, c = 0.8, 0.6  # r^2 + c^2 = 1
    i = np.arange(n_p - 1)
    tangents = np.stack(
        [r * np.cos(i * phi), r * np.sin(i * phi), c * np.ones_like(i)],
        axis=-1,
    )
    chain = np.concatenate(
        [np.zeros((1, 3)), np.cumsum(tangents, axis=0)]
    ) + 50.0
    u = Universe.from_arrays(
        chain[None], np.array([100.0] * 3),
        segindices=np.zeros(n_p, dtype=int), dt=1.0,
    )
    pl = polymer.PersistenceLength(u.atoms, verbose=False).run()
    s = np.arange(n_p - 1)
    expected = r**2 * np.cos(s * phi) + c**2
    np.testing.assert_allclose(
        pl.results.bond_acf[0], expected, rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(pl.results.bond_lengths[0], 1.0,
                               rtol=1e-6)


def test_persistence_length_freely_rotating_fit():
    """Freely-rotating chains decay as cos(theta)^s; the fitted l_p
    matches -l_b / ln cos(theta)."""

    theta, lb = np.radians(30.0), 1.5
    m, n_p, t_frames = 60, 16, 12
    rng_fr = np.random.default_rng(11)
    frames = np.empty((t_frames, m * n_p, 3))
    for t in range(t_frames):
        chains = []
        for _ in range(m):
            u_vec = rng_fr.normal(size=3)
            u_vec /= np.linalg.norm(u_vec)
            tangents = [u_vec]
            for _ in range(n_p - 2):
                prev = tangents[-1]
                # random unit vector perpendicular to prev
                perp = np.cross(prev, rng_fr.normal(size=3))
                perp /= np.linalg.norm(perp)
                tangents.append(
                    np.cos(theta) * prev + np.sin(theta) * perp
                )
            pos = np.concatenate(
                [np.zeros((1, 3)),
                 np.cumsum(lb * np.asarray(tangents), axis=0)]
            )
            chains.append(pos + 500.0)
        frames[t] = np.concatenate(chains)
    u = Universe.from_arrays(
        frames, np.array([1000.0] * 3),
        segindices=np.repeat(np.arange(m), n_p), dt=1.0,
    )
    pl = polymer.PersistenceLength(u.atoms, verbose=False).run()
    s = np.arange(n_p - 1)
    np.testing.assert_allclose(
        pl.results.bond_acf[0], np.cos(theta) ** s, atol=0.04
    )
    pl.calculate_persistence_length()
    expected_lp = -lb / np.log(np.cos(theta))
    assert np.isclose(
        pl.results.persistence_lengths[0], expected_lp, rtol=0.12
    )
    np.testing.assert_allclose(pl.results.bond_lengths[0], lb,
                               rtol=1e-6)


def test_persistence_length_min_image(universe, traj):
    """Wrapped coordinates reproduce the unwrapped correlation (bond
    vectors are restored by the minimum image)."""

    wrapped = traj - BOX * np.floor(traj / BOX)
    u = Universe.from_arrays(
        wrapped, np.array([BOX] * 3),
        masses=universe.atoms.masses,
        segindices=np.repeat(np.arange(M), N_P),
        dt=1.0,
    )
    pl = polymer.PersistenceLength(u.atoms, verbose=False).run()
    ref = polymer.PersistenceLength(
        universe.atoms, verbose=False
    ).run()
    np.testing.assert_allclose(
        pl.results.bond_acf[0], ref.results.bond_acf[0],
        rtol=1e-6, atol=1e-8,
    )


def test_persistence_length_parallel(universe):
    serial = polymer.PersistenceLength(
        universe.atoms, verbose=False
    ).run()
    par = polymer.PersistenceLength(
        universe.atoms, parallel=True, verbose=False
    ).run()
    np.testing.assert_allclose(
        par.results.bond_acf[0], serial.results.bond_acf[0],
        rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_allclose(
        par.results.bond_lengths, serial.results.bond_lengths,
        rtol=1e-9,
    )


def test_persistence_length_residues(universe, traj):
    """Residue grouping: monomers are residue COMs (here 1-atom
    residues, so identical to atoms)."""

    pl = polymer.PersistenceLength(
        universe.atoms, "residues", verbose=False
    ).run()
    ref_acf, _ = oracle_bond_acf(traj, M, N_P)
    np.testing.assert_allclose(
        pl.results.bond_acf[0], ref_acf, rtol=1e-6, atol=1e-8
    )


def test_persistence_length_host_pipeline(universe, monkeypatch):
    device, host = _host_device_pair(
        lambda: polymer.PersistenceLength(
            universe.atoms, verbose=False
        ),
        monkeypatch,
        universe,
    )
    np.testing.assert_allclose(
        host.results.bond_acf[0], device.results.bond_acf[0],
        rtol=1e-10, atol=1e-12,
    )
    np.testing.assert_allclose(
        host.results.bond_lengths, device.results.bond_lengths,
        rtol=1e-10,
    )


def test_persistence_length_too_short():
    u = Universe.from_arrays(
        np.zeros((2, 4, 3)), np.array([10.0] * 3),
        segindices=np.repeat(np.arange(2), 2), dt=1.0,
    )
    with pytest.raises(ValueError, match="at least 3"):
        polymer.PersistenceLength(u.atoms, verbose=False)


def test_persistence_length_unwrap_long_bonds():
    """Bonds stretched beyond half the box: the min-image fold
    corrupts them, while ``unwrap=True`` (image-flag tracking seeded
    by the compact first frame) recovers the true correlation."""

    box = 5.0
    m2, n_p2, t2 = 2, 6, 12
    local = np.random.default_rng(11)
    # chains start compact (bond 1.0 < box/2, exact edge-unwrap seed)
    # and stretch to bond 3.5 > box/2; per-frame monomer displacement
    # stays below box/2 so image-flag tracking is well-posed
    dirs = local.normal(size=(m2, n_p2 - 1, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs[:, 0] = (1.0, 0.0, 0.0)  # guaranteed folded at full stretch
    starts = local.random((m2, 1, 3)) * box
    lengths = np.linspace(1.0, 3.5, t2)
    walks = np.concatenate(
        [np.zeros((m2, 1, 3)), np.cumsum(dirs, axis=1)], axis=1
    )  # (M, N_p, 3) unit-bond contours, fixed shape over time
    frames = np.stack([starts + lb * walks for lb in lengths])
    traj_u = frames.reshape(t2, m2 * n_p2, 3)
    wrapped = traj_u - box * np.floor(traj_u / box)
    u = Universe.from_arrays(
        wrapped, np.array([box] * 3),
        segindices=np.repeat(np.arange(m2), n_p2), dt=1.0,
    )

    pl = polymer.PersistenceLength(
        u.atoms, unwrap=True, verbose=False
    ).run()
    ref_acf, ref_lb = oracle_bond_acf(traj_u, m2, n_p2)
    np.testing.assert_allclose(
        pl.results.bond_acf[0], ref_acf, rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        pl.results.bond_lengths[0], ref_lb, rtol=1e-6
    )
    # the min-image path cannot represent bonds > box/2
    folded = polymer.PersistenceLength(u.atoms, verbose=False).run()
    assert np.abs(folded.results.bond_acf[0] - ref_acf).max() > 0.05


def test_persistence_length_unwrap_matches_min_image(universe, traj):
    """On a drifting small-bond trajectory the unwrap and min-image
    routes agree (and both match the oracle)."""

    wrapped = traj - BOX * np.floor(traj / BOX)
    u = Universe.from_arrays(
        wrapped, np.array([BOX] * 3),
        masses=universe.atoms.masses,
        segindices=np.repeat(np.arange(M), N_P),
        dt=1.0,
    )
    pl = polymer.PersistenceLength(
        u.atoms, unwrap=True, verbose=False
    ).run()
    ref_acf, _ = oracle_bond_acf(traj, M, N_P)
    np.testing.assert_allclose(
        pl.results.bond_acf[0], ref_acf, rtol=1e-6, atol=1e-8
    )


def test_persistence_length_host_pipeline_unwrap(traj, monkeypatch):
    """Host pipeline honors unwrap=True (residue-COM monomers)."""

    wrapped = traj - BOX * np.floor(traj / BOX)
    u = Universe.from_arrays(
        wrapped, np.array([BOX] * 3),
        masses=np.tile(np.linspace(1, 2, N_P), M),
        segindices=np.repeat(np.arange(M), N_P),
        resindices=np.arange(N),
        dt=1.0,
    )
    device, host = _host_device_pair(
        lambda: polymer.PersistenceLength(
            u.atoms, "residues", unwrap=True, verbose=False
        ),
        monkeypatch,
        u,
        chunk_frames=3,
    )
    np.testing.assert_allclose(
        host.results.bond_acf[0], device.results.bond_acf[0],
        rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_allclose(
        host.results.bond_lengths, device.results.bond_lengths,
        rtol=1e-9,
    )


def test_persistence_length_degenerate_bond(monkeypatch):
    """Coincident consecutive monomers: both routes stay finite (the
    host path guards the norm like the device path)."""

    local = np.random.default_rng(5)
    t2, n_p2 = 4, 4
    pos = local.random((t2, n_p2, 3)) * BOX
    pos[:, 2] = pos[:, 1]  # zero-length middle bond, every frame
    u = Universe.from_arrays(
        pos, np.array([BOX] * 3),
        segindices=np.zeros(n_p2, dtype=int), dt=1.0,
    )
    device, host = _host_device_pair(
        lambda: polymer.PersistenceLength(u.atoms, verbose=False),
        monkeypatch,
        u,
        chunk_frames=2,
    )
    assert np.isfinite(host.results.bond_acf[0]).all()
    assert np.isfinite(device.results.bond_acf[0]).all()
    np.testing.assert_allclose(
        host.results.bond_acf[0], device.results.bond_acf[0],
        rtol=1e-10, atol=1e-12,
    )


def test_persistence_length_unwrap_requires_box():
    u = Universe.from_arrays(
        np.zeros((2, 6, 3)),
        segindices=np.zeros(6, dtype=int), dt=1.0,
    )
    with pytest.raises(ValueError, match="box dimensions"):
        polymer.PersistenceLength(u.atoms, unwrap=True, verbose=False)


# -- mean-square internal distances ----------------------------------------


def oracle_msid(chains):
    """Brute double-loop MSID over (T, M, P, 3) unwrapped chains."""

    n_p = chains.shape[2]
    out = np.empty(n_p - 1)
    for s in range(1, n_p):
        diff = chains[:, :, s:] - chains[:, :, :-s]
        out[s - 1] = (diff**2).sum(axis=-1).mean()
    return out


def test_msid_vs_oracle(universe, traj):
    msid = polymer.MeanSquareInternalDistance(
        universe.atoms, verbose=False
    ).run()
    assert msid.results.msid.shape == (1, N_P - 1)
    np.testing.assert_array_equal(
        msid.results.separations[0], np.arange(1, N_P)
    )
    ref = oracle_msid(traj.reshape(T, M, N_P, 3))
    np.testing.assert_allclose(
        msid.results.msid[0], ref, rtol=1e-9
    )


def test_msid_wrapped_matches_unwrapped(universe, traj):
    """Wrapped coordinates reconstruct through the per-frame chain
    walk (bond-fold cumulative sum) — no unwrap carry involved."""

    wrapped = traj - BOX * np.floor(traj / BOX)
    u = Universe.from_arrays(
        wrapped,
        np.array([BOX] * 3),
        masses=universe.atoms.masses.copy(),
        segindices=np.repeat(np.arange(M), N_P),
        resindices=np.arange(N),
        dt=1.0,
    )
    a = polymer.MeanSquareInternalDistance(
        u.atoms, verbose=False
    ).run()
    b = polymer.MeanSquareInternalDistance(
        universe.atoms, verbose=False
    ).run()
    np.testing.assert_allclose(
        a.results.msid, b.results.msid, rtol=1e-9
    )


def test_msid_rod_exact():
    """A straight chain with bond length b: MSID(s) = (s b)^2."""

    b, n_p, m = 1.3, 6, 2
    chain = np.zeros((n_p, 3))
    chain[:, 0] = b * np.arange(n_p)
    pos = np.stack([chain, chain + [0.0, 5.0, 0.0]])[None]
    u = Universe.from_arrays(
        pos.reshape(1, -1, 3), np.array([50.0] * 3), dt=1.0
    )
    msid = polymer.MeanSquareInternalDistance(
        u.atoms, n_chains=m, n_monomers=n_p, verbose=False
    ).run()
    s = np.arange(1, n_p)
    np.testing.assert_allclose(
        msid.results.msid[0], (s * b) ** 2, rtol=1e-10
    )


def test_msid_residue_grouping_matches_atoms(universe):
    """One-atom residues: residue-COM monomers equal atoms."""

    atoms = polymer.MeanSquareInternalDistance(
        universe.atoms, verbose=False
    ).run()
    residues = polymer.MeanSquareInternalDistance(
        universe.atoms, "residues", verbose=False
    ).run()
    np.testing.assert_allclose(
        residues.results.msid, atoms.results.msid, rtol=1e-10
    )


def test_msid_parallel_matches_serial(universe):
    serial = polymer.MeanSquareInternalDistance(
        universe.atoms, verbose=False
    ).run()
    par = polymer.MeanSquareInternalDistance(
        universe.atoms, parallel=True, verbose=False
    ).run()
    np.testing.assert_allclose(
        par.results.msid, serial.results.msid, rtol=1e-12
    )


def test_msid_ragged_groups(traj):
    """Two groups with different chain lengths produce per-group
    lists; each matches its own oracle."""

    u = Universe.from_arrays(traj, np.array([BOX] * 3), dt=1.0)
    # group 1: first 4 chains of 8; group 2: last 16 atoms as
    # 2 chains of 8 re-read as 4 chains of 4
    g1 = u.atoms[np.arange(4 * N_P)]
    g2 = u.atoms[np.arange(4 * N_P, 6 * N_P)]
    msid = polymer.MeanSquareInternalDistance(
        [g1, g2],
        n_chains=[4, 4],
        n_monomers=[N_P, 4],
        verbose=False,
    ).run()
    assert isinstance(msid.results.msid, list)
    ref1 = oracle_msid(traj[:, : 4 * N_P].reshape(T, 4, N_P, 3))
    ref2 = oracle_msid(
        traj[:, 4 * N_P : 6 * N_P].reshape(T, 4, 4, 3)
    )
    np.testing.assert_allclose(msid.results.msid[0], ref1, rtol=1e-9)
    np.testing.assert_allclose(msid.results.msid[1], ref2, rtol=1e-9)


def test_msid_host_pipeline(universe, monkeypatch):
    device, host = _host_device_pair(
        lambda: polymer.MeanSquareInternalDistance(
            universe.atoms, verbose=False
        ),
        monkeypatch,
        universe,
    )
    np.testing.assert_allclose(
        host.results.msid, device.results.msid, rtol=1e-10
    )


def test_msid_validation():
    pos = np.zeros((1, 4, 3))
    u = Universe.from_arrays(pos, np.array([10.0] * 3), dt=1.0)
    with pytest.raises(ValueError, match="at least 2"):
        polymer.MeanSquareInternalDistance(
            u.atoms, n_chains=4, n_monomers=1, verbose=False
        )


def test_msid_triclinic_wrapped_matches_unwrapped(traj):
    """Triclinic cells: bonds are folded along lattice vectors, so
    wrapped coordinates reconstruct exactly (regression: the first
    implementation folded orthorhombically)."""

    from mdhelper_tpu.algorithm.topology import triclinic_matrices

    dims = np.array([BOX, BOX, BOX, 80.0, 75.0, 70.0])
    h = np.asarray(triclinic_matrices(dims[None]))[0]  # rows = cell
    frac = traj.reshape(-1, 3) @ np.linalg.inv(h)
    wrapped = ((frac - np.floor(frac)) @ h).reshape(traj.shape)
    u_wrap = Universe.from_arrays(wrapped, dims, dt=1.0)
    u_free = Universe.from_arrays(traj, dims, dt=1.0)
    kw = dict(n_chains=M, n_monomers=N_P, verbose=False)
    a = polymer.MeanSquareInternalDistance(u_wrap.atoms, **kw).run()
    b = polymer.MeanSquareInternalDistance(u_free.atoms, **kw).run()
    np.testing.assert_allclose(
        a.results.msid, b.results.msid, rtol=1e-9
    )
    ref = oracle_msid(traj.reshape(T, M, N_P, 3))
    np.testing.assert_allclose(b.results.msid[0], ref, rtol=1e-9)


def test_msid_npt_per_frame_boxes(traj):
    """Per-frame (NPT) boxes: each frame folds with ITS box
    (regression: the first implementation used the static first
    frame's box)."""

    boxes = np.column_stack(
        [
            np.linspace(BOX, 1.6 * BOX, T),
            np.linspace(BOX, 1.4 * BOX, T),
            np.full(T, BOX),
        ]
    )
    wrapped = traj - boxes[:, None, :] * np.floor(
        traj / boxes[:, None, :]
    )
    u = Universe.from_arrays(wrapped, boxes, dt=1.0)
    kw = dict(n_chains=M, n_monomers=N_P, verbose=False)
    msid = polymer.MeanSquareInternalDistance(u.atoms, **kw).run()
    ref = oracle_msid(traj.reshape(T, M, N_P, 3))
    np.testing.assert_allclose(msid.results.msid[0], ref, rtol=1e-9)


def test_msid_slab_zero_axis(traj):
    """Zero-length axes are aperiodic per axis: a slab box still
    folds the periodic axes (regression: the first implementation
    disabled folding entirely when any axis was zero)."""

    box = np.array([BOX, BOX, 0.0])
    wrapped = traj.copy()
    wrapped[..., :2] -= BOX * np.floor(traj[..., :2] / BOX)
    u = Universe.from_arrays(wrapped, box, dt=1.0)
    kw = dict(n_chains=M, n_monomers=N_P, verbose=False)
    msid = polymer.MeanSquareInternalDistance(u.atoms, **kw).run()
    ref = oracle_msid(traj.reshape(T, M, N_P, 3))
    np.testing.assert_allclose(msid.results.msid[0], ref, rtol=1e-9)


def test_scsf_guinier_radius():
    """Guinier-fit Rg from S_sc(q) matches the real-space Rg of
    ideal random-walk chains within discretization tolerance."""

    rng_l = np.random.default_rng(101)
    m, p, b, box = 40, 20, 1.0, 60.0
    T_l = 4
    steps = rng_l.normal(size=(T_l, m, p - 1, 3))
    steps *= b / np.linalg.norm(steps, axis=-1, keepdims=True)
    starts = rng_l.random((T_l, m, 1, 3)) * box
    chains = np.concatenate(
        [starts, starts + np.cumsum(steps, axis=2)], axis=2
    )
    u = Universe.from_arrays(
        chains.reshape(T_l, m * p, 3), np.array([box] * 3), dt=1.0
    )
    scsf = polymer.SingleChainStructureFactor(
        u.atoms, n_chains=m, n_monomers=p, n_points=5,
        verbose=False,
    ).run()
    rg = scsf.calculate_guinier_radius()
    com = chains.mean(axis=2, keepdims=True)
    rg_direct = np.sqrt(
        ((chains - com) ** 2).sum(axis=-1).mean()
    )
    assert rg == pytest.approx(rg_direct, rel=0.12)
    assert scsf.results.guinier_fit_q.max() * rg <= 1.3 + 1e-9
    assert scsf.results.units[
        "results.guinier_radius"
    ].dimensionality

    with pytest.raises(RuntimeError, match="run"):
        polymer.SingleChainStructureFactor(
            u.atoms, n_chains=m, n_monomers=p, verbose=False
        ).calculate_guinier_radius()
