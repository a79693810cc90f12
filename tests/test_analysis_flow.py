"""FlowProfile (axis-binned density / streaming velocity / kinetic
temperature) vs NumPy oracles — beyond-reference capability
(dual positions+velocities payload streaming)."""

import numpy as np
import pytest

from mdhelper_tpu.analysis.flow import FlowProfile
from mdhelper_tpu.core.universe import Topology, Universe

rng = np.random.default_rng(91)

K_B = 0.8314462621026538  # u Å² ps⁻² K⁻¹


def _universe(pos, vel, box=10.0, masses=None, **kwargs):
    T, n, _ = pos.shape
    return Universe.from_arrays(
        pos,
        np.asarray(box if np.ndim(box) else [box] * 3, np.float64),
        types=np.array(["A"] * n, dtype=object),
        dt=0.5,
        velocities=vel,
        masses=masses,
        **kwargs,
    )


def _quantized(shape, scale=2.0):
    """Velocities on a 1/8 grid (f64 sums of their products are
    exact, so oracle comparisons can be tight)."""

    return np.round(rng.uniform(-scale, scale, shape) * 8) / 8


def _oracle(pos, vel, masses, length, n_bins, frame_lengths=None):
    """Per-bin accumulators with the class's estimator: per-frame
    global-COM-centered moments + f64 laboratory-frame corrections."""

    T, n, _ = pos.shape
    m_tot = masses.sum()
    edges = np.linspace(0.0, length, n_bins + 1)
    sums = {
        k: np.zeros(n_bins)
        for k in ("n", "m", "mw2", "boost")
    }
    sums["mw"] = np.zeros((n_bins, 3))
    sums["drift"] = np.zeros((n_bins, 3))
    for f in range(T):
        L = length if frame_lengths is None else frame_lengths[f]
        coord = pos[f, :, 2]
        coord = coord - L * np.floor(coord / L)
        idx = np.searchsorted(edges, coord, side="right") - 1
        idx[coord == edges[-1]] = n_bins - 1
        ok = (coord >= edges[0]) & (coord <= edges[-1])
        u = (masses[:, None] * vel[f]).sum(axis=0) / m_tot
        w = vel[f] - u
        mw = masses[:, None] * w
        mw2 = (mw * w).sum(axis=-1)
        m_f = np.zeros(n_bins)
        mw_f = np.zeros((n_bins, 3))
        for i in range(n):
            if not ok[i]:
                continue
            b = min(max(idx[i], 0), n_bins - 1)
            sums["n"][b] += 1
            m_f[b] += masses[i]
            mw_f[b] += mw[i]
            sums["mw2"][b] += mw2[i]
        sums["m"] += m_f
        sums["mw"] += mw_f
        sums["drift"] += u[None, :] * m_f[:, None]
        sums["boost"] += (
            2.0 * (mw_f * u[None, :]).sum(axis=-1)
            + (u * u).sum() * m_f
        )
    return sums


def _oracle_results(sums, n_frames, volume, n_bins,
                    remove_drift=True, k_B=K_B):
    with np.errstate(divide="ignore", invalid="ignore"):
        velocity = np.where(
            sums["m"][:, None] > 0,
            (sums["mw"] + sums["drift"]) / sums["m"][:, None],
            np.nan,
        )
        if remove_drift:
            kinetic = (
                sums["mw2"]
                - (sums["mw"] ** 2).sum(-1) / sums["m"]
            )
            dof = 3 * (sums["n"] - 1)
        else:
            kinetic = sums["mw2"] + sums["boost"]
            dof = 3 * sums["n"]
        temperature = np.where(
            dof > 0, kinetic / (dof * k_B), np.nan
        )
    denom = n_bins / (volume * n_frames)
    return {
        "counts": sums["n"],
        "number_density": sums["n"] * denom,
        "mass_density": sums["m"] * denom,
        "velocity": velocity,
        "temperature": temperature,
    }


def _assert_matches(prof, want, rtol=1e-9):
    for key, value in want.items():
        np.testing.assert_allclose(
            getattr(prof.results, key), value, rtol=rtol,
            atol=1e-12, err_msg=key,
        )


def test_flow_profile_oracle():
    T, n, n_bins = 6, 64, 8
    pos = rng.uniform(-5.0, 15.0, (T, n, 3))  # exercises wrapping
    vel = _quantized((T, n, 3))
    masses = rng.choice([0.5, 1.0, 2.0], n)
    u = _universe(pos, vel, masses=masses)
    prof = FlowProfile(u.atoms, "z", n_bins, verbose=False).run()

    sums = _oracle(pos, vel, masses, 10.0, n_bins)
    _assert_matches(prof, _oracle_results(sums, T, 1000.0, n_bins))
    assert (
        str(prof.results.units["results.temperature"]) == "kelvin"
    )


def test_flow_profile_subset_group():
    """Atom-subset groups slice the concatenated (B, N, 6) payload;
    the COM centering runs over the subset only."""

    T, n, n_bins = 5, 60, 6
    pos = rng.uniform(0.0, 10.0, (T, n, 3))
    vel = _quantized((T, n, 3))
    masses = rng.choice([1.0, 2.0, 4.0], n)
    u = _universe(pos, vel, masses=masses)
    sel = np.arange(0, n, 3)
    prof = FlowProfile(
        u.atoms[sel], "z", n_bins, verbose=False
    ).run()
    sums = _oracle(
        pos[:, sel], vel[:, sel], masses[sel], 10.0, n_bins
    )
    _assert_matches(prof, _oracle_results(sums, T, 1000.0, n_bins))


def test_flow_profile_parallel_matches_serial():
    """Frame-sharded parallel runs agree with serial to f64 rounding
    (the f64 drift/boost correction products make the frame sum
    non-associative, unlike the pure-f32-histogram classes)."""

    T, n, n_bins = 9, 40, 5
    pos = rng.uniform(0.0, 10.0, (T, n, 3))
    vel = rng.standard_normal((T, n, 3))
    masses = np.abs(rng.standard_normal(n)) + 0.5
    u = _universe(pos, vel, masses=masses)
    serial = FlowProfile(u.atoms, "z", n_bins, verbose=False).run()
    par = FlowProfile(
        u.atoms, "z", n_bins, parallel=True, verbose=False
    ).run()
    np.testing.assert_array_equal(
        par.results.counts, serial.results.counts
    )
    for key in (
        "number_density", "mass_density", "velocity", "temperature",
    ):
        np.testing.assert_allclose(
            getattr(par.results, key), getattr(serial.results, key),
            rtol=1e-12, atol=1e-15, err_msg=key,
        )


def test_flow_uniform_drift_invariance():
    """A rigid boost leaves the drift-removed temperature unchanged
    (exactly: the boost never reaches the centered histograms) and
    shifts the streaming velocity by exactly the boost."""

    T, n, n_bins = 5, 48, 4
    pos = rng.uniform(0.0, 10.0, (T, n, 3))
    vel = _quantized((T, n, 3))
    boost = np.array([1.25, -0.5, 2.0])
    masses = rng.choice([1.0, 2.0], n)
    u0 = _universe(pos, vel, masses=masses)
    u1 = _universe(pos, vel + boost, masses=masses)
    p0 = FlowProfile(u0.atoms, "z", n_bins, verbose=False).run()
    p1 = FlowProfile(u1.atoms, "z", n_bins, verbose=False).run()
    np.testing.assert_allclose(
        p1.results.temperature, p0.results.temperature, rtol=1e-9
    )
    np.testing.assert_allclose(
        p1.results.velocity, p0.results.velocity + boost, rtol=1e-8
    )


def test_flow_remove_drift_false_and_reduced():
    T, n, n_bins = 4, 32, 4
    pos = rng.uniform(0.0, 10.0, (T, n, 3))
    vel = _quantized((T, n, 3))
    masses = np.ones(n)
    u = _universe(pos, vel, masses=masses)
    prof = FlowProfile(
        u.atoms, "z", n_bins, remove_drift=False, reduced=True,
        verbose=False,
    ).run()
    sums = _oracle(pos, vel, masses, 10.0, n_bins)
    want = _oracle_results(
        sums, T, 1000.0, n_bins, remove_drift=False, k_B=1.0
    )
    np.testing.assert_allclose(
        prof.results.temperature, want["temperature"], rtol=1e-9
    )
    # raw laboratory-frame kinetic energy, reconstructed exactly:
    # sum m|v|^2 / (3 N k_B) with k_B = 1
    raw = np.zeros(n_bins)
    counts = np.zeros(n_bins)
    edges = np.linspace(0.0, 10.0, n_bins + 1)
    for f in range(T):
        coord = pos[f, :, 2] - 10.0 * np.floor(pos[f, :, 2] / 10.0)
        idx = np.minimum(
            np.searchsorted(edges, coord, side="right") - 1,
            n_bins - 1,
        )
        np.add.at(raw, idx, (vel[f] ** 2).sum(-1) * masses)
        np.add.at(counts, idx, 1.0)
    np.testing.assert_allclose(
        prof.results.temperature, raw / (3 * counts), rtol=1e-9
    )
    assert "units" not in prof.results


def test_flow_npt_wraps_with_frame_box():
    """Per-frame boxes drive the wrap; the bin grid stays the
    initialization-time cell."""

    T, n, n_bins = 3, 30, 6
    frame_lengths = np.array([10.0, 8.0, 12.0])
    pos = rng.uniform(0.0, 20.0, (T, n, 3))
    vel = _quantized((T, n, 3))
    masses = np.ones(n)
    boxes = np.tile(
        np.array([[10.0, 10.0, 10.0, 90.0, 90.0, 90.0]]), (T, 1)
    )
    boxes[:, :3] = frame_lengths[:, None]
    u = Universe.from_arrays(
        pos, boxes,
        types=np.array(["A"] * n, dtype=object),
        dt=0.5, velocities=vel, masses=masses,
    )
    # init box is frame 0's (length 10): the grid spans [0, 10]
    prof = FlowProfile(u.atoms, "z", n_bins, verbose=False).run()
    sums = _oracle(
        pos, vel, masses, 10.0, n_bins, frame_lengths=frame_lengths
    )
    want = _oracle_results(sums, T, 1000.0, n_bins)
    np.testing.assert_allclose(
        prof.results.counts, want["counts"], rtol=1e-12
    )
    np.testing.assert_allclose(
        prof.results.temperature, want["temperature"], rtol=1e-9
    )


def test_flow_trr_single_decode(tmp_path):
    """File-backed dual payload: the combined reader entry decodes
    each TRR frame once (read_frames + read_velocity_frames would
    decode twice), and the results match the oracle on the decoded
    arrays."""

    from mdhelper_tpu.core.trajectory import TRRReader
    from mdhelper_tpu.io.trr import write_trr

    T, n, n_bins = 6, 20, 4
    pos_nm = rng.random((T, n, 3))
    vel_nm = rng.standard_normal((T, n, 3)) * 0.2
    path = str(tmp_path / "flow.trr")
    write_trr(
        path, pos_nm, np.diag([1.0, 1.0, 1.0]), velocities=vel_nm
    )
    reader = TRRReader(path)
    masses = rng.choice([1.0, 2.0], n)
    u = Universe(
        Topology(
            n, masses=masses,
            types=np.array(["A"] * n, dtype=object),
        ),
        reader,
    )
    decoded = []
    original = reader._trr.read_frame
    reader._trr.read_frame = lambda i: (
        decoded.append(i) or original(i)
    )
    prof = FlowProfile(u.atoms, "z", n_bins, verbose=False).run()
    # one decode per streamed frame (+ small constant for the
    # initialization-time frame-0 reads); the double-decode bug was
    # 2 * T here
    assert len(decoded) <= T + 3

    pos = reader.read_frames(np.arange(T))[0]
    vel = reader.read_velocity_frames(np.arange(T))
    sums = _oracle(pos, vel, masses, 10.0, n_bins)
    _assert_matches(
        prof, _oracle_results(sums, T, 1000.0, n_bins), rtol=1e-7
    )


def test_flow_run_together():
    """Fused multi-analysis pass with the dual payload: two
    FlowProfiles fuse; mixing payloads raises."""

    from mdhelper_tpu.analysis.multi import run_together
    from mdhelper_tpu.analysis.profile import DensityProfile

    T, n, n_bins = 6, 36, 5
    pos = rng.uniform(0.0, 10.0, (T, n, 3))
    vel = _quantized((T, n, 3))
    masses = rng.choice([1.0, 2.0], n)
    u = _universe(pos, vel, masses=masses)

    solo_z = FlowProfile(u.atoms, "z", n_bins, verbose=False).run()
    solo_x = FlowProfile(u.atoms, "x", n_bins, verbose=False).run()
    fused_z = FlowProfile(u.atoms, "z", n_bins, verbose=False)
    fused_x = FlowProfile(u.atoms, "x", n_bins, verbose=False)
    run_together([fused_z, fused_x])
    for solo, fused in ((solo_z, fused_z), (solo_x, fused_x)):
        for key in ("counts", "velocity", "temperature"):
            np.testing.assert_allclose(
                getattr(fused.results, key),
                getattr(solo.results, key),
                rtol=1e-12, atol=1e-12, err_msg=key,
            )

    with pytest.raises(ValueError, match="payload"):
        run_together([
            FlowProfile(u.atoms, "z", n_bins, verbose=False),
            DensityProfile(u.atoms, verbose=False),
        ])


def test_flow_shear_rate_fit():
    """A linear imposed velocity profile fits back to its slope."""

    T, n, n_bins = 6, 400, 10
    gamma = 0.35
    pos = rng.uniform(0.0, 10.0, (T, n, 3))
    vel = rng.standard_normal((T, n, 3)) * 0.05
    vel[..., 0] += gamma * (pos[..., 2] - 5.0)
    masses = np.ones(n)
    u = _universe(pos, vel, masses=masses)
    prof = FlowProfile(u.atoms, "z", n_bins, verbose=False).run()
    rate = prof.calculate_shear_rate("x")
    # binning flattens the gradient within each bin; the fitted
    # slope recovers the imposed one to a few percent at this noise
    np.testing.assert_allclose(rate, gamma, rtol=0.05)
    assert prof.results.shear_rate == rate
    assert (
        str(prof.results.units["results.shear_rate"])
        in ("1 / picosecond", "picosecond ** -1", "1/picosecond")
    )
    with pytest.raises(ValueError, match="component"):
        prof.calculate_shear_rate("w")
    with pytest.raises(ValueError, match="occupied"):
        prof.calculate_shear_rate("x", window=slice(0, 1))

    fresh = FlowProfile(u.atoms, "z", n_bins, verbose=False)
    with pytest.raises(RuntimeError, match="run"):
        fresh.calculate_shear_rate()


def test_flow_validation_errors():
    T, n = 3, 8
    pos = rng.uniform(0.0, 10.0, (T, n, 3))
    vel = rng.standard_normal((T, n, 3))
    no_vel = Universe.from_arrays(
        pos, np.array([10.0] * 3),
        types=np.array(["A"] * n, dtype=object), dt=0.5,
    )
    with pytest.raises(ValueError, match="velocities"):
        FlowProfile(no_vel.atoms, verbose=False)

    u = _universe(pos, vel)
    with pytest.raises(ValueError, match="axis"):
        FlowProfile(u.atoms, "w", verbose=False)
    with pytest.raises(ValueError, match="n_bins"):
        FlowProfile(u.atoms, "z", 0, verbose=False)
    with pytest.raises(ValueError, match="Empty"):
        FlowProfile(u.atoms[:0], verbose=False)

    tri = Universe.from_arrays(
        pos, np.array([10.0, 10.0, 10.0, 90.0, 90.0, 80.0]),
        types=np.array(["A"] * n, dtype=object), dt=0.5,
        velocities=vel,
    )
    with pytest.raises(ValueError, match="orthorhombic"):
        FlowProfile(tri.atoms, verbose=False)
