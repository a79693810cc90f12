"""RMSD / RMSF superposition vs scipy Rotation.align_vectors and
direct f64 oracles — beyond-reference capability (MDAnalysis rms
family)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from mdhelper_tpu.analysis.rmsd import RMSD, RMSF
from mdhelper_tpu.core.universe import Universe

rng = np.random.default_rng(31)


def _universe(pos, **kw):
    n = pos.shape[-2]
    return Universe.from_arrays(
        pos, np.array([50.0, 50.0, 50.0]),
        types=np.array(["A"] * n, dtype=object), **kw
    )


def _make_traj(F=6, n=25, noise=0.3):
    base = rng.normal(size=(n, 3)) * 3.0
    pos = np.empty((F, n, 3))
    rots = []
    for f in range(F):
        R = Rotation.random(rng=rng).as_matrix()
        shift = rng.normal(size=3) * 5.0
        pos[f] = (
            (base + rng.normal(size=(n, 3)) * noise) @ R.T + shift
        )
        rots.append(R)
    return pos, base, rots


def _oracle_rmsd(pos, ref, w, align=True):
    W = w.sum()
    ref_c = ref - (w[:, None] * ref).sum(0) / W
    out_r, out_R = [], []
    for p in pos:
        pc = p - (w[:, None] * p).sum(0) / W
        if align:
            R, _ = Rotation.align_vectors(ref_c, pc, weights=w)
            Rm = R.as_matrix()
            a = pc @ Rm.T
        else:
            Rm = np.eye(3)
            a = pc
        out_r.append(
            np.sqrt((w * ((a - ref_c) ** 2).sum(1)).sum() / W)
        )
        out_R.append(Rm)
    return np.array(out_r), np.array(out_R)


def test_rmsd_vs_scipy_oracle():
    pos, _, _ = _make_traj()
    w = rng.random(pos.shape[1]) + 0.5
    u = _universe(pos)
    r = RMSD(u.atoms, reference=0, weights=w, verbose=False).run()
    r_o, R_o = _oracle_rmsd(pos, pos[0], w)
    np.testing.assert_allclose(r.results.rmsd, r_o, atol=1e-9)
    np.testing.assert_allclose(
        r.results.rotations, R_o, atol=1e-7
    )


def test_rmsd_pure_rotation_is_zero():
    """A rigid rotation + translation of the reference has RMSD 0."""
    pos, base, _ = _make_traj(noise=0.0)
    u = _universe(pos)
    r = RMSD(u.atoms, reference=base, verbose=False).run()
    # noise floor: rmsd = sqrt(Gp + Gq - 2*lam) amplifies f64
    # cancellation to ~sqrt(eps * G) near zero
    np.testing.assert_allclose(r.results.rmsd, 0.0, atol=1e-6)


def test_rmsd_no_align():
    pos, _, _ = _make_traj()
    u = _universe(pos)
    r = RMSD(u.atoms, align=False, verbose=False).run()
    w = np.ones(pos.shape[1])
    r_o, _ = _oracle_rmsd(pos, pos[0], w, align=False)
    np.testing.assert_allclose(r.results.rmsd, r_o, atol=1e-9)
    np.testing.assert_allclose(
        r.results.rotations,
        np.broadcast_to(np.eye(3), r.results.rotations.shape),
        atol=0,
    )


def test_rmsd_mass_weights_and_explicit_reference():
    pos, base, _ = _make_traj()
    n = pos.shape[1]
    masses = rng.random(n) * 10 + 1
    u = Universe.from_arrays(
        pos, np.array([50.0] * 3),
        types=np.array(["A"] * n, dtype=object),
        masses=masses,
    )
    r = RMSD(
        u.atoms, reference=base, weights="mass", verbose=False
    ).run()
    r_o, _ = _oracle_rmsd(pos, base, masses)
    np.testing.assert_allclose(r.results.rmsd, r_o, atol=1e-9)


def test_rmsf_oracle():
    pos, base, _ = _make_traj(F=10)
    u = _universe(pos)
    out = RMSF(u.atoms, reference=base, verbose=False).run()
    # oracle: align every frame, then per-atom std
    w = np.ones(pos.shape[1])
    ref_c = base - base.mean(0)
    aligned = []
    for p in pos:
        pc = p - p.mean(0)
        R, _ = Rotation.align_vectors(ref_c, pc, weights=w)
        aligned.append(pc @ R.as_matrix().T)
    aligned = np.array(aligned)
    mean = aligned.mean(axis=0)
    rmsf_o = np.sqrt(
        ((aligned - mean) ** 2).sum(axis=2).mean(axis=0)
    )
    np.testing.assert_allclose(out.results.rmsf, rmsf_o, atol=1e-8)
    np.testing.assert_allclose(
        out.results.mean_positions, mean, atol=1e-8
    )


def test_rmsf_rigid_motion_is_zero():
    pos, _, _ = _make_traj(noise=0.0)
    u = _universe(pos)
    out = RMSF(u.atoms, verbose=False).run()
    np.testing.assert_allclose(out.results.rmsf, 0.0, atol=1e-6)


def test_host_pipeline_matches_device(monkeypatch):
    pos, _, _ = _make_traj(F=5)
    results = {}
    for knob in ("0", "1"):
        monkeypatch.setenv("MDTPU_HOST_PIPELINE", knob)
        u = _universe(pos)
        r = RMSD(u.atoms, verbose=False).run()
        f = RMSF(u.atoms, verbose=False).run()
        assert r._host_pipeline is (knob == "1")
        results[knob] = (
            r.results.rmsd, r.results.rotations, f.results.rmsf
        )
    monkeypatch.delenv("MDTPU_HOST_PIPELINE")
    for a, b in zip(results["0"], results["1"]):
        np.testing.assert_allclose(a, b, atol=1e-8)


def test_parallel_matches_serial():
    pos, _, _ = _make_traj(F=8)
    u = _universe(pos)
    serial = RMSD(u.atoms, verbose=False).run()
    u2 = _universe(pos)
    par = RMSD(u2.atoms, parallel=True, verbose=False).run()
    # atol covers the sqrt-cancellation noise floor at the
    # reference frame (rmsd ~ 0)
    np.testing.assert_allclose(
        par.results.rmsd, serial.results.rmsd, atol=1e-6
    )


def test_rmsf_host_pipeline_refuses_checkpoint(monkeypatch, tmp_path):
    """Carry-only host pipelines accumulate in numpy buffers the
    checkpoint cannot capture — resume would silently drop frames."""
    pos, _, _ = _make_traj(F=4)
    monkeypatch.setenv("MDTPU_HOST_PIPELINE", "1")
    u = _universe(pos)
    with pytest.raises(ValueError, match="host-side pipeline"):
        RMSF(u.atoms, verbose=False).run(
            checkpoint=str(tmp_path / "c.npz")
        )
    monkeypatch.delenv("MDTPU_HOST_PIPELINE")


def test_validation():
    pos, _, _ = _make_traj()
    u = _universe(pos)
    with pytest.raises(ValueError, match="weights"):
        RMSD(u.atoms, weights="charge", verbose=False)
    with pytest.raises(ValueError, match="one value per"):
        RMSD(u.atoms, weights=np.ones(3), verbose=False)
    with pytest.raises(ValueError, match="reference"):
        RMSD(u.atoms, reference=np.zeros((4, 3)), verbose=False
             ).run()
    u_small = _universe(pos[:, :2])
    with pytest.raises(ValueError, match="at least 3"):
        RMSD(u_small.atoms, verbose=False)


# -- PCA ------------------------------------------------------------


def _pca_oracle(pos, ref, w):
    from scipy.spatial.transform import Rotation

    W = w.sum()
    ref_c = ref - (w[:, None] * ref).sum(0) / W
    X = []
    for p in pos:
        pc = p - (w[:, None] * p).sum(0) / W
        R, _ = Rotation.align_vectors(ref_c, pc, weights=w)
        X.append((pc @ R.as_matrix().T).reshape(-1))
    X = np.array(X)
    mean = X.mean(axis=0)
    cov = (X - mean).T @ (X - mean) / len(X)
    vals, vecs = np.linalg.eigh(cov)
    return X, mean, vals[::-1], vecs[:, ::-1]


def test_pca_matches_oracle():
    from mdhelper_tpu.analysis.rmsd import (
        PrincipalComponentAnalysis,
    )

    pos, base, _ = _make_traj(F=15, n=12, noise=0.4)
    u = _universe(pos)
    p = PrincipalComponentAnalysis(
        u.atoms, reference=base, verbose=False
    ).run()
    w = np.ones(pos.shape[1])
    X, mean, vals, vecs = _pca_oracle(pos, base, w)
    np.testing.assert_allclose(
        p.results.variance, np.maximum(vals, 0), atol=1e-9
    )
    np.testing.assert_allclose(
        p.results.mean_positions.reshape(-1), mean, atol=1e-9
    )
    # eigenvectors up to sign; the class fixes largest-|entry|>0
    for k in range(5):
        v = p.results.p_components[:, k]
        o = vecs[:, k]
        assert min(
            np.abs(v - o).max(), np.abs(v + o).max()
        ) < 1e-7
    np.testing.assert_allclose(
        p.results.cumulated_variance[-1], 1.0, atol=1e-12
    )
    # transform: projections match the oracle's centered X @ vecs
    proj = p.transform(n_components=3)
    oracle_proj = (X - mean) @ p.results.p_components[:, :3]
    np.testing.assert_allclose(proj, oracle_proj, atol=1e-8)
    # variance of the projections equals the eigenvalues
    np.testing.assert_allclose(
        proj.var(axis=0), p.results.variance[:3], atol=1e-9
    )


def test_pca_rigid_motion_zero_variance():
    from mdhelper_tpu.analysis.rmsd import (
        PrincipalComponentAnalysis,
    )

    pos, _, _ = _make_traj(F=8, noise=0.0)
    u = _universe(pos)
    p = PrincipalComponentAnalysis(u.atoms, verbose=False).run()
    assert p.results.variance.max() < 1e-10


def test_pca_host_pipeline(monkeypatch):
    from mdhelper_tpu.analysis.rmsd import (
        PrincipalComponentAnalysis,
    )

    pos, _, _ = _make_traj(F=12, n=10)
    results = {}
    for knob in ("0", "1"):
        monkeypatch.setenv("MDTPU_HOST_PIPELINE", knob)
        u = _universe(pos)
        p = PrincipalComponentAnalysis(
            u.atoms, verbose=False
        ).run()
        assert p._host_pipeline is (knob == "1")
        results[knob] = (
            p.results.variance, p.results.p_components
        )
    monkeypatch.delenv("MDTPU_HOST_PIPELINE")
    np.testing.assert_allclose(
        results["0"][0], results["1"][0], atol=1e-9
    )
    # compare only the leading (well-separated) components — the
    # trailing eigenvectors span a near-null space whose basis is
    # arbitrary between solvers
    np.testing.assert_allclose(
        results["0"][1][:, :2], results["1"][1][:, :2], atol=1e-6
    )


def _tica_oracle(pos, ref, w, lag, align=True, rcond=1e-8):
    """Direct f64 tICA: align, flatten, global mean/C0, pair-event
    C_tau (symmetrized), truncated-whitening generalized eigh."""

    from mdhelper_tpu.analysis.rmsd import (
        _davenport_k,
        _rotation_from_quaternion,
    )

    W = w.sum()
    ref_c = ref - (w[:, None] * ref).sum(0) / W
    X = []
    for p in pos:
        pc = p - (w[:, None] * p).sum(0) / W
        if align:
            c = (pc * w[:, None]).T @ ref_c
            _, vecs = np.linalg.eigh(_davenport_k(c))
            pc = pc @ _rotation_from_quaternion(vecs[:, -1]).T
        X.append(pc.reshape(-1))
    X = np.array(X)
    mean = X.mean(0)
    c0 = (X - mean).T @ (X - mean) / len(X)
    a, b = X[:-lag] - mean, X[lag:] - mean
    ctau = a.T @ b / len(a)
    ctau = (ctau + ctau.T) / 2
    vals0, vecs0 = np.linalg.eigh(c0)
    keep = vals0 > rcond * vals0[-1]
    whiten = vecs0[:, keep] / np.sqrt(vals0[keep])
    m = whiten.T @ ctau @ whiten
    lam, y = np.linalg.eigh((m + m.T) / 2)
    return X, mean, lam[::-1], whiten @ y[:, ::-1]


def test_tica_matches_oracle():
    from mdhelper_tpu.analysis.rmsd import TICA

    pos, base, _ = _make_traj(F=20, n=10, noise=0.5)
    u = _universe(pos, dt=2.0)
    t = TICA(u.atoms, reference=base, lag=3, verbose=False).run()
    w = np.ones(pos.shape[1])
    X, mean, lam, comps = _tica_oracle(pos, base, w, lag=3)
    assert t.results.rank == comps.shape[1]
    np.testing.assert_allclose(
        t.results.eigenvalues, lam, atol=1e-8
    )
    np.testing.assert_allclose(
        t.results.mean_positions.reshape(-1), mean, atol=1e-9
    )
    # Components against the oracle STATISTICS (vector comparison is
    # ill-posed where the eigenvalue spectrum is close): each class
    # component must be C0-normalized and reproduce its eigenvalue
    # through the oracle's symmetrized C_tau.
    Xc = X - mean
    c0_o = Xc.T @ Xc / len(X)
    a_o, b_o = Xc[:-3], Xc[3:]
    ctau_o = a_o.T @ b_o / len(a_o)
    ctau_o = (ctau_o + ctau_o.T) / 2
    U = t.results.tica_components
    np.testing.assert_allclose(
        np.einsum("ik,ij,jk->k", U, c0_o, U), 1.0, atol=1e-8
    )
    np.testing.assert_allclose(
        np.einsum("ik,ij,jk->k", U, ctau_o, U),
        t.results.eigenvalues, atol=1e-8,
    )
    # leading component vector where the eigengap is clear
    gaps = lam[0] - lam[1]
    if gaps > 1e-3:
        v, o = U[:, 0], comps[:, 0]
        assert min(np.abs(v - o).max(), np.abs(v + o).max()) < 1e-6
    # projections: unit variance in C0 metric, autocorrelation at
    # the lag equals the eigenvalue (the defining property)
    proj = t.transform()
    centered = proj - ((X - mean) @ t.results.tica_components).mean(0)
    np.testing.assert_allclose(
        proj, (X - mean) @ t.results.tica_components, atol=1e-8
    )
    c0_proj = proj.T @ proj / len(proj) - np.outer(
        proj.mean(0), proj.mean(0)
    )
    np.testing.assert_allclose(
        np.diag(c0_proj), 1.0, atol=1e-8
    )
    # timescales: -lag * dt / ln(lambda) where 0 < lambda < 1
    lag_time = 3 * 2.0
    lam_c = t.results.eigenvalues
    ok = (lam_c > 1e-3) & (lam_c < 1)  # noise-floor lam flips sign
    np.testing.assert_allclose(
        t.results.timescales[ok], -lag_time / np.log(lam_c[ok]),
        rtol=1e-10,
    )
    assert t.results.units["results.timescales"] is not None


def test_tica_slow_mode_identified():
    """A single slow OU coordinate among fast-noise coordinates is
    the leading component with the right implied timescale."""

    from mdhelper_tpu.analysis.rmsd import TICA

    local = np.random.default_rng(77)
    T, n = 4000, 4
    tau, dt_frame = 25.0, 1.0
    theta = dt_frame / tau
    slow = np.empty(T)
    slow[0] = 0.0
    for t in range(1, T):
        slow[t] = slow[t - 1] * (1 - theta) + np.sqrt(
            2 * theta
        ) * local.standard_normal()
    pos = local.standard_normal((T, n, 3)) * 0.05
    base = np.array(
        [[4.0, 0, 0], [-4.0, 0, 0], [0, 4.0, 0], [0, 0, 4.0]]
    )
    pos += base  # rigid scaffold so no alignment degeneracy
    pos[:, 0, 0] += 2.0 * slow  # slow collective coordinate
    u = _universe(pos, dt=dt_frame)
    t_ = TICA(
        u.atoms, reference=base, lag=5, align=False, verbose=False
    ).run()
    lam = t_.results.eigenvalues
    # leading eigenvalue ~ exp(-lag/tau), far above the noise modes
    assert abs(lam[0] - np.exp(-5 / tau)) < 0.1
    assert lam[0] > 3 * abs(lam[1])
    ts = t_.results.timescales[0]
    assert abs(ts - tau) / tau < 0.35, ts


def test_tica_chunked_ring_and_host_pipeline(monkeypatch):
    from mdhelper_tpu.analysis.rmsd import TICA

    pos, base, _ = _make_traj(F=14, n=8, noise=0.4)
    results = {}
    for knob in ("0", "1"):
        monkeypatch.setenv("MDTPU_HOST_PIPELINE", knob)
        u = _universe(pos)
        t = TICA(u.atoms, lag=2, verbose=False)
        if knob == "0":
            # tiny chunks: the lag ring must hand off across chunks
            t._chunk_bytes = 3 * pos.shape[1] * 3 * 8
        t.run()
        assert t._host_pipeline is (knob == "1")
        results[knob] = (
            t.results.eigenvalues, t.results.tica_components
        )
    monkeypatch.delenv("MDTPU_HOST_PIPELINE")
    np.testing.assert_allclose(
        results["0"][0], results["1"][0], atol=1e-8
    )
    # same retained subspace: projectors agree even where individual
    # eigenvectors rotate within near-degenerate clusters
    U0, U1 = results["0"][1], results["1"][1]
    lam = results["0"][0]
    w0 = U0 * lam  # weight columns by eigenvalue to damp the
    w1 = U1 * lam  # noise-floor modes before comparing projectors
    np.testing.assert_allclose(
        w0 @ U0.T, w1 @ U1.T, atol=1e-5
    )


def test_tica_validation():
    from mdhelper_tpu.analysis.rmsd import TICA

    pos, _, _ = _make_traj(F=5)
    u = _universe(pos)
    with pytest.raises(ValueError, match="positive"):
        TICA(u.atoms, lag=0, verbose=False)
    with pytest.raises(ValueError, match="below the analyzed"):
        TICA(u.atoms, lag=5, verbose=False).run()
    t = TICA(u.atoms, lag=1, verbose=False)
    with pytest.raises(RuntimeError, match="run"):
        t.transform()
