"""Tests for StructureFactor and IntermediateScatteringFunction
(parity: /root/reference/tests/test_analysis_structure.py:148-303,
which validated against the dynasor package; here the oracles are
direct-sum NumPy implementations)."""

import numpy as np
import pytest

from mdhelper_tpu.analysis.structure import (
    IntermediateScatteringFunction,
    StructureFactor,
    _wavevector_grid,
)
from mdhelper_tpu.core import Universe

rng = np.random.default_rng(21)

BOX = 8.0
T, NA, NB = 10, 30, 20
N = NA + NB


@pytest.fixture(scope="module")
def universe():
    positions = rng.random((T, N, 3)) * BOX
    return Universe.from_arrays(
        positions,
        np.array([BOX] * 3),
        types=np.array(["A"] * NA + ["B"] * NB, dtype=object),
        dt=2.0,
    )


def oracle_trig_sums(qs, pos):
    phases = qs @ pos.T
    return np.cos(phases).sum(1), np.sin(phases).sum(1)


def oracle_ssf(qs, traj):
    """S(q) = <|sum exp(iqr)|^2>/N."""

    out = np.zeros(len(qs))
    for pos in traj:
        c, s = oracle_trig_sums(qs, pos)
        out += c**2 + s**2
    return out / (len(traj) * traj.shape[1])


def test_wavevector_grid_cubic():
    qs = _wavevector_grid(np.array([BOX] * 3), 4)
    assert qs.shape == (64, 3)
    mags = 2 * np.pi * np.arange(4) / BOX
    assert np.allclose(sorted(set(qs[:, 0])), mags)
    # Surface points add n_surfaces * n_surface_points rows.
    qs_s = _wavevector_grid(np.array([BOX] * 3), 4, 2, 8)
    assert qs_s.shape == (64 + 16, 3)
    # Surface points sit on grid-magnitude spheres.
    extra = np.linalg.norm(qs_s[64:], axis=1)
    assert np.allclose(np.unique(extra.round(9)), mags[1:3])


def test_ssf_total(universe):
    sf = StructureFactor(
        universe.atoms, n_points=5, unique=False, sort=False,
        verbose=False,
    ).run()
    traj = universe.trajectory._positions
    qs = _wavevector_grid(np.array([BOX] * 3), 5)
    ref = oracle_ssf(qs, traj)
    assert np.allclose(sf.results.ssf[0], ref)
    # Sanity: S(q=0) = N.
    assert np.isclose(sf.results.ssf[0][0], N)


def test_ssf_unique_sort(universe):
    sf = StructureFactor(universe.atoms, n_points=5, verbose=False).run()
    qs = _wavevector_grid(np.array([BOX] * 3), 5)
    mags = np.linalg.norm(qs, axis=1)
    raw = oracle_ssf(qs, universe.trajectory._positions)
    uniq = np.unique(mags.round(11))
    ref = np.array(
        [raw[np.isclose(q, mags)].mean() for q in uniq]
    )
    order = np.argsort(uniq)
    assert np.allclose(sf.results.wavenumbers, uniq[order])
    assert np.allclose(sf.results.ssf[0], ref[order])


def test_ssf_partial_sums_to_total(universe):
    ag_a = universe.select_atoms("type A")
    ag_b = universe.select_atoms("type B")
    total = StructureFactor(universe.atoms, n_points=4,
                            verbose=False).run()
    partial = StructureFactor(
        [ag_a, ag_b], mode="partial", n_points=4, verbose=False
    ).run()
    assert partial.results.pairs == ((0, 0), (0, 1), (1, 1))
    assert partial.results.ssf.shape[0] == 3
    assert np.allclose(
        partial.results.ssf.sum(axis=0), total.results.ssf[0]
    )


def test_ssf_pair_mode(universe):
    ag_a = universe.select_atoms("type A")
    ag_b = universe.select_atoms("type B")
    pair = StructureFactor(
        [ag_a, ag_b], mode="pair", n_points=4, unique=False,
        sort=False, verbose=False,
    ).run()
    qs = _wavevector_grid(np.array([BOX] * 3), 4)
    traj = universe.trajectory._positions
    ref = np.zeros(len(qs))
    for pos in traj:
        ca, sa = oracle_trig_sums(qs, pos[:NA])
        cb, sb = oracle_trig_sums(qs, pos[NA:])
        ref += 2 * (ca * cb + sa * sb)
    ref /= T * N
    assert np.allclose(pair.results.ssf[0], ref)


def test_ssf_q_max_and_wavevectors(universe):
    sf = StructureFactor(
        universe.atoms, n_points=5, q_max=2.0, unique=False,
        sort=False, verbose=False,
    ).run()
    assert (np.linalg.norm(sf._wavevectors, axis=1) <= 2.0).all()
    custom = np.array([[0.5, 0, 0], [0, 0.5, 0.5]])
    sf2 = StructureFactor(
        universe.atoms, wavevectors=custom, unique=False, sort=False,
        verbose=False,
    ).run()
    assert sf2.results.ssf.shape == (1, 2)


def test_ssf_serial_parallel_equal(universe):
    serial = StructureFactor(
        universe.atoms, n_points=4, verbose=False, parallel=False
    ).run()
    parallel = StructureFactor(
        universe.atoms, n_points=4, verbose=False, parallel=True
    ).run()
    assert np.allclose(serial.results.ssf, parallel.results.ssf)


def test_ssf_exp_trig_equal(universe):
    exp = StructureFactor(
        universe.atoms, form="exp", n_points=4, verbose=False
    ).run()
    trig = StructureFactor(
        universe.atoms, form="trig", n_points=4, verbose=False
    ).run()
    assert np.allclose(exp.results.ssf, trig.results.ssf)


def test_ssf_validation(universe):
    ag_a = universe.select_atoms("type A")
    with pytest.raises(ValueError):
        StructureFactor(ag_a, verbose=False)  # not all atoms, mode=None
    with pytest.raises(ValueError):
        StructureFactor(universe.atoms, groupings="invalid",
                        verbose=False)
    with pytest.raises(ValueError):
        StructureFactor(universe.atoms, form="bad", verbose=False)
    with pytest.raises(ValueError):
        StructureFactor(
            [ag_a] * 3, mode="pair", verbose=False
        )


def oracle_isf(qs, traj, n_lags):
    """Coherent F(q, t) by direct sliding-window sums."""

    n_frames, n_particles = traj.shape[:2]
    sums = [oracle_trig_sums(qs, pos) for pos in traj]
    out = np.zeros((n_lags, len(qs)))
    for lag in range(n_lags):
        for t0 in range(n_frames - lag):
            c0, s0 = sums[t0]
            c1, s1 = sums[t0 + lag]
            out[lag] += c0 * c1 + s0 * s1
        out[lag] /= (n_frames - lag) * n_particles
    return out


def oracle_iisf(qs, traj, n_lags):
    """Incoherent F_s(q, t) by direct sums."""

    n_frames, n_particles = traj.shape[:2]
    out = np.zeros((n_lags, len(qs)))
    for lag in range(n_lags):
        for t0 in range(n_frames - lag):
            delta = traj[t0 + lag] - traj[t0]
            out[lag] += np.cos(qs @ delta.T).sum(1)
        out[lag] /= (n_frames - lag) * n_particles
    return out


def test_isf_coherent(universe):
    isf = IntermediateScatteringFunction(
        universe.atoms, n_points=4, unique=False, sort=False,
        verbose=False,
    ).run()
    qs = _wavevector_grid(np.array([BOX] * 3), 4)
    ref = oracle_isf(qs, universe.trajectory._positions, T)
    assert np.allclose(isf.results.cisf[:, 0, :], ref)
    assert np.allclose(isf.results.times, 2.0 * np.arange(T))


def test_isf_zero_lag_equals_ssf(universe):
    isf = IntermediateScatteringFunction(
        universe.atoms, n_points=4, verbose=False
    ).run()
    sf = StructureFactor(universe.atoms, n_points=4,
                         verbose=False).run()
    assert np.allclose(isf.results.cisf[0, 0], sf.results.ssf[0])


def test_isf_incoherent(universe):
    isf = IntermediateScatteringFunction(
        universe.atoms, n_points=3, unique=False, sort=False,
        n_lags=5, incoherent=True, verbose=False,
    ).run()
    qs = _wavevector_grid(np.array([BOX] * 3), 3)
    ref = oracle_iisf(qs, universe.trajectory._positions, 5)
    assert np.allclose(isf.results.iisf[:, 0, :], ref)
    # F_s(q=0, t) = 1 for all t.
    assert np.allclose(isf.results.iisf[:, 0, 0], 1.0)


def test_isf_partial(universe):
    ag_a = universe.select_atoms("type A")
    ag_b = universe.select_atoms("type B")
    isf = IntermediateScatteringFunction(
        [ag_a, ag_b], mode="partial", n_points=3, n_lags=4,
        verbose=False,
    ).run()
    total = IntermediateScatteringFunction(
        universe.atoms, n_points=3, n_lags=4, verbose=False
    ).run()
    assert np.allclose(
        isf.results.cisf.sum(axis=1), total.results.cisf[:, 0, :]
    )


def test_isf_chunked_ring_buffer(universe):
    """Ring-buffer carry must hand off correctly across host chunks."""

    isf_full = IntermediateScatteringFunction(
        universe.atoms, n_points=3, n_lags=4, unique=False, sort=False,
        verbose=False,
    )
    isf_full.run()
    isf_chunked = IntermediateScatteringFunction(
        universe.atoms, n_points=3, n_lags=4, unique=False, sort=False,
        verbose=False,
    )
    # Force tiny chunks (3 frames per device batch).
    isf_chunked._chunk_bytes = 3 * N * 3 * 8
    isf_chunked.run()
    assert np.allclose(
        isf_full.results.cisf, isf_chunked.results.cisf
    )


def test_isf_uneven_frames_error(universe):
    isf = IntermediateScatteringFunction(
        universe.atoms, n_points=3, verbose=False
    )
    with pytest.raises(ValueError):
        isf.run(frames=[0, 1, 5])


def test_ssf_factor_split_with_surfaces(universe):
    """Mixed wavevector sets (lattice grid + sphere-surface extras)
    split: the grid subset rides the factorized kernel, the extras the
    direct sweep, and the recombined S(q) matches the direct oracle in
    the caller's ordering."""

    sf = StructureFactor(
        universe.atoms, n_points=5, n_surfaces=2, n_surface_points=8,
        unique=False, sort=False, method="factor", verbose=False,
    )
    sf.run()
    assert sf._factor is not None
    assert sf._factor_split is not None
    qs = _wavevector_grid(np.array([BOX] * 3), 5, 2, 8)
    ref = oracle_ssf(qs, universe.trajectory._positions)
    np.testing.assert_allclose(sf.results.ssf[0], ref, rtol=5e-5)


def test_isf_time_fft_matches_ring(universe):
    """The coherent-only default (Wiener-Khinchin time FFT over the
    stored rho(q, t) series) reproduces the reference-parity lag ring
    buffer exactly — same triangular-normalized estimator — across
    total/partial/pair modes, n_lags truncation and raw output."""

    for kwargs in (
        dict(),
        dict(n_lags=4),
        dict(sort=False, unique=False),
    ):
        ring = IntermediateScatteringFunction(
            universe.atoms, n_points=3, fft=False, verbose=False,
            **kwargs,
        ).run()
        fft = IntermediateScatteringFunction(
            universe.atoms, n_points=3, verbose=False, **kwargs
        ).run()
        assert fft._time_fft and not ring._time_fft
        np.testing.assert_allclose(
            ring.results.cisf, fft.results.cisf, rtol=1e-9, atol=1e-9
        )

    a, b = universe.atoms[:20], universe.atoms[20:]
    for mode in ("partial", "pair"):
        ring = IntermediateScatteringFunction(
            [a, b], mode=mode, n_points=3, fft=False, verbose=False
        ).run()
        fft = IntermediateScatteringFunction(
            [a, b], mode=mode, n_points=3, verbose=False
        ).run()
        np.testing.assert_allclose(
            ring.results.cisf, fft.results.cisf, rtol=1e-9, atol=1e-9
        )


def test_isf_time_fft_parallel(universe):
    """The FFT path lifts the sequential constraint: frame-sharded
    execution matches the serial ring."""

    ring = IntermediateScatteringFunction(
        universe.atoms, n_points=3, fft=False, verbose=False
    ).run()
    par = IntermediateScatteringFunction(
        universe.atoms, n_points=3, parallel=True, verbose=False
    ).run()
    np.testing.assert_allclose(
        ring.results.cisf, par.results.cisf, rtol=1e-9, atol=1e-9
    )


def test_isf_fft_incoherent_rejected(universe):
    with pytest.raises(ValueError, match="incoherent"):
        IntermediateScatteringFunction(
            universe.atoms, n_points=3, incoherent=True, fft=True,
            verbose=False,
        )


def test_isf_lag_subset(universe):
    """Explicit and log-spaced lag subsets reproduce the full-grid
    values at the selected lags (ring and time-FFT estimators), and
    the incoherent sweep count drops with the subset."""

    full = IntermediateScatteringFunction(
        universe.atoms, n_points=3, n_lags=8, unique=False, sort=False,
        incoherent=True, verbose=False,
    ).run()

    subset = [0, 2, 5, 7]
    sub = IntermediateScatteringFunction(
        universe.atoms, n_points=3, n_lags=8, lags=subset,
        unique=False, sort=False, incoherent=True, verbose=False,
    ).run()
    assert sub._lags == len(subset)
    np.testing.assert_allclose(
        sub.results.times, 2.0 * np.asarray(subset)
    )
    np.testing.assert_allclose(
        sub.results.cisf, full.results.cisf[subset]
    )
    np.testing.assert_allclose(
        sub.results.iisf, full.results.iisf[subset]
    )

    # Without n_lags the ring shrinks to max(lags) + 1.
    auto = IntermediateScatteringFunction(
        universe.atoms, n_points=3, lags=[1, 6], unique=False,
        sort=False, fft=False, verbose=False,
    ).run()
    np.testing.assert_allclose(
        auto.results.cisf, full.results.cisf[[1, 6]]
    )


def test_isf_lags_log(universe):
    """The "log" grid keeps every short lag, includes the longest,
    and matches the dense run at its selected lags on both
    estimators."""

    dense = IntermediateScatteringFunction(
        universe.atoms, n_points=3, fft=False, unique=False,
        sort=False, verbose=False,
    ).run()
    ring = IntermediateScatteringFunction(
        universe.atoms, n_points=3, lags="log", fft=False,
        unique=False, sort=False, verbose=False,
    ).run()
    lag_values = ring._lag_values
    assert lag_values[0] == 0 and lag_values[-1] == T - 1
    np.testing.assert_allclose(
        ring.results.cisf, dense.results.cisf[lag_values]
    )
    fft = IntermediateScatteringFunction(
        universe.atoms, n_points=3, lags="log", unique=False,
        sort=False, verbose=False,
    ).run()
    assert fft._time_fft
    np.testing.assert_allclose(
        fft.results.cisf, ring.results.cisf, rtol=1e-9, atol=1e-9
    )


def test_isf_lags_validation(universe):
    with pytest.raises(ValueError, match="[Ii]nvalid lags"):
        IntermediateScatteringFunction(
            universe.atoms, n_points=3, lags="geometric",
            verbose=False,
        ).run()
    with pytest.raises(ValueError, match="non-negative"):
        IntermediateScatteringFunction(
            universe.atoms, n_points=3, lags=[-1, 2], verbose=False
        ).run()
    with pytest.raises(ValueError, match="below n_lags"):
        IntermediateScatteringFunction(
            universe.atoms, n_points=3, n_lags=4, lags=[9],
            verbose=False,
        ).run()


def test_isf_lags_out_of_range_rejected(universe):
    """Explicit lags beyond n_lags must raise, not silently drop."""

    with pytest.raises(ValueError, match="not below n_lags"):
        IntermediateScatteringFunction(
            universe.atoms, n_points=3, n_lags=8, lags=[0, 2, 100],
            verbose=False,
        ).run()


def test_weighted_partial_recombination():
    """Neutron-style weighting: partial rows recombine to the direct
    weighted trig-sum oracle; unit weights + normalization='none'
    reproduce the unweighted total."""

    from mdhelper_tpu.analysis.structure import StructureFactor
    from mdhelper_tpu.core.universe import Universe

    local = np.random.default_rng(43)
    box, T, n = 9.0, 3, 36
    pos = local.random((T, n, 3)) * box
    u = Universe.from_arrays(
        pos, np.array([box] * 3),
        types=np.array(["A", "B"] * (n // 2), dtype=object),
    )
    ga, gb = u.select_atoms("type A"), u.select_atoms("type B")

    partial = StructureFactor(
        [ga, gb], mode="partial", n_points=3, sort=True,
        unique=True, verbose=False,
    ).run()
    total = StructureFactor(
        [ga, gb], n_points=3, sort=True, unique=True,
        verbose=False,
    ).run()

    unit = partial.calculate_weighted_sum(
        [1.0, 1.0], normalization="none"
    )
    np.testing.assert_allclose(
        unit, total.results.ssf[0], rtol=1e-8
    )

    # direct oracle with weights b = (2.0, -0.5)
    b = np.array([2.0, -0.5])
    qs = (
        2 * np.pi / box
        * np.stack(
            np.meshgrid(*[np.arange(3)] * 3), -1
        ).reshape(-1, 3)
    )  # q = 0 kept: the class grid retains it (reference parity)
    weights_atom = np.where(
        np.isin(np.arange(n), ga.ix), b[0], b[1]
    )
    per_q = np.zeros(len(qs))
    for f in range(T):
        phases = qs @ pos[f].T
        cos = (np.cos(phases) * weights_atom).sum(axis=1)
        sin = (np.sin(phases) * weights_atom).sum(axis=1)
        per_q += cos**2 + sin**2
    per_q /= T * n
    # canonical |q| grouping (matches unique=True, sort=True)
    wavenumbers = np.round(np.linalg.norm(qs, axis=1), 9)
    uniq, inverse = np.unique(wavenumbers, return_inverse=True)
    oracle = np.zeros(len(uniq))
    np.add.at(oracle, inverse, per_q)
    oracle /= np.bincount(inverse)
    x = np.array([ga.n_atoms, gb.n_atoms]) / n
    norm = (x * b**2).sum()
    got = partial.calculate_weighted_sum(b)
    np.testing.assert_allclose(
        partial.results.wavenumbers, uniq, rtol=1e-6
    )
    np.testing.assert_allclose(got, oracle / norm, rtol=1e-6)

    with pytest.raises(ValueError):
        total.calculate_weighted_sum([1.0])
    with pytest.raises(ValueError):
        partial.calculate_weighted_sum([1.0, 1.0, 1.0])
    with pytest.raises(ValueError):
        partial.calculate_weighted_sum([1.0, 1.0],
                                       normalization="zz")


def test_weighted_sum_com_grouping_normalization():
    """With COM groupings the normalization uses scattering-ENTITY
    counts, not atom counts (regression: atom counts skewed the
    fractions)."""

    from mdhelper_tpu.analysis.structure import StructureFactor
    from mdhelper_tpu.core.universe import Universe

    local = np.random.default_rng(47)
    box = 8.0
    # group A: 4 residues x 3 atoms; group B: 6 single-atom residues
    nA, nB = 12, 6
    pos = local.random((2, nA + nB, 3)) * box
    u = Universe.from_arrays(
        pos, np.array([box] * 3),
        types=np.array(["A"] * nA + ["B"] * nB, dtype=object),
        masses=np.ones(nA + nB),
        resindices=np.concatenate(
            [np.repeat(np.arange(4), 3), 4 + np.arange(6)]
        ),
    )
    sf = StructureFactor(
        [u.select_atoms("type A"), u.select_atoms("type B")],
        groupings=["residues", "atoms"], mode="partial",
        n_points=2, sort=True, unique=True, verbose=False,
    ).run()
    b = np.array([2.0, -0.5])
    got = sf.calculate_weighted_sum(b)
    # entity fractions: 4 residue COMs + 6 atoms
    x = np.array([4, 6]) / 10
    norm = (x * b**2).sum()
    raw = sf.calculate_weighted_sum(b, normalization="none")
    np.testing.assert_allclose(got, raw / norm, rtol=1e-12)
    assert abs(norm - 1.75) < 1e-12  # NOT the atom-count 2.75


def test_weighted_sum_q_dependent_form_factors():
    """(G, n_q) weights: a q-dependent f(q) equals per-q scalar
    recombination."""

    from mdhelper_tpu.analysis.structure import StructureFactor
    from mdhelper_tpu.core.universe import Universe

    local = np.random.default_rng(51)
    box, n = 8.0, 20
    pos = local.random((2, n, 3)) * box
    u = Universe.from_arrays(
        pos, np.array([box] * 3),
        types=np.array(["A", "B"] * (n // 2), dtype=object),
    )
    sf = StructureFactor(
        [u.select_atoms("type A"), u.select_atoms("type B")],
        mode="partial", n_points=2, sort=True, unique=True,
        verbose=False,
    ).run()
    q = sf.results.wavenumbers
    fq = np.stack(
        [2.0 * np.exp(-0.1 * q**2), 1.0 + 0.2 * q]
    )  # (2, n_q)
    got = sf.calculate_weighted_sum(fq)
    # oracle: per-q scalar recombination
    for i in (0, len(q) // 2, len(q) - 1):
        single = StructureFactor(
            [u.select_atoms("type A"), u.select_atoms("type B")],
            mode="partial", n_points=2, sort=True, unique=True,
            verbose=False,
        )
        single.results = sf.results
        per_q = single.calculate_weighted_sum(fq[:, i])
        np.testing.assert_allclose(got[i], per_q[i], rtol=1e-12)
    with pytest.raises(ValueError, match="shape"):
        sf.calculate_weighted_sum(np.ones((2, 3)))


def test_dynamic_structure_factor(universe):
    """S(q, w): the rfft evaluation matches a dense trapezoid cosine
    transform exactly; the w=0 row is the trapezoid integral of F;
    a Debye decay transforms to the expected Lorentzian."""

    isf = IntermediateScatteringFunction(
        universe.atoms, n_points=3, unique=False, sort=False,
        incoherent=True, verbose=False,
    ).run()
    times = np.asarray(isf.results.times)
    dt = times[1] - times[0]
    tau = 4.0
    shape_c = isf.results.cisf.shape
    decay = np.exp(-times / tau)
    isf.results.cisf = decay[:, None, None] * np.ones(shape_c)
    isf.results.iisf = (
        decay[:, None, None] * np.ones(isf.results.iisf.shape)
    )
    isf.calculate_dynamic_structure_factor()
    w = isf.results.angular_frequencies
    assert np.allclose(w, 2 * np.pi * np.fft.rfftfreq(len(times), dt))

    # dense-matrix trapezoid cosine-transform oracle
    weights = np.ones(len(times))
    weights[0] = weights[-1] = 0.5
    oracle = (dt / np.pi) * np.einsum(
        "k,jk->j", weights * decay, np.cos(np.outer(w, times))
    )
    np.testing.assert_allclose(
        isf.results.dsf[:, 0, 0], oracle, rtol=1e-12, atol=1e-15
    )
    np.testing.assert_allclose(
        isf.results.idsf[:, 0, 0], oracle, rtol=1e-12, atol=1e-15
    )
    # w = 0: (1/pi) * trapezoid integral of F
    np.testing.assert_allclose(
        isf.results.dsf[0, 0, 0],
        np.trapz(decay, times) / np.pi,
        rtol=1e-12,
    )
    assert "results.dsf" in isf.results.units
    assert "results.angular_frequencies" in isf.results.units

    # Debye decay -> Lorentzian (tau/pi)/(1 + (w tau)^2), to
    # quadrature accuracy of the short truncated window
    lorentz = (tau / np.pi) / (1 + (w * tau) ** 2)
    assert abs(isf.results.dsf[0, 0, 0] - lorentz[0]) / lorentz[0] < 0.35

    # half-Hann taper applies before the transform
    isf.calculate_dynamic_structure_factor(window="hann")
    k = np.arange(len(times))
    hann = 0.5 * (1 + np.cos(np.pi * k / (len(times) - 1)))
    oracle_h = (dt / np.pi) * np.einsum(
        "k,jk->j", weights * hann * decay,
        np.cos(np.outer(w, times)),
    )
    np.testing.assert_allclose(
        isf.results.dsf[:, 0, 0], oracle_h, rtol=1e-12, atol=1e-15
    )

    # t_max truncation shortens the frequency grid
    isf.calculate_dynamic_structure_factor(t_max=times[5])
    assert len(isf.results.angular_frequencies) == 6 // 2 + 1

    with pytest.raises(ValueError, match="window"):
        isf.calculate_dynamic_structure_factor(window="hamming")


def test_dynamic_structure_factor_validation(universe):
    isf = IntermediateScatteringFunction(
        universe.atoms, n_points=3, verbose=False
    )
    with pytest.raises(RuntimeError, match="run"):
        isf.calculate_dynamic_structure_factor()
    logged = IntermediateScatteringFunction(
        universe.atoms, n_points=3, lags=[0, 1, 3, 7],
        fft=False, verbose=False,
    ).run()
    with pytest.raises(ValueError, match="evenly spaced"):
        logged.calculate_dynamic_structure_factor()


def test_charge_structure_factor():
    """S_ZZ(q) equals the charge-weighted recombination and the
    direct charge-weighted trig-sum oracle; the weighted_ssf scratch
    key is not left behind."""

    from mdhelper_tpu.analysis.structure import StructureFactor
    from mdhelper_tpu.core.universe import Universe

    local = np.random.default_rng(53)
    box, T, n = 9.0, 3, 36
    pos = local.random((T, n, 3)) * box
    u = Universe.from_arrays(
        pos, np.array([box] * 3),
        types=np.array(["A", "B"] * (n // 2), dtype=object),
        charges=np.tile([1.0, -1.0], n // 2),
    )
    ga, gb = u.select_atoms("type A"), u.select_atoms("type B")
    partial = StructureFactor(
        [ga, gb], mode="partial", n_points=3, sort=True,
        unique=True, verbose=False,
    ).run()

    szz = partial.calculate_charge_structure_factor()
    # the recombination must not touch the weighted-sum key...
    assert "weighted_ssf" not in partial.results
    ref = partial.calculate_weighted_sum(
        [1.0, -1.0], normalization="none"
    )
    np.testing.assert_allclose(szz, ref, rtol=1e-12)
    # ...nor clobber one a user stored explicitly
    partial.calculate_charge_structure_factor()
    np.testing.assert_allclose(
        partial.results.weighted_ssf, ref, rtol=1e-12
    )

    # direct oracle: charge-weighted trig sums
    qs = (
        2 * np.pi / box
        * np.stack(
            np.meshgrid(*[np.arange(3)] * 3), -1
        ).reshape(-1, 3)
    )
    z_atom = np.where(np.isin(np.arange(n), ga.ix), 1.0, -1.0)
    per_q = np.zeros(len(qs))
    for f in range(T):
        phases = qs @ pos[f].T
        cos = (np.cos(phases) * z_atom).sum(axis=1)
        sin = (np.sin(phases) * z_atom).sum(axis=1)
        per_q += cos**2 + sin**2
    per_q /= T * n
    wavenumbers = np.round(np.linalg.norm(qs, axis=1), 9)
    uniq, inverse = np.unique(wavenumbers, return_inverse=True)
    oracle = np.zeros(len(uniq))
    np.add.at(oracle, inverse, per_q)
    oracle /= np.bincount(inverse)
    np.testing.assert_allclose(szz, oracle, rtol=1e-6)

    # non-uniform group charges must raise with the explicit hint
    u2 = Universe.from_arrays(
        pos, np.array([box] * 3),
        types=np.array(["A", "B"] * (n // 2), dtype=object),
        charges=local.normal(size=n),
    )
    p2 = StructureFactor(
        [u2.select_atoms("type A"), u2.select_atoms("type B")],
        mode="partial", n_points=3, verbose=False,
    ).run()
    with pytest.warns(UserWarning):
        with pytest.raises(ValueError, match="charges="):
            p2.calculate_charge_structure_factor()
    # ...and explicit charges fix it
    p2.calculate_charge_structure_factor([1.0, -1.0])


def test_screening_length_fit():
    """The Debye-form fit recovers a synthetic kappa on the class's
    own wavenumber grid."""

    from mdhelper_tpu.analysis.structure import StructureFactor
    from mdhelper_tpu.core.universe import Universe

    local = np.random.default_rng(59)
    box, n = 9.0, 24
    pos = local.random((2, n, 3)) * box
    u = Universe.from_arrays(
        pos, np.array([box] * 3),
        types=np.array(["A", "B"] * (n // 2), dtype=object),
        charges=np.tile([1.0, -1.0], n // 2),
    )
    partial = StructureFactor(
        [u.select_atoms("type A"), u.select_atoms("type B")],
        mode="partial", n_points=4, sort=True, unique=True,
        verbose=False,
    ).run()
    q = partial.results.wavenumbers
    a_true, kappa_true = 1.0, 0.7
    partial.results.charge_ssf = (
        a_true * q**2 / (q**2 + kappa_true**2)
    )
    lam = partial.calculate_screening_length(q_max=float(q.max()))
    assert lam == pytest.approx(1.0 / kappa_true, rel=1e-6)
    a_fit, kappa_fit = partial.results.charge_ssf_fit
    assert a_fit == pytest.approx(a_true, rel=1e-6)
    # fit window stored alongside the curve, aligned
    assert (
        partial.results.charge_ssf_fit_q.shape
        == partial.results.charge_ssf_fit_curve.shape
    )
    assert partial.results.units[
        "results.screening_length"
    ].dimensionality
    with pytest.raises(ValueError, match="increase.*q_max"):
        partial.calculate_screening_length(q_max=1e-9)
    # a flat S_ZZ (no screening resolved) raises instead of
    # returning an infinite length
    partial.results.charge_ssf = np.ones_like(q)
    with pytest.raises(ValueError, match="kappa -> 0"):
        partial.calculate_screening_length(q_max=float(q.max()))
