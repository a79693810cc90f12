"""Free-energy estimators (FEP/BAR/MBAR/WHAM + umbrella sampling)
against analytic Gaussian/harmonic oracles.

The fixtures are exactly samplable: a Gaussian state with reduced
potential u_k(x) = a_k (x - mu_k)^2 has Z_k = sqrt(pi / a_k), so
f_k = 0.5 ln(a_k / pi) analytically, and a harmonic potential under a
harmonic bias stays Gaussian — no MD required, no estimator-vs-
estimator circularity.
"""

import numpy as np
import pytest

from mdhelper_tpu.analysis.free_energy import (
    UmbrellaSampling,
    bar,
    fep,
    harmonic_bin_bias,
    mbar,
    wham,
)

RNG = np.random.default_rng(2024)


def _gaussian_state_samples(a, mu, n, rng):
    """Samples from p(x) ~ exp(-a (x - mu)^2)."""

    return rng.normal(mu, np.sqrt(0.5 / a), size=n)


def _u(a, mu, x):
    return a * (x - mu) ** 2


def test_fep_and_bar_two_gaussians():
    # f_k = 0.5 ln(a_k / pi): delta_f = 0.5 ln(a1 / a0) = ln 2.
    a0, mu0, a1, mu1 = 0.5, 0.0, 2.0, 0.4
    delta_exact = 0.5 * np.log(a1 / a0)
    rng = np.random.default_rng(7)
    x0 = _gaussian_state_samples(a0, mu0, 40_000, rng)
    x1 = _gaussian_state_samples(a1, mu1, 40_000, rng)

    w_f = _u(a1, mu1, x0) - _u(a0, mu0, x0)
    w_r = _u(a0, mu0, x1) - _u(a1, mu1, x1)

    assert fep(w_f) == pytest.approx(delta_exact, abs=0.05)
    # The reverse direction (narrow state -> broad state) carries the
    # classic one-sided FEP bias — samples from the narrow state never
    # visit the broad tails — so it only converges loosely; BAR fixes
    # exactly this.
    assert -fep(w_r) == pytest.approx(delta_exact, abs=0.12)
    # BAR pools both directions and is much tighter.
    assert bar(w_f, w_r) == pytest.approx(delta_exact, abs=0.01)


def test_bar_requires_both_directions():
    with pytest.raises(ValueError, match="forward and reverse"):
        bar([1.0, 2.0], [])


def test_mbar_matches_analytic_gaussian_ladder():
    a_k = np.array([0.5, 1.0, 2.0, 4.0])
    mu_k = np.array([0.0, 0.3, 0.5, 0.6])
    f_exact = 0.5 * np.log(a_k / np.pi)
    f_exact = f_exact - f_exact[0]

    rng = np.random.default_rng(11)
    n_k = np.array([8000, 8000, 8000, 8000])
    x_n = np.concatenate(
        [
            _gaussian_state_samples(a, mu, n, rng)
            for a, mu, n in zip(a_k, mu_k, n_k)
        ]
    )
    u_kn = np.stack([_u(a, mu, x_n) for a, mu in zip(a_k, mu_k)])

    out = mbar(u_kn, n_k)
    assert out.converged
    np.testing.assert_allclose(
        out.free_energies, f_exact, atol=0.03
    )
    # Uncertainties: positive for k > 0, zero for the anchor, and the
    # estimate should sit within ~5 sigma of truth.
    assert out.uncertainties[0] == pytest.approx(0.0, abs=1e-12)
    assert (out.uncertainties[1:] > 0).all()
    err = np.abs(out.free_energies - f_exact)[1:]
    assert (err < 5 * out.uncertainties[1:] + 0.02).all()


def test_mbar_unsampled_state_and_k2_vs_bar():
    a_k = np.array([0.5, 2.0, 1.0])
    mu_k = np.array([0.0, 0.4, 0.2])
    f_exact = 0.5 * np.log(a_k / np.pi)
    f_exact = f_exact - f_exact[0]

    rng = np.random.default_rng(3)
    n_k = np.array([30_000, 30_000, 0])  # state 2 never sampled
    x_n = np.concatenate(
        [
            _gaussian_state_samples(a_k[0], mu_k[0], n_k[0], rng),
            _gaussian_state_samples(a_k[1], mu_k[1], n_k[1], rng),
        ]
    )
    u_kn = np.stack([_u(a, mu, x_n) for a, mu in zip(a_k, mu_k)])

    out = mbar(u_kn, n_k, uncertainties=False)
    np.testing.assert_allclose(
        out.free_energies, f_exact, atol=0.03
    )

    # K = 2 MBAR solves the same implicit equation as BAR.
    w_f = u_kn[1, : n_k[0]] - u_kn[0, : n_k[0]]
    w_r = u_kn[0, n_k[0]:] - u_kn[1, n_k[0]:]
    assert out.free_energies[1] == pytest.approx(
        bar(w_f, w_r), abs=1e-6
    )


def test_mbar_input_validation():
    with pytest.raises(ValueError, match=r"\(K, N\)"):
        mbar(np.zeros((2, 10)), [2, 4, 4])
    with pytest.raises(ValueError, match="sum"):
        mbar(np.zeros((2, 10)), [4, 4])
    with pytest.raises(ValueError, match="sampled state"):
        mbar(np.zeros((2, 0)), [0, 0])


def _harmonic_umbrella_windows(a, centers, kappa, n, rng):
    """Exact samples from U0 = 0.5 a x^2 under biases
    0.5 kappa (x - c)^2: Gaussian, precision a + kappa, mean
    kappa c / (a + kappa)."""

    prec = a + kappa
    return [
        rng.normal(kappa * c / prec, np.sqrt(1.0 / prec), size=n)
        for c in centers
    ]


def test_wham_recovers_harmonic_pmf():
    a, kappa = 1.2, 12.0
    centers = np.linspace(-2.0, 2.0, 11)
    rng = np.random.default_rng(5)
    series = _harmonic_umbrella_windows(a, centers, kappa, 20_000, rng)

    # harmonic_bin_bias removes the bin-center discretization bias
    # (exact-counts residual < 0.01 kT at this geometry); what remains
    # below is sampling noise, ~1/sqrt(bin counts).
    n_bins = 96
    edges = np.linspace(-2.4, 2.4, n_bins + 1)
    mids = 0.5 * (edges[:-1] + edges[1:])
    counts = np.stack(
        [np.histogram(s, bins=edges)[0] for s in series]
    ).astype(float)
    bias = harmonic_bin_bias(edges, centers, kappa)

    out = wham(counts, bias)
    assert out.converged
    pmf_exact = 0.5 * a * mids**2
    pmf_exact -= pmf_exact.min()
    # Compare well inside the window coverage: the outermost bins sit
    # > 1.5 sigma beyond the last biased mean, where the statistical
    # error (1/sqrt(counts)) dominates.
    ok = (counts.sum(axis=0) > 400) & (np.abs(mids) < 1.9)
    assert ok.sum() > 50
    np.testing.assert_allclose(
        out.pmf[ok], pmf_exact[ok], atol=0.12
    )


def test_mbar_unsampled_anchor_gauge_consistency():
    """Anchoring at an UNSAMPLED state 0 must shift f_k and d_n
    together: uncertainties and log-denominators are gauge-invariant
    under state relabeling (review regression)."""

    a_k = np.array([1.0, 0.5, 2.0])
    mu_k = np.array([0.2, 0.0, 0.4])
    rng = np.random.default_rng(17)
    n0 = 15_000
    x_n = np.concatenate(
        [
            _gaussian_state_samples(a_k[1], mu_k[1], n0, rng),
            _gaussian_state_samples(a_k[2], mu_k[2], n0, rng),
        ]
    )
    u_kn = np.stack([_u(a, mu, x_n) for a, mu in zip(a_k, mu_k)])

    # State 0 unsampled; states (1, 2) sampled.
    out_a = mbar(u_kn, [0, n0, n0])
    # Relabeled: same data with the sampled state first.
    out_b = mbar(u_kn[[1, 2, 0]], [n0, n0, 0])

    # Pairwise free energies and uncertainties between the SAME
    # physical states must agree across labelings.
    d_f_12_a = out_a.free_energies[2] - out_a.free_energies[1]
    d_f_12_b = out_b.free_energies[1] - out_b.free_energies[0]
    assert d_f_12_a == pytest.approx(d_f_12_b, abs=1e-9)
    unc_a = np.sqrt(
        out_a.covariance[1, 1]
        + out_a.covariance[2, 2]
        - 2 * out_a.covariance[1, 2]
    )
    unc_b = out_b.uncertainties[1]
    assert unc_a == pytest.approx(unc_b, rel=1e-6)

    # Gauge consistency: the weight columns built from the RETURNED
    # (f_k, d_n) pair column-sum to 1 for sampled states.
    w_cols = np.exp(
        out_a.free_energies[:, None] - u_kn - out_a.log_denominators
    ).sum(axis=1)
    np.testing.assert_allclose(w_cols, 1.0, rtol=1e-6)


def test_wham_fractional_counts_and_inactive_windows():
    """Weighted (fractional) histogram totals below 1 must enter the
    equations unclamped, and zero-sample windows get NaN free
    energies without warnings (review regressions)."""

    counts = np.array([[0.25, 3.0, 2.0], [0.25, 2.0, 1.0]])
    out = wham(counts, np.zeros((2, 3)))
    # Zero bias: probabilities are just normalized totals.
    np.testing.assert_allclose(
        out.probabilities, counts.sum(axis=0) / counts.sum()
    )
    assert out.probabilities[0] == pytest.approx(0.5 / 8.5)

    counts = np.array([[5.0, 3.0, 0.0], [0.0, 0.0, 0.0]])
    with np.errstate(all="raise"):
        out = wham(counts, np.zeros((2, 3)))
    assert np.isnan(out.free_energies[1])
    assert out.free_energies[0] == 0.0

    with pytest.raises(ValueError, match="bin is empty"):
        wham(np.zeros((2, 3)), np.zeros((2, 3)))


def test_umbrella_sampling_empty_range_and_negative_springs():
    rng = np.random.default_rng(1)
    series = _harmonic_umbrella_windows(
        1.0, np.array([-0.5, 0.5]), 8.0, 200, rng
    )
    with pytest.raises(ValueError, match="non-negative"):
        UmbrellaSampling(
            series, [-0.5, 0.5], -8.0, temperature=1.0, reduced=True
        )
    for method in ("mbar", "wham"):
        us = UmbrellaSampling(
            series, [-0.5, 0.5], 8.0, temperature=1.0, reduced=True,
            method=method,
        )
        with pytest.raises(ValueError, match="No samples"):
            us.run(n_bins=8, range=(50.0, 60.0))


def test_umbrella_sampling_save_keeps_metadata(tmp_path):
    rng = np.random.default_rng(2)
    us = UmbrellaSampling(
        _harmonic_umbrella_windows(
            1.0, np.array([-0.5, 0.5]), 8.0, 500, rng
        ),
        [-0.5, 0.5], 8.0, temperature=1.0, reduced=True,
    ).run(n_bins=8)
    out = tmp_path / "pmf_meta.npz"
    us.save(out)
    data = np.load(out, allow_pickle=True)
    np.testing.assert_allclose(data["pmf"], us.results.pmf)
    assert bool(data["converged"])
    assert "units" in data.files


def test_harmonic_bin_bias_matches_quadrature():
    """The erf-integral bin averages match brute-force quadrature of
    exp(-beta W) over each bin, far into the wings."""

    edges = np.linspace(-3.0, 3.0, 25)
    centers = np.array([-2.0, 0.5, 10.0])  # last one: deep wing
    bk = np.array([8.0, 25.0, 2.0])
    out = harmonic_bin_bias(edges, centers, bk)

    for k in range(centers.size):
        for b in range(edges.size - 1):
            x = np.linspace(edges[b], edges[b + 1], 2001)
            avg = np.trapezoid(
                np.exp(
                    -0.5 * bk[k] * (x - centers[k]) ** 2
                    + 0.5 * bk[k] * (edges[b] - centers[k]) ** 2
                ),
                x,
            ) / (edges[b + 1] - edges[b])
            expected = (
                -np.log(avg)
                + 0.5 * bk[k] * (edges[b] - centers[k]) ** 2
            )
            assert out[k, b] == pytest.approx(
                expected, rel=1e-7, abs=1e-7
            )

    # Periodic wrap: a center one full period away is identical.
    per = harmonic_bin_bias(
        edges, np.array([0.5]), 25.0, period=6.0
    )
    per_shift = harmonic_bin_bias(
        edges, np.array([0.5 - 6.0]), 25.0, period=6.0
    )
    np.testing.assert_allclose(per, per_shift, rtol=1e-12)

    # Zero spring: flat bias.
    np.testing.assert_array_equal(
        harmonic_bin_bias(edges, np.array([0.0]), 0.0), 0.0
    )


def test_wham_input_validation():
    with pytest.raises(ValueError, match="shape"):
        wham(np.zeros((2, 5)), np.zeros((3, 5)))
    with pytest.raises(ValueError, match="per window"):
        wham(np.zeros((2, 5)), np.zeros((2, 5)), [1.0])


@pytest.mark.parametrize("method", ["mbar", "wham"])
def test_umbrella_sampling_reduced(method):
    a, kappa = 1.5, 15.0
    centers = np.linspace(-1.8, 1.8, 13)
    rng = np.random.default_rng(9)
    series = _harmonic_umbrella_windows(a, centers, kappa, 5000, rng)

    us = UmbrellaSampling(
        series, centers, kappa, temperature=1.0, reduced=True,
        method=method,
    ).run(n_bins=36, range=(-2.0, 2.0))

    mids = us.results.bin_centers
    pmf_exact = 0.5 * a * mids**2
    pmf_exact -= pmf_exact.min()
    ok = np.isfinite(us.results.pmf) & (np.abs(mids) < 1.6)
    assert ok.sum() > 20
    np.testing.assert_allclose(
        us.results.pmf[ok], pmf_exact[ok], atol=0.15
    )
    assert str(us.results.units["results.pmf"]) in (
        "dimensionless", ""
    )


def test_umbrella_sampling_physical_units_scale_by_kBT():
    """A physical-units run is the reduced run scaled by kB*T when the
    springs scale accordingly."""

    a, kappa_red = 1.0, 10.0
    centers = np.linspace(-1.5, 1.5, 9)
    rng = np.random.default_rng(21)
    series = _harmonic_umbrella_windows(
        a, centers, kappa_red, 4000, rng
    )

    reduced = UmbrellaSampling(
        series, centers, kappa_red, temperature=1.0, reduced=True,
    ).run(n_bins=24, range=(-1.8, 1.8))

    kBT = 8.31446261815324e-3 * 300  # kJ/mol at 300 K
    physical = UmbrellaSampling(
        series, centers, kappa_red * kBT, temperature=300.0,
    ).run(n_bins=24, range=(-1.8, 1.8))

    np.testing.assert_allclose(
        physical.results.pmf,
        reduced.results.pmf * kBT,
        rtol=1e-8, atol=1e-10,
    )
    assert str(physical.results.units["results.pmf"]) in (
        "kilojoule / mole",
    )


def test_umbrella_sampling_periodic_center_invariance():
    """With a period, shifting a bias center by a full period must not
    change the PMF (dihedral-style wrapping)."""

    kappa = 20.0
    centers = np.linspace(0.0, 300.0, 6)
    rng = np.random.default_rng(13)
    series = [
        (rng.normal(c, 12.0, size=3000)) % 360.0 for c in centers
    ]

    base = UmbrellaSampling(
        series, centers, kappa / 100, temperature=1.0, reduced=True,
        period=360.0,
    ).run(n_bins=30, range=(0.0, 360.0))
    shifted = UmbrellaSampling(
        series, centers - 360.0, kappa / 100, temperature=1.0,
        reduced=True, period=360.0,
    ).run(n_bins=30, range=(0.0, 360.0))

    np.testing.assert_allclose(
        base.results.pmf, shifted.results.pmf, rtol=1e-10,
        atol=1e-12, equal_nan=True,
    )


def test_umbrella_sampling_validation_and_save(tmp_path):
    with pytest.raises(ValueError, match="Invalid method"):
        UmbrellaSampling(
            [[0.0]], [0.0], 1.0, temperature=1.0, reduced=True,
            method="tram",
        )
    with pytest.raises(ValueError, match="at least one sample"):
        UmbrellaSampling(
            [[]], [0.0], 1.0, temperature=1.0, reduced=True
        )
    with pytest.raises(ValueError, match="bias centers"):
        UmbrellaSampling(
            [[0.0], [0.1]], [0.0], 1.0, temperature=1.0, reduced=True
        )
    with pytest.raises(TypeError, match="cannot have units"):
        from mdhelper_tpu import ureg

        UmbrellaSampling(
            [[0.0]], [0.0], 1.0,
            temperature=1.0 * ureg.kelvin, reduced=True,
        )

    rng = np.random.default_rng(1)
    us = UmbrellaSampling(
        _harmonic_umbrella_windows(
            1.0, np.array([-0.5, 0.5]), 8.0, 800, rng
        ),
        [-0.5, 0.5], 8.0, temperature=1.0, reduced=True,
    ).run(n_bins=10)
    out = tmp_path / "pmf.npz"
    us.save(out)
    data = np.load(out)
    np.testing.assert_allclose(data["pmf"], us.results.pmf)
