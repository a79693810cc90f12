"""Tests for mdhelper_tpu.algorithm.correlation (parity:
/root/reference/tests/test_algorithm_correlation.py).

The reference validates against the `tidynamics` package, which is not
available here; `naive_acf`/`naive_ccf` below are independent direct-sum
NumPy oracles implementing the same definitions
(<r(t0+tau) . r(t0)> averaged over window positions t0).
"""

import numpy as np
import pytest

from mdhelper_tpu.algorithm import correlation


def naive_acf(series: np.ndarray) -> np.ndarray:
    """Direct-sum ACF of a 1D scalar or (N_t, d) vector series."""

    series = np.asarray(series, dtype=float)
    n_t = series.shape[0]
    out = np.empty(n_t)
    for m in range(n_t):
        prods = series[: n_t - m if m else None] * series[m:]
        out[m] = prods.sum() / (n_t - m)
    return out


def naive_ccf(s1: np.ndarray, s2: np.ndarray) -> np.ndarray:
    """Direct-sum two-sided CCF (lags -(N_t-1)..N_t-1)."""

    s1 = np.asarray(s1, dtype=float)
    s2 = np.asarray(s2, dtype=float)
    n_t = s1.shape[0]
    out = np.empty(2 * n_t - 1)
    for m in range(-(n_t - 1), n_t):
        if m >= 0:
            prods = s1[: n_t - m if m else None] * s2[m:]
        else:
            prods = s1[-m:] * s2[: n_t + m]
        out[m + n_t - 1] = prods.sum() / (n_t - abs(m))
    return out


rng = np.random.default_rng(7)
shape = (4, 37, 5, 3)  # (blocks, times, entities, dims)
ones = np.ones(shape)
rand1 = rng.random(shape)
rand2 = rng.random(shape)

acf_scalar = naive_acf(rand1[0, :, 0, 0])
acf_multi_scalar = np.stack(
    [naive_acf(v) for v in rand1[0, :, :, 0].T]
).T
acf_block_scalar = np.stack([naive_acf(v) for v in rand1[:, :, 0, 0]])
acf_vector = naive_acf(rand1[0, :, 0])
acf_multi_vector = np.stack(
    [naive_acf(v) for v in np.swapaxes(rand1[0], 0, 1)]
).T
acf_block_vector = np.stack([naive_acf(v) for v in rand1[:, :, 0]])
ccf_scalar = naive_ccf(rand1[0, :, 0, 0], rand2[0, :, 0, 0])
ccf_multi_scalar = np.stack(
    [
        naive_ccf(v1, v2)
        for v1, v2 in zip(rand1[0, :, :, 0].T, rand2[0, :, :, 0].T)
    ]
).T
ccf_block_scalar = np.stack(
    [
        naive_ccf(v1, v2)
        for v1, v2 in zip(rand1[:, :, 0, 0], rand2[:, :, 0, 0])
    ]
)
ccf_vector = naive_ccf(rand1[0, :, 0], rand2[0, :, 0])
ccf_multi_vector = np.stack(
    [
        naive_ccf(v1, v2)
        for v1, v2 in zip(
            np.swapaxes(rand1[0], 0, 1), np.swapaxes(rand2[0], 0, 1)
        )
    ]
).T
ccf_block_vector = np.stack(
    [
        naive_ccf(v1, v2)
        for v1, v2 in zip(rand1[:, :, 0], rand2[:, :, 0])
    ]
)


def test_correlation_fft_errors():
    with pytest.raises(ValueError):
        correlation.correlation_fft(np.empty(0))
    with pytest.raises(ValueError):
        correlation.correlation_fft(np.empty((0, 3)))
    with pytest.raises(ValueError):
        correlation.correlation_fft(np.empty((2, 2, 2, 2, 2)))
    with pytest.raises(ValueError):
        correlation.correlation_fft(np.empty((2, 2, 2)), axis=2)
    with pytest.raises(ValueError):
        correlation.correlation_fft(np.empty((2, 3)), np.empty((3, 2)))


def test_correlation_fft_acf_ones():
    assert np.allclose(correlation.correlation_fft(ones[0, :, 0, 0]), 1)
    assert np.allclose(
        correlation.correlation_fft(ones[0, :, :, 0], axis=0), 1
    )
    assert np.allclose(
        correlation.correlation_fft(ones[:, :, 0, 0], axis=1), 1
    )
    assert np.allclose(correlation.correlation_fft(ones, vector=True),
                       shape[-1])
    assert np.allclose(
        correlation.correlation_fft(ones[0, :, 0], axis=0, vector=True),
        shape[-1],
    )


def test_correlation_fft_acf_random():
    assert np.allclose(
        correlation.correlation_fft(rand1[0, :, 0, 0]), acf_scalar
    )
    acf = correlation.correlation_fft(rand1[0, :, :, 0], axis=0)
    assert np.allclose(acf, acf_multi_scalar)
    assert np.allclose(
        correlation.correlation_fft(
            rand1[0, :, :, 0], average=True, axis=0
        ),
        np.asarray(acf).mean(axis=1),
    )
    assert np.allclose(
        correlation.correlation_fft(rand1[:, :, 0, 0], axis=1),
        acf_block_scalar,
    )
    acf4 = correlation.correlation_fft(rand1[:, :, :, 0], axis=1)
    assert np.allclose(acf4[0], acf_multi_scalar)
    assert np.allclose(acf4[:, :, 0], acf_block_scalar)
    assert np.allclose(
        correlation.correlation_fft(rand1[0, :, 0], axis=0, vector=True),
        acf_vector,
    )
    # Blocked multi-entity vectors default to axis=1.
    acf_full = correlation.correlation_fft(rand1, vector=True)
    assert np.allclose(
        acf_full[0, :, 0],
        naive_acf(rand1[0, :, 0]),
    )


def test_correlation_fft_ccf_random():
    assert np.allclose(
        correlation.correlation_fft(
            rand1[0, :, 0, 0].tolist(), rand2[0, :, 0, 0].tolist()
        ),
        ccf_scalar,
    )
    ccf4 = correlation.correlation_fft(
        rand1[:, :, :, 0], rand2[:, :, :, 0], axis=1
    )
    assert np.allclose(ccf4[0, :, 0], ccf_scalar)


def test_correlation_shift_matches_fft():
    # Serial sliding-window vs FFT across the shape matrix.
    for args in (
        dict(arr1=rand1[0, :, 0, 0]),
        dict(arr1=rand1[0, :, :, 0], axis=0),
        dict(arr1=rand1[:, :, 0, 0], axis=1),
        dict(arr1=rand1[:, :, :, 0], axis=1),
        dict(arr1=rand1[0, :, 0], axis=0, vector=True),
        dict(arr1=rand1, axis=1, vector=True),
        dict(arr1=rand1[0, :, 0, 0], arr2=rand2[0, :, 0, 0]),
        dict(arr1=rand1[:, :, :, 0], arr2=rand2[:, :, :, 0], axis=1),
        dict(arr1=rand1[0, :, 0], arr2=rand2[0, :, 0], axis=0,
             vector=True),
        dict(
            arr1=rand1[0, :, 0, 0],
            arr2=rand2[0, :, 0, 0],
            double=True,
        ),
        dict(arr1=rand1[0, :, :, 0], axis=0, average=True),
    ):
        arr2 = args.pop("arr2", None)
        arr1 = args.pop("arr1")
        shift = correlation.correlation_shift(arr1, arr2, **args)
        fft = correlation.correlation_fft(arr1, arr2, **args)
        assert np.allclose(shift, np.asarray(fft)), args


# ---------------------------------------------------------------------
# Full reference test matrix (parity:
# /root/reference/tests/test_algorithm_correlation.py:11-560): every
# 1-4-D shape x axis x vector combination for BOTH the FFT and the
# sliding-window ("shift") kernels, ACF and CCF, against the NumPy
# direct-sum oracles, plus average=True consistency on every ACF
# combination and complex-input support.
# ---------------------------------------------------------------------
_FUNCS = [correlation.correlation_fft, correlation.correlation_shift]


@pytest.mark.parametrize("func", _FUNCS, ids=("fft", "shift"))
def test_correlation_acf_ones_full_matrix(func):
    # 1-D through 4-D series of ones: scalar ACFs are 1, vector ACFs
    # are the component count.
    assert np.allclose(func(ones[0, :, 0, 0]), 1)
    assert np.allclose(func(ones[0, :, :, 0], axis=0), 1)
    assert np.allclose(func(ones[:, :, 0, 0], axis=1), 1)
    assert np.allclose(func(ones[:, :, :, 0], axis=1), 1)
    assert np.allclose(
        func(ones[0, :, 0], axis=0, vector=True), shape[-1]
    )
    assert np.allclose(func(ones[0], axis=0, vector=True), shape[-1])
    assert np.allclose(
        func(ones[:, :, 0], axis=1, vector=True), shape[-1]
    )
    assert np.allclose(func(ones, vector=True), shape[-1])


@pytest.mark.parametrize("func", _FUNCS, ids=("fft", "shift"))
def test_correlation_acf_random_full_matrix(func):
    # CASE 1: 1-D scalar series.
    assert np.allclose(func(rand1[0, :, 0, 0]), acf_scalar)
    # CASE 2: 2-D multi-entity scalars (+ average).
    acf = np.asarray(func(rand1[0, :, :, 0], axis=0))
    assert np.allclose(acf, acf_multi_scalar)
    assert np.allclose(
        func(rand1[0, :, :, 0], average=True, axis=0),
        acf.mean(axis=1),
    )
    # CASE 3: 2-D blocked scalars.
    assert np.allclose(
        func(rand1[:, :, 0, 0], axis=1), acf_block_scalar
    )
    # CASE 4: 3-D blocked multi-entity scalars (+ average).
    acf = np.asarray(func(rand1[:, :, :, 0], axis=1))
    assert np.allclose(acf[0], acf_multi_scalar)
    assert np.allclose(acf[:, :, 0], acf_block_scalar)
    assert np.allclose(
        func(rand1[:, :, :, 0], average=True, axis=1),
        acf.mean(axis=2),
    )
    # CASE 5: 2-D vector series.
    assert np.allclose(
        func(rand1[0, :, 0], axis=0, vector=True), acf_vector
    )
    # CASE 6: 3-D multi-entity vectors (+ average).
    acf = np.asarray(func(rand1[0], axis=0, vector=True))
    assert np.allclose(acf, acf_multi_vector)
    assert np.allclose(
        func(rand1[0], axis=0, vector=True, average=True),
        acf.mean(axis=1),
    )
    # CASE 7: 3-D blocked vectors.
    assert np.allclose(
        func(rand1[:, :, 0], axis=1, vector=True), acf_block_vector
    )
    # CASE 8: 4-D blocked multi-entity vectors (+ axis default and
    # average).
    acf = np.asarray(func(rand1, vector=True))
    assert np.allclose(acf[0], acf_multi_vector)
    assert np.allclose(acf[:, :, 0], acf_block_vector)
    assert np.allclose(
        func(rand1, vector=True, average=True), acf.mean(axis=2)
    )


@pytest.mark.parametrize("func", _FUNCS, ids=("fft", "shift"))
def test_correlation_ccf_random_full_matrix(func):
    # CASE 1: 1-D scalar series (list input).
    assert np.allclose(
        func(rand1[0, :, 0, 0].tolist(), rand2[0, :, 0, 0].tolist()),
        ccf_scalar,
    )
    # CASE 2: 2-D multi-entity scalars.
    assert np.allclose(
        func(rand1[0, :, :, 0], rand2[0, :, :, 0], axis=0),
        ccf_multi_scalar,
    )
    # CASE 3: 2-D blocked scalars.
    assert np.allclose(
        func(rand1[:, :, 0, 0], rand2[:, :, 0, 0], axis=1),
        ccf_block_scalar,
    )
    # CASE 4: 3-D blocked multi-entity scalars.
    ccf = np.asarray(
        func(rand1[:, :, :, 0], rand2[:, :, :, 0], axis=1)
    )
    assert np.allclose(ccf[0], ccf_multi_scalar)
    assert np.allclose(ccf[:, :, 0], ccf_block_scalar)
    # CASE 5: 2-D vector series.
    assert np.allclose(
        func(rand1[0, :, 0], rand2[0, :, 0], axis=0, vector=True),
        ccf_vector,
    )
    # CASE 6: 3-D multi-entity vectors.
    assert np.allclose(
        func(rand1[0], rand2[0], axis=0, vector=True),
        ccf_multi_vector,
    )
    # CASE 7: 3-D blocked vectors.
    assert np.allclose(
        func(rand1[:, :, 0], rand2[:, :, 0], axis=1, vector=True),
        ccf_block_vector,
    )
    # CASE 8: 4-D blocked multi-entity vectors (axis default).
    ccf = np.asarray(func(rand1, rand2, vector=True))
    assert np.allclose(ccf[0], ccf_multi_vector)
    assert np.allclose(ccf[:, :, 0], ccf_block_vector)


def test_correlation_shift_errors():
    # Parity with the FFT validation (reference runs the same five
    # cases on both kernels).
    with pytest.raises(ValueError):
        correlation.correlation_shift(np.empty(0))
    with pytest.raises(ValueError):
        correlation.correlation_shift(np.empty((0, 3)))
    with pytest.raises(ValueError):
        correlation.correlation_shift(np.empty((2, 2, 2, 2, 2)))
    with pytest.raises(ValueError):
        correlation.correlation_shift(np.empty((2, 2, 2)), axis=2)
    with pytest.raises(ValueError):
        correlation.correlation_shift(np.empty((2, 3)), np.empty((3, 2)))
    with pytest.raises(ValueError):
        correlation.correlation_shift(
            np.empty((2, 2, 2)), np.empty((2, 2, 2)), axis=2
        )


def test_correlation_double_modes():
    # Doubled ACF is exactly twice the ACF.
    assert np.allclose(
        correlation.correlation_shift(rand1[0, :, 0, 0], double=True),
        2 * acf_scalar,
    )
    # Folded CCF: shift and FFT agree for 1-D and blocked series.
    for a1, a2, axis in (
        (rand1[0, :, 0, 0], rand2[0, :, 0, 0], 0),
        (rand1[:, :, 0, 0], rand2[:, :, 0, 0], 1),
    ):
        assert np.allclose(
            correlation.correlation_shift(a1, a2, axis=axis, double=True),
            np.asarray(
                correlation.correlation_fft(a1, a2, axis=axis, double=True)
            ),
        )


def test_correlation_complex_inputs():
    """Complex series route through the complex transform (the
    incoherent-scattering use: exp(iq.r) series); oracle evaluated on
    the same definition with conjugation on the first series."""

    z1 = rand1[0, :, 0, 0] + 1j * rand2[0, :, 0, 0]

    n_t = len(z1)
    oracle = np.empty(n_t, dtype=complex)
    for m in range(n_t):
        prods = z1[: n_t - m if m else None].conj() * z1[m:]
        oracle[m] = prods.sum() / (n_t - m)

    out = np.asarray(correlation.correlation_fft(z1))
    assert np.iscomplexobj(out)
    # ACF of a complex series: magnitudes must match the direct sum.
    assert np.allclose(np.abs(out), np.abs(oracle), atol=1e-8)


# Simple deterministic trajectories for MSD/CD checks.
traj_1 = np.array(((0, 0, 0), (1, 1, 1), (2, 2, 2), (3, 3, 3)), dtype=float)
msd_1 = np.einsum("td,td->t", traj_1, traj_1)
traj_2 = np.array(((0, 1, 2), (2, 3, 4), (4, 5, 6), (6, 7, 8)), dtype=float)
msd_2 = ((traj_2 - traj_2[0]) ** 2).sum(axis=1)
cd = (traj_1 * (traj_2 - traj_2[0])).sum(axis=1)


def test_msd_fft_errors():
    with pytest.raises(ValueError):
        correlation.msd_fft(np.empty(0))
    with pytest.raises(ValueError):
        correlation.msd_fft(np.empty((2, 2, 2, 2, 2)))
    with pytest.raises(ValueError):
        correlation.msd_fft(traj_1, traj_2[:1])
    with pytest.raises(ValueError):
        correlation.msd_fft(np.empty((2, 2, 2)), axis=2)


def test_msd_fft_simple():
    assert np.allclose(correlation.msd_fft(traj_1.tolist()), msd_1)
    assert np.allclose(correlation.msd_fft(traj_2), msd_2)
    assert np.allclose(correlation.msd_fft(traj_1, traj_2.tolist()), cd)
    assert np.allclose(
        correlation.msd_fft(
            np.tile(traj_1[:, None], (1, 2, 1)), average=False
        )[:, 0],
        msd_1,
    )
    assert np.allclose(
        correlation.msd_fft(
            np.tile(traj_1[None, :, None], (2, 1, 2, 1)), average=False
        )[0, :, 0],
        msd_1,
    )
    assert np.allclose(
        correlation.msd_fft(
            np.tile(traj_1[None, :, None], (2, 1, 2, 1)),
            np.tile(traj_2[None, :, None], (2, 1, 2, 1)),
        )[0],
        cd,
    )


def test_msd_shift_matches_fft_random():
    pos1 = rng.random((3, 25, 4, 3))
    pos2 = rng.random((3, 25, 4, 3))
    for kwargs in (
        dict(average=True),
        dict(average=False),
    ):
        a = correlation.msd_shift(pos1, axis=1, **kwargs)
        b = correlation.msd_fft(pos1, axis=1, **kwargs)
        assert np.allclose(a, np.asarray(b))
        a = correlation.msd_shift(pos1, pos2, axis=1, **kwargs)
        b = correlation.msd_fft(pos1, pos2, axis=1, **kwargs)
        assert np.allclose(a, np.asarray(b))
    # Unblocked forms.
    assert np.allclose(
        correlation.msd_shift(pos1[0], axis=0),
        np.asarray(correlation.msd_fft(pos1[0], axis=0)),
    )


def test_msd_shift_simple():
    assert np.allclose(correlation.msd_shift(traj_1.tolist()), msd_1)
    assert np.allclose(correlation.msd_shift(traj_2), msd_2)
    assert np.allclose(correlation.msd_shift(traj_1, traj_2.tolist()), cd)
