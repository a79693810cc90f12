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
ccf_scalar = naive_ccf(rand1[0, :, 0, 0], rand2[0, :, 0, 0])
ccf_vector = naive_ccf(rand1[0, :, 0, 0], rand2[0, :, 0, 0])


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
