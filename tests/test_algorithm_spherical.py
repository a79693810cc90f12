"""Spherical-harmonics engine vs scipy (complex Y_lm with the
Condon-Shortley phase) and exact Wigner 3-j identities."""

import math

import numpy as np
import pytest
from scipy.special import sph_harm_y

from mdhelper_tpu.algorithm.spherical import (
    complex_from_real,
    invariant_ql,
    invariant_wl,
    real_sph_harm,
    sph_harm_columns,
    wigner_3j,
    wigner_3j_lll,
)

rng = np.random.default_rng(11)


def _unit_vectors(n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


@pytest.mark.parametrize("l", [1, 2, 3, 4, 6, 8, 10])
def test_real_sph_harm_vs_scipy(l):
    u = _unit_vectors(200)
    theta = np.arccos(np.clip(u[:, 2], -1, 1))
    phi = np.arctan2(u[:, 1], u[:, 0])
    y = real_sph_harm((l,), u)
    assert y.shape == (200, 2 * l + 1)
    y0 = sph_harm_y(l, 0, theta, phi).real
    np.testing.assert_allclose(y[:, 0], y0, atol=1e-12)
    for m in range(1, l + 1):
        ylm = sph_harm_y(l, m, theta, phi)
        scale = math.sqrt(2.0) * (-1) ** m
        np.testing.assert_allclose(
            y[:, 2 * m - 1], scale * ylm.real, atol=1e-12
        )
        np.testing.assert_allclose(
            y[:, 2 * m], scale * ylm.imag, atol=1e-12
        )


def test_real_sph_harm_multi_degree_layout():
    u = _unit_vectors(50)
    y = real_sph_harm((4, 6), u)
    assert y.shape[-1] == sph_harm_columns((4, 6)) == 22
    np.testing.assert_allclose(y[:, :9], real_sph_harm((4,), u))
    np.testing.assert_allclose(y[:, 9:], real_sph_harm((6,), u))


def test_real_sph_harm_jnp_matches_numpy():
    import jax.numpy as jnp

    u = _unit_vectors(64)
    y_np = real_sph_harm((4, 6), u)
    y_j = np.asarray(real_sph_harm((4, 6), jnp.asarray(u), xp=jnp))
    np.testing.assert_allclose(y_j, y_np, atol=1e-12)


def test_poles_are_finite():
    u = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    y = real_sph_harm((6,), u)
    assert np.isfinite(y).all()
    # only m = 0 survives at the poles
    np.testing.assert_allclose(y[:, 1:], 0.0, atol=1e-14)
    np.testing.assert_allclose(
        y[0, 0], math.sqrt(13.0 / (4 * math.pi)), atol=1e-12
    )


@pytest.mark.parametrize("l", [2, 4, 6])
def test_complex_reconstruction_vs_scipy(l):
    u = _unit_vectors(120)
    theta = np.arccos(np.clip(u[:, 2], -1, 1))
    phi = np.arctan2(u[:, 1], u[:, 0])
    q_real = real_sph_harm((l,), u).mean(axis=0)
    qc = complex_from_real(l, q_real)
    direct = np.array(
        [
            sph_harm_y(l, m, theta, phi).mean()
            for m in range(-l, l + 1)
        ]
    )
    np.testing.assert_allclose(qc, direct, atol=1e-12)
    # the ql invariant agrees with the complex-modulus definition
    ql = invariant_ql(l, q_real)
    ql_c = math.sqrt(
        4 * math.pi / (2 * l + 1) * (np.abs(direct) ** 2).sum()
    )
    np.testing.assert_allclose(ql, ql_c, atol=1e-12)


def test_wigner_3j_known_values():
    np.testing.assert_allclose(
        wigner_3j(2, 2, 2, 0, 0, 0), -2.0 / math.sqrt(70.0),
        atol=1e-14,
    )
    np.testing.assert_allclose(
        wigner_3j(1, 1, 0, 1, -1, 0), 1.0 / math.sqrt(3.0),
        atol=1e-14,
    )
    assert wigner_3j(2, 2, 2, 2, 2, -1) == 0.0  # m-sum rule
    assert wigner_3j(1, 1, 3, 0, 0, 0) == 0.0  # triangle rule


@pytest.mark.parametrize("j", [2, 4, 6])
def test_wigner_3j_orthogonality(j):
    # sum_{m1, m2} 3j(j j j3; m1 m2 m3)^2 = 1 / (2 j3 + 1)
    for m3 in (-1, 0, 2):
        total = 0.0
        for m1 in range(-j, j + 1):
            m2 = -m3 - m1
            if abs(m2) > j:
                continue
            total += wigner_3j(j, j, j, m1, m2, m3) ** 2
        np.testing.assert_allclose(
            total, 1.0 / (2 * j + 1), atol=1e-13
        )


def test_wigner_3j_lll_table_consistency():
    entries = wigner_3j_lll(6)
    assert all(m1 + m2 + m3 == 0 for m1, m2, m3, _ in entries)
    for m1, m2, m3, w in entries[:20]:
        np.testing.assert_allclose(
            w, wigner_3j(6, 6, 6, m1, m2, m3), atol=1e-15
        )


@pytest.mark.parametrize("l", [4, 6])
def test_invariant_wl_rotation_invariance(l):
    """w_l (and q_l) are invariant under a global rotation of the
    neighbor set."""
    u = _unit_vectors(30)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    u_rot = u @ q.T
    qr = real_sph_harm((l,), u).mean(axis=0)
    qr_rot = real_sph_harm((l,), u_rot).mean(axis=0)
    np.testing.assert_allclose(
        invariant_ql(l, qr), invariant_ql(l, qr_rot), atol=1e-12
    )
    np.testing.assert_allclose(
        invariant_wl(l, qr[None])[0],
        invariant_wl(l, qr_rot[None])[0],
        atol=1e-12,
    )


def test_invariant_wl_zero_coefficients():
    wl = invariant_wl(6, np.zeros((3, 13)))
    np.testing.assert_array_equal(wl, 0.0)
