"""Nematic order parameter + orientational relaxation vs NumPy
oracles and closed-form rigid-rotor results — beyond-reference
capability."""

import numpy as np
import pytest

from mdhelper_tpu.analysis.orientation import NematicOrderParameter
from mdhelper_tpu.core.universe import Universe

rng = np.random.default_rng(23)


def _rod_universe(axes, box=40.0, lengths=2.0):
    """One 2-atom rod per axis row; begins at random centers."""

    F, n, _ = axes.shape
    pos = np.empty((F, 2 * n, 3))
    centers = rng.random((n, 3)) * (box - 10) + 5
    for f in range(F):
        u = axes[f] / np.linalg.norm(axes[f], axis=-1, keepdims=True)
        pos[f, 0::2] = centers
        pos[f, 1::2] = centers + lengths * u
    names = np.array(["B", "E"] * n, dtype=object)
    uni = Universe.from_arrays(
        pos % box, np.array([box] * 3), names=names, dt=0.5
    )
    return uni


def test_nematic_aligned_and_oracle():
    """Perfectly aligned rods give P2 = 1 with the director on the
    alignment axis; random rods match the per-frame Q oracle."""

    F, n = 3, 50
    axis = np.array([1.0, 2.0, -0.5])
    axes = np.tile(axis, (F, n, 1))
    u = _rod_universe(axes)
    nop = NematicOrderParameter(
        u.select_atoms("name B"), u.select_atoms("name E"),
        verbose=False,
    ).run()
    np.testing.assert_allclose(nop.results.P2, 1.0, rtol=1e-10)
    np.testing.assert_allclose(nop.results.P2_mean, 1.0, rtol=1e-10)
    expect_dir = axis / np.linalg.norm(axis)
    for f in range(F):
        np.testing.assert_allclose(
            np.abs(nop.results.director[f] @ expect_dir), 1.0,
            rtol=1e-10,
        )

    # random rods: Q oracle per frame
    axes = rng.standard_normal((F, n, 3))
    u = _rod_universe(axes)
    nop = NematicOrderParameter(
        u.select_atoms("name B"), u.select_atoms("name E"),
        verbose=False,
    ).run()
    for f in range(F):
        uh = axes[f] / np.linalg.norm(
            axes[f], axis=-1, keepdims=True
        )
        Q = (3 * np.einsum("ia,ib->ab", uh, uh) / n - np.eye(3)) / 2
        np.testing.assert_allclose(
            nop.results.Q[f], Q, atol=1e-10
        )
        np.testing.assert_allclose(
            nop.results.P2[f], np.linalg.eigvalsh(Q)[-1],
            rtol=1e-10,
        )

    # parallel=True bit-equality
    par = NematicOrderParameter(
        u.select_atoms("name B"), u.select_atoms("name E"),
        parallel=True, verbose=False,
    ).run()
    np.testing.assert_allclose(par.results.Q, nop.results.Q)


def test_nematic_isotropic_small():
    """Many random rods: P2_mean well below the aligned value."""

    axes = rng.standard_normal((4, 400, 3))
    u = _rod_universe(axes)
    nop = NematicOrderParameter(
        u.select_atoms("name B"), u.select_atoms("name E"),
        verbose=False,
    ).run()
    assert nop.results.P2_mean < 0.2


def test_nematic_rigid_rotor_acf():
    """A rod rotating at constant angular velocity: C1(t) = cos(wt),
    C2(t) = P2(cos(wt)) exactly (every time origin is equivalent)."""

    T, w = 32, 0.19
    t = np.arange(T)
    axes = np.stack(
        [np.cos(w * t), np.sin(w * t), np.zeros(T)], axis=-1
    )[:, None, :]
    u = _rod_universe(axes)
    nop = NematicOrderParameter(
        u.select_atoms("name B"), u.select_atoms("name E"),
        acf=True, verbose=False,
    ).run()
    cos_wt = np.cos(w * t)
    np.testing.assert_allclose(
        nop.results.C1, cos_wt, atol=1e-9
    )
    np.testing.assert_allclose(
        nop.results.C2, (3 * cos_wt**2 - 1) / 2, atol=1e-9
    )
    np.testing.assert_allclose(
        nop.results.acf_times, t * 0.5
    )
    assert nop.results.C1[0] == pytest.approx(1.0)
    assert nop.results.C2[0] == pytest.approx(1.0)


def test_nematic_min_image_axes():
    """A rod straddling the periodic boundary keeps its true axis."""

    box = 10.0
    pos = np.array([[[9.5, 5.0, 5.0], [0.5, 5.0, 5.0]]])  # +x, len 1
    u = Universe.from_arrays(
        pos, np.array([box] * 3),
        names=np.array(["B", "E"], dtype=object),
    )
    nop = NematicOrderParameter(
        u.select_atoms("name B"), u.select_atoms("name E"),
        verbose=False,
    ).run()
    np.testing.assert_allclose(
        np.abs(nop.results.director[0]), [1.0, 0.0, 0.0],
        atol=1e-12,
    )
    np.testing.assert_allclose(nop.results.P2[0], 1.0)


def test_nematic_validation():
    pos = rng.random((1, 4, 3)) * 10
    u = Universe.from_arrays(
        pos, np.array([10.0] * 3),
        names=np.array(["B", "E", "B", "E"], dtype=object),
    )
    with pytest.raises(ValueError):
        NematicOrderParameter(
            u.select_atoms("name B"), u.select_atoms("name E*")[:1],
            verbose=False,
        )
    with pytest.raises(ValueError):
        NematicOrderParameter(
            u.select_atoms("name X"), u.select_atoms("name X"),
            verbose=False,
        )
