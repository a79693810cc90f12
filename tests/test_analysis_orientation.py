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


def test_nematic_host_pipeline_equals_device(monkeypatch):
    """Host-pipeline Q-tensor stage matches the device path —
    including the ACF axes store and triclinic folds."""

    local = np.random.default_rng(83)

    def run_both(u, **kwargs):
        out = []
        for knob in ("0", "1"):
            monkeypatch.setenv("MDTPU_HOST_PIPELINE", knob)
            a = NematicOrderParameter(
                u.select_atoms("name B"), u.select_atoms("name E"),
                verbose=False, **kwargs,
            )
            a._chunk_bytes = 2 * u.atoms.n_atoms * 3 * 8
            out.append(a.run())
        monkeypatch.delenv("MDTPU_HOST_PIPELINE")
        device, host = out
        assert host._host_pipeline and not device._host_pipeline
        np.testing.assert_allclose(
            host.results.Q, device.results.Q, atol=1e-12
        )
        if "acf" in kwargs:
            np.testing.assert_allclose(
                host.results.C2, device.results.C2, rtol=1e-10
            )

    axes = local.standard_normal((6, 40, 3))
    u = _rod_universe(axes)
    run_both(u)
    run_both(u, acf=True)

    # triclinic rods
    dims = np.array([14.0, 15.0, 16.0, 75.0, 85.0, 100.0])
    from mdhelper_tpu.algorithm.topology import triclinic_vectors

    h = np.asarray(triclinic_vectors(dims))
    F, n = 3, 20
    pos = np.empty((F, 2 * n, 3))
    centers = local.random((n, 3)) @ h
    for f in range(F):
        d = local.standard_normal((n, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        pos[f, 0::2] = centers
        pos[f, 1::2] = centers + 2.0 * d
    frac = pos.reshape(-1, 3) @ np.linalg.inv(h)
    pos = ((frac % 1.0) @ h).reshape(F, 2 * n, 3)
    tric = Universe.from_arrays(
        pos, dims,
        names=np.array(["B", "E"] * n, dtype=object),
    )
    run_both(tric)


# -- axis-resolved orientation profiles ------------------------------------


def test_orientation_profile_vs_oracle():
    from mdhelper_tpu.analysis.orientation import OrientationProfile
    from mdhelper_tpu.core.universe import Universe

    local = np.random.default_rng(71)
    box = np.array([8.0, 9.0, 10.0])
    T_l, n = 5, 40
    begins = local.random((T_l, n, 3)) * box
    vecs = local.normal(size=(T_l, n, 3))
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    ends = begins + 0.9 * vecs
    pos = np.empty((T_l, 2 * n, 3))
    pos[:, 0::2] = begins % box
    pos[:, 1::2] = ends % box
    u = Universe.from_arrays(
        pos, box, types=np.array(["B", "E"] * n, dtype=object),
        dt=1.0,
    )
    gb = u.select_atoms("type B")
    ge = u.select_atoms("type E")
    n_bins = 12
    op = OrientationProfile(
        gb, ge, axis="z", n_bins=n_bins, verbose=False
    ).run()

    counts = np.zeros(n_bins)
    c1 = np.zeros(n_bins)
    c2 = np.zeros(n_bins)
    edges = np.linspace(0, box[2], n_bins + 1)
    for f in range(T_l):
        cos = vecs[f, :, 2]
        mid = (begins[f] + 0.45 * vecs[f]) % box
        idx = np.clip(
            np.searchsorted(edges, mid[:, 2], side="right") - 1,
            0, n_bins - 1,
        )
        np.add.at(counts, idx, 1.0)
        np.add.at(c1, idx, cos)
        np.add.at(c2, idx, cos**2)
    np.testing.assert_allclose(op.results.counts, counts)
    occupied = counts > 0
    np.testing.assert_allclose(
        op.results.p1[occupied], (c1 / counts)[occupied],
        rtol=1e-5, atol=1e-8,
    )
    np.testing.assert_allclose(
        op.results.p2[occupied],
        ((3 * c2 / counts - 1) / 2)[occupied],
        rtol=1e-5, atol=1e-8,
    )
    assert np.isnan(op.results.p1[~occupied]).all()

    # perfectly aligned vectors: P1 = P2 = 1 in occupied bins
    pos2 = pos.copy()
    pos2[:, 1::2] = (pos[:, 0::2] + [0.0, 0.0, 0.8]) % box
    u2 = Universe.from_arrays(
        pos2, box, types=np.array(["B", "E"] * n, dtype=object),
        dt=1.0,
    )
    al = OrientationProfile(
        u2.select_atoms("type B"), u2.select_atoms("type E"),
        axis="z", n_bins=n_bins, verbose=False,
    ).run()
    occ = al.results.counts > 0
    np.testing.assert_allclose(al.results.p1[occ], 1.0, rtol=1e-6)
    np.testing.assert_allclose(al.results.p2[occ], 1.0, rtol=1e-6)

    # director override: x reference flips the profile content
    dx = OrientationProfile(
        gb, ge, axis="z", n_bins=n_bins,
        director=[2.0, 0.0, 0.0], verbose=False,
    ).run()
    c1x = np.zeros(n_bins)
    for f in range(T_l):
        mid = (begins[f] + 0.45 * vecs[f]) % box
        idx = np.clip(
            np.searchsorted(edges, mid[:, 2], side="right") - 1,
            0, n_bins - 1,
        )
        np.add.at(c1x, idx, vecs[f, :, 0])
    np.testing.assert_allclose(
        dx.results.p1[occupied], (c1x / counts)[occupied],
        rtol=1e-5, atol=1e-8,
    )

    # parallel equality
    par = OrientationProfile(
        gb, ge, axis="z", n_bins=n_bins, parallel=True,
        verbose=False,
    ).run()
    np.testing.assert_allclose(
        par.results.p1[occupied], op.results.p1[occupied],
        rtol=1e-12,
    )

    with pytest.raises(ValueError, match="axis"):
        OrientationProfile(gb, ge, axis="w", verbose=False)
    with pytest.raises(ValueError, match="director"):
        OrientationProfile(
            gb, ge, director=[0.0, 0.0, 0.0], verbose=False
        )


def test_orientation_profile_npt_per_frame_boxes():
    """Boundary-straddling bonds fold with each frame's OWN box
    (regression: the first implementation used the init-time box for
    the fold, corrupting NPT orientations)."""

    from mdhelper_tpu.analysis.orientation import OrientationProfile
    from mdhelper_tpu.core.universe import Universe

    boxes = np.array(
        [[10.0, 10.0, 10.0], [10.0, 10.0, 16.0]]
    )
    # frame 0 (L_z = 10): bond from z=9.7 to z=0.5 -> +z via the
    # boundary; frame 1 (L_z = 16): bond from z=15.7 to z=0.5 ->
    # +z via ITS boundary.  Folding frame 1 with the init box (10)
    # would give dz = 0.5 - 15.7 + 10 = -5.2 (garbage).
    pos = np.array(
        [
            [[5.0, 5.0, 9.7], [5.0, 5.0, 0.5]],
            [[5.0, 5.0, 15.7], [5.0, 5.0, 0.5]],
        ]
    )
    u = Universe.from_arrays(
        pos, boxes, types=np.array(["B", "E"], dtype=object),
        dt=1.0,
    )
    prof = OrientationProfile(
        u.select_atoms("type B"), u.select_atoms("type E"),
        axis="z", n_bins=4, verbose=False,
    ).run()
    occ = prof.results.counts > 0
    # both frames' bonds point along +z exactly
    np.testing.assert_allclose(prof.results.p1[occ], 1.0,
                               rtol=1e-6)
    assert prof.results.counts.sum() == 2


def test_pair_column_validation():
    from mdhelper_tpu.analysis.orientation import (
        NematicOrderParameter,
        OrientationProfile,
    )
    from mdhelper_tpu.core.universe import Universe

    pos = np.zeros((1, 4, 3))
    pos[0, :, 2] = [0.0, 1.0, 2.0, 3.0]
    box = np.array([10.0, 10.0, 10.0])
    u = Universe.from_arrays(
        pos, box, types=np.array(["A", "A", "B", "B"],
                                 dtype=object),
    )
    u2 = Universe.from_arrays(
        pos.copy(), box, types=np.array(["A", "A", "B", "B"],
                                        dtype=object),
    )
    ga, gb = u.select_atoms("type A"), u.select_atoms("type B")
    with pytest.raises(ValueError, match="same universe"):
        OrientationProfile(ga, u2.select_atoms("type B"),
                           verbose=False)
    with pytest.raises(ValueError, match="same universe"):
        NematicOrderParameter(ga, u2.select_atoms("type B"),
                              verbose=False)
    with pytest.raises(ValueError, match="itself"):
        OrientationProfile(ga, ga, verbose=False)
    with pytest.raises(ValueError, match="itself"):
        NematicOrderParameter(gb, gb, verbose=False)
