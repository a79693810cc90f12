"""Shrake-Rupley SASA vs analytic sphere-cap areas and a brute f64
NumPy oracle — beyond-reference capability (mdtraj ``shrake_rupley``
/ FreeSASA family)."""

import numpy as np
import pytest

from mdhelper_tpu.analysis.sasa import (
    OccluderOverflow,
    SolventAccessibleSurfaceArea,
    sphere_points,
)
from mdhelper_tpu.core.universe import Universe

rng = np.random.default_rng(71)


def _universe(pos, box, **kw):
    n = pos.shape[-2]
    kw.setdefault("types", np.array(["A"] * n, dtype=object))
    return Universe.from_arrays(pos, box, **kw)


def _oracle(pos, box, radii, probe, n_points):
    """Brute-force f64 oracle: all-pairs minimum image, no candidate
    budget, no neighbor search."""

    sphere = sphere_points(n_points)
    inflated = np.asarray(radii, dtype=np.float64) + probe
    n = len(pos)
    areas = np.empty(n)
    counts = np.empty(n, dtype=np.int64)
    for i in range(n):
        delta = pos - pos[i]
        if box is not None:
            periodic = box > 0
            delta[:, periodic] -= box[periodic] * np.round(
                delta[:, periodic] / box[periodic]
            )
        d2 = (delta**2).sum(axis=1)
        touch = inflated[i] + inflated
        cand = (d2 < touch**2) & (np.arange(n) != i)
        counts[i] = cand.sum()
        rel = delta[cand]
        rj2 = inflated[cand] ** 2
        q = inflated[i] * sphere
        if rel.size:
            dd = q[:, None, :] - rel[None, :, :]
            occ = ((dd**2).sum(axis=-1) < rj2[None, :]).any(axis=1)
            free = int((~occ).sum())
        else:
            free = n_points
        areas[i] = 4 * np.pi / n_points * free * inflated[i] ** 2
    return areas, counts


def test_sphere_points_unit_and_uniform():
    pts = sphere_points(500)
    np.testing.assert_allclose(
        (pts**2).sum(axis=1), 1.0, atol=1e-12
    )
    # near-uniform: the mean should sit at the origin
    assert np.abs(pts.mean(axis=0)).max() < 5e-3


def test_isolated_atom_full_sphere():
    pos = np.array([[[5.0, 5.0, 5.0]]])
    u = _universe(pos, np.array([10.0, 10.0, 10.0]))
    sasa = SolventAccessibleSurfaceArea(
        u.atoms, probe_radius=1.4, n_points=128,
        radii=np.array([1.6]), verbose=False,
    ).run()
    np.testing.assert_allclose(
        sasa.results.areas[0, 0], 4 * np.pi * 3.0**2, rtol=1e-12
    )
    np.testing.assert_allclose(
        sasa.results.total_areas[0], 4 * np.pi * 9.0, rtol=1e-12
    )
    assert (sasa.results.n_neighbors == 0).all()


def test_two_spheres_analytic_cap():
    # two equal inflated spheres R at center distance d < 2R: the
    # occluded polar cap has cos(theta*) = d / (2R), so the free
    # fraction is (1 + d/(2R)) / 2 per sphere
    R, d = 2.0, 1.5
    pos = np.array([[[5.0, 5.0, 5.0], [5.0, 5.0, 5.0 + d]]])
    u = _universe(pos, np.array([30.0, 30.0, 30.0]))
    n_points = 8192
    sasa = SolventAccessibleSurfaceArea(
        u.atoms, probe_radius=0.5, n_points=n_points,
        radii=np.array([R - 0.5, R - 0.5]), verbose=False,
    ).run()
    free_frac = (1 + d / (2 * R)) / 2
    expected = 4 * np.pi * R**2 * free_frac
    np.testing.assert_allclose(
        sasa.results.areas[0], expected, rtol=3e-3
    )
    assert (sasa.results.n_neighbors[0] == 1).all()


def test_buried_atom_zero_area():
    # a small sphere fully inside a big one is completely occluded
    pos = np.array([[[5.0, 5.0, 5.0], [5.2, 5.0, 5.0]]])
    u = _universe(pos, np.array([20.0, 20.0, 20.0]))
    sasa = SolventAccessibleSurfaceArea(
        u.atoms, probe_radius=0.0, n_points=256,
        radii=np.array([0.5, 5.0]), verbose=False,
    ).run()
    assert sasa.results.areas[0, 0] == 0.0
    assert sasa.results.areas[0, 1] > 0.0


def test_random_fluid_vs_oracle():
    box = np.array([9.0, 10.0, 11.0])
    F, n = 3, 64
    pos = rng.random((F, n, 3)) * box
    radii = rng.uniform(1.0, 2.0, n)
    u = _universe(pos, box)
    sasa = SolventAccessibleSurfaceArea(
        u.atoms, probe_radius=1.4, n_points=240,
        radii=radii, verbose=False,
    ).run()
    for f in range(F):
        areas_o, counts_o = _oracle(
            pos[f].copy(), box, radii, 1.4, 240
        )
        np.testing.assert_allclose(
            sasa.results.areas[f], areas_o, rtol=1e-9, atol=1e-9
        )
        np.testing.assert_array_equal(
            sasa.results.n_neighbors[f], counts_o
        )


def test_pbc_occlusion_across_boundary():
    # neighbor just across the periodic boundary occludes exactly
    # like the unwrapped configuration
    box = np.array([10.0, 10.0, 10.0])
    d = 2.2
    # 9.5 and (9.5 + d) % 10 = 1.7: the pair straddles the boundary
    pos_wrap = np.array([[[9.5, 5.0, 5.0], [1.7, 5.0, 5.0]]])
    pos_free = np.array([[[5.0, 5.0, 5.0], [5.0 + d, 5.0, 5.0]]])
    radii = np.array([1.5, 1.5])
    kw = dict(probe_radius=1.0, n_points=512, radii=radii,
              verbose=False)
    a = SolventAccessibleSurfaceArea(
        _universe(pos_wrap, box).atoms, **kw
    ).run().results.areas
    b = SolventAccessibleSurfaceArea(
        _universe(pos_free, box).atoms, **kw
    ).run().results.areas
    np.testing.assert_allclose(a, b, rtol=1e-9)
    assert (a < 4 * np.pi * 2.5**2 - 1e-6).all()


def test_aperiodic_no_box():
    # box-less universe: no images; two far atoms stay full spheres
    pos = np.array([[[0.0, 0.0, 0.0], [50.0, 0.0, 0.0]]])
    u = _universe(pos, None)
    sasa = SolventAccessibleSurfaceArea(
        u.atoms, probe_radius=1.4, n_points=128,
        radii=np.array([1.5, 1.5]), verbose=False,
    ).run()
    np.testing.assert_allclose(
        sasa.results.areas[0], 4 * np.pi * 2.9**2, rtol=1e-12
    )


def test_triclinic_vs_oracle_images():
    # tilted cell: compare against the same configuration replicated
    # far from boundaries in a big orthorhombic cell (the physical
    # answer must not depend on the wrapping representation)
    dims = np.array([12.0, 12.0, 12.0, 80.0, 95.0, 100.0])
    n = 40
    from mdhelper_tpu.algorithm.topology import triclinic_vectors

    h = np.asarray(triclinic_vectors(dims))
    frac = rng.random((n, 3))
    pos = frac @ h
    radii = rng.uniform(1.2, 1.8, n)
    u = _universe(pos[None], dims)
    sasa = SolventAccessibleSurfaceArea(
        u.atoms, probe_radius=1.0, n_points=200,
        radii=radii, verbose=False,
    ).run()
    # oracle: 27-image explicit neighbor copies, aperiodic test
    images = np.array(
        [
            [i, j, k]
            for i in (-1, 0, 1)
            for j in (-1, 0, 1)
            for k in (-1, 0, 1)
        ],
        dtype=np.float64,
    )
    shift = images @ h
    all_pos = (pos[None, :, :] + shift[:, None, :]).reshape(-1, 3)
    all_radii = np.tile(radii, 27)
    sphere = sphere_points(200)
    inflated = all_radii + 1.0
    center = 13 * n  # the (0,0,0) image block
    expected = np.empty(n)
    for i in range(n):
        ci = center + i
        delta = all_pos - all_pos[ci]
        d2 = (delta**2).sum(axis=1)
        touch = inflated[ci] + inflated
        cand = (d2 < touch**2) & (np.arange(27 * n) != ci)
        rel = delta[cand]
        rj2 = inflated[cand] ** 2
        q = inflated[ci] * sphere
        dd = q[:, None, :] - rel[None, :, :]
        occ = ((dd**2).sum(axis=-1) < rj2[None, :]).any(axis=1)
        expected[i] = (
            4 * np.pi / 200 * (~occ).sum() * inflated[ci] ** 2
        )
    np.testing.assert_allclose(
        sasa.results.areas[0], expected, rtol=1e-9, atol=1e-9
    )


def test_host_pipeline_matches_device():
    import os

    box = np.array([8.0, 8.0, 8.0])
    pos = rng.random((2, 48, 3)) * box
    radii = rng.uniform(1.0, 1.6, 48)
    kw = dict(probe_radius=1.2, n_points=192, radii=radii,
              verbose=False)
    dev = SolventAccessibleSurfaceArea(
        _universe(pos, box).atoms, **kw
    ).run()
    os.environ["MDTPU_HOST_PIPELINE"] = "1"
    try:
        host = SolventAccessibleSurfaceArea(
            _universe(pos, box).atoms, **kw
        ).run()
        assert host._host_pipeline
    finally:
        del os.environ["MDTPU_HOST_PIPELINE"]
    np.testing.assert_allclose(
        dev.results.areas, host.results.areas, rtol=1e-9, atol=1e-9
    )
    np.testing.assert_array_equal(
        dev.results.n_neighbors, host.results.n_neighbors
    )


def test_parallel_matches_serial():
    box = np.array([8.0, 8.0, 8.0])
    pos = rng.random((8, 32, 3)) * box
    radii = rng.uniform(1.0, 1.6, 32)
    kw = dict(probe_radius=1.2, n_points=128, radii=radii,
              verbose=False)
    serial = SolventAccessibleSurfaceArea(
        _universe(pos, box).atoms, **kw
    ).run()
    par = SolventAccessibleSurfaceArea(
        _universe(pos, box).atoms, parallel=True, **kw
    ).run()
    np.testing.assert_array_equal(
        serial.results.areas, par.results.areas
    )


def test_occluder_overflow_escalates():
    # 60 atoms crammed into a tiny cluster: everyone sees everyone,
    # exceeding a max_occluders=8 budget; run() must escalate
    # (8 -> 16 -> 32) and still overflow, raising cleanly...
    n = 60
    pos = (0.1 * rng.random((1, n, 3))) + 5.0
    box = np.array([20.0, 20.0, 20.0])
    u = _universe(pos, box)
    with pytest.warns(UserWarning, match="max_occluders"):
        with pytest.raises(OccluderOverflow):
            SolventAccessibleSurfaceArea(
                u.atoms, probe_radius=1.0, n_points=64,
                radii=np.full(n, 1.5), max_occluders=8,
                verbose=False,
            ).run()
    # ...while a budget within two doublings succeeds and matches
    # the unconstrained run
    with pytest.warns(UserWarning, match="max_occluders"):
        ok = SolventAccessibleSurfaceArea(
            u.atoms, probe_radius=1.0, n_points=64,
            radii=np.full(n, 1.5), max_occluders=32,
            verbose=False,
        ).run()
    ref = SolventAccessibleSurfaceArea(
        u.atoms, probe_radius=1.0, n_points=64,
        radii=np.full(n, 1.5), verbose=False,
    ).run()
    np.testing.assert_allclose(
        ok.results.areas, ref.results.areas, rtol=1e-12
    )


def test_escalated_retry_not_truncated():
    # regression: the failed first pass's async store queue must not
    # leak its budget-truncated chunk into the escalated retry.  Nine
    # NEAR occluders crowd the north side and a FARTHER tenth one
    # uniquely covers the south pole; the top-k-NEAREST compaction
    # under max_occluders=8 drops exactly the pole coverer, so a
    # leaked truncated chunk is numerically wrong (not merely
    # reordered) and the oracle comparison catches it.
    rng_l = np.random.default_rng(5)
    center = np.array([10.0, 10.0, 10.0])
    # near occluders on a 60-degree cone about +z: their occlusion
    # caps (half-angle 66.4 deg at d=2, R=2.5) cannot reach the far
    # occluder's south-pole cap (36.9 deg about -z), so dropping the
    # pole coverer changes atom 0's area (verified: 32.23 truncated
    # vs 24.38 correct A^2 at 480 points)
    theta = np.deg2rad(rng_l.uniform(0.0, 60.0, 9))
    phi = rng_l.uniform(0.0, 2.0 * np.pi, 9)
    near_dirs = np.stack(
        [
            np.sin(theta) * np.cos(phi),
            np.sin(theta) * np.sin(phi),
            np.cos(theta),
        ],
        axis=1,
    )
    pos = np.concatenate(
        [
            center[None],
            center + 2.0 * near_dirs,          # d = 2.0 (near)
            center + [[0.0, 0.0, -4.0]],       # d = 4.0 (far, pole)
        ]
    )[None]
    box = np.array([40.0, 40.0, 40.0])
    radii = np.full(11, 1.5)
    with pytest.warns(UserWarning, match="max_occluders"):
        sasa = SolventAccessibleSurfaceArea(
            _universe(pos, box).atoms, probe_radius=1.0,
            n_points=480, radii=radii, max_occluders=8,
            verbose=False,
        ).run()
    areas_o, counts_o = _oracle(pos[0].copy(), box, radii, 1.0, 480)
    assert counts_o[0] == 10  # the overflow atom
    np.testing.assert_allclose(
        sasa.results.areas[0], areas_o, rtol=1e-9, atol=1e-9
    )
    np.testing.assert_array_equal(
        sasa.results.n_neighbors[0], counts_o
    )


def test_escalation_budget_resets_across_runs():
    # regression: a successful escalated run must reset the retry
    # counter — a LATER run() on the same instance gets its own two
    # escalations.  Frame 0 needs one doubling (8 -> 16); frame 1
    # (everyone crammed, 40 candidates each) then needs two more
    # (16 -> 32 -> 64), which only works if run 1 reset the count.
    n = 41
    rng_l = np.random.default_rng(9)
    frame0 = np.zeros((n, 3))
    frame0[0] = [50.0, 50.0, 50.0]
    dirs = rng_l.normal(size=(10, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    frame0[1:11] = frame0[0] + 2.0 * dirs      # 10 candidates each
    frame0[11:] = (
        rng_l.random((30, 3)) * 30.0 + [[5.0, 5.0, 5.0]]
    )
    frame1 = 50.0 + 0.2 * rng_l.random((n, 3))  # all 40 in reach
    pos = np.stack([frame0, frame1])
    box = np.array([100.0, 100.0, 100.0])
    radii = np.full(n, 1.5)
    kw = dict(probe_radius=1.0, n_points=64, radii=radii,
              verbose=False)
    sasa = SolventAccessibleSurfaceArea(
        _universe(pos, box).atoms, max_occluders=8, **kw
    )
    with pytest.warns(UserWarning, match="max_occluders"):
        sasa.run(frames=np.array([0]))
    assert sasa.results.n_neighbors[0, 0] == 10
    with pytest.warns(UserWarning, match="max_occluders"):
        sasa.run(frames=np.array([1]))
    ref = SolventAccessibleSurfaceArea(
        _universe(pos[1:2], box).atoms, **kw
    ).run()
    np.testing.assert_allclose(
        sasa.results.areas, ref.results.areas, rtol=1e-12
    )


def test_min_image_reach_warning():
    import warnings as _warnings

    # inflated radius 2.9 -> reach 5.8 exceeds half a 6 A box
    pos = np.array([[[1.0, 1.0, 1.0], [4.0, 4.0, 4.0]]])
    radii = np.array([1.5, 1.5])
    with pytest.warns(UserWarning, match="occluder reach"):
        SolventAccessibleSurfaceArea(
            _universe(pos, np.array([6.0, 6.0, 6.0])).atoms,
            probe_radius=1.4, n_points=64, radii=radii,
            verbose=False,
        ).run()
    # triclinic branch: perpendicular widths gate the contract
    with pytest.warns(UserWarning, match="occluder reach"):
        SolventAccessibleSurfaceArea(
            _universe(
                pos, np.array([7.0, 7.0, 7.0, 60.0, 60.0, 80.0])
            ).atoms,
            probe_radius=1.4, n_points=64, radii=radii,
            verbose=False,
        ).run()
    # a roomy box stays silent
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        SolventAccessibleSurfaceArea(
            _universe(pos, np.array([20.0, 20.0, 20.0])).atoms,
            probe_radius=1.4, n_points=64, radii=radii,
            verbose=False,
        ).run()
    assert not any(
        "occluder reach" in str(w.message) for w in caught
    )


def test_radii_from_labels_and_overrides():
    pos = np.array([[[2.0, 2.0, 2.0], [30.0, 30.0, 30.0]]])
    box = np.array([60.0, 60.0, 60.0])
    u = _universe(
        pos, box, names=np.array(["OW", "CL"], dtype=object)
    )
    # name resolution: "OW" -> O (1.52); "CL" -> C by the organic
    # rule unless overridden
    sasa = SolventAccessibleSurfaceArea(
        u.atoms, probe_radius=1.4, n_points=96, verbose=False
    ).run()
    np.testing.assert_allclose(
        sasa.results.areas[0, 0],
        4 * np.pi * (1.52 + 1.4) ** 2,
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        sasa.results.areas[0, 1],
        4 * np.pi * (1.70 + 1.4) ** 2,
        rtol=1e-12,
    )
    over = SolventAccessibleSurfaceArea(
        u.atoms, probe_radius=1.4, n_points=96,
        radii={"CL": 1.75}, verbose=False,
    ).run()
    np.testing.assert_allclose(
        over.results.areas[0, 1],
        4 * np.pi * (1.75 + 1.4) ** 2,
        rtol=1e-12,
    )


def test_validation_errors():
    pos = np.array([[[1.0, 1.0, 1.0]]])
    u = _universe(pos, np.array([5.0, 5.0, 5.0]))
    with pytest.raises(ValueError, match="probe_radius"):
        SolventAccessibleSurfaceArea(
            u.atoms, probe_radius=-1.0, radii=np.array([1.0]),
            verbose=False,
        )
    with pytest.raises(ValueError, match="n_points"):
        SolventAccessibleSurfaceArea(
            u.atoms, n_points=0, radii=np.array([1.0]),
            verbose=False,
        )
    with pytest.raises(ValueError, match="entries"):
        SolventAccessibleSurfaceArea(
            u.atoms, radii=np.array([1.0, 2.0]), verbose=False
        )
    with pytest.raises(ValueError, match="positive"):
        SolventAccessibleSurfaceArea(
            u.atoms, radii=np.array([-1.0]), verbose=False
        )
    with pytest.raises(ValueError, match="max_occluders"):
        SolventAccessibleSurfaceArea(
            u.atoms, radii=np.array([1.0]), max_occluders=0,
            verbose=False,
        )


def test_units_metadata():
    pos = np.array([[[1.0, 1.0, 1.0]]])
    u = _universe(pos, np.array([5.0, 5.0, 5.0]))
    sasa = SolventAccessibleSurfaceArea(
        u.atoms, radii=np.array([1.0]), verbose=False
    ).run()
    assert "results.areas" in sasa.results.units
    red = SolventAccessibleSurfaceArea(
        u.atoms, radii=np.array([1.0]), reduced=True, verbose=False
    ).run()
    assert "results.areas" not in (
        getattr(red.results, "units", None) or {}
    )


def test_checkpoint_resume(tmp_path):
    box = np.array([8.0, 8.0, 8.0])
    pos = rng.random((6, 24, 3)) * box
    radii = rng.uniform(1.0, 1.5, 24)
    kw = dict(probe_radius=1.2, n_points=96, radii=radii,
              verbose=False)
    full = SolventAccessibleSurfaceArea(
        _universe(pos, box).atoms, **kw
    ).run()
    ckpt = str(tmp_path / "sasa.npz")
    partial = SolventAccessibleSurfaceArea(
        _universe(pos, box).atoms, **kw
    )
    partial.run(stop=3, checkpoint=ckpt)
    resumed = SolventAccessibleSurfaceArea(
        _universe(pos, box).atoms, **kw
    )
    resumed.run(checkpoint=ckpt)
    np.testing.assert_array_equal(
        full.results.areas, resumed.results.areas
    )
