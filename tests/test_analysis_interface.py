"""Tests for mdhelper_tpu.analysis.interface (Willard-Chandler
instantaneous interfaces; beyond reference — no counterpart exists in
/root/reference).  Oracles: a NumPy mirror of the particle-mesh
pipeline, a direct periodic Gaussian KDE sum, and capillary-wave
identities (Parseval)."""

import numpy as np
import pytest

from mdhelper_tpu.analysis.interface import WillardChandlerInterface
from mdhelper_tpu.core import Universe

rng = np.random.default_rng(53)

BOX = np.array([12.0, 12.0, 16.0])
T, N = 5, 3000
XI = 1.0
SLAB = (4.0, 12.0)  # z extent of the liquid


@pytest.fixture(scope="module")
def slab_universe():
    pos = rng.random((T, N, 3)) * np.array(
        [BOX[0], BOX[1], SLAB[1] - SLAB[0]]
    )
    pos[..., 2] += SLAB[0]
    return Universe.from_arrays(pos, BOX, dt=1.0)


def oracle_smooth(counts, box, n_cells, xi, order):
    """NumPy mirror of ops.profiles.gaussian_smooth_periodic."""
    nx, ny, nz = n_cells
    kernel = 1.0
    for ax, (n, L) in enumerate(zip(n_cells, box)):
        m = (
            np.fft.rfftfreq(n) * n
            if ax == 2
            else np.fft.fftfreq(n) * n
        )
        k = 2 * np.pi * m / L
        kern = np.exp(-0.5 * (xi * k) ** 2) / np.sinc(m / n) ** order
        shape = [1, 1, 1]
        shape[ax] = -1
        kernel = kernel * kern.reshape(shape)
    cell_volume = box.prod() / (nx * ny * nz)
    return (
        np.fft.irfftn(
            np.fft.rfftn(counts, axes=(0, 1, 2)) * kernel,
            s=n_cells,
            axes=(0, 1, 2),
        )
        / cell_volume
    )


def oracle_deposit(pts, box, n_cells, order):
    """NumPy mirror of ops.profiles.grid_deposit_frames (one frame)."""
    n = np.asarray(n_cells)
    counts = np.zeros(n_cells)
    s = pts * (n / box)
    if order == 1:
        idx = np.clip(s.astype(np.int32), 0, n - 1)
        np.add.at(counts, tuple(idx.T), 1.0)
        return counts
    s = s - 0.5
    if order == 2:
        base, offs = np.floor(s), (0, 1)
        w1d = lambda f: np.stack((1.0 - f, f), axis=-1)
    else:
        base, offs = np.round(s), (-1, 0, 1)
        w1d = lambda f: np.stack(
            (
                0.5 * (0.5 - f) ** 2,
                0.75 - f**2,
                0.5 * (0.5 + f) ** 2,
            ),
            axis=-1,
        )
    frac = s - base
    base = base.astype(np.int64)
    wts = w1d(frac)  # (N, 3, K)
    for a, oa in enumerate(offs):
        for b, ob in enumerate(offs):
            for c, oc in enumerate(offs):
                idx = (base + np.array([oa, ob, oc])) % n
                w = wts[:, 0, a] * wts[:, 1, b] * wts[:, 2, c]
                np.add.at(counts, tuple(idx.T), w)
    return counts


def oracle_pipeline(
    positions, box, n_cells, xi, level=None, axis=2, order=2
):
    """Full per-frame mirror: deposit, FFT smoothing, bulk level,
    first-crossing heights along `axis`."""
    n_cells = np.asarray(n_cells)
    fields, levels, heights = [], [], []
    for pos in positions:
        pts = pos - np.floor(pos / box) * box
        counts = oracle_deposit(pts, box, tuple(n_cells), order)
        dens = oracle_smooth(counts, box, tuple(n_cells), xi, order)
        fields.append(dens)
        if level is None:
            bulk = dens[dens >= 0.5 * dens.max()].mean()
            c = 0.5 * bulk
        else:
            c = level
        levels.append(c)

        d = np.moveaxis(dens, axis, -1)
        n_axis = n_cells[axis]
        h = box[axis] / n_axis
        above = d >= c
        occupied = above.any(axis=-1)
        lo_idx = np.argmax(above, axis=-1)
        hi_idx = n_axis - 1 - np.argmax(above[..., ::-1], axis=-1)

        def interp(first, outward):
            d_in = np.take_along_axis(
                d, first[..., None], axis=-1
            )[..., 0]
            d_out = np.take_along_axis(
                d, (first[..., None] + outward) % n_axis, axis=-1
            )[..., 0]
            denom = d_in - d_out
            with np.errstate(invalid="ignore"):
                frac = np.where(
                    denom > 0,
                    (d_in - c) / np.where(denom > 0, denom, 1.0),
                    0.0,
                )
            return np.clip(frac, 0.0, 1.0)

        lower = (lo_idx + 0.5 - interp(lo_idx, -1)) * h
        upper = (hi_idx + 0.5 + interp(hi_idx, +1)) * h
        zeta = np.stack((lower, upper)) % box[axis]
        heights.append(np.where(occupied[None], zeta, np.nan))
    return (
        np.mean(fields, axis=0),
        np.asarray(levels),
        np.stack(heights, axis=1),
    )


def test_pipeline_matches_numpy_oracle(slab_universe):
    u = slab_universe
    n_cells = (16, 16, 32)
    wc = WillardChandlerInterface(
        u.atoms, xi=XI, n_cells=n_cells, verbose=False
    ).run()
    pos = u.trajectory._positions
    field, levels, heights = oracle_pipeline(pos, BOX, n_cells, XI)
    np.testing.assert_allclose(
        wc.results.density_field, field, rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(wc.results.levels, levels, rtol=1e-9)
    np.testing.assert_allclose(
        wc.results.heights, heights, rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        wc.results.mean_heights,
        np.nanmean(heights, axis=(2, 3)),
        rtol=1e-9,
    )
    # grid centers
    for b, n, L in zip(wc.results.bins, n_cells, BOX):
        np.testing.assert_allclose(b, (np.arange(n) + 0.5) * L / n)


def test_smoothed_field_converges_to_direct_kde():
    """The particle-mesh field converges to the exact periodic
    Gaussian KDE at the grid centers as the assignment order rises
    (per-particle error ~ (kh/2)^order after deconvolution)."""
    from mdhelper_tpu.ops.profiles import (
        gaussian_smooth_periodic,
        grid_deposit_frames,
    )
    import jax.numpy as jnp

    box = np.array([8.0, 8.0, 8.0])
    n_cells = (32, 32, 32)
    xi = 1.2
    pts = rng.random((1, 12, 3)) * box

    centers = [
        (np.arange(n) + 0.5) * L / n for n, L in zip(n_cells, box)
    ]
    grid = np.stack(
        np.meshgrid(*centers, indexing="ij"), axis=-1
    )  # (nx, ny, nz, 3)
    kde = np.zeros(n_cells)
    images = np.array(
        np.meshgrid(*([[-1, 0, 1]] * 3), indexing="ij")
    ).reshape(3, -1).T
    norm = (2 * np.pi * xi**2) ** -1.5
    for p in pts[0]:
        for img in images:
            d2 = ((grid - p - img * box) ** 2).sum(axis=-1)
            kde += norm * np.exp(-0.5 * d2 / xi**2)

    errs = {}
    for order in (1, 2, 3):
        counts = grid_deposit_frames(
            jnp.asarray(pts), n_cells, jnp.asarray(box), order
        )
        # each particle deposits total weight 1 at every order
        np.testing.assert_allclose(
            np.asarray(counts).sum(), pts.shape[1], rtol=1e-12
        )
        dens = np.asarray(
            gaussian_smooth_periodic(
                counts, jnp.asarray(box), xi, order
            )
        )[0]
        errs[order] = np.abs(dens - kde).max() / kde.max()
    assert errs[2] < 0.25 * errs[1]
    assert errs[3] < 0.5 * errs[2]
    assert errs[3] < 2e-3


def test_slab_physics(slab_universe):
    wc = WillardChandlerInterface(
        slab_universe.atoms, xi=XI, verbose=False
    ).run()
    res = wc.results
    # no unresolved columns in a dense slab
    assert not np.isnan(res.heights).any()
    # interfaces at the slab edges, within the coarse-graining width
    lower, upper = res.mean_heights.mean(axis=1)
    assert abs(lower - SLAB[0]) < 0.5 * XI
    assert abs(upper - SLAB[1]) < 0.5 * XI
    # capillary roughness of an ideal-gas slab is small but nonzero
    assert 0 < res.interface_width[0] < XI
    assert 0 < res.interface_width[1] < XI
    # level = half the bulk density
    bulk = N / (BOX[0] * BOX[1] * (SLAB[1] - SLAB[0]))
    np.testing.assert_allclose(res.levels, 0.5 * bulk, rtol=0.15)
    # the smoothed field integrates to N
    cell_volume = BOX.prod() / res.density_field.size
    np.testing.assert_allclose(
        res.density_field.sum() * cell_volume, N, rtol=1e-9
    )


def test_fixed_level_and_axis(slab_universe):
    """axis='x' + explicit level runs the same crossing logic along
    x (the slab spans the full x range, so every column crosses at
    the box faces or never — NaN columns allowed)."""
    u = slab_universe
    n_cells = (32, 16, 16)
    wc = WillardChandlerInterface(
        u.atoms, axis="x", xi=XI, n_cells=n_cells, level=0.8,
        verbose=False,
    ).run()
    pos = u.trajectory._positions
    field, levels, heights = oracle_pipeline(
        pos, BOX, n_cells, XI, level=0.8, axis=0
    )
    np.testing.assert_allclose(wc.results.levels, levels)
    np.testing.assert_allclose(
        wc.results.heights, heights, rtol=1e-7, atol=1e-9
    )
    assert wc.results.heights.shape == (2, T, 16, 16)


def test_spectrum_parseval_and_surface_tension(slab_universe):
    wc = WillardChandlerInterface(
        slab_universe.atoms, xi=XI, verbose=False
    ).run()
    wc.calculate_spectrum()
    q = wc.results.spectrum_wavenumbers
    spec = wc.results.spectrum
    assert q.ndim == 1 and (q > 0).all()
    assert spec.shape == (2, len(q))
    assert np.isfinite(spec).all() and (spec >= 0).all()

    # Parseval: sum_q |zeta_q|^2 = <fluct^2>_r, so the shell sums
    # reconstruct the squared roughness exactly (no-NaN data).
    n1, n2 = wc.results.heights.shape[2:]
    L1, L2 = BOX[0], BOX[1]
    dq = 2 * np.pi / max(L1, L2)
    q1 = 2 * np.pi * np.fft.fftfreq(n1, d=L1 / n1)
    q2 = 2 * np.pi * np.fft.fftfreq(n2, d=L2 / n2)
    shells = np.round(
        np.hypot(q1[:, None], q2[None, :]) / dq
    ).astype(int)
    counts = np.bincount(shells.ravel())[1:]  # q > 0 shells
    for side in range(2):
        total = (spec[side] * counts).sum() / (L1 * L2)
        np.testing.assert_allclose(
            total, wc.results.interface_width[side] ** 2, rtol=1e-9
        )

    wc.calculate_surface_tension(300.0)
    gamma = wc.results.surface_tension
    assert gamma.shape == (2,) and (gamma > 0).all()

    # reduced units: plain kT scale, no unit metadata
    red = WillardChandlerInterface(
        slab_universe.atoms, xi=XI, reduced=True, verbose=False
    ).run()
    red.calculate_surface_tension(1.0)
    assert np.isfinite(red.results.surface_tension).all()
    assert not (red.results.units or {})


def test_residue_com_grouping():
    """Dimers with coincident atoms: the residue-COM field equals the
    atoms field of the deduplicated system."""
    box = np.array([10.0, 10.0, 10.0])
    single = rng.random((3, 40, 3)) * box
    paired = np.repeat(single, 2, axis=1)
    u_pair = Universe.from_arrays(
        paired, box,
        masses=np.ones(80),
        resindices=np.repeat(np.arange(40), 2),
        dt=1.0,
    )
    u_single = Universe.from_arrays(single, box, dt=1.0)
    kw = dict(xi=1.5, n_cells=16, level=0.02, verbose=False)
    wc_pair = WillardChandlerInterface(
        u_pair.atoms, "residues", **kw
    ).run()
    wc_single = WillardChandlerInterface(u_single.atoms, **kw).run()
    np.testing.assert_allclose(
        wc_pair.results.density_field,
        wc_single.results.density_field,
        rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_allclose(
        wc_pair.results.heights,
        wc_single.results.heights,
        rtol=1e-9, atol=1e-12,
    )


def test_group_order_invariance():
    """Residue-COM results must not depend on the ORDER of the atom
    group: masses/segment ids are group-ordered, so the stream must
    be too (regression: a sorted stream paired wrong atoms with
    wrong masses for non-ascending groups)."""
    box = np.array([10.0, 10.0, 10.0])
    pos = rng.random((3, 40, 3)) * box
    u = Universe.from_arrays(
        pos, box,
        masses=rng.uniform(1.0, 16.0, 40),
        resindices=np.repeat(np.arange(20), 2),
        dt=1.0,
    )
    kw = dict(
        grouping="residues", xi=1.5, n_cells=16, level=0.02,
        verbose=False,
    )
    fwd = WillardChandlerInterface(u.atoms, **kw).run()
    rev = WillardChandlerInterface(u.atoms[::-1], **kw).run()
    np.testing.assert_allclose(
        fwd.results.density_field,
        rev.results.density_field,
        rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_allclose(
        fwd.results.heights, rev.results.heights,
        rtol=1e-9, atol=1e-9,
    )


def test_per_frame_npt_boxes():
    """Fluctuating (NPT) boxes: every frame wraps/deposits/smooths
    against its own cell — each frame matches the NumPy oracle run
    at that frame's box (regression: the constructor box used to be
    baked into the whole run)."""
    base = np.array([10.0, 10.0, 14.0])
    scales = np.array([1.0, 1.08, 0.94])
    boxes = base * scales[:, None]
    n_cells = (16, 16, 32)
    pos = np.empty((3, 500, 3))
    for t in range(3):
        pos[t] = rng.random((500, 3)) * np.array(
            [boxes[t, 0], boxes[t, 1], 0.5 * boxes[t, 2]]
        ) + np.array([0.0, 0.0, 0.25 * boxes[t, 2]])
    u = Universe.from_arrays(
        pos,
        np.concatenate(
            [boxes, np.full((3, 3), 90.0)], axis=1
        ),
        dt=1.0,
    )
    wc = WillardChandlerInterface(
        u.atoms, xi=1.2, n_cells=n_cells, verbose=False
    ).run()
    fields = []
    for t in range(3):
        field_t, levels_t, heights_t = oracle_pipeline(
            pos[t:t + 1], boxes[t], np.asarray(n_cells), 1.2
        )
        fields.append(field_t)
        np.testing.assert_allclose(
            wc.results.levels[t], levels_t[0], rtol=1e-9
        )
        np.testing.assert_allclose(
            wc.results.heights[:, t], heights_t[:, 0],
            rtol=1e-7, atol=1e-9,
        )
    np.testing.assert_allclose(
        wc.results.density_field, np.mean(fields, axis=0),
        rtol=1e-9, atol=1e-12,
    )


def test_parallel_bit_equality(slab_universe):
    kw = dict(xi=XI, n_cells=(16, 16, 32), verbose=False)
    serial = WillardChandlerInterface(
        slab_universe.atoms, **kw
    ).run()
    par = WillardChandlerInterface(
        slab_universe.atoms, parallel=True, **kw
    ).run()
    # cross-frame reduction order differs under sharding: ulp-level
    np.testing.assert_allclose(
        par.results.density_field,
        serial.results.density_field,
        rtol=1e-12, atol=1e-15,
    )
    np.testing.assert_array_equal(
        par.results.heights, serial.results.heights
    )
    np.testing.assert_array_equal(
        par.results.levels, serial.results.levels
    )


def test_checkpoint_resume(slab_universe, tmp_path):
    ckpt = str(tmp_path / "wc.npz")
    kw = dict(xi=XI, n_cells=(16, 16, 16), verbose=False)
    make = lambda: WillardChandlerInterface(
        slab_universe.atoms, **kw
    )
    make().run(stop=3, checkpoint=ckpt)  # "killed" after 3 frames
    resumed = make().run(checkpoint=ckpt)
    straight = make().run()
    np.testing.assert_allclose(
        resumed.results.density_field,
        straight.results.density_field,
        rtol=1e-12,
    )
    np.testing.assert_array_equal(
        resumed.results.heights, straight.results.heights
    )


def test_validation():
    box = np.array([8.0, 8.0, 8.0])
    pos = rng.random((2, 20, 3)) * box
    u = Universe.from_arrays(pos, box, dt=1.0)
    with pytest.raises(ValueError, match="axis"):
        WillardChandlerInterface(u.atoms, axis="w", verbose=False)
    with pytest.raises(ValueError, match="n_cells"):
        WillardChandlerInterface(u.atoms, n_cells=2, verbose=False)
    with pytest.raises(ValueError, match="xi"):
        WillardChandlerInterface(u.atoms, xi=0.0, verbose=False)
    with pytest.raises(ValueError, match="grouping"):
        WillardChandlerInterface(
            u.atoms, "molecules", verbose=False
        )
    tric = Universe.from_arrays(
        pos, np.array([8.0, 8.0, 8.0, 80.0, 90.0, 90.0]), dt=1.0
    )
    with pytest.raises(ValueError, match="orthorhombic"):
        WillardChandlerInterface(tric.atoms, verbose=False)


# ---------------------------------------------------------------------------
# IntrinsicDensityProfile


def oracle_interp(map2d, frac):
    """NumPy mirror of interface.interpolate_height_maps (one map)."""
    n1, n2 = map2d.shape
    u = frac[:, 0] * n1 - 0.5
    v = frac[:, 1] * n2 - 0.5
    i0 = np.floor(u).astype(int)
    j0 = np.floor(v).astype(int)
    fu, fv = u - i0, v - j0
    out = np.zeros(len(frac))
    for a in (0, 1):
        for b in (0, 1):
            w = (fu if a else 1 - fu) * (fv if b else 1 - fv)
            out += w * map2d[(i0 + a) % n1, (j0 + b) % n2]
    return out


def oracle_intrinsic(
    positions, box, n_cells, xi, edges, axis=2, order=2, level=None
):
    """Full NumPy mirror: WC heights per frame, signed min-image
    distances (positive into the liquid), histogram per side."""
    t1, t2 = (a for a in range(3) if a != axis)
    _, _, heights = oracle_pipeline(
        positions, box, np.asarray(n_cells), xi, level=level,
        axis=axis, order=order,
    )
    counts = np.zeros((2, len(edges) - 1))
    L = box[axis]
    for t, pos in enumerate(positions):
        pts = pos - np.floor(pos / box) * box
        frac = np.stack(
            (pts[:, t1] / box[t1], pts[:, t2] / box[t2]), axis=-1
        )
        z = pts[:, axis]
        for s, sign in ((0, 1.0), (1, -1.0)):
            zeta = oracle_interp(heights[s, t], frac)
            d = sign * (z - zeta)
            d = d - L * np.round(d / L)
            counts[s] += np.histogram(
                d[np.isfinite(d)], bins=edges
            )[0]
    return counts


def test_intrinsic_matches_numpy_oracle(slab_universe):
    from mdhelper_tpu.analysis.interface import (
        IntrinsicDensityProfile,
    )

    u = slab_universe
    n_cells = (16, 16, 32)
    idp = IntrinsicDensityProfile(
        u.atoms, xi=XI, n_cells=n_cells, n_bins=64,
        range=(-5.0, 5.0), verbose=False,
    ).run()
    counts = oracle_intrinsic(
        u.trajectory._positions, BOX, n_cells, XI,
        idp.results.edges,
    )
    np.testing.assert_allclose(
        idp.results.counts[0], counts, atol=1e-9
    )
    # normalization: rho = counts / (2 A dd T) for side="both"
    dd = idp.results.edges[1] - idp.results.edges[0]
    np.testing.assert_allclose(
        idp.results.number_densities[0],
        counts.sum(0) / (2 * BOX[0] * BOX[1] * dd * T),
        rtol=1e-12,
    )
    # deep-liquid plateau = bulk density
    bulk = N / (BOX[0] * BOX[1] * (SLAB[1] - SLAB[0]))
    np.testing.assert_allclose(
        idp.results.number_densities[0][-10:].mean(), bulk, rtol=0.1
    )


def test_intrinsic_sides(slab_universe):
    from mdhelper_tpu.analysis.interface import (
        IntrinsicDensityProfile,
    )

    u = slab_universe
    kw = dict(
        xi=XI, n_cells=(16, 16, 32), n_bins=48, range=(-4.0, 4.0),
        verbose=False,
    )
    both = IntrinsicDensityProfile(u.atoms, **kw).run()
    lower = IntrinsicDensityProfile(u.atoms, side="lower", **kw).run()
    upper = IntrinsicDensityProfile(u.atoms, side="upper", **kw).run()
    np.testing.assert_allclose(
        both.results.number_densities,
        0.5 * (
            lower.results.number_densities
            + upper.results.number_densities
        ),
        rtol=1e-12,
    )


def test_intrinsic_sharpens_corrugated_slab():
    """The whole point of intrinsic profiles: a corrugated slab's
    lab-frame edge is smeared over the corrugation amplitude, while
    the interface-relative edge stays sharp."""
    from mdhelper_tpu.analysis.interface import (
        IntrinsicDensityProfile,
    )

    box = np.array([24.0, 6.0, 24.0])
    amp, z_lo, z_up = 2.0, 6.0, 18.0
    T_, N_ = 3, 20000
    pos = np.empty((T_, N_, 3))
    for t in range(T_):
        x = rng.uniform(0, box[0], N_)
        y = rng.uniform(0, box[1], N_)
        zeta = amp * np.sin(2 * np.pi * x / box[0] + t)
        z = zeta + rng.uniform(z_lo, z_up, N_)
        pos[t] = np.stack((x, y, z), axis=-1)
    u = Universe.from_arrays(pos, box, dt=1.0)
    edges_d = np.linspace(-4, 4, 81)
    idp = IntrinsicDensityProfile(
        u.atoms, xi=1.0, n_cells=(64, 8, 64), n_bins=80,
        range=(-4.0, 4.0), verbose=False,
    ).run()
    dens = idp.results.number_densities[0]
    bulk = N_ / (box[0] * box[1] * (z_up - z_lo))

    # lab-frame profile of the lower edge region
    z_edges = np.linspace(z_lo - amp - 2, z_lo + amp + 2, 81)
    lab = (
        np.histogram(pos[..., 2].ravel(), bins=z_edges)[0]
        / (T_ * box[0] * box[1] * (z_edges[1] - z_edges[0]))
    )

    def edge_width(x, rho):
        lo = x[np.searchsorted(rho > 0.25 * bulk, True)]
        hi = x[np.searchsorted(rho > 0.75 * bulk, True)]
        return hi - lo

    d_centers = (edges_d[:-1] + edges_d[1:]) / 2
    z_centers = (z_edges[:-1] + z_edges[1:]) / 2
    w_intr = edge_width(d_centers, dens)
    w_lab = edge_width(z_centers, lab)
    # smeared over the corrugation: the arcsine height distribution
    # has 25-75% quantile width 2 amp cos(pi/4) ~ 2.83
    assert w_lab > 2 * amp * np.cos(np.pi / 4) * 0.85
    assert w_intr < 0.5 * w_lab  # intrinsic edge is much sharper
    np.testing.assert_allclose(dens[-15:].mean(), bulk, rtol=0.05)


def test_intrinsic_charges_and_groups():
    from mdhelper_tpu.analysis.interface import (
        IntrinsicDensityProfile,
    )

    box = np.array([10.0, 10.0, 14.0])
    n_w, n_i = 600, 100
    pos = rng.random((3, n_w + 2 * n_i, 3)) * np.array(
        [10.0, 10.0, 7.0]
    ) + np.array([0.0, 0.0, 3.5])
    u = Universe.from_arrays(
        pos, box,
        charges=np.concatenate(
            (np.zeros(n_w), np.ones(n_i), -np.ones(n_i))
        ),
        dt=1.0,
    )
    water = u.atoms[:n_w]
    cat = u.atoms[n_w:n_w + n_i]
    an = u.atoms[n_w + n_i:]
    idp = IntrinsicDensityProfile(
        water, [cat, an], xi=1.2, n_cells=16, n_bins=32,
        range=(-3.0, 3.0), verbose=False,
    ).run()
    assert idp.results.number_densities.shape == (2, 32)
    np.testing.assert_allclose(
        idp.results.charge_densities,
        idp.results.number_densities[0]
        - idp.results.number_densities[1],
        rtol=1e-12,
    )
    idp.calculate_pmf(300.0)
    assert idp.results.pmf.shape == (2, 32)


def test_intrinsic_minimum_image():
    """An analyte atom just across the periodic boundary from the
    upper interface gets a small NEGATIVE distance, not ~+L."""
    from mdhelper_tpu.analysis.interface import (
        IntrinsicDensityProfile,
    )

    box = np.array([10.0, 10.0, 20.0])
    surf = rng.random((1, 2000, 3)) * np.array([10.0, 10.0, 8.0])
    surf[..., 2] += 9.0  # slab z in [9, 17]
    probe = np.array([[[5.0, 5.0, 0.5]]])  # 3.5 A past z=17 via PBC
    pos = np.concatenate((surf, probe), axis=1)
    u = Universe.from_arrays(pos, box, dt=1.0)
    idp = IntrinsicDensityProfile(
        u.atoms[:-1], [u.atoms[-1:]], xi=1.0,
        n_cells=(16, 16, 32), n_bins=40, range=(-10.0, 10.0),
        side="upper", verbose=False,
    ).run()
    counts = idp.results.counts[0, 1]
    bin_of = np.flatnonzero(counts)
    assert len(bin_of) == 1
    d = idp.results.bins[bin_of[0]]
    assert -5.0 < d < -2.0, d


def test_intrinsic_parallel_and_checkpoint(slab_universe, tmp_path):
    from mdhelper_tpu.analysis.interface import (
        IntrinsicDensityProfile,
    )

    kw = dict(
        xi=XI, n_cells=(16, 16, 32), n_bins=48, range=(-4.0, 4.0),
        verbose=False,
    )
    serial = IntrinsicDensityProfile(slab_universe.atoms, **kw).run()
    par = IntrinsicDensityProfile(
        slab_universe.atoms, parallel=True, **kw
    ).run()
    np.testing.assert_allclose(
        par.results.counts, serial.results.counts, rtol=1e-12
    )

    ckpt = str(tmp_path / "idp.npz")
    make = lambda: IntrinsicDensityProfile(
        slab_universe.atoms, **kw
    )
    make().run(stop=3, checkpoint=ckpt)
    resumed = make().run(checkpoint=ckpt)
    np.testing.assert_allclose(
        resumed.results.counts, serial.results.counts, rtol=1e-12
    )


def test_intrinsic_pmf_zero_reference():
    """A group with zero density in the default reference window
    (e.g. purely surface-adsorbed species) warns and gets NaN PMF
    instead of a silent RuntimeWarning/nan mix."""
    import warnings as _warnings

    from mdhelper_tpu.analysis.interface import (
        IntrinsicDensityProfile,
    )

    box = np.array([10.0, 10.0, 14.0])
    n_w, n_i = 600, 80
    pos = rng.random((2, n_w + n_i, 3)) * np.array(
        [10.0, 10.0, 7.0]
    ) + np.array([0.0, 0.0, 3.5])
    # adsorbates strictly OUTSIDE the liquid (d < 0 on both sides)
    pos[:, n_w:, 2] = 1.5 + rng.normal(0, 0.1, (2, n_i))
    u = Universe.from_arrays(pos, box, dt=1.0)
    idp = IntrinsicDensityProfile(
        u.atoms[:n_w], [u.atoms[:n_w], u.atoms[n_w:]], xi=1.2,
        n_cells=16, n_bins=32, range=(-3.0, 3.0), verbose=False,
    ).run()
    assert idp.results.counts[1].sum() > 0
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        idp.calculate_pmf(300.0)
    assert any(
        "reference_densities" in str(x.message) for x in w
    )
    assert np.isnan(idp.results.pmf[1]).all()
    assert np.isfinite(idp.results.pmf[0]).any()
    idp.calculate_pmf(300.0, reference_densities=[1.0, 0.1])
    assert np.isfinite(idp.results.pmf[1]).any()


def test_intrinsic_validation(slab_universe):
    from mdhelper_tpu.analysis.interface import (
        IntrinsicDensityProfile,
    )

    with pytest.raises(ValueError, match="side"):
        IntrinsicDensityProfile(
            slab_universe.atoms, side="top", verbose=False
        )
    with pytest.raises(ValueError, match="range"):
        IntrinsicDensityProfile(
            slab_universe.atoms, range=(2.0, -2.0), verbose=False
        )
    with pytest.raises(ValueError, match="surface_grouping"):
        IntrinsicDensityProfile(
            slab_universe.atoms, surface_grouping="molecules",
            verbose=False,
        )
