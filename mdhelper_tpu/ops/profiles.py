"""
Density-profile binning kernels
===============================

Per-axis 1-D histogramming for density/charge profiles (reference hot
loop: ``/root/reference/src/mdhelper/analysis/profile.py:807-818``, a
per-frame ``numpy.histogram`` per group per axis).  Binning runs in the
coordinates' dtype (mixing float64 edges into a float32 batch would
promote onto the TPU's emulated-f64 path) and accumulates scatter-free
via a two-level one-hot digit contraction on the MXU (scatter-adds
serialize on TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np

from .doublefloat import df_add, df_sub

__all__ = [
    "axis_histogram_batch",
    "gaussian_smooth_periodic",
    "grid_deposit_frames",
    "plane_histogram_batch",
    "volume_histogram_batch",
]


def _bin_indices(coords, edges, n_bins):
    """np.histogram bin indices along one axis; out-of-range marked
    by a False weight (idx clamped in-range for the one-hot)."""

    edges = edges.astype(coords.dtype)
    idx = jnp.searchsorted(edges, coords, side="right") - 1
    idx = jnp.where(coords == edges[-1], n_bins - 1, idx)
    in_range = (coords >= edges[0]) & (coords <= edges[-1])
    return jnp.clip(idx, 0, n_bins - 1), in_range


def plane_histogram_batch(
    coords, mask, edges_x, edges_y, weights=None
):
    r"""2-D histogram of per-atom plane coordinates over a frame
    batch — one one-hot outer-product matmul per frame (MXU;
    scatter-adds serialize on TPU).

    Parameters
    ----------
    coords : `jax.Array`
        Plane coordinates, shape ``(B, N, 2)``.
    mask : `jax.Array`
        Frame validity mask, shape ``(B,)``.
    edges_x, edges_y : `jax.Array`
        Bin edges (np.histogram semantics).
    weights : `jax.Array`, optional
        Per-atom weights, shape ``(N,)`` (e.g. charges).

    Returns
    -------
    counts : `jax.Array`
        Counts summed over real frames, shape ``(n_x, n_y)``.
    """

    n_x = edges_x.shape[0] - 1
    n_y = edges_y.shape[0] - 1
    dtype = jnp.float32

    def frame(args):
        xy, m = args
        ix, ok_x = _bin_indices(xy[:, 0], edges_x, n_x)
        iy, ok_y = _bin_indices(xy[:, 1], edges_y, n_y)
        w = (ok_x & ok_y).astype(dtype) * m.astype(dtype)
        if weights is not None:
            w = w * weights.astype(dtype)
        onehot_x = (
            ix[:, None]
            == jax.lax.broadcasted_iota(
                jnp.int32, (ix.shape[0], n_x), 1
            )
        ).astype(dtype)
        onehot_y = (
            iy[:, None]
            == jax.lax.broadcasted_iota(
                jnp.int32, (iy.shape[0], n_y), 1
            )
        ).astype(dtype) * w[:, None]
        # HIGHEST: onehot_y carries real-valued weights (charges);
        # the default bf16 pass would round them (~4e-3 relative).
        return jax.lax.dot_general(
            onehot_x, onehot_y,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    counts = jax.lax.map(frame, (coords, mask)).sum(axis=0)
    out = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return counts.astype(out)


def volume_histogram_batch(
    coords, mask, edges_x, edges_y, edges_z,
    weights=None, block: int = 2048,
):
    r"""3-D histogram of per-atom coordinates over a frame batch —
    scatter-free: per point block, a one-hot ``(bk, n_x)`` matrix
    contracts against a weighted one-hot ``(bk, n_y n_z)`` matrix on
    the MXU (the combined :math:`y n_z + z` minor index keeps the
    per-block intermediate at ``bk (n_x + n_y n_z)`` floats instead
    of the full ``bk n_x n_y n_z`` outer product).

    Parameters
    ----------
    coords : `jax.Array`
        Coordinates, shape ``(B, N, 3)``.
    mask : `jax.Array`
        Frame validity mask, shape ``(B,)``.
    edges_x, edges_y, edges_z : `jax.Array`
        Bin edges (np.histogram semantics).
    weights : `jax.Array`, optional
        Per-atom weights, shape ``(N,)``.
    block : `int`, default 2048
        Point-block size (bounds the one-hot intermediates).

    Returns
    -------
    counts : `jax.Array`
        Counts summed over real frames, ``(n_x, n_y, n_z)``.
    """

    n_x = edges_x.shape[0] - 1
    n_y = edges_y.shape[0] - 1
    n_z = edges_z.shape[0] - 1
    n = coords.shape[1]
    dtype = jnp.float32
    # bound the (bk, n_y n_z) one-hot to ~16 MB of f32 regardless of
    # the voxel grid (a fixed block would cost 512 MB at 256^3)
    budget = 4_000_000
    bk = int(
        min(block, max(8, budget // max(1, n_y * n_z)), max(n, 1))
    )
    n_pad = int(-(-n // bk) * bk)

    def frame(args):
        xyz, m = args
        ix, ok_x = _bin_indices(xyz[:, 0], edges_x, n_x)
        iy, ok_y = _bin_indices(xyz[:, 1], edges_y, n_y)
        iz, ok_z = _bin_indices(xyz[:, 2], edges_z, n_z)
        w = (ok_x & ok_y & ok_z).astype(dtype) * m.astype(dtype)
        if weights is not None:
            w = w * weights.astype(dtype)
        iyz = iy * n_z + iz
        ix_p = jnp.pad(ix, (0, n_pad - n))
        iyz_p = jnp.pad(iyz, (0, n_pad - n))
        w_p = jnp.pad(w, (0, n_pad - n))

        def body(acc, start):
            ixb = jax.lax.dynamic_slice(ix_p, (start,), (bk,))
            iyzb = jax.lax.dynamic_slice(iyz_p, (start,), (bk,))
            wb = jax.lax.dynamic_slice(w_p, (start,), (bk,))
            onehot_x = (
                ixb[:, None]
                == jax.lax.broadcasted_iota(
                    jnp.int32, (bk, n_x), 1
                )
            ).astype(dtype)
            onehot_yz = (
                iyzb[:, None]
                == jax.lax.broadcasted_iota(
                    jnp.int32, (bk, n_y * n_z), 1
                )
            ).astype(dtype) * wb[:, None]
            # HIGHEST: real-valued weights (charges) must not take
            # the default bf16 MXU pass
            part = jax.lax.dot_general(
                onehot_x, onehot_yz,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            return acc + part, None

        starts = jnp.arange(
            n_pad // bk, dtype=jnp.int32
        ) * jnp.int32(bk)
        acc0 = jnp.zeros((n_x, n_y * n_z), dtype=dtype)
        acc, _ = jax.lax.scan(body, acc0, starts)
        return acc

    # frame sum as a scan carry: lax.map would materialize the full
    # (B, n_x, n_y n_z) stack before reducing (GBs at 256^3)
    def frame_body(acc, args):
        return acc + frame(args), None

    counts, _ = jax.lax.scan(
        frame_body,
        jnp.zeros((n_x, n_y * n_z), dtype=dtype),
        (coords, mask),
    )
    out = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return counts.reshape(n_x, n_y, n_z).astype(out)


def grid_deposit_frames(coords, n_cells_dim, box, order=1):
    r"""Particle-mesh deposit of wrapped coordinates onto a 3-D grid,
    per frame, scatter-free: (corner id, weight) pairs are sorted by
    cell id and per-cell totals read off as differences of the
    weight cumsum at ``searchsorted`` run boundaries (the slot-table
    trick from :mod:`mdhelper_tpu.ops.pallas_cell_histogram`) —
    scatter-adds serialize on TPU, a sort does not.

    Grid point :math:`i` sits at the cell center :math:`(i+1/2)h`;
    the P3M assignment windows about it are

    * ``order=1`` — nearest grid point (1 corner, exact counts);
    * ``order=2`` — cloud-in-cell (8 corners, linear weights);
    * ``order=3`` — triangular-shaped cloud (27 corners, quadratic
      B-spline weights).

    Per-particle assignment error after window deconvolution
    (:func:`gaussian_smooth_periodic`) scales as
    :math:`(kh/2)^\mathrm{order}`, so CIC/TSC deposits converge to
    the exact kernel density estimate much faster than NGP.

    Parameters
    ----------
    coords : `jax.Array`
        Wrapped coordinates in ``[0, L)``, shape ``(B, N, 3)``.
    n_cells_dim : `tuple`
        Static grid shape ``(nx, ny, nz)``.
    box : `jax.Array`
        Orthorhombic box lengths, shape ``(3,)`` or per-frame
        ``(B, 3)``.
    order : `int`, default 1
        Assignment order (1, 2 or 3).

    Returns
    -------
    counts : `jax.Array`
        Per-frame deposited fields, shape ``(B, nx, ny, nz)``, in
        the coordinates' dtype; each particle contributes total
        weight 1.
    """

    nx, ny, nz = (int(n) for n in n_cells_dim)
    n_cells = nx * ny * nz
    dtype = coords.dtype
    dims = jnp.asarray([nx, ny, nz], dtype=dtype)
    dims_i = jnp.asarray([nx, ny, nz], dtype=jnp.int32)
    probes = jnp.arange(n_cells + 1, dtype=jnp.int32)
    scale = dims / jnp.asarray(box, dtype)
    if scale.ndim == 2:  # per-frame boxes: (B, 3) -> (B, 1, 3)
        scale = scale[:, None, :]
    scaled = coords * scale

    if order == 1:
        cell = jnp.clip(
            jax.lax.convert_element_type(scaled, jnp.int32),
            0,
            dims_i - 1,
        )
        cid = (cell[..., 0] * ny + cell[..., 1]) * nz + cell[..., 2]
        sorted_cid = jnp.sort(cid, axis=1)
        bounds = jax.vmap(
            lambda s: jnp.searchsorted(s, probes, side="left")
        )(sorted_cid)
        counts = jnp.diff(bounds, axis=1).astype(dtype)
        return counts.reshape(coords.shape[0], nx, ny, nz)

    if order == 2:
        # cell-center coordinates; corners floor(s) and floor(s)+1
        s = scaled - 0.5
        base = jnp.floor(s)
        frac = s - base
        offsets = np.array([0, 1], dtype=np.int32)
        weights_1d = lambda f: jnp.stack((1.0 - f, f), axis=-1)
    elif order == 3:
        s = scaled - 0.5
        base = jnp.round(s)
        d = s - base  # in [-1/2, 1/2]
        offsets = np.array([-1, 0, 1], dtype=np.int32)
        weights_1d = lambda f: jnp.stack(
            (
                0.5 * (0.5 - f) ** 2,
                0.75 - f**2,
                0.5 * (0.5 + f) ** 2,
            ),
            axis=-1,
        )
        frac = d
    else:
        raise ValueError("order must be 1, 2 or 3.")

    base = jax.lax.convert_element_type(base, jnp.int32)
    # (B, N, 3, K) per-axis corner indices (periodic) and weights
    idx = jnp.mod(
        base[..., None] + offsets, dims_i[None, None, :, None]
    )
    wts = weights_1d(frac)  # (B, N, 3, K)
    k = len(offsets)
    # flatten the K^3 corners: ids (B, N*K^3), weights (B, N*K^3)
    cid = (
        (idx[..., 0, :, None, None] * ny + idx[..., 1, None, :, None])
        * nz
        + idx[..., 2, None, None, :]
    ).reshape(coords.shape[0], -1)
    weight = (
        wts[..., 0, :, None, None]
        * wts[..., 1, None, :, None]
        * wts[..., 2, None, None, :]
    ).reshape(coords.shape[0], -1)

    def one_frame(ids, w):
        ids, w = jax.lax.sort((ids, w), num_keys=1)
        # Double-float running sum: a plain float32 cumsum's rounding
        # rides the O(N) running total, so differences between nearby
        # boundaries (a cell's weight, O(1)) would be swamped late in
        # the scan.  The compensated pair keeps per-cell totals exact
        # to float32 inputs at any N.
        zero = jnp.zeros((1,), dtype=w.dtype)
        hi, lo = jax.lax.associative_scan(
            df_add, (w, jnp.zeros_like(w))
        )
        hi = jnp.concatenate((zero, hi))
        lo = jnp.concatenate((zero, lo))
        bounds = jnp.searchsorted(ids, probes, side="left")
        d_hi, d_lo = df_sub(
            (hi[bounds[1:]], lo[bounds[1:]]),
            (hi[bounds[:-1]], lo[bounds[:-1]]),
        )
        return d_hi + d_lo

    counts = jax.vmap(one_frame)(cid, weight)
    return counts.reshape(coords.shape[0], nx, ny, nz).astype(dtype)


def gaussian_smooth_periodic(fields, box, xi, order=1):
    r"""Periodic Gaussian smoothing of per-frame grid deposits by 3-D
    real FFTs: the coarse-grained density of Willard & Chandler
    (J. Phys. Chem. B 114, 1954 (2010)), evaluated particle-mesh
    style — deposit, then convolve with the normalized Gaussian
    :math:`\phi(r) = (2\pi\xi^2)^{-3/2}\exp(-r^2/2\xi^2)` in Fourier
    space where the periodic image sum is exact
    (:math:`\hat\phi(k) = e^{-k^2\xi^2/2}`).

    Parameters
    ----------
    fields : `jax.Array`
        Per-frame deposits from :func:`grid_deposit_frames`, shape
        ``(B, nx, ny, nz)``.
    box : `jax.Array`
        Orthorhombic box lengths, shape ``(3,)`` or per-frame
        ``(B, 3)``.
    xi : `float`
        Gaussian coarse-graining width :math:`\xi` (Angstrom).
    order : `int`, default 1
        Assignment order of the deposit (see
        :func:`grid_deposit_frames`): divides by the B-spline window
        :math:`\prod_a \mathrm{sinc}^{\,\mathrm{order}}(k_a h_a/2)`
        (the P3M/PME deconvolution), undoing the deposit's blur.
        The window is :math:`\geq (2/\pi)^\mathrm{order}` at the
        grid Nyquist, so the division is well-conditioned at any
        grid size.  ``order=0`` skips the deconvolution.

    Returns
    -------
    density : `jax.Array`
        Smoothed number densities (length^-3), shape
        ``(B, nx, ny, nz)``, in the fields' dtype: the deposits are
        divided by the grid-cell volume so the field integrates to
        the particle count.
    """

    nx, ny, nz = (int(n) for n in fields.shape[1:])
    dtype = fields.dtype
    box = jnp.asarray(box, dtype)
    batched = box.ndim == 2  # per-frame boxes: kernel grows a B axis
    # Integer mode numbers are static; wavevectors k_a = 2 pi m_a / L_a
    # pick up the (possibly traced) box only as a scale factor.
    mx = np.fft.fftfreq(nx) * nx
    my = np.fft.fftfreq(ny) * ny
    mz = np.fft.rfftfreq(nz) * nz

    def axis_kernel(m, n, length):
        m_dev = jnp.asarray(m, dtype)
        if batched:
            k = (2 * np.pi) * m_dev / length[:, None]
        else:
            k = (2 * np.pi) * m_dev / length
        kern = jnp.exp(-0.5 * (xi * k) ** 2)
        if order:
            # B-spline window sinc^order(k h / 2), kh/2 = pi m / n;
            # np.sinc is the normalized variant, static in the mode
            # numbers.
            kern = kern / jnp.asarray(np.sinc(m / n) ** order, dtype)
        return kern

    kx = axis_kernel(mx, nx, box[..., 0])
    ky = axis_kernel(my, ny, box[..., 1])
    kz = axis_kernel(mz, nz, box[..., 2])
    kernel = (
        kx[..., :, None, None]
        * ky[..., None, :, None]
        * kz[..., None, None, :]
    )
    spectra = jnp.fft.rfftn(fields, axes=(1, 2, 3))
    smooth = jnp.fft.irfftn(
        spectra * kernel, s=(nx, ny, nz), axes=(1, 2, 3)
    )
    cell_volume = box.prod(-1) / (nx * ny * nz)
    if batched:
        cell_volume = cell_volume[:, None, None, None]
    return (smooth / cell_volume).astype(dtype)


def axis_histogram_batch(coords, mask, edges, weights=None):
    r"""Histogram 1-D coordinates over a frame batch.

    NaN coordinates drop out (their ``in_range`` test is False) —
    callers use NaN to mark atoms without a defined coordinate (e.g.
    unresolved interface columns in
    :class:`mdhelper_tpu.analysis.interface.IntrinsicDensityProfile`).

    Parameters
    ----------
    coords : `jax.Array`
        Coordinates along one axis, shape ``(B, N)``.
    mask : `jax.Array`
        Frame validity mask, shape ``(B,)``.
    edges : `jax.Array`
        Bin edges, shape ``(n_bins + 1,)`` (np.histogram semantics).
    weights : `jax.Array`, optional
        Per-atom weights, shape ``(N,)`` or ``(B, N)`` (e.g.
        charges).

    Returns
    -------
    counts : `jax.Array`
        Counts summed over real frames, shape ``(n_bins,)``.
    """

    n_bins = edges.shape[0] - 1
    idx, in_range = _bin_indices(coords, edges, n_bins)
    idx = idx.reshape(-1)
    # accumulate in the coords dtype: float32 on the TPU stream (f64
    # is emulated there), full float64 when the caller binned f64
    # coordinates (the CPU / oracle path) — small-difference
    # observables (drift-removed temperatures) keep every bit the
    # platform offers
    acc = (
        coords.dtype
        if jnp.issubdtype(coords.dtype, jnp.floating)
        else jnp.float32
    )
    w = in_range.astype(acc) * mask[:, None].astype(acc)
    weighted = weights is not None
    if weighted:
        w = w * jnp.broadcast_to(
            weights.astype(acc), coords.shape
        )
    weights = w.reshape(-1)

    n_fine = 16
    n_coarse = -(-(n_bins + 1) // n_fine)
    coarse_iota = jax.lax.broadcasted_iota(
        jnp.int32, (idx.shape[0], n_coarse), 1
    )
    fine_iota = jax.lax.broadcasted_iota(
        jnp.int32, (idx.shape[0], n_fine), 1
    )
    coarse = (idx[:, None] // n_fine == coarse_iota).astype(acc)
    fine = (
        idx[:, None] % n_fine == fine_iota
    ).astype(acc) * weights[:, None]
    # HIGHEST only when `fine` carries real-valued weights (charges):
    # the default bf16 MXU pass would round them (~4e-3 relative);
    # 0/1 one-hots are bf16-exact and accumulate in f32 regardless.
    counts2d = jax.lax.dot_general(
        coarse, fine,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=(
            jax.lax.Precision.HIGHEST
            if weighted
            else jax.lax.Precision.DEFAULT
        ),
        preferred_element_type=acc,
    )
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return counts2d.reshape(-1)[:n_bins].astype(dtype)
