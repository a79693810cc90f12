r"""
Mesh (NUFFT) structure-factor kernels
=====================================

PME-reciprocal-style evaluation of :math:`\rho(\mathbf{q}) = \sum_j
w_j e^{i\mathbf{q}\cdot\mathbf{r}_j}` on the full wavevector grid
:math:`\mathbf{q} = 2\pi\mathbf{n}/L`: Kaiser–Bessel gridding +
3-D FFT + deconvolution, replacing the :math:`\mathcal{O}(N_q N)`
direct phase sweep (``ops/scattering.py``) with
:math:`\mathcal{O}(N M + M^3 \log M)` work.

The TPU twist is the **spreading**: instead of the scatter-add used by
CPU/GPU PME implementations (reference pattern:
``/root/reference/src/mdhelper/openmm/utility.py:92-105`` tunes
OpenMM's PME, which spreads charges with CUDA scatter kernels), the
separable window is built as three dense per-axis matrices
``W_x, W_y, W_z`` of shape ``(N, M)`` and the mesh assembles as a
matmul chain

.. math::

   \mathrm{mesh}[a, bc] = W_x^T (W_y \odot W_z)

which runs on the MXU — scatter-free, static shapes, and no support
truncation (each atom's window is evaluated on the whole axis, so the
only approximation is standard gridding aliasing, controlled by the
oversampled mesh and the Kaiser–Bessel shape).

Accuracy: with ``width=8`` and 2x oversampling the grid
:math:`\rho(\mathbf{q})` matches the exact double-float direct kernel
to ~1e-6 relative — the same fidelity class — at a small fraction of
the cost for large wavevector grids.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["mesh_plan", "mesh_trig_sums"]


def _kb_beta(width: float, oversampling: float) -> float:
    """Beatty et al. (2005) optimal Kaiser-Bessel shape parameter."""

    return float(
        np.pi
        * np.sqrt(
            (width / oversampling) ** 2
            * (oversampling - 0.5) ** 2
            - 0.8
        )
    )


def mesh_plan(
    n_points: int,
    box,
    *,
    oversampling: float = 2.0,
    width: int = 10,
) -> dict:
    """Host-side gridding geometry for the positive-octant wavevector
    grid ``q = 2*pi*n/L``, ``n in [0, n_points)^3``.

    ``mesh`` is the per-axis FFT size (a power of two at least
    ``oversampling * 2 * n_points``), ``width`` the Kaiser-Bessel
    support in mesh units, and ``deconv`` the per-axis inverse window
    transforms evaluated at the grid frequencies (float64 on host).
    """

    box = np.asarray(box, dtype=np.float64)
    mesh = 1
    while mesh < oversampling * 2 * n_points:
        mesh *= 2
    beta = _kb_beta(width, oversampling=mesh / (2.0 * n_points))

    # Continuous FT of the KB window (support width w, unit grid):
    #   Phi(k) = w * sinh(sqrt(beta^2 - (pi w k / M)^2)) /
    #            (I0(beta) * sqrt(beta^2 - (pi w k / M)^2))
    k = np.arange(n_points, dtype=np.float64)
    arg2 = beta**2 - (np.pi * width * k / mesh) ** 2
    root = np.sqrt(np.abs(arg2))
    phi = np.where(
        arg2 > 0, np.sinh(root) / root, np.sinc(root / np.pi)
    ) * (width / np.i0(beta))
    return {
        "n_points": int(n_points),
        "mesh": int(mesh),
        "width": int(width),
        "beta": float(beta),
        "deconv": (1.0 / phi).astype(np.float64),
        "box": tuple(float(b) for b in box),
    }


def _axis_window(frac_coords, mesh: int, width: int, beta: float):
    """Dense per-axis KB window matrix, shape ``(N, mesh)``:
    ``W[i, a] = kb(dist_periodic(a, x_i * mesh))``."""

    centers = frac_coords[:, None] * np.float32(mesh)  # (N, 1)
    grid = jax.lax.broadcasted_iota(
        jnp.int32, (1, mesh), 1
    ).astype(jnp.float32)
    d = grid - centers
    d = d - np.float32(mesh) * jnp.round(d / np.float32(mesh))
    u2 = 1.0 - (d * np.float32(2.0 / width)) ** 2
    inside = u2 > 0
    # I0 via jax.scipy; clamp the argument so masked lanes stay finite.
    vals = jax.scipy.special.i0(
        np.float32(beta) * jnp.sqrt(jnp.where(inside, u2, 0.0))
    )
    return jnp.where(inside, vals, 0.0) * np.float32(
        1.0 / np.i0(beta)
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_points", "mesh", "width", "beta", "box",
                     "atom_chunk"),
)
def mesh_trig_sums(
    positions,
    *,
    n_points: int,
    mesh: int,
    width: int,
    beta: float,
    box,
    deconv,
    weights=None,
    atom_chunk: int = 2048,
):
    r"""Grid :math:`(\sum_j w_j\cos\mathbf{q}\cdot\mathbf{r}_j,
    \sum_j w_j \sin\cdot)` for every wavevector of the positive octant
    ``q = 2*pi*(nx, ny, nz)/L`` with ``n`` in ``[0, n_points)^3``.

    Parameters come from :func:`mesh_plan` (``deconv`` as a
    ``(3, n_points)`` or ``(n_points,)`` array).  Returns two arrays of
    shape ``(n_points, n_points, n_points)`` (C order: ``nx`` slowest)
    matching ``_wavevector_grid``'s ``meshgrid(indexing="xy")``-free
    raveling when transposed appropriately by the caller.
    """

    n = positions.shape[0]
    box_arr = jnp.asarray(box, dtype=jnp.float32)
    frac = positions.astype(jnp.float32) / box_arr  # (N, 3)
    frac = frac - jnp.floor(frac)
    if weights is None:
        weights = jnp.ones((n,), jnp.float32)
    weights = weights.astype(jnp.float32)

    pad = (-n) % atom_chunk
    if pad:
        frac = jnp.pad(frac, ((0, pad), (0, 0)))
        weights = jnp.pad(weights, (0, pad))
    n_chunks = frac.shape[0] // atom_chunk

    def spread_chunk(acc, inputs):
        fr, w = inputs  # (C, 3), (C,)
        wx = _axis_window(fr[:, 0], mesh, width, beta) * w[:, None]
        wy = _axis_window(fr[:, 1], mesh, width, beta)
        wz = _axis_window(fr[:, 2], mesh, width, beta)
        # P[i, b*M + c] = wy[i, b] * wz[i, c]  (separable outer)
        p = (wy[:, :, None] * wz[:, None, :]).reshape(
            atom_chunk, mesh * mesh
        )
        # Precision.HIGHEST: TPU f32 matmuls default to a single
        # bf16 MXU pass (~1e-3 relative), which floods the mesh with
        # white noise; the 3-pass mode restores true float32.
        acc = acc + jax.lax.dot_general(
            wx, p,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (M, M*M)
        return acc, None

    mesh2d, _ = jax.lax.scan(
        spread_chunk,
        jnp.zeros((mesh, mesh * mesh), jnp.float32),
        (
            frac.reshape(n_chunks, atom_chunk, 3),
            weights.reshape(n_chunks, atom_chunk),
        ),
    )
    mesh3d = mesh2d.reshape(mesh, mesh, mesh)

    # Remove the DC bulk before the FFT: the total deposited mass (~N)
    # dominates the mesh's L2 norm, and float32 FFT roundoff scales
    # with that norm — at 100k atoms it floods the q != 0 coefficients
    # with ~1e-3 relative noise.  Subtracting the mean shrinks the
    # norm to the fluctuation scale (~sqrt(N)) and restores ~1e-6
    # fidelity; rho(0) is then set analytically (= sum of weights).
    total_w = weights.sum()
    mesh3d = mesh3d - mesh3d.mean()

    # rho(q_n) = sum_j w_j e^{+i 2 pi n . r_j / L}
    #          = conj(FFT(mesh))[n] / Phi(n)  (XLA FFT is e^{-i...}).
    rho = jnp.fft.fftn(mesh3d.astype(jnp.complex64))
    rho = rho[:n_points, :n_points, :n_points]

    dec = jnp.asarray(deconv, dtype=jnp.float32)
    if dec.ndim == 1:
        dx = dy = dz = dec
    else:
        dx, dy, dz = dec
    scale = (
        dx[:, None, None] * dy[None, :, None] * dz[None, None, :]
    )
    cos = jnp.real(rho) * scale
    sin = -jnp.imag(rho) * scale
    cos = cos.at[0, 0, 0].set(total_w)
    sin = sin.at[0, 0, 0].set(0.0)
    return cos, sin
