r"""
Statistical correlation
=======================

Auto-/cross-correlation functions and mean-squared/cross displacements
(reference: ``/root/reference/src/mdhelper/algorithm/correlation.py``).

The FFT (Wiener–Khinchin) paths — :func:`correlation_fft` and
:func:`msd_fft` — run on-device through :mod:`jax.numpy` and are the
production paths: batched ``rfft``/``irfft`` over the time axis map
directly onto XLA's fused FFT kernels, with blocks/entities as leading
batch axes.  The :math:`\mathcal{O}(N^2)` sliding-window variants
(:func:`correlation_shift`, :func:`msd_shift`) are retained as
NumPy host implementations: they exist for validation and tiny inputs,
exactly like the reference's usage.

Array convention (identical to the reference): time series of
:math:`N` entities over :math:`N_b` blocks of :math:`N_t` frames, i.e.
shapes ``(N_t,)``, ``(N_t, N)``, ``(N_b, N_t)``, ``(N_b, N_t, N)`` for
scalars, with a trailing dimension of vector components when
``vector=True``.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
from scipy import fft as _scipy_fft

__all__ = [
    "correlation_fft",
    "correlation_shift",
    "msd_fft",
    "msd_shift",
]


def _validate(arr1, arr2, axis, min_ndim=1, name="The arrays"):
    arr1 = np.asarray(arr1) if not hasattr(arr1, "ndim") else arr1
    if arr1.size == 0:
        raise ValueError(f"{name} must not be empty.")
    ndim = arr1.ndim
    if not min_ndim <= ndim <= 4:
        raise ValueError(
            f"{name} must have between {min_ndim} and 4 dimensions."
        )
    if arr2 is not None:
        arr2 = np.asarray(arr2) if not hasattr(arr2, "ndim") else arr2
        if arr1.shape != arr2.shape:
            raise ValueError(f"{name} must have the same dimensions.")

    if axis is None:
        if ndim == 4:
            axis = 1
        else:
            axis = 0
            if ndim > min_ndim:
                warnings.warn(
                    "The axis along which to compute the correlation "
                    "was not specified and is ambiguous for a "
                    "multidimensional array. It has been set to the "
                    "first axis by default."
                )
    elif axis not in {0, 1}:
        raise ValueError(
            "The correlation can only be evaluated along the first or "
            "second axis."
        )
    return arr1, arr2, axis, ndim


def _fft_device_fallback(*arrays):
    """TPU backends cannot lower complex128 FFTs; route float64 inputs
    onto the host CPU backend.  (The benchmark-grade TPU path uses the
    float32 correlators in :mod:`mdhelper_tpu.ops`; this fallback
    keeps the float64 reference semantics correct everywhere.)

    Host (NumPy) inputs are placed on the CPU device DIRECTLY — a
    ``jnp.asarray`` first would upload them to the TPU as emulated
    f64 and immediately ship them back, a double round trip that
    dominates e.g. ``Onsager._conclude`` at 100k-atom scale."""

    # Under a jit trace placement is the caller's problem; pass
    # tracers through untouched.
    if any(
        isinstance(a, jax.core.Tracer) for a in arrays if a is not None
    ):
        return arrays

    def f64_for_tpu(a):
        if a is None:
            return False
        dtype = np.dtype(getattr(a, "dtype", np.float64))
        if dtype not in (np.dtype(np.float64), np.dtype(np.complex128)):
            return False
        if isinstance(a, jax.Array):
            return any(d.platform == "tpu" for d in a.devices())
        return jax.default_backend() == "tpu"

    if not any(f64_for_tpu(a) for a in arrays):
        return tuple(
            None if a is None else jnp.asarray(a) for a in arrays
        )
    cpu = jax.devices("cpu")[0]
    return tuple(
        None if a is None else jax.device_put(a, cpu) for a in arrays
    )


def correlation_fft(
    arr1,
    arr2=None,
    axis: int = None,
    *,
    average: bool = False,
    double: bool = False,
    vector: bool = False,
):
    r"""Evaluate the ACF/CCF of a time series via the Fast Correlation
    Algorithm (Wiener–Khinchin), :math:`\mathcal{O}(N\log N)`.

    .. math::

       A(\tau) = \mathrm{FFT}^{-1}\!\left[\,
       \mathrm{FFT}(\mathbf{r})\,\mathrm{FFT}(\mathbf{r})^*\right](\tau)
       \,/\,(N_t-\tau)

    Parity: ``algorithm/correlation.py:17-226`` — including the
    zero-padded transform length :math:`2\,\mathrm{nextfastlen}(N_t)`,
    the triangular-count normalization, the ``double`` mode (doubled ACF
    or folded negative/positive-lag CCF for displacement evaluation),
    the ``vector`` contraction over the trailing axis, and the
    two-sided :math:`2N_t-1`-long CCF when ``double=False``.

    Parameters
    ----------
    arr1, arr2 : array-like
        Time series; if `arr2` is given the CCF is computed, else the
        ACF of `arr1`.
    axis : `int`, optional
        Time axis (0, or 1 for blocked series). Auto-detected from the
        array rank when omitted.
    average : `bool`, keyword-only
        Average over the entity axis.
    double : `bool`, keyword-only
        Double the ACF / fold the CCF lags (for MSD evaluation).
    vector : `bool`, keyword-only
        Treat the last axis as vector components and contract it.

    Returns
    -------
    corr : `jax.Array`
        Correlation function.
    """

    arr1, arr2, axis, ndim = _validate(arr1, arr2, axis)

    is_real = not jnp.iscomplexobj(arr1)
    if arr2 is not None:
        is_real = is_real and not jnp.iscomplexobj(arr2)
    # Device placement BEFORE any jnp.asarray: see the fallback.
    arr1, arr2 = _fft_device_fallback(arr1, arr2)

    # Work with the time axis leading; restore at the end.
    work1 = jnp.moveaxis(arr1, axis, 0)
    work2 = jnp.moveaxis(arr2, axis, 0) if arr2 is not None else None

    n_t = work1.shape[0]
    n_fft = 2 * _scipy_fft.next_fast_len(n_t, real=is_real)
    fft_ = jnp.fft.rfft if is_real else jnp.fft.fft
    ifft_ = jnp.fft.irfft if is_real else jnp.fft.ifft

    if work2 is None:
        f1 = fft_(work1, n=n_fft, axis=0)
        spec = (double + 1) * (f1 * f1.conj())
        two_sided = False
    else:
        f1 = fft_(work1, n=n_fft, axis=0)
        f2 = fft_(work2, n=n_fft, axis=0)
        if double:
            spec = f1.conj() * f2 + f1 * f2.conj()
            two_sided = False
        else:
            spec = f1.conj() * f2
            two_sided = True

    # The FFT is linear, so the vector contraction and the entity
    # average reduce the POWER SPECTRUM before the inverse transform —
    # one inverse FFT instead of one per entity/component.  At 100k
    # particles this is the difference between a ~200 MB complex
    # intermediate pair and a single series (the Onsager conclusion's
    # dominant cost).
    if vector:
        spec = spec.sum(axis=-1)
    if average:
        axis_avg = ndim - vector - 1
        if axis != axis_avg:
            # Map the input-coordinate entity axis into work
            # coordinates (time axis moved to the front).
            work_axis = axis_avg if axis_avg > axis else axis_avg + 1
            spec = spec.mean(axis=work_axis)

    corr = ifft_(spec, n=n_fft, axis=0)
    if not two_sided:
        corr = corr[:n_t]

    # Triangular-count normalization: lag m is an average over
    # N_t - |m| window positions.
    shape_tail = (1,) * (corr.ndim - 1)
    desc = jnp.arange(n_t, 0, -1).reshape(-1, *shape_tail)
    if two_sided:
        asc = jnp.arange(1, n_t).reshape(-1, *shape_tail)
        corr = jnp.concatenate(
            (corr[1 - n_t:] / asc, corr[:n_t] / desc), axis=0
        )
    else:
        corr = corr / desc

    corr = jnp.moveaxis(corr, 0, axis)
    return corr


def correlation_shift(
    arr1,
    arr2=None,
    axis: int = None,
    *,
    average: bool = False,
    double: bool = False,
    vector: bool = False,
) -> np.ndarray:
    r"""Evaluate the ACF/CCF directly with sliding windows,
    :math:`\mathcal{O}(N^2)`.

    Parity: ``algorithm/correlation.py:228-459``.  Host-side NumPy;
    retained for validation of :func:`correlation_fft` and tiny
    series — prefer the FFT form for production work.
    """

    arr1, arr2, axis, ndim = _validate(arr1, arr2, axis)
    arr1 = np.asarray(arr1, dtype=float)
    work1 = np.moveaxis(arr1, axis, 0)
    n_t = work1.shape[0]
    sum_axes = (0, work1.ndim - 1) if vector and work1.ndim > 1 else 0

    if arr2 is None:
        corr = np.stack(
            [
                (work1[m:] * work1[: n_t - m if m else None]).sum(
                    axis=sum_axes
                )
                for m in range(n_t)
            ]
        )
        if double:
            corr = 2 * corr
        two_sided = False
    else:
        work2 = np.moveaxis(np.asarray(arr2, dtype=float), axis, 0)
        # Negative lags first (lag -(N_t-1) ... -1), then 0 ... N_t-1.
        lags = list(range(1 - n_t, n_t))
        out = []
        for m in lags:
            if m >= 0:
                prod = work1[: n_t - m if m else None] * work2[m:]
            else:
                prod = work1[-m:] * work2[: n_t + m]
            out.append(prod.sum(axis=sum_axes))
        corr = np.stack(out)
        if double:
            corr = corr[n_t - 1:] + corr[n_t - 1::-1]
            two_sided = False
        else:
            two_sided = True

    # Normalize by window counts.
    shape_tail = (1,) * (corr.ndim - 1)
    desc = np.arange(n_t, 0, -1).reshape(-1, *shape_tail)
    if two_sided:
        asc = np.arange(1, n_t).reshape(-1, *shape_tail)
        corr[: n_t - 1] /= asc
        corr[n_t - 1:] /= desc
    else:
        corr = corr / desc

    corr = np.moveaxis(corr, 0, axis)
    if average:
        axis_avg = ndim - vector - 1
        if axis != axis_avg:
            corr = corr.mean(axis=axis_avg)
    return corr


def msd_fft(
    pos1,
    pos2=None,
    axis: int = None,
    *,
    average: bool = True,
):
    r"""Evaluate the mean-squared displacement (MSD) — or the cross
    displacement (CD) for two position sets — using FFTs.

    Implements the :math:`\mathrm{MSD}_m = S_m - 2A_m` decomposition
    (Kneller et al. FCA / Calandrini et al.), where :math:`A_m` is the
    position autocorrelation (via :func:`correlation_fft`) and
    :math:`S_m` follows from the recursion
    :math:`Q_m = Q_{m-1} - D_{m-1} - D_{N_t-m}` over the squared norms
    :math:`D_k`.  Parity: ``algorithm/correlation.py:461-668``.

    Parameters
    ----------
    pos1, pos2 : array-like
        Positions with shapes ``(N_t, 3)``, ``(N_t, N, 3)`` or
        ``(N_b, N_t, N, 3)``.  For Onsager-style group sums, sum over
        atoms before calling.
    axis : `int`, optional
        Time axis (auto-detected when omitted).
    average : `bool`, keyword-only
        Average over the particle axis.

    Returns
    -------
    disp : `jax.Array`
        MSD or CD.
    """

    pos1, pos2, axis, ndim = _validate(
        pos1, pos2, axis, min_ndim=2, name="The position arrays"
    )
    # Device placement BEFORE any jnp.asarray: see the fallback.
    pos1, pos2js = _fft_device_fallback(
        pos1, pos2 if pos2 is not None else None
    )

    # With averaging requested, correlation_fft reduces the power
    # spectrum over the particle axis BEFORE its inverse FFT (one
    # inverse transform instead of one per particle — the dominant
    # cost of a 100k-particle MSD).
    pre_average = ndim - axis == 3 and average
    s2 = correlation_fft(
        pos1, pos2js, axis, average=pre_average, double=True,
        vector=True,
    )
    r1r2 = (pos1 * (pos1 if pos2js is None else pos2js)).sum(axis=-1)

    n_t = pos1.shape[axis]
    work = jnp.moveaxis(r1r2, axis, 0)  # (N_t, ...)
    s2_work = jnp.moveaxis(s2, axis, 0)

    if pre_average:
        # The ACF side was averaged spectrally; match it on the
        # squared-norm side (now last axis).
        work = work.mean(axis=-1)

    # Q_m recursion, vectorized: Q_m = 2*sum(D) - cumsum_m(D_{m-1} +
    # D_{N_t-m}) with D_{-1} = D_{N_t} = 0.
    zeros = jnp.zeros((1, *work.shape[1:]), dtype=work.dtype)
    head = jnp.concatenate((zeros, work[: n_t - 1]), axis=0)
    tail = jnp.concatenate((zeros, work[: 0 : -1]), axis=0)
    ssum = 2 * work.sum(axis=0) - jnp.cumsum(head + tail, axis=0)

    counts = jnp.arange(n_t, 0, -1).reshape(-1, *(1,) * (ssum.ndim - 1))
    disp = ssum / counts - s2_work
    return jnp.moveaxis(disp, 0, axis)


#: jitted :func:`msd_fft` (static axis/average): one compiled program
#: instead of per-op eager dispatch — ~2x on the 100k-particle MSD
#: conclusion.  Run under ``jax.default_device(cpu)`` on TPU backends
#: (f64 FFTs do not lower there; see :func:`_fft_device_fallback`).
msd_fft_jit = jax.jit(msd_fft, static_argnames=("axis", "average"))


def msd_shift(
    pos1,
    pos2=None,
    axis: int = None,
    *,
    average: bool = True,
) -> np.ndarray:
    r"""Evaluate the MSD/CD directly via the Einstein relation,
    averaging over all window positions, :math:`\mathcal{O}(N^2)`.

    Parity: ``algorithm/correlation.py:670-850``.  Host-side NumPy
    validation path for :func:`msd_fft`.
    """

    pos1, pos2, axis, ndim = _validate(
        pos1, pos2, axis, min_ndim=2, name="The position arrays"
    )
    pos1 = np.asarray(pos1, dtype=float)
    work1 = np.moveaxis(pos1, axis, 0)
    n_t = work1.shape[0]
    if pos2 is None:
        work2 = work1
    else:
        work2 = np.moveaxis(np.asarray(pos2, dtype=float), axis, 0)

    disp = np.stack(
        [
            (
                (work1[: n_t - m if m else None] - work1[m:])
                * (work2[: n_t - m if m else None] - work2[m:])
            )
            .sum(axis=-1)
            .mean(axis=0)
            for m in range(n_t)
        ]
    )
    disp = np.moveaxis(disp, 0, axis)
    if ndim - axis == 3 and average:
        disp = disp.mean(axis=ndim - 2)
    return disp
