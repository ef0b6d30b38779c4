"""Matmul-based (four-step) FFT for the MXU.

XLA's native TPU FFT collapses on transform sizes with a large odd factor —
exactly the 2·3·5·7-smooth padded convolution sizes this framework uses
(re-measured 2026-08-21 on v5e / jax 0.9.0: an [8, 2500, 2500] rfft2
forward+inverse pair takes 115 ms native vs 45 ms here; 2268² is 86 ms vs
37 ms — while on power-of-two and near-power-of-two sizes the native FFT
now wins, see ``convolution._matmul_fft_active`` for the measured routing).
A Cooley-Tukey four-step factorization turns the same transform into a pair
of small dense DFT matmuls plus a twiddle multiply, which the MXU executes
at tens of TFLOP/s: the factored transform does ~9x the FLOPs of an
n·log n FFT but finishes 2-3x sooner on those sizes.

For a length-n axis with n = n1·n2 (row-major split j = j1·n2 + j2,
k = k1 + n1·k2):

    X[k1 + n1·k2] = Σ_{j2} W_n2[k2, j2] · tw[k1, j2] · Σ_{j1} W_n1[k1, j1] · x[j1, j2]

with W_m[a, b] = exp(-2πi·a·b/m) and tw[k1, j2] = exp(-2πi·k1·j2/n).
Both contractions are dense [m, m] matmuls batched over every other axis;
complex arithmetic is carried as explicit (re, im) float32 pairs with
``Precision.HIGH`` (bf16x3 passes, ~3e-5 relative accuracy; see ``_PREC``).

This module is intentionally plain XLA (no Pallas): the einsums, twiddle
multiplies, and transposes fuse well, and the whole transform is
differentiable and shardable like any other jnp code.

Used by ``ops/convolution.py`` as the TPU spectrum backend; spectra produced
here are *full* [H, W] complex64 (not the rfft half-plane), mathematically
identical to ``jnp.fft.fft2`` so they can be multiplied with any DFT spectrum
of matching layout.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# bf16x3 ("HIGH") keeps ~3e-5 relative accuracy on the DFT — far below any
# CLEAN threshold and comparable to the reference's -ffast-math float FFTW
# contract — at ~2-3x the speed of the six-pass f32 emulation ("HIGHEST",
# ~3e-7).  RADLER_TPU_FFT_PRECISION=highest restores full f32 accuracy.
_PREC = (
    jax.lax.Precision.HIGHEST
    if os.environ.get("RADLER_TPU_FFT_PRECISION", "").lower() == "highest"
    else jax.lax.Precision.HIGH
)
_MAX_FACTOR = 128


@lru_cache(maxsize=None)
def factor_split(n: int) -> Optional[Tuple[int, int]]:
    """Split n = n1 * n2 with both factors <= 128, as balanced as possible.

    Returns None when no such split exists (then the caller falls back to a
    single dense DFT matmul for small n, or to jnp.fft).
    """
    if n <= _MAX_FACTOR:
        return None  # single dense DFT is fine
    best = None
    for n1 in range(2, _MAX_FACTOR + 1):
        if n % n1:
            continue
        n2 = n // n1
        if n2 > _MAX_FACTOR:
            continue
        score = abs(n1 - n2)
        if best is None or score < best[0]:
            best = (score, n1, n2)
    if best is None:
        return None
    return best[1], best[2]


def supported_size(n: int) -> bool:
    """Whether a length-n axis can run on the matmul backend."""
    return n <= _MAX_FACTOR or factor_split(n) is not None


@lru_cache(maxsize=None)
def _dft_mats(n: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """(re, im) of the dense DFT matrix W[a, b] = exp(∓2πi·a·b/n).

    Built in float64 and rounded once, so twiddle error stays at f32 ulp.
    """
    a = np.arange(n)
    sign = 2.0 if inverse else -2.0
    ang = sign * np.pi * np.outer(a, a) / n
    return (
        np.cos(ang).astype(np.float32),
        np.sin(ang).astype(np.float32),
    )


@lru_cache(maxsize=None)
def _twiddles(n1: int, n2: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """(re, im) of tw[k1, j2] = exp(∓2πi·k1·j2/(n1·n2))."""
    n = n1 * n2
    sign = 2.0 if inverse else -2.0
    ang = sign * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n
    return (
        np.cos(ang).astype(np.float32),
        np.sin(ang).astype(np.float32),
    )


def _cmatmul_last(xr, xi, wr, wi, prec=None):
    """Complex contraction over the LAST axis: out[..., k] = Σ_j x[..., j] W[k, j].

    Shaped as ``...j,kj->...k`` with no batch dimensions, which XLA lowers to
    one large GEMM (a [prod(lead), j] x [j, k] matmul) — small *batched*
    matmuls (the naive four-step einsum) run the MXU at ~3% utilization.
    """
    prec = _PREC if prec is None else prec
    er = jnp.einsum("...j,kj->...k", xr, wr, precision=prec) - jnp.einsum(
        "...j,kj->...k", xi, wi, precision=prec
    )
    ei = jnp.einsum("...j,kj->...k", xr, wi, precision=prec) + jnp.einsum(
        "...j,kj->...k", xi, wr, precision=prec
    )
    return er, ei


def _cmatmul_last_real(xr, xi, wr, wi, prec=None):
    """Real part only of :func:`_cmatmul_last`: half the matmuls, used for
    the final step of a real-output inverse transform."""
    prec = _PREC if prec is None else prec
    return jnp.einsum("...j,kj->...k", xr, wr, precision=prec) - jnp.einsum(
        "...j,kj->...k", xi, wi, precision=prec
    )


def _fft_last_axis(
    xr,
    xi,
    n: int,
    inverse: bool,
    in_window: Optional[Tuple[int, int]] = None,
    out_window: Optional[Tuple[int, int]] = None,
    real_out: bool = False,
    prec=None,
):
    """DFT over the last axis of a split-complex array.

    ``in_window = (start, length)``: the input array holds only entries
    ``[start, start+length)`` of the virtual ``n``-length axis (everything
    else is zero and never materialized) — the first contraction skips the
    all-zero factor rows, an *exact* saving for zero-padded convolution
    inputs.  ``out_window = (start, length)``: only that output slice is
    produced (callers trimming a padded convolution back to image size).
    ``real_out``: only the real part of the output is computed (the final
    axis of a real inverse transform) — halves the last contraction.  All
    three drop matmul work on zeros / unused outputs, not precision.
    """
    in_s, in_l = (0, n) if in_window is None else in_window
    out_s, out_l = (0, n) if out_window is None else out_window
    split = factor_split(n)
    if split is None:
        wr, wi = (jnp.asarray(m) for m in _dft_mats(n, inverse))
        if (in_s, in_l) != (0, n):
            wr = wr[:, in_s : in_s + in_l]
            wi = wi[:, in_s : in_s + in_l]
        if (out_s, out_l) != (0, n):
            wr = wr[out_s : out_s + out_l]
            wi = wi[out_s : out_s + out_l]
        if real_out:
            return _cmatmul_last_real(xr, xi, wr, wi, prec), None
        return _cmatmul_last(xr, xi, wr, wi, prec)
    n1, n2 = split
    lead = xr.shape[:-1]
    w1r, w1i = (jnp.asarray(m) for m in _dft_mats(n1, inverse))
    w2r, w2i = (jnp.asarray(m) for m in _dft_mats(n2, inverse))
    twr, twi = (jnp.asarray(m) for m in _twiddles(n1, n2, inverse))
    # j = j1*n2 + j2: only grid rows j1 in [j1_lo, j1_hi) intersect the
    # input window — skip the all-zero rest in the first contraction.
    j1_lo = in_s // n2
    j1_hi = -(-(in_s + in_l) // n2)  # ceil
    if (in_s, in_l) != (0, n):
        lpad = in_s - j1_lo * n2
        rpad = j1_hi * n2 - (in_s + in_l)
        pads = [(0, 0)] * (xr.ndim - 1) + [(lpad, rpad)]
        xr = jnp.pad(xr, pads)
        xi = jnp.pad(xi, pads)
    xr = xr.reshape(lead + (j1_hi - j1_lo, n2))
    xi = xi.reshape(lead + (j1_hi - j1_lo, n2))
    # A[..., j2, k1] = sum_j1 x[..., j2, j1] W1[k1, j1]
    xr = jnp.swapaxes(xr, -1, -2)
    xi = jnp.swapaxes(xi, -1, -2)
    ar, ai = _cmatmul_last(
        xr, xi, w1r[:, j1_lo:j1_hi], w1i[:, j1_lo:j1_hi], prec
    )
    # B[..., j2, k1] = A * tw[k1, j2]  (twiddle transposed to [j2, k1])
    br = ar * twr.T - ai * twi.T
    bi = ar * twi.T + ai * twr.T
    # C[..., k1, k2] = sum_j2 B[..., k1, j2] W2[k2, j2]; output index
    # k = k1 + n1*k2, so the output window needs only k2 in [k2_lo, k2_hi).
    br = jnp.swapaxes(br, -1, -2)
    bi = jnp.swapaxes(bi, -1, -2)
    k2_lo = out_s // n1
    k2_hi = n2 if (out_s, out_l) == (0, n) else min(
        -(-(out_s + out_l) // n1), n2
    )
    w2r_s, w2i_s = w2r[k2_lo:k2_hi], w2i[k2_lo:k2_hi]
    off = out_s - k2_lo * n1
    if real_out:
        cr = _cmatmul_last_real(br, bi, w2r_s, w2i_s, prec)
        cr = jnp.swapaxes(cr, -1, -2).reshape(lead + ((k2_hi - k2_lo) * n1,))
        if (out_s, out_l) != (0, n):
            cr = cr[..., off : off + out_l]
        return cr, None
    cr, ci = _cmatmul_last(br, bi, w2r_s, w2i_s, prec)
    # Output index k = k1 + n1*k2 -> row-major [k2, k1].
    cr = jnp.swapaxes(cr, -1, -2).reshape(lead + ((k2_hi - k2_lo) * n1,))
    ci = jnp.swapaxes(ci, -1, -2).reshape(lead + ((k2_hi - k2_lo) * n1,))
    if (out_s, out_l) != (0, n):
        cr = cr[..., off : off + out_l]
        ci = ci[..., off : off + out_l]
    return cr, ci


def _fft2_split(xr, xi, inverse: bool):
    h, w = xr.shape[-2:]
    xr, xi = _fft_last_axis(xr, xi, w, inverse)
    xr = jnp.swapaxes(xr, -1, -2)
    xi = jnp.swapaxes(xi, -1, -2)
    xr, xi = _fft_last_axis(xr, xi, h, inverse)
    xr = jnp.swapaxes(xr, -1, -2)
    xi = jnp.swapaxes(xi, -1, -2)
    if inverse:
        scale = jnp.float32(1.0 / (h * w))
        xr = xr * scale
        xi = xi * scale
    return xr, xi


@jax.jit
def fft2(x: jnp.ndarray) -> jnp.ndarray:
    """2-D DFT over the trailing axes; returns complex64 [..., H, W].

    Accepts real float32 or complex64 input.  Identical math to
    ``jnp.fft.fft2`` (full spectrum), executed as MXU matmuls.
    """
    if jnp.iscomplexobj(x):
        xr, xi = jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(
            jnp.float32
        )
    else:
        xr = x.astype(jnp.float32)
        xi = jnp.zeros_like(xr)
    yr, yi = _fft2_split(xr, xi, inverse=False)
    return jax.lax.complex(yr, yi)


@jax.jit
def ifft2_real(spec: jnp.ndarray) -> jnp.ndarray:
    """Real part of the 2-D inverse DFT of a full complex spectrum."""
    xr = jnp.real(spec).astype(jnp.float32)
    xi = jnp.imag(spec).astype(jnp.float32)
    yr, _ = _fft2_split(xr, xi, inverse=True)
    return yr


@partial(jax.jit, static_argnames=("padded_shape", "offsets"))
def fft2_windowed(
    x: jnp.ndarray,
    padded_shape: Tuple[int, int],
    offsets: Tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """Spectrum of ``x`` embedded at ``offsets`` (top, left) in a zero
    ``padded_shape`` canvas, without materializing the canvas: the all-zero
    factor rows are skipped inside the matmuls (exactly
    ``fft2(pad-embed(x))`` — fewer FLOPs and no padded HBM round trip)."""
    Ph, Pw = padded_shape
    top, left = offsets
    h, w = x.shape[-2:]
    assert top + h <= Ph and left + w <= Pw, (x.shape, padded_shape, offsets)
    if jnp.iscomplexobj(x):
        xr = jnp.real(x).astype(jnp.float32)
        xi = jnp.imag(x).astype(jnp.float32)
    else:
        xr = x.astype(jnp.float32)
        xi = jnp.zeros_like(xr)
    # Transform the width axis first (only h of Ph rows exist — the batch
    # lead is smaller too), then the height axis with its zero tail skipped.
    xr, xi = _fft_last_axis(xr, xi, Pw, inverse=False, in_window=(left, w))
    xr = jnp.swapaxes(xr, -1, -2)
    xi = jnp.swapaxes(xi, -1, -2)
    xr, xi = _fft_last_axis(xr, xi, Ph, inverse=False, in_window=(top, h))
    xr = jnp.swapaxes(xr, -1, -2)
    xi = jnp.swapaxes(xi, -1, -2)
    return jax.lax.complex(xr, xi)


@partial(jax.jit, static_argnames=("out_shape", "offsets", "precision"))
def ifft2_real_windowed(
    spec: jnp.ndarray,
    out_shape: Tuple[int, int],
    offsets: Tuple[int, int] = (0, 0),
    precision: Optional[str] = None,
) -> jnp.ndarray:
    """The ``out_shape`` window at ``offsets`` (top, left) of the real
    inverse DFT of a full [..., Ph, Pw] spectrum: exactly
    ``ifft2_real(spec)[top:top+H, left:left+W]`` with the unused output
    rows/columns and the entire imaginary part of the final contraction
    never computed."""
    H, W = out_shape
    top, left = offsets
    Ph, Pw = spec.shape[-2:]
    assert top + H <= Ph and left + W <= Pw, (spec.shape, out_shape, offsets)
    xr = jnp.real(spec).astype(jnp.float32)
    xi = jnp.imag(spec).astype(jnp.float32)
    # "fast" = native bf16 matmuls (one pass instead of bf16x3) — ~1e-2
    # relative error, for SEARCH-only transforms whose outputs never feed
    # residual/model state (e.g. the multiscale maxima refresh).
    prec = (
        jax.lax.Precision.DEFAULT if precision == "fast" else None
    )
    # Width axis first (trims the lead for the height axis), height last
    # with a real-only final contraction.
    xr, xi = _fft_last_axis(
        xr, xi, Pw, inverse=True, out_window=(left, W), prec=prec
    )
    xr = jnp.swapaxes(xr, -1, -2)
    xi = jnp.swapaxes(xi, -1, -2)
    yr, _ = _fft_last_axis(
        xr, xi, Ph, inverse=True, out_window=(top, H), real_out=True,
        prec=prec,
    )
    yr = jnp.swapaxes(yr, -1, -2)
    return yr * jnp.float32(1.0 / (Ph * Pw))
