"""FFT convolution primitives.

TPU-native equivalent of the schaapcommon FFTW path used by the reference
(``PrepareConvolutionKernel`` + ``Convolve`` + ``PaddedConvolution``, called
from e.g. ``cpp/algorithms/subminor_loop.cc:195-218`` and
``cpp/algorithms/multiscale/multiscale_transforms.cc:11-23``).

All convolutions here are *centered*: the kernel's origin is pixel
``(H//2, W//2)``, matching the reference's PSF conventions.  Images are
zero-padded to a 7-smooth size (same policy as
``cpp/utils/fft_size_calculations.h``) to avoid wrap-around, convolved via
``jnp.fft.rfft2`` (XLA's batched FFT), and trimmed back.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.fft_size import calculate_good_fft_size
from . import fft as mxu_fft


def _odd_part(n: int) -> int:
    while n % 2 == 0 and n > 0:
        n //= 2
    return n


def _matmul_fft_active(h: int, w: int) -> bool:
    """Whether the MXU matmul-FFT backend (ops/fft.py) handles this shape.

    Routing is by measurement (re-measured 2026-08-21 on v5e / jax 0.9.0,
    [8, N, N] forward+inverse pairs, scratch/fft benchmarks recorded in
    BASELINE.md): the native TPU FFT wins on power-of-two and
    near-power-of-two sizes (odd part <= 49: 2048² 21 ms vs 37 ms matmul,
    4096² 77 ms vs 96 ms, 3136²=2⁶·7² 48 ms vs 61 ms), while the matmul
    four-step formulation wins 2-3x on sizes with a large odd factor where
    the native FFT collapses (2268² 37 ms vs 86 ms, 2500² 45 ms vs 115 ms).
    Full spectra ([H, W] complex) are used in matmul mode instead of rfft
    half-planes; all spectrum producers/consumers in this module agree on
    the representation via these helpers.  Opt out with
    RADLER_TPU_NO_MXU_FFT=1 (e.g. to A/B against the native FFT).
    """
    if os.environ.get("RADLER_TPU_NO_MXU_FFT"):
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon") or min(h, w) < 256:
        return False
    if _odd_part(h) <= 49 and _odd_part(w) <= 49:
        return False  # native FFT wins on (near-)power-of-two sizes
    return mxu_fft.supported_size(h) and mxu_fft.supported_size(w)


def forward_fft2(x: jnp.ndarray) -> jnp.ndarray:
    """Forward 2-D spectrum of a real image stack [..., H, W]: full [H, W]
    complex on the matmul backend, rfft half-plane otherwise.  The native
    batched *forward* rfft2 is accurate (re-probed on jax 0.9.0 / v5e,
    2026-08-20: ≤5e-7 rel. error at [16, 2048, 2048]); only the batched
    inverse is broken — see :func:`inverse_fft2_real`."""
    h, w = x.shape[-2:]
    if _matmul_fft_active(h, w):
        return mxu_fft.fft2(x)
    return jnp.fft.rfft2(x)


def inverse_fft2_real(spec: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Real inverse of a spectrum produced by :func:`forward_fft2` (either
    representation, distinguished by the trailing-axis length).

    Batched inverses are mapped plane-by-plane: TPU's batched *inverse* FFT
    loses catastrophic amounts of precision at large sizes (re-measured
    2026-08-20 on jax 0.9.0 / v5e: 37% rel. error for an [8, 2048, 2048]
    irfft2 where the single-plane inverse and the batched forward are both
    exact), and a serial map of full-size FFTs costs the same FLOPs."""
    h, w = shape
    if spec.shape[-1] == w:
        return mxu_fft.ifft2_real(spec)
    if spec.ndim == 2:
        return jnp.fft.irfft2(spec, s=(h, w))
    flat = spec.reshape((-1,) + spec.shape[-2:])
    out = jax.lax.map(lambda f: jnp.fft.irfft2(f, s=(h, w)), flat)
    return out.reshape(spec.shape[:-2] + (h, w))


def forward_fft2_padded(
    x: jnp.ndarray, padded_shape: Tuple[int, int]
) -> jnp.ndarray:
    """Spectrum of ``untrim(x, Ph, Pw)`` (centered zero-pad) in the active
    representation — on the matmul backend the padded canvas is never
    materialized and the all-zero factor rows are skipped (exact)."""
    Ph, Pw = padded_shape
    h, w = x.shape[-2:]
    if (h, w) == (Ph, Pw):
        return forward_fft2(x)
    if _matmul_fft_active(Ph, Pw):
        top = Ph // 2 - h // 2
        left = Pw // 2 - w // 2
        return mxu_fft.fft2_windowed(x, padded_shape, (top, left))
    return jnp.fft.rfft2(untrim(x, Ph, Pw))


def inverse_fft2_real_trimmed(
    spec: jnp.ndarray,
    padded_shape: Tuple[int, int],
    out_shape: Tuple[int, int],
    precision=None,
) -> jnp.ndarray:
    """``trim(inverse_fft2_real(spec, (Ph, Pw)), H, W)`` with the unused
    output rows/columns (and the final contraction's imaginary part) never
    computed on the matmul backend.  ``precision="fast"`` runs the matmul
    path at native bf16 (~1e-2 rel) — only for search-only consumers; the
    native-FFT fallback ignores it (already exact)."""
    Ph, Pw = padded_shape
    H, W = out_shape
    if (H, W) == (Ph, Pw):
        return inverse_fft2_real(spec, padded_shape)
    if spec.shape[-1] == Pw:
        top = Ph // 2 - H // 2
        left = Pw // 2 - W // 2
        return mxu_fft.ifft2_real_windowed(
            spec, out_shape, (top, left), precision
        )
    return trim(inverse_fft2_real(spec, padded_shape), H, W)


def probe_batched_fft_accuracy(
    n: int = 8, size: int = 2048, seed: int = 0
) -> dict:
    """Measure batched-vs-per-plane FFT agreement on the live backend.

    This module's routing rests on a measured property of jax 0.9.0 / TPU
    v5e: the batched *forward* rfft2 is accurate while the batched *inverse*
    loses precision at large sizes (see :func:`inverse_fft2_real`).  A
    jax/libtpu upgrade could silently change either; callers (bench.py) run
    this probe once at startup and warn if the assumption flipped.

    Returns ``{"forward_rel_err": float, "inverse_rel_err": float}`` where
    each value is the max relative error of the batched op against the
    per-plane op on an [n, size, size] float32 stack.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, size, size)), jnp.float32)

    batched_f = jax.jit(jnp.fft.rfft2)(x)
    per_plane_f = jax.jit(lambda v: jax.lax.map(jnp.fft.rfft2, v))(x)
    scale_f = jnp.max(jnp.abs(per_plane_f))
    fwd_err = float(jnp.max(jnp.abs(batched_f - per_plane_f)) / scale_f)

    spec = per_plane_f
    batched_i = jax.jit(lambda s: jnp.fft.irfft2(s, s=(size, size)))(spec)
    per_plane_i = jax.jit(
        lambda s: jax.lax.map(lambda f: jnp.fft.irfft2(f, s=(size, size)), s)
    )(spec)
    scale_i = jnp.max(jnp.abs(per_plane_i))
    inv_err = float(jnp.max(jnp.abs(batched_i - per_plane_i)) / scale_i)
    return {"forward_rel_err": fwd_err, "inverse_rel_err": inv_err}


def identity_spectrum(h: int, w: int) -> jnp.ndarray:
    """Spectrum of the centered delta kernel (= flat ones) in the active
    representation for (h, w).

    Built host-side and transferred: an eager on-device complex fill is a
    tiny server-side compile on remote-dispatch backends and has been seen
    failing (UNIMPLEMENTED) when the compile service is saturated; a plain
    host->device transfer does not take that path."""
    wf = w if _matmul_fft_active(h, w) else w // 2 + 1
    import numpy as _np

    return jnp.asarray(_np.ones((h, wf), _np.complex64))


def untrim(image: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Zero-pad ``image`` centered into a (height, width) canvas.

    Equivalent of ``aocommon::Image::Untrim``: the input center pixel
    ``(h//2, w//2)`` lands on the output center pixel ``(H//2, W//2)``.
    """
    h, w = image.shape[-2:]
    top = height // 2 - h // 2
    left = width // 2 - w // 2
    pad = [(0, 0)] * (image.ndim - 2) + [
        (top, height - h - top),
        (left, width - w - left),
    ]
    return jnp.pad(image, pad)


def trim(image: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Extract the centered (height, width) region (``aocommon::Image::Trim``)."""
    h, w = image.shape[-2:]
    top = h // 2 - height // 2
    left = w // 2 - width // 2
    return image[..., top : top + height, left : left + width]


def _centered_kernel_fft(kernel: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Spectrum of the kernel re-origined so its center pixel is at (0, 0),
    in the active representation for ``shape``.

    Equivalent of ``schaapcommon::math::PrepareConvolutionKernel``.
    """
    h, w = kernel.shape[-2:]
    k = jnp.roll(kernel, (-(h // 2), -(w // 2)), axis=(-2, -1))
    if _matmul_fft_active(*shape):
        if (h, w) != tuple(shape):
            # Match rfft2's implicit zero-extension at the (0, 0) origin.
            k = jnp.pad(
                k,
                [(0, 0)] * (k.ndim - 2)
                + [(0, shape[0] - h), (0, shape[1] - w)],
            )
        return mxu_fft.fft2(k)
    return jnp.fft.rfft2(k, s=shape)


def convolve_same(image: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Circular centered convolution at the image's own size.

    Equivalent of ``schaapcommon::math::Convolve`` on pre-padded buffers:
    out[p] = sum_q image[q] * kernel[p - q + center].  Batched over leading
    dims of ``image``; ``kernel`` must have the same spatial size, with
    matching/broadcastable leading dims.

    Forward transforms run batched (accurate, see :func:`forward_fft2`);
    only the inverse is mapped plane-by-plane (see :func:`inverse_fft2_real`).
    """
    h, w = image.shape[-2:]
    assert kernel.shape[-2:] == (h, w), (
        "convolve_same requires an image-sized (embedded) kernel"
    )
    if _matmul_fft_active(h, w):
        # The matmul backend batches cleanly (it is matmuls, not the
        # precision-losing native batched inverse FFT).
        ker_f = _centered_kernel_fft(kernel, (h, w))
        out = mxu_fft.ifft2_real(mxu_fft.fft2(image) * ker_f)
        return out.astype(image.dtype)
    if image.ndim == 2 and kernel.ndim == 2:
        img_f = jnp.fft.rfft2(image)
        ker_f = _centered_kernel_fft(kernel, (h, w))
        return jnp.fft.irfft2(img_f * ker_f, s=(h, w)).astype(image.dtype)

    lead = jnp.broadcast_shapes(image.shape[:-2], kernel.shape[:-2])
    ker_rolled = jnp.roll(kernel, (-(h // 2), -(w // 2)), axis=(-2, -1))
    spec = jnp.fft.rfft2(image) * jnp.fft.rfft2(ker_rolled)
    spec = jnp.broadcast_to(spec, lead + spec.shape[-2:])
    return inverse_fft2_real(spec, (h, w)).astype(image.dtype)


def convolve_one_with_many(
    image: jnp.ndarray, kernels: jnp.ndarray
) -> jnp.ndarray:
    """Convolve one [H, W] image with a [S, H, W] kernel bank, computing the
    image transform once (used by the multiscale scale-peak search)."""
    h, w = image.shape
    assert kernels.shape[-2:] == (h, w)
    if _matmul_fft_active(h, w):
        ker_f = _centered_kernel_fft(kernels, (h, w))
        return mxu_fft.ifft2_real(mxu_fft.fft2(image)[None] * ker_f).astype(
            image.dtype
        )
    img_f = jnp.fft.rfft2(image)
    ker_rolled = jnp.roll(kernels, (-(h // 2), -(w // 2)), axis=(-2, -1))
    spec = img_f[None] * jnp.fft.rfft2(ker_rolled)
    return inverse_fft2_real(spec, (h, w)).astype(image.dtype)


@partial(jax.jit, static_argnames=("shape",))
def centered_embed_kernel_fft(
    kernel: jnp.ndarray, shape: Tuple[int, int]
) -> jnp.ndarray:
    """Centered-embed ``kernel`` into ``shape`` and return its origin-rolled
    spectrum, as ONE jitted call (eager pads/rolls are separate server-side
    ops on remote-dispatch backends).  Batched over leading dims."""
    h, w = kernel.shape[-2:]
    if (h, w) != tuple(shape):
        kernel = untrim(kernel, *shape)
    return _centered_kernel_fft(kernel, tuple(shape))


@jax.jit
def prepare_kernel_fft(kernel: jnp.ndarray) -> jnp.ndarray:
    """rfft2 of a centered kernel (leading dims batched via lax.map), for
    reuse across many :func:`convolve_same_prefft` calls — e.g. the fixed
    multiscale kernel bank, whose transforms would otherwise be recomputed
    on every outer iteration."""
    h, w = kernel.shape[-2:]
    rolled = jnp.roll(kernel, (-(h // 2), -(w // 2)), axis=(-2, -1))
    if _matmul_fft_active(h, w):
        return mxu_fft.fft2(rolled)
    return jnp.fft.rfft2(rolled)


@jax.jit
def convolve_same_prefft(image: jnp.ndarray, ker_f: jnp.ndarray) -> jnp.ndarray:
    """Centered circular convolution with a pre-transformed kernel spectrum
    (either representation, shared across every leading plane)."""
    h, w = image.shape[-2:]
    if ker_f.shape[-1] == w:  # full-spectrum (matmul backend)
        return mxu_fft.ifft2_real(mxu_fft.fft2(image) * ker_f).astype(
            image.dtype
        )
    spec = jnp.fft.rfft2(image) * ker_f
    return inverse_fft2_real(spec, (h, w)).astype(image.dtype)


@partial(jax.jit, static_argnames=("padded_height", "padded_width"))
def _padded_convolve_impl(
    image: jnp.ndarray,
    kernel: jnp.ndarray,
    padded_height: int,
    padded_width: int,
) -> jnp.ndarray:
    h, w = image.shape[-2:]
    if _matmul_fft_active(padded_height, padded_width):
        # Windowed matmul transforms: the padded canvases are never
        # materialized and only the centered (h, w) output window is
        # computed (exactly untrim -> convolve -> trim, fewer matmul FLOPs).
        ker_p = untrim(kernel, padded_height, padded_width)
        ker_f = _centered_kernel_fft(ker_p, (padded_height, padded_width))
        img_f = forward_fft2_padded(image, (padded_height, padded_width))
        return inverse_fft2_real_trimmed(
            img_f * ker_f, (padded_height, padded_width), (h, w)
        ).astype(image.dtype)
    img_p = untrim(image, padded_height, padded_width)
    ker_p = untrim(kernel, padded_height, padded_width)
    out = convolve_same(img_p, ker_p)
    return trim(out, h, w)


def padded_convolve(
    image: jnp.ndarray,
    kernel: jnp.ndarray,
    padding: float = 1.1,
    padded_shape: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Zero-padded centered convolution returning the input-sized result.

    Equivalent of ``schaapcommon::math::PaddedConvolution`` and of the
    manual untrim/convolve/trim dance in ``cpp/algorithms/subminor_loop.cc:
    195-218``.  ``padded_shape`` overrides the automatically chosen 7-smooth
    padded size.
    """
    h, w = image.shape[-2:]
    if padded_shape is None:
        ph = calculate_good_fft_size(int(padding * h))
        pw = calculate_good_fft_size(int(padding * w))
    else:
        ph, pw = padded_shape
    return _padded_convolve_impl(image, kernel, ph, pw)
