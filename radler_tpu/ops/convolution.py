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

from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.fft_size import calculate_good_fft_size


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
    """rfft2 of the kernel re-origined so its center pixel is at (0, 0).

    Equivalent of ``schaapcommon::math::PrepareConvolutionKernel``.
    """
    h, w = kernel.shape[-2:]
    k = jnp.roll(kernel, (-(h // 2), -(w // 2)), axis=(-2, -1))
    return jnp.fft.rfft2(k, s=shape)


def convolve_same(image: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Circular centered convolution at the image's own size.

    Equivalent of ``schaapcommon::math::Convolve`` on pre-padded buffers:
    out[p] = sum_q image[q] * kernel[p - q + center].  Batched over leading
    dims of ``image``; ``kernel`` must have the same spatial size, with
    matching/broadcastable leading dims.

    Batched 2-D FFTs are mapped plane-by-plane: TPU's batched FFT path loses
    catastrophic amounts of precision at large sizes (measured 26% relative
    error for an [8, 2048, 2048] rfft2 where the single-plane transform is
    exact), and a serial map of full-size FFTs costs the same FLOPs.
    """
    h, w = image.shape[-2:]
    assert kernel.shape[-2:] == (h, w), (
        "convolve_same requires an image-sized (embedded) kernel"
    )
    if image.ndim == 2 and kernel.ndim == 2:
        img_f = jnp.fft.rfft2(image)
        ker_f = _centered_kernel_fft(kernel, (h, w))
        return jnp.fft.irfft2(img_f * ker_f, s=(h, w)).astype(image.dtype)

    lead = jnp.broadcast_shapes(image.shape[:-2], kernel.shape[:-2])
    n = int(np.prod(lead)) if lead else 1
    img_b = jnp.broadcast_to(image, lead + (h, w)).reshape(n, h, w)
    ker_rolled = jnp.roll(kernel, (-(h // 2), -(w // 2)), axis=(-2, -1))
    ker_b = jnp.broadcast_to(ker_rolled, lead + (h, w)).reshape(n, h, w)

    def _one(args):
        img, ker = args
        return jnp.fft.irfft2(
            jnp.fft.rfft2(img) * jnp.fft.rfft2(ker), s=(h, w)
        )

    out = jax.lax.map(_one, (img_b, ker_b))
    return out.reshape(lead + (h, w)).astype(image.dtype)


def convolve_one_with_many(
    image: jnp.ndarray, kernels: jnp.ndarray
) -> jnp.ndarray:
    """Convolve one [H, W] image with a [S, H, W] kernel bank, computing the
    image transform once (used by the multiscale scale-peak search)."""
    h, w = image.shape
    assert kernels.shape[-2:] == (h, w)
    img_f = jnp.fft.rfft2(image)
    ker_rolled = jnp.roll(kernels, (-(h // 2), -(w // 2)), axis=(-2, -1))

    def _one(ker):
        return jnp.fft.irfft2(img_f * jnp.fft.rfft2(ker), s=(h, w))

    return jax.lax.map(_one, ker_rolled).astype(image.dtype)


@jax.jit
def prepare_kernel_fft(kernel: jnp.ndarray) -> jnp.ndarray:
    """rfft2 of a centered kernel (leading dims batched via lax.map), for
    reuse across many :func:`convolve_same_prefft` calls — e.g. the fixed
    multiscale kernel bank, whose transforms would otherwise be recomputed
    on every outer iteration."""
    h, w = kernel.shape[-2:]
    rolled = jnp.roll(kernel, (-(h // 2), -(w // 2)), axis=(-2, -1))
    if rolled.ndim == 2:
        return jnp.fft.rfft2(rolled)
    lead = rolled.shape[:-2]
    flat = rolled.reshape((-1, h, w))
    out = jax.lax.map(jnp.fft.rfft2, flat)
    return out.reshape(lead + out.shape[-2:])


@jax.jit
def convolve_same_prefft(image: jnp.ndarray, ker_f: jnp.ndarray) -> jnp.ndarray:
    """Centered circular convolution with a pre-transformed kernel
    (one shared [H, W//2+1] spectrum applied to every leading plane)."""
    h, w = image.shape[-2:]
    if image.ndim == 2:
        return jnp.fft.irfft2(jnp.fft.rfft2(image) * ker_f, s=(h, w)).astype(
            image.dtype
        )
    lead = image.shape[:-2]
    flat = image.reshape((-1, h, w))

    def _one(img):
        return jnp.fft.irfft2(jnp.fft.rfft2(img) * ker_f, s=(h, w))

    return jax.lax.map(_one, flat).reshape(lead + (h, w)).astype(image.dtype)


@partial(jax.jit, static_argnames=("padded_height", "padded_width"))
def _padded_convolve_impl(
    image: jnp.ndarray,
    kernel: jnp.ndarray,
    padded_height: int,
    padded_width: int,
) -> jnp.ndarray:
    h, w = image.shape[-2:]
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
