"""Isotropic Undecimated Wavelet Transform (à-trous B3-spline).

Behavioral equivalent of ``cpp/algorithms/iuwt/iuwt_decomposition.{h,cc}``:
the 5-tap kernel [1,4,6,4,1]/16 applied separably with tap spacing
``2^scale - 1`` and *zero boundary* (taps falling outside the image are
dropped, no renormalization — see ``convolveComponentHorizontal``,
``iuwt_decomposition.h:199-211``).

On TPU each scale's separable convolution is a handful of shifted adds over
the whole image (fused VPU passes); the full decomposition of a [H, W] image
into S scales is S * 2 such convolutions, batched over leading axes.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

_H = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _shifted(image: jnp.ndarray, dist: int, axis: int) -> jnp.ndarray:
    """out[i] = image[i + dist] with zero fill (reference's clipped taps)."""
    if dist == 0:
        return image
    axis = axis % image.ndim
    n = image.shape[axis]
    rolled = jnp.roll(image, -dist, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, image.shape, axis)
    valid = (idx + dist >= 0) & (idx + dist < n)
    return jnp.where(valid, rolled, 0.0)


def _conv_axis(image: jnp.ndarray, scale: int, axis: int) -> jnp.ndarray:
    """1-D B3-spline convolution with tap spacing (2^scale - 1)."""
    scale_dist = (1 << scale) - 1
    out = _H[2] * image
    for h_index in (0, 1, 3, 4):
        shift = (h_index - 2) * scale_dist
        out = out + _H[h_index] * _shifted(image, shift, axis)
    return out


def iuwt_convolve(image: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Separable smoothing at one scale (``iuwt_decomposition.h:243-261``).

    ``scale`` here matches the reference's ``convolve(..., scale)`` argument
    (the decomposition at scale s calls it with s+1).
    """
    return _conv_axis(_conv_axis(image, scale, -1), scale, -2)


@partial(jax.jit, static_argnames=("n_scales",))
def decompose(image: jnp.ndarray, n_scales: int) -> jnp.ndarray:
    """IUWT decomposition; returns ``[n_scales + 1, H, W]`` where plane s
    holds the wavelet coefficients w_s = i_s - conv(conv(i_s)) and the last
    plane is the smooth residual (``IuwtDecomposition::DecomposeSt``,
    ``iuwt_decomposition.h:100-119``)."""
    coefficients = []
    i0 = image
    i1 = image
    for scale in range(n_scales):
        i1 = iuwt_convolve(i0, scale + 1)
        i2 = iuwt_convolve(i1, scale + 1)
        coefficients.append(i0 - i2)
        i0 = i1
    coefficients.append(i1)
    return jnp.stack(coefficients)


@partial(jax.jit, static_argnames=("n_scales", "include_largest"))
def recompose(
    scales: jnp.ndarray, n_scales: int, include_largest: bool
) -> jnp.ndarray:
    """Inverse transform (``IuwtDecomposition::Recompose``,
    ``iuwt_decomposition.h:121-148``): repeated smoothing + coefficient
    addition from the coarsest scale down."""
    if include_largest:
        output = scales[n_scales]
        is_zero = False
    else:
        output = jnp.zeros_like(scales[0])
        is_zero = True
    for scale in range(n_scales - 1, -1, -1):
        if is_zero:
            output = scales[scale]
            is_zero = False
        else:
            output = iuwt_convolve(output, scale + 1) + scales[scale]
    return output


def apply_mask(scales: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero coefficients outside the per-scale mask and zero the smooth plane
    (``IuwtDecomposition::ApplyMask``, ``iuwt_decomposition.h:162-169``).
    ``mask`` is bool ``[n_scales, H, W]``; ``scales`` is
    ``[n_scales + 1, H, W]``."""
    n_scales = mask.shape[0]
    masked = jnp.where(mask, scales[:n_scales], 0.0)
    smooth = jnp.zeros_like(scales[n_scales])[None]
    return jnp.concatenate([masked, smooth])


def end_scale(max_image_dimension: int) -> int:
    """``max(log2(dim) - 3, 2)`` (``iuwt_decomposition.h:182-184``)."""
    return max(int(math.log2(max_image_dimension)) - 3, 2)


def min_image_dimension(end_scale_value: int) -> int:
    """``iuwt_decomposition.h:186-188``."""
    return 1 << (end_scale_value + 3)
