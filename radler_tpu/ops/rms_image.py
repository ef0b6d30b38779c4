"""Local-RMS maps and sliding-window extrema.

Behavioral equivalent of ``cpp/math/rms_image.{h,cc}`` plus the Gaussian-beam
convolution of schaapcommon's ``RestoreImage`` used by it.  The windowed RMS
is a Gaussian-weighted mean of squares computed with one padded FFT
convolution; sliding minima use ``lax.reduce_window`` (separable, clipped at
the edges exactly like the reference's scalar loops).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .convolution import padded_convolve

_FWHM_TO_SIGMA = 1.0 / (2.0 * math.sqrt(2.0 * math.log(2.0)))


def gaussian_beam_kernel(
    height: int,
    width: int,
    beam_major: float,
    beam_minor: float,
    beam_pa: float,
    pixel_scale_l: float,
    pixel_scale_m: float,
) -> np.ndarray:
    """Unit-peak elliptical Gaussian centered at (H//2, W//2).

    Equivalent of the restoring-beam raster of schaapcommon's
    ``RestoreImage``; beam axes are FWHM in radians.
    """
    # Work in angle units: pixel offsets are scaled per-axis, so non-square
    # pixels produce the correctly-shaped elliptical window.
    sigma_maj = max(beam_major * _FWHM_TO_SIGMA, 1e-30)
    sigma_min = max(beam_minor * _FWHM_TO_SIGMA, 1e-30)
    ys = (np.arange(height) - height // 2) * pixel_scale_m
    xs = (np.arange(width) - width // 2) * pixel_scale_l
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    cos_pa, sin_pa = np.cos(beam_pa), np.sin(beam_pa)
    xr = xx * cos_pa - yy * sin_pa
    yr = xx * sin_pa + yy * cos_pa
    arg = (xr / sigma_maj) ** 2 + (yr / sigma_min) ** 2
    return np.exp(-0.5 * arg).astype(np.float32)


def make_rms_image(
    image: jnp.ndarray,
    window_size: float,
    beam_major: float,
    beam_minor: float,
    beam_pa: float,
    pixel_scale_l: float,
    pixel_scale_m: float,
) -> jnp.ndarray:
    """Local RMS = sqrt(Gaussian-window mean of squares)
    (``cpp/math/rms_image.cc:16-34``)."""
    h, w = image.shape
    kernel = gaussian_beam_kernel(
        h,
        w,
        beam_major * window_size,
        beam_minor * window_size,
        beam_pa,
        pixel_scale_l,
        pixel_scale_m,
    )
    conv = padded_convolve(image * image, jnp.asarray(kernel))
    s = math.sqrt(2.0 * math.pi)
    sigma_maj = beam_major * _FWHM_TO_SIGMA
    sigma_min = beam_minor * _FWHM_TO_SIGMA
    norm = 1.0 / (
        s
        * sigma_maj
        / pixel_scale_l
        * window_size
        * s
        * sigma_min
        / pixel_scale_l
        * window_size
    )
    return jnp.sqrt(jnp.maximum(conv * norm, 0.0))


@partial(jax.jit, static_argnames=("window_size",))
def sliding_minimum(image: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """Separable sliding minimum with edge clipping
    (``cpp/math/rms_image.cc:36-70``)."""
    half = window_size // 2
    pad_lo, pad_hi = half, window_size - half - 1

    def _min_1d(x, axis):
        dims = [1, 1]
        dims[axis] = window_size
        padding = [(0, 0), (0, 0)]
        padding[axis] = (pad_lo, pad_hi)
        return jax.lax.reduce_window(
            x,
            jnp.asarray(jnp.inf, x.dtype),
            jax.lax.min,
            window_dimensions=tuple(dims),
            window_strides=(1, 1),
            padding=tuple(padding),
        )

    return _min_1d(_min_1d(image, 1), 0)


def sliding_maximum(image: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """``cpp/math/rms_image.cc:72-77``."""
    return -sliding_minimum(-image, window_size)


def make_with_negativity_limit(
    image: jnp.ndarray,
    window_size: float,
    beam_major: float,
    beam_minor: float,
    beam_pa: float,
    pixel_scale_l: float,
    pixel_scale_m: float,
) -> jnp.ndarray:
    """RMS map floored at 0.3x the |sliding minimum|
    (``cpp/math/rms_image.cc:79-93``)."""
    rms = make_rms_image(
        image,
        window_size,
        beam_major,
        beam_minor,
        beam_pa,
        pixel_scale_l,
        pixel_scale_m,
    )
    beam_in_pixels = max(beam_major / pixel_scale_l, 1.0)
    win = max(int(window_size * beam_in_pixels), 1)
    smin = sliding_minimum(image, win)
    return jnp.maximum(rms, jnp.abs(smin) * np.float32(1.5 / 5.0))


def make_rms_factor_image(
    rms_image: jnp.ndarray, local_rms_strength: float
) -> Tuple[jnp.ndarray, float]:
    """Convert an RMS map into a multiplicative peak-finding factor
    (``cpp/math/rms_image.cc:95-123``).  Returns (factor_image, lowest_rms)."""
    stddev = float(jnp.min(rms_image))
    if stddev < 0.0:
        raise RuntimeError(
            "RMS image can only contain values >= 0, but contains values < 0.0"
        )
    if local_rms_strength == 0.0:
        return jnp.ones_like(rms_image), stddev
    ratio = jnp.where(rms_image != 0.0, stddev / rms_image, 0.0)
    if local_rms_strength != 1.0:
        factor = jnp.where(
            rms_image != 0.0, ratio**local_rms_strength, 0.0
        )
    else:
        factor = ratio
    return factor, stddev
