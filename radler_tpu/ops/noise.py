"""Noise estimation: median and MAD-based standard deviation.

Equivalent of ``aocommon::Image::MedianAndStdDevFromMAD`` as used by
``Radler::Perform`` (``cpp/radler.cc:162-169``): a robust sigma estimate that
is insensitive to residual source structure.  Runs fully on device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Consistency constant: stddev = MAD * 1 / Phi^-1(3/4).
MAD_TO_SIGMA = 1.4826


@jax.jit
def median_and_stddev_from_mad(image: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (median, sigma) with sigma = 1.4826 x median(|x - median|).

    Non-finite pixels are ignored (they carry zero weight in the reference's
    averaging and must not poison the noise estimate).
    """
    flat = image.reshape(-1)
    finite = jnp.isfinite(flat)
    n = jnp.sum(finite)
    # Replace non-finite values with +inf so they sort to the end, then take
    # the median over the first n entries.
    safe = jnp.where(finite, flat, jnp.inf)
    s = jnp.sort(safe)

    def _median_of_sorted(sorted_vals, count):
        idx_hi = jnp.maximum(count // 2, 0)
        idx_lo = jnp.maximum((count - 1) // 2, 0)
        return 0.5 * (sorted_vals[idx_lo] + sorted_vals[idx_hi])

    med = _median_of_sorted(s, n)
    med = jnp.where(n > 0, med, jnp.float32(0.0))
    dev = jnp.where(finite, jnp.abs(flat - med), jnp.inf)
    mad = _median_of_sorted(jnp.sort(dev), n)
    mad = jnp.where(n > 0, mad, jnp.float32(0.0))
    return med, mad * jnp.float32(MAD_TO_SIGMA)


@jax.jit
def rms(image: jnp.ndarray) -> jnp.ndarray:
    """Plain root-mean-square (``ThreadedDeconvolutionTools::RMS``)."""
    return jnp.sqrt(jnp.mean(jnp.square(image)))
