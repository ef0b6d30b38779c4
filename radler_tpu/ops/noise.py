"""Noise estimation: median and MAD-based standard deviation.

Equivalent of ``aocommon::Image::MedianAndStdDevFromMAD`` as used by
``Radler::Perform`` (``cpp/radler.cc:162-169``): a robust sigma estimate that
is insensitive to residual source structure.  Runs fully on device.

Instead of sorting (O(n log n) and slow on TPU), the k-th order statistics
are found by 32-step binary search over the monotonic unsigned encoding of
float32 — each step is one bandwidth-bound comparison-reduce, so a 4096^2
median costs ~64 streamed passes instead of two full sorts.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Consistency constant: stddev = MAD * 1 / Phi^-1(3/4).
MAD_TO_SIGMA = 1.4826


def _orderable_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Map float32 to uint32 so unsigned order equals float order; non-finite
    values map to the maximum (they are excluded via the finite count)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    flipped = jnp.where(
        (u & jnp.uint32(0x80000000)) != 0,
        ~u,
        u | jnp.uint32(0x80000000),
    )
    return jnp.where(jnp.isfinite(x), flipped, jnp.uint32(0xFFFFFFFF))


def _bits_to_float(u: jnp.ndarray) -> jnp.ndarray:
    back = jnp.where(
        (u & jnp.uint32(0x80000000)) != 0,
        u & jnp.uint32(0x7FFFFFFF),
        ~u,
    )
    return jax.lax.bitcast_convert_type(back, jnp.float32)


def _kth_smallest_bits(u: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Smallest encoded value v with count(u <= v) >= k + 1 (the 0-based k-th
    order statistic), via 32-step bisection of the value space."""

    def body(_, state):
        lo, hi = state
        mid = lo + (hi - lo) // jnp.uint32(2)
        count = jnp.sum((u <= mid).astype(jnp.int32))
        take_low = count >= k + 1
        return (
            jnp.where(take_low, lo, mid + jnp.uint32(1)),
            jnp.where(take_low, mid, hi),
        )

    lo, hi = jax.lax.fori_loop(
        0, 32, body, (jnp.uint32(0), jnp.uint32(0xFFFFFFFF))
    )
    return lo


def _median(values: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Median of the first-n (finite) encoded values: mean of the two middle
    order statistics."""
    k_lo = jnp.maximum((n - 1) // 2, 0)
    k_hi = jnp.maximum(n // 2, 0)
    lo = _bits_to_float(_kth_smallest_bits(values, k_lo))
    hi = jnp.where(
        k_hi == k_lo,
        lo,
        _bits_to_float(_kth_smallest_bits(values, k_hi)),
    )
    return 0.5 * (lo + hi)


@jax.jit
def median_and_stddev_from_mad(image: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (median, sigma) with sigma = 1.4826 x median(|x - median|).

    Non-finite pixels are ignored (they carry zero weight in the reference's
    averaging and must not poison the noise estimate).
    """
    flat = image.reshape(-1)
    finite = jnp.isfinite(flat)
    n = jnp.sum(finite.astype(jnp.int32))
    bits = _orderable_bits(flat)
    med = jnp.where(n > 0, _median(bits, n), jnp.float32(0.0))
    dev = jnp.where(finite, jnp.abs(flat - med), jnp.float32(jnp.inf))
    dev_bits = _orderable_bits(dev)
    mad = jnp.where(n > 0, _median(dev_bits, n), jnp.float32(0.0))
    return med, mad * jnp.float32(MAD_TO_SIGMA)


@jax.jit
def rms(image: jnp.ndarray) -> jnp.ndarray:
    """Plain root-mean-square (``ThreadedDeconvolutionTools::RMS``)."""
    return jnp.sqrt(jnp.mean(jnp.square(image)))


@jax.jit
def mad_sigma_batched(planes: jnp.ndarray) -> jnp.ndarray:
    """Per-plane MAD(|x|)-based sigma for a [S, H, W] stack in one device
    call (used by IUWT's per-scale thresholds,
    ``iuwt_deconvolution_algorithm.cc:104-110`` — note that estimator takes
    the median of |x| directly)."""

    def one(plane):
        v = jnp.abs(plane).reshape(-1)
        bits = _orderable_bits(v)
        mid = jnp.int32(v.shape[0] // 2)
        return _bits_to_float(_kth_smallest_bits(bits, mid))

    return jax.vmap(one)(planes) / jnp.float32(0.674559)
