"""Windowed matmul-FFT variants (ops/fft.py): exact equivalence with the
pad-then-transform / transform-then-trim compositions they replace.  These
are the transforms behind the fused multiscale loop's round-5 speedup —
they must drop FLOPs, never precision."""

import numpy as np
import jax.numpy as jnp
import pytest

from radler_tpu.ops import fft as F
from radler_tpu.ops.convolution import (
    forward_fft2_padded,
    inverse_fft2_real_trimmed,
    untrim,
)


@pytest.mark.parametrize(
    "shape,padded",
    [
        ((100, 120), (189, 210)),  # split sizes with odd factors
        ((64, 64), (126, 150)),
        ((200, 200), (250, 250)),
        ((50, 60), (90, 90)),  # no-split (n <= 128) path
    ],
)
def test_fft2_windowed_matches_padded_fft(shape, padded):
    rng = np.random.default_rng(0)
    H, W = shape
    Ph, Pw = padded
    top, left = Ph // 2 - H // 2, Pw // 2 - W // 2
    x = rng.standard_normal((3, H, W)).astype(np.float32)
    xp = np.zeros((3, Ph, Pw), np.float32)
    xp[:, top : top + H, left : left + W] = x
    ref = np.fft.fft2(xp)
    got = np.asarray(F.fft2_windowed(jnp.asarray(x), padded, (top, left)))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


@pytest.mark.parametrize(
    "shape,padded",
    [((100, 120), (189, 210)), ((50, 60), (90, 90))],
)
def test_ifft2_real_windowed_matches_trim(shape, padded):
    rng = np.random.default_rng(1)
    H, W = shape
    Ph, Pw = padded
    top, left = Ph // 2 - H // 2, Pw // 2 - W // 2
    spec = np.fft.fft2(rng.standard_normal((2, Ph, Pw))).astype(np.complex64)
    ref = np.real(np.fft.ifft2(spec))[:, top : top + H, left : left + W]
    got = np.asarray(
        F.ifft2_real_windowed(jnp.asarray(spec), shape, (top, left))
    )
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def test_forward_fft2_padded_wrapper_routes():
    """On CPU (no matmul backend) the wrapper must fall back to the
    untrim+rfft2 composition with identical results."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 60, 70)).astype(np.float32)
    got = np.asarray(forward_fft2_padded(jnp.asarray(x), (90, 98)))
    ref = np.asarray(jnp.fft.rfft2(untrim(jnp.asarray(x), 90, 98)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_inverse_fft2_real_trimmed_wrapper_routes():
    rng = np.random.default_rng(3)
    spec = jnp.fft.rfft2(
        jnp.asarray(rng.standard_normal((2, 90, 98)).astype(np.float32))
    )
    got = np.asarray(inverse_fft2_real_trimmed(spec, (90, 98), (60, 70)))
    from radler_tpu.ops.convolution import inverse_fft2_real, trim

    ref = np.asarray(trim(inverse_fft2_real(spec, (90, 98)), 60, 70))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
