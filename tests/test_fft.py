"""Matmul-based four-step FFT (ops/fft.py) vs numpy's FFT.

On CPU the convolution backend uses jnp.fft, so these tests exercise the
matmul transform directly; the TPU convolution paths that select it at
runtime are covered by the same spectra algebra (the transform is
mathematically jnp.fft.fft2).
"""

import numpy as np
import pytest

from radler_tpu.ops.fft import factor_split, fft2, ifft2_real, supported_size


@pytest.mark.parametrize(
    "shape",
    [
        (64, 64),  # single dense DFT per axis
        (128, 96),
        (256, 256),  # four-step both axes
        (3, 300, 288),  # batched, mixed radix
        (2, 2, 640, 512),
        (2400, 300),  # 7-smooth sizes used by padded convolutions
    ],
)
def test_matches_numpy(shape):
    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)
    ref = np.fft.fft2(x)
    got = np.asarray(fft2(x))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-5


def test_roundtrip_and_complex_input():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(512, 384)).astype(np.float32)
    assert np.abs(np.asarray(ifft2_real(fft2(x))) - x).max() < 1e-4
    xc = (x + 1j * x[::-1]).astype(np.complex64)
    ref = np.fft.fft2(xc)
    got = np.asarray(fft2(xc))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-5


def test_factorization():
    assert factor_split(2048) is not None
    n1, n2 = factor_split(2048)
    assert n1 * n2 == 2048 and n1 <= 128 and n2 <= 128
    assert factor_split(64) is None  # single dense DFT
    assert supported_size(2400) and supported_size(16384)
    assert not supported_size(2 * 131)  # large prime factor


def test_convolution_agrees_across_backends():
    """convolve_same through the matmul spectra equals the rfft path."""
    import jax.numpy as jnp
    from radler_tpu.ops import convolution as conv
    from radler_tpu.ops import fft as mxu

    rng = np.random.default_rng(2)
    img = rng.normal(size=(256, 256)).astype(np.float32)
    ker = np.zeros((256, 256), np.float32)
    ker[128, 128] = 1.0
    ker[125:132, 125:132] += 0.1
    ref = np.asarray(conv.convolve_same(jnp.asarray(img), jnp.asarray(ker)))
    k = jnp.roll(jnp.asarray(ker), (-128, -128), axis=(0, 1))
    got = np.asarray(mxu.ifft2_real(mxu.fft2(jnp.asarray(img)) * mxu.fft2(k)))
    assert np.abs(got - ref).max() < 2e-4
