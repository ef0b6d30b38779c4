"""Auto-thresholding / two-phase auto-masking behavior.

Mirrors the state machine of ``cpp/radler.cc:162-302``: with
``auto_mask_sigma`` set, cleaning first runs to the sigma threshold, then
flips to the masked deeper-cleaning phase (with doubled minor gain and no RMS
weighting), constrained to component positions, and stops after
``major_auto_mask_iteration_count`` further major iterations.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import radler_tpu as rd
from radler_tpu.ops.convolution import padded_convolve

SIZE = 128
PIXEL_SCALE = 1.0 / 60.0 * (np.pi / 180.0)


def make_settings():
    s = rd.Settings()
    s.algorithm_type = rd.AlgorithmType.GENERIC_CLEAN
    s.trimmed_image_width = SIZE
    s.trimmed_image_height = SIZE
    s.pixel_scale.x = PIXEL_SCALE
    s.pixel_scale.y = PIXEL_SCALE
    s.minor_iteration_count = 10_000
    return s


def make_problem(noise_sigma=0.01, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    psf = np.exp(
        -((yy - SIZE // 2) ** 2 + (xx - SIZE // 2) ** 2) / (2 * 1.5**2)
    ).astype(np.float32)
    sky = np.zeros((SIZE, SIZE), np.float32)
    sky[40, 30] = 1.0
    sky[80, 90] = 0.6
    residual = np.asarray(
        padded_convolve(jnp.asarray(sky), jnp.asarray(psf))
    ).astype(np.float32)
    residual += rng.normal(scale=noise_sigma, size=residual.shape).astype(
        np.float32
    )
    return psf, residual


def test_auto_threshold_stops_at_sigma():
    psf, residual = make_problem()
    model = np.zeros_like(residual)
    s = make_settings()
    s.auto_threshold_sigma = 3.0
    r = rd.Radler(s, psf, residual, model, 0.0)
    again = r.perform(0)
    assert again is False
    # Residual peak is near the 3-sigma level of the noise (0.01).
    assert np.abs(residual).max() < 6 * 0.01
    assert np.abs(residual).max() > 1 * 0.01
    # The strong sources were cleaned into the model.
    assert model.sum() > 1.0


def test_auto_mask_two_phase():
    psf, residual = make_problem()
    model = np.zeros_like(residual)
    s = make_settings()
    s.auto_mask_sigma = 5.0
    s.auto_threshold_sigma = 1.0
    r = rd.Radler(s, psf, residual, model, 0.0)

    # Phase 1 runs to the 5-sigma auto-mask level, then flags another
    # iteration to start the masked deeper phase (radler.cc:276-283).
    again = r.perform(0)
    assert again is True
    model_after_phase1 = model.copy()
    mask_positions = np.abs(model_after_phase1) > 0

    # Phase 2: cleans deeper but only at masked positions.
    major = 1
    while again and major < 8:
        again = r.perform(major)
        major += 1
    new_components = (np.abs(model) > 0) & ~mask_positions
    assert new_components.sum() == 0, "deeper phase must stay inside the mask"
    # Deeper phase lowered the residual peak further than phase 1.
    assert np.abs(residual[40, 30]) < 3 * 0.01


def test_major_iteration_cap():
    psf, residual = make_problem()
    model = np.zeros_like(residual)
    s = make_settings()
    s.major_loop_gain = 0.2  # forces many major iterations
    s.absolute_threshold = 1e-6
    s.major_iteration_count = 2
    r = rd.Radler(s, psf, residual, model, 0.0)
    assert r.perform(0) is True
    assert r.perform(1) is True
    assert r.perform(2) is False  # cap reached (radler.cc:285-290)
