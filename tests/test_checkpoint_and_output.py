"""Checkpoint/resume and sky-model output tests."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

import radler_tpu as rd

SIZE = 64
PIXEL_SCALE = 1.0 / 60.0 * (np.pi / 180.0)


def cross_psf():
    ps = np.array(
        [[0.0, 0.4, 0.0], [0.25, 1.0, 0.5], [0.0, 0.6, 0.0]], np.float32
    )
    psf = np.zeros((SIZE, SIZE), np.float32)
    psf[31:34, 31:34] = ps
    return psf, ps


def make_settings(algorithm=rd.AlgorithmType.GENERIC_CLEAN):
    s = rd.Settings()
    s.algorithm_type = algorithm
    s.trimmed_image_width = SIZE
    s.trimmed_image_height = SIZE
    s.pixel_scale.x = PIXEL_SCALE
    s.pixel_scale.y = PIXEL_SCALE
    s.minor_iteration_count = 500
    s.absolute_threshold = 1e-7
    return s


def test_checkpoint_roundtrip(tmp_path):
    psf, ps = cross_psf()
    residual = np.zeros((SIZE, SIZE), np.float32)
    residual[21:24, 26:29] = 2.5 * ps
    model = np.zeros_like(residual)
    s = make_settings()
    s.major_loop_gain = 0.9  # stop partway
    r = rd.Radler(s, psf, residual, model, 0.0)
    assert r.perform(0) is True
    iters_before = r.iteration_number
    path = str(tmp_path / "state.ckpt")
    r.save_state(path)

    # Fresh Radler over the same (partially cleaned) buffers + checkpoint.
    r2 = rd.Radler(s, psf, residual, model, 0.0)
    r2.load_state(path)
    assert r2.iteration_number == iters_before
    again = True
    major = 1
    while again and major < 20:
        again = r2.perform(major)
        major += 1
    np.testing.assert_allclose(residual, 0.0, atol=2e-6)
    assert model[22, 27] == pytest.approx(2.5, abs=1e-4)


def test_write_sources(tmp_path):
    """Sky-model writer (``cpp/component_list.cc:59-140`` equivalent)."""
    psf, ps = cross_psf()
    residual = np.zeros((SIZE, SIZE), np.float32)
    residual[31:34, 31:34] = 2.0 * ps
    model = np.zeros_like(residual)
    s = make_settings()
    s.save_source_list = True
    r = rd.Radler(s, psf, residual, model, 0.0)
    r.perform(0)
    comp_list = r.component_list
    assert comp_list.component_count(0) >= 1
    path = str(tmp_path / "sources.txt")
    comp_list.write_sources(
        r, path, PIXEL_SCALE, PIXEL_SCALE, 0.3, 0.4, 0.0, 0.0
    )
    with open(path) as f:
        lines = f.read().strip().splitlines()
    assert lines[0].startswith("Format = Name, Type, Ra, Dec, I")
    assert any(",POINT," in line for line in lines[1:])
    # The brightest component carries (nearly) all the flux.
    fluxes = [float(line.split(",")[4]) for line in lines[1:]]
    assert max(fluxes) == pytest.approx(2.0, rel=0.15)


def test_forced_spectrum_fitting(tmp_path):
    """kForcedTerms: spectral shape fixed by a terms image, amplitude fitted
    (``cpp/radler.cc:410-432`` + spectral_fitting.py FORCED_TERMS)."""
    from radler_tpu.utils.fits import write_fits_image

    C = 3
    psf = np.zeros((C, SIZE, SIZE), np.float32)
    psf[:, SIZE // 2, SIZE // 2] = 1.0
    freqs = np.array([[1.0e8, 1.1e8], [1.2e8, 1.3e8], [1.4e8, 1.5e8]])
    centers = freqs.mean(axis=1)
    ref = centers.mean()
    alpha = -0.7
    amp = 2.0
    residual = np.zeros((C, SIZE, SIZE), np.float32)
    for c in range(C):
        residual[c, 20, 30] = amp * (centers[c] / ref) ** alpha
    model = np.zeros_like(residual)

    terms_path = str(tmp_path / "forced.fits")
    write_fits_image(
        terms_path, np.full((1, SIZE, SIZE), alpha, np.float32)
    )
    s = make_settings()
    s.spectral_fitting.mode = rd.SpectralFittingMode.FORCED_TERMS
    s.spectral_fitting.terms = 2
    s.spectral_fitting.forced_filename = terms_path
    r = rd.Radler(
        s,
        psf,
        residual,
        model,
        0.0,
        rd.Polarization.STOKES_I,
        frequencies=freqs,
        weights=np.ones(C),
    )
    r.perform(0)
    np.testing.assert_allclose(residual, 0.0, atol=1e-5)
    # The model spectrum follows the forced power law exactly.
    ratio = model[2, 20, 30] / model[0, 20, 30]
    expected = (centers[2] / centers[0]) ** alpha
    assert ratio == pytest.approx(expected, rel=1e-3)


def test_forced_fitting_requires_filename():
    s = make_settings()
    s.spectral_fitting.mode = rd.SpectralFittingMode.FORCED_TERMS
    s.spectral_fitting.terms = 2
    with pytest.raises(RuntimeError, match="Forced fitting filename"):
        s.validate()
