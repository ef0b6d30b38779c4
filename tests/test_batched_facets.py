"""The vmapped batched-facet multiscale run must match the serial per-facet
loop (``parallel_deconvolution.cc:555-654`` semantics either way)."""

import os

import numpy as np
import pytest

import radler_tpu as rd


def _gaussian_psf(size, sigma=2.0):
    yy, xx = np.mgrid[0:size, 0:size]
    r2 = (yy - size // 2) ** 2.0 + (xx - size // 2) ** 2.0
    psf = np.exp(-r2 / (2 * sigma**2)).astype(np.float32)
    return psf / psf.max()


def _sky_residual(size, psf, seed=9):
    rng = np.random.default_rng(seed)
    sky = np.zeros((size, size), np.float32)
    ys = rng.integers(12, size - 12, 10)
    xs = rng.integers(12, size - 12, 10)
    np.add.at(sky, (ys, xs), rng.uniform(0.5, 2.0, 10).astype(np.float32))
    yy, xx = np.mgrid[0:size, 0:size]
    blob = np.exp(
        -((yy - 3 * size // 4) ** 2 + (xx - size // 4) ** 2) / (2 * 5.0**2)
    )
    sky += 1.5 * blob.astype(np.float32)
    return np.real(
        np.fft.ifft2(np.fft.fft2(sky) * np.fft.fft2(np.fft.ifftshift(psf)))
    ).astype(np.float32)


def _run(batched, monkeypatch, with_rms=False):
    if batched:
        monkeypatch.delenv("RADLER_TPU_NO_BATCHED_FACETS", raising=False)
    else:
        monkeypatch.setenv("RADLER_TPU_NO_BATCHED_FACETS", "1")
    size = 128
    psf = _gaussian_psf(size)
    residual = _sky_residual(size, psf)
    model = np.zeros_like(residual)
    s = rd.Settings()
    s.trimmed_image_width = size
    s.trimmed_image_height = size
    s.algorithm_type = rd.AlgorithmType.MULTISCALE
    s.minor_iteration_count = 300
    s.absolute_threshold = 5e-3
    s.major_loop_gain = 0.8
    s.multiscale.max_scales = 3
    s.parallel.grid_width = 2
    s.parallel.grid_height = 2
    beam = 0.0
    if with_rms:
        s.local_rms.method = rd.LocalRmsMethod.RMS_WINDOW
        s.local_rms.window = 25.0
        s.pixel_scale.x = 1.0
        s.pixel_scale.y = 1.0
        beam = 2.0
    r = rd.Radler(s, psf, residual, model, beam)
    more = r.perform(0)
    return residual, model, more, r.iteration_number


def test_batched_facets_match_serial(monkeypatch):
    res_s, mdl_s, more_s, it_s = _run(False, monkeypatch)
    res_b, mdl_b, more_b, it_b = _run(True, monkeypatch)
    assert mdl_s.max() > 0  # the serial run must actually have cleaned
    assert more_b == more_s
    # The batched path pads facets to a common box; numerics inside the
    # minor loops are identical, so only fp reduction order may differ.
    np.testing.assert_allclose(res_b, res_s, atol=3e-5)
    np.testing.assert_allclose(mdl_b, mdl_s, atol=3e-5)


def test_batched_path_actually_engages(monkeypatch):
    from radler_tpu.models.multiscale import MultiScaleAlgorithm

    calls = []
    orig = MultiScaleAlgorithm.execute_batched_facets

    def spy(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    monkeypatch.setattr(MultiScaleAlgorithm, "execute_batched_facets", spy)
    _run(True, monkeypatch)
    assert len(calls) == 2  # peak-only pass + clean pass


def test_batched_facets_with_local_rms(monkeypatch):
    res_s, mdl_s, _, _ = _run(False, monkeypatch, with_rms=True)
    res_b, mdl_b, _, _ = _run(True, monkeypatch, with_rms=True)
    np.testing.assert_allclose(res_b, res_s, atol=3e-5)
    np.testing.assert_allclose(mdl_b, mdl_s, atol=3e-5)
