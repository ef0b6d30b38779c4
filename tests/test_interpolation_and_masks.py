"""Deconvolution-channel interpolation and mask ingestion.

* ``n_deconvolution_groups < n_channels``: channels are averaged before
  deconvolution and the model is interpolated back to every original channel
  through the spectral fitter (``cpp/image_set.cc:209-288``).
* Horizon masks restrict cleaning to within the horizon
  (``cpp/radler.cc:484-527``); FITS masks restrict cleaning to masked pixels.
"""

import os

import numpy as np
import pytest

import radler_tpu as rd

SIZE = 64
PIXEL_SCALE = 1.0 / 60.0 * (np.pi / 180.0)


def delta_psf(n=None):
    psf = np.zeros((SIZE, SIZE), np.float32)
    psf[SIZE // 2, SIZE // 2] = 1.0
    return psf if n is None else np.repeat(psf[None], n, 0)


def make_settings():
    s = rd.Settings()
    s.trimmed_image_width = SIZE
    s.trimmed_image_height = SIZE
    s.pixel_scale.x = PIXEL_SCALE
    s.pixel_scale.y = PIXEL_SCALE
    s.minor_iteration_count = 300
    s.absolute_threshold = 1e-6
    return s


def test_deconvolution_group_interpolation():
    """4 original channels joined into 2 deconvolution groups: the output
    model per original channel comes from evaluating the spectral fit at
    that channel's frequency."""
    C = 4
    freqs = np.stack(
        [np.linspace(1.0e8, 1.6e8, C), np.linspace(1.1e8, 1.7e8, C)], axis=1
    )
    centers = freqs.mean(axis=1)
    amp, ref = 2.0, None
    residual = np.zeros((C, SIZE, SIZE), np.float32)
    # Linear spectrum so a 2-term polynomial fit is exact.
    slope = 0.5
    s = make_settings()
    s.spectral_fitting.mode = rd.SpectralFittingMode.POLYNOMIAL
    s.spectral_fitting.terms = 2
    # reference frequency = weighted mean of the deconvolution channels
    for c in range(C):
        residual[c, 20, 30] = amp + slope * (centers[c] / centers.mean() - 1.0)
    model = np.zeros_like(residual)
    r = rd.Radler(
        s,
        delta_psf(C),
        residual,
        model,
        0.0,
        rd.Polarization.STOKES_I,
        frequencies=freqs,
        weights=np.ones(C),
        n_deconvolution_groups=2,
    )
    r.perform(0)
    # Each output channel's model approximates its input flux: the two-group
    # averaging + interpolation reproduces the linear spectrum.
    for c in range(C):
        expected = amp + slope * (centers[c] / centers.mean() - 1.0)
        assert model[c, 20, 30] == pytest.approx(expected, rel=0.02), c
    np.testing.assert_allclose(residual, 0.0, atol=1e-4)


def test_fits_mask(tmp_path):
    from radler_tpu.utils.fits import write_fits_image

    mask = np.zeros((SIZE, SIZE), np.float32)
    mask[10, 10] = 1.0
    mask_path = str(tmp_path / "mask.fits")
    write_fits_image(mask_path, mask)

    residual = np.zeros((SIZE, SIZE), np.float32)
    residual[10, 10] = 1.0
    residual[40, 40] = 5.0  # outside the mask: must not be cleaned
    model = np.zeros_like(residual)
    s = make_settings()
    s.fits_mask = mask_path
    r = rd.Radler(s, delta_psf(), residual, model, 0.0)
    r.perform(0)
    assert model[10, 10] == pytest.approx(1.0, abs=1e-4)
    assert model[40, 40] == 0.0
    assert residual[40, 40] == pytest.approx(5.0)


def test_horizon_mask(tmp_path):
    os.chdir(tmp_path)  # horizon mask FITS is written to prefix_name path
    residual = np.zeros((SIZE, SIZE), np.float32)
    residual[SIZE // 2, SIZE // 2] = 1.0  # at phase centre: inside horizon
    residual[1, 1] = 5.0  # far corner
    model = np.zeros_like(residual)
    s = make_settings()
    # Large pixel scale so the corner is beyond the horizon distance.
    s.pixel_scale.x = s.pixel_scale.y = np.deg2rad(2.0)
    s.horizon_mask_distance = 0.5  # radians
    r = rd.Radler(s, delta_psf(), residual, model, 0.0)
    r.perform(0)
    assert model[SIZE // 2, SIZE // 2] == pytest.approx(1.0, abs=1e-4)
    assert model[1, 1] == 0.0
    assert os.path.exists("wsclean-horizon-mask.fits")
