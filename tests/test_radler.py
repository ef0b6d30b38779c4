"""End-to-end point-source deconvolution parity tests.

Mirrors the reference's ``python/test/test_radler.py`` and
``cpp/test/test_radler.cc``: a 5-pixel-cross PSF with a (possibly shifted)
point source must deconvolve to an (almost) empty residual and a single-pixel
model, within the reference's own tolerances (2e-6 abs).
"""

import numpy as np
import pytest

import radler_tpu as rd

WIDTH = 64
HEIGHT = 64
BEAM_SIZE = 0.0
PIXEL_SCALE = 1.0 / 60.0 * (np.pi / 180.0)
MINOR_ITERATION_COUNT = 1000


@pytest.fixture
def settings():
    s = rd.Settings()
    s.algorithm_type = rd.AlgorithmType.GENERIC_CLEAN
    s.trimmed_image_width = WIDTH
    s.trimmed_image_height = HEIGHT
    s.pixel_scale.x = PIXEL_SCALE
    s.pixel_scale.y = PIXEL_SCALE
    s.minor_iteration_count = MINOR_ITERATION_COUNT
    s.absolute_threshold = 1e-8
    return s


def get_point_source():
    return np.array(
        [[0.0, 0.4, 0.0], [0.25, 1.0, 0.5], [0.0, 0.6, 0.0]], dtype=np.float32
    )


def get_psf():
    point_source = get_point_source()
    psf = np.zeros((HEIGHT, WIDTH), dtype=np.float32)
    oy = HEIGHT // 2 - point_source.shape[0] // 2
    ox = WIDTH // 2 - point_source.shape[1] // 2
    psf[oy : oy + 3, ox : ox + 3] = point_source
    return psf


def get_residual(scale, shift_x, shift_y):
    point_source = scale * get_point_source()
    cy = HEIGHT // 2 + shift_y
    cx = WIDTH // 2 + shift_x
    residual = np.zeros((HEIGHT, WIDTH), dtype=np.float32)
    residual[cy - 1 : cy + 2, cx - 1 : cx + 2] = point_source
    return residual


def radler_perform(radler_object, minor_iteration_count):
    reached_threshold = radler_object.perform(0)
    assert reached_threshold is False
    assert radler_object.iteration_number <= minor_iteration_count


def check_model_point_source(model, scale, shift_x, shift_y):
    model_ref = np.zeros((HEIGHT, WIDTH), dtype=np.float32)
    model_ref[HEIGHT // 2 + shift_y, WIDTH // 2 + shift_x] = scale
    np.testing.assert_allclose(model, model_ref, atol=2e-6)


def test_input_dtype(settings):
    psf = get_psf()
    residual = get_residual(1.0, 0, 0)
    model = np.zeros_like(residual)
    with pytest.raises(TypeError):
        rd.Radler(settings, psf.astype(np.float64), residual, model, BEAM_SIZE)
    with pytest.raises(TypeError):
        rd.Radler(settings, psf, residual.astype(np.float16), model, BEAM_SIZE)
    with pytest.raises(TypeError):
        rd.Radler(settings, psf, residual, model.astype(int), BEAM_SIZE)
    rd.Radler(settings, psf, residual, model, BEAM_SIZE)


def test_matching_arrays(settings):
    valid = np.zeros((3, HEIGHT, WIDTH), dtype=np.float32)
    valid_frequencies = np.zeros((3, 2), dtype=np.float64)
    valid_weights = np.zeros((3,), dtype=np.float64)
    rd.Radler(
        settings,
        valid,
        valid,
        valid,
        BEAM_SIZE,
        frequencies=valid_frequencies,
        weights=valid_weights,
    )
    bad = np.zeros((42,), dtype=np.float32)
    with pytest.raises(RuntimeError):
        rd.Radler(settings, bad, bad, bad, BEAM_SIZE)
    nonmatching = np.zeros((3, WIDTH + 42, HEIGHT + 42), dtype=np.float32)
    with pytest.raises(RuntimeError):
        rd.Radler(settings, valid, valid, nonmatching, BEAM_SIZE)
    with pytest.raises(RuntimeError):
        rd.Radler(
            settings,
            valid,
            valid,
            valid,
            BEAM_SIZE,
            frequencies=np.zeros((42, 2)),
        )
    with pytest.raises(RuntimeError):
        rd.Radler(
            settings, valid, valid, valid, BEAM_SIZE, weights=np.zeros((42,))
        )


def test_require_frequencies(settings):
    image = np.zeros((HEIGHT, WIDTH), dtype=np.float32)
    settings.spectral_fitting.mode = rd.SpectralFittingMode.POLYNOMIAL
    with pytest.raises(RuntimeError):
        rd.Radler(settings, image, image, image, BEAM_SIZE)


@pytest.mark.parametrize("use_subminor", [True, False])
@pytest.mark.parametrize("source_shift", [(0, 0), (-9, 15)])
def test_point_source_generic(settings, use_subminor, source_shift):
    settings.generic.use_sub_minor_optimization = use_subminor
    scale = 2.5
    psf = get_psf()
    residual = get_residual(scale, *source_shift)
    model = np.zeros_like(residual)
    r = rd.Radler(
        settings, psf, residual, model, BEAM_SIZE, rd.Polarization.STOKES_I
    )
    radler_perform(r, settings.minor_iteration_count)
    np.testing.assert_allclose(residual, np.zeros_like(residual), atol=2e-6)
    check_model_point_source(model, scale, *source_shift)


def test_point_source_multiscale(settings):
    """Multiscale parity with the reference's point-source case
    (``cpp/test/test_radler.cc`` multiscale variant).  The absolute threshold
    is 1e-7 instead of the reference's 1e-8 to keep CPU test runtime down;
    the assertion tolerances are the reference's own (2e-6)."""
    settings.algorithm_type = rd.AlgorithmType.MULTISCALE
    settings.absolute_threshold = 1e-7
    settings.minor_iteration_count = 600
    scale = 2.5
    shift = (-9, 15)
    psf = get_psf()
    residual = get_residual(scale, *shift)
    model = np.zeros_like(residual)
    r = rd.Radler(
        settings, psf, residual, model, BEAM_SIZE, rd.Polarization.STOKES_I
    )
    r.perform(0)
    np.testing.assert_allclose(residual, np.zeros_like(residual), atol=2e-6)
    check_model_point_source(model, scale, *shift)


def test_component_list_generic(settings):
    settings.save_source_list = True
    settings.minor_iteration_count = 42
    psf = get_psf()
    residual = np.ones((HEIGHT, WIDTH), dtype=np.float32)
    model = np.zeros_like(residual)
    r = rd.Radler(
        settings, psf, residual, model, BEAM_SIZE, rd.Polarization.STOKES_I
    )
    r.perform(0)
    component_list = r.component_list
    assert component_list.n_scales == 1
    assert component_list.component_count(0) == settings.minor_iteration_count
