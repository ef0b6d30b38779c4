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


def _run_automask(batched, monkeypatch):
    """Auto-mask + source-list faceted run (the production configuration
    that previously forced the serial loop)."""
    if batched:
        monkeypatch.delenv("RADLER_TPU_NO_BATCHED_FACETS", raising=False)
    else:
        monkeypatch.setenv("RADLER_TPU_NO_BATCHED_FACETS", "1")
    size = 128
    pixel_scale = 1.0 / 60.0 * (np.pi / 180.0)
    psf = _gaussian_psf(size)
    residual = _sky_residual(size, psf)
    model = np.zeros_like(residual)
    s = rd.Settings()
    s.trimmed_image_width = size
    s.trimmed_image_height = size
    s.pixel_scale.x = pixel_scale
    s.pixel_scale.y = pixel_scale
    s.algorithm_type = rd.AlgorithmType.MULTISCALE
    s.minor_iteration_count = 600
    s.multiscale.max_scales = 3
    s.parallel.grid_width = 2
    s.parallel.grid_height = 2
    s.auto_mask_sigma = 4.0
    s.save_source_list = True
    r = rd.Radler(s, psf, residual, model, 0.0)
    again = True
    major = 0
    while again and major < 4:
        again = r.perform(major)
        major += 1
    comp_list = r.get_component_list()
    counts = [
        comp_list.component_count(sc) for sc in range(comp_list.n_scales)
    ]
    scale_masks = [m.copy() for m in r._parallel._scale_masks]
    return residual, model, r.iteration_number, counts, scale_masks


def test_batched_facets_with_automask_and_source_list(monkeypatch):
    """Per-scale auto-masks and component lists ride the batched path
    (previously excluded by _can_batch_facets).

    Exact pixel parity is not achievable here: the serial loop runs each
    facet at its true box size while the batched program pads facets to a
    common box, so convolution FFT sizes differ and near-tied argmax picks
    can land a pixel apart.  The contract is behavioral equivalence: same
    iteration counts, same per-scale mask population and component counts,
    same cleaning depth, near-total mask overlap."""
    res_s, mdl_s, it_s, nc_s, masks_s = _run_automask(False, monkeypatch)
    res_b, mdl_b, it_b, nc_b, masks_b = _run_automask(True, monkeypatch)
    assert mdl_s.max() > 0
    assert it_b == it_s
    assert nc_b == nc_s
    # Cleaning depth and recovered flux agree.
    rms_s = float(np.sqrt(np.mean(res_s**2)))
    rms_b = float(np.sqrt(np.mean(res_b**2)))
    assert rms_b == pytest.approx(rms_s, rel=0.05)
    assert float(mdl_b.sum()) == pytest.approx(float(mdl_s.sum()), rel=0.02)
    # Per-scale masks: identical population, >95% positional overlap.
    assert len(masks_b) == len(masks_s)
    for mb, ms_ in zip(masks_b, masks_s):
        assert mb.sum() == ms_.sum()
        if ms_.sum():
            overlap = np.logical_and(mb, ms_).sum() / ms_.sum()
            assert overlap > 0.95


def _run_dd_psfs(batched, monkeypatch):
    """2x2 facets with per-facet direction-dependent PSFs of different
    widths (per-facet bias/gain banks in the batched path)."""
    from radler_tpu.work_table import (
        LoadAndStoreImageAccessor,
        LoadOnlyImageAccessor,
        PsfOffset,
        WorkTable,
        WorkTableEntry,
    )

    if batched:
        monkeypatch.delenv("RADLER_TPU_NO_BATCHED_FACETS", raising=False)
    else:
        monkeypatch.setenv("RADLER_TPU_NO_BATCHED_FACETS", "1")
    size = 128
    psf_narrow = _gaussian_psf(size, sigma=1.8)
    psf_wide = _gaussian_psf(size, sigma=2.6)
    residual = _sky_residual(size, psf_narrow)
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

    offsets = []
    accessors = []
    for gy in range(2):
        for gx in range(2):
            offsets.append(PsfOffset(gx * 64 + 32, gy * 64 + 32))
            accessors.append(
                LoadOnlyImageAccessor(
                    psf_wide if (gx + gy) % 2 else psf_narrow
                )
            )
    table = WorkTable(offsets, 1, 1)
    entry = WorkTableEntry()
    entry.polarization = rd.Polarization.STOKES_I
    entry.image_weight = 1.0
    entry.psf_accessors = accessors
    entry.residual_accessor = LoadAndStoreImageAccessor(residual)
    entry.model_accessor = LoadAndStoreImageAccessor(model)
    table.add_entry(entry)
    r = rd.Radler(s, table, beam_size=0.0)
    r.perform(0)
    return residual, model, r.iteration_number


def test_batched_facets_with_dd_psfs(monkeypatch):
    """Direction-dependent PSFs ride the batched path via per-unique-PSF
    banks.  The Dijkstra split gives unequal facet boxes, so the serial
    loop (true box size) and the batched program (common padded box) use
    different convolution FFT sizes — near-tied picks can shift a pixel.
    The contract is behavioral equivalence: same iteration count, same
    cleaning depth and recovered flux."""
    res_s, mdl_s, it_s = _run_dd_psfs(False, monkeypatch)
    res_b, mdl_b, it_b = _run_dd_psfs(True, monkeypatch)
    assert mdl_s.max() > 0
    assert it_b == it_s
    rms_s = float(np.sqrt(np.mean(res_s**2)))
    rms_b = float(np.sqrt(np.mean(res_b**2)))
    assert rms_b == pytest.approx(rms_s, rel=0.05)
    assert float(mdl_b.sum()) == pytest.approx(float(mdl_s.sum()), rel=0.05)
    # Models agree where components did not shift; total mismatch energy is
    # a small fraction of the recovered flux.
    assert float(np.abs(mdl_b - mdl_s).sum()) < 0.12 * float(
        np.abs(mdl_s).sum()
    )


def _run_generic(batched, monkeypatch):
    """Generic-clean faceted run (the reference runs all sub-images
    concurrently regardless of algorithm)."""
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
    s.algorithm_type = rd.AlgorithmType.GENERIC_CLEAN
    s.minor_iteration_count = 2000
    s.absolute_threshold = 5e-3
    s.major_loop_gain = 0.8
    s.parallel.grid_width = 2
    s.parallel.grid_height = 2
    r = rd.Radler(s, psf, residual, model, 0.0)
    more = r.perform(0)
    return residual, model, more


def test_batched_generic_clean_facets(monkeypatch):
    """The batched facet program also covers GENERIC_CLEAN; the dense
    Högbom program per facet is semantically identical to the serial
    per-facet run (same shifted-PSF subtraction, same thresholds), so the
    numerics must agree to fp tolerance."""
    res_s, mdl_s, more_s = _run_generic(False, monkeypatch)
    res_b, mdl_b, more_b = _run_generic(True, monkeypatch)
    assert mdl_s.max() > 0
    assert more_b == more_s
    np.testing.assert_allclose(res_b, res_s, atol=5e-5)
    np.testing.assert_allclose(mdl_b, mdl_s, atol=5e-5)


def test_batched_generic_engages(monkeypatch):
    from radler_tpu.models.generic_clean import GenericClean

    calls = []
    orig = GenericClean.execute_batched_facets

    def spy(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    monkeypatch.setattr(GenericClean, "execute_batched_facets", spy)
    _run_generic(True, monkeypatch)
    assert len(calls) == 2  # peak-only pass + clean pass


def _run_forced(batched, monkeypatch, tmp_path, algorithm):
    """Faceted run with FORCED_TERMS spectral fitting: the per-facet slices
    of the global term images must ride the batched program (round-4 lift
    of the forced-spectrum exclusion; the serial path slices per clone,
    ``parallel_deconvolution.cc:359-390`` semantics)."""
    from radler_tpu.utils.fits import write_fits_image

    if batched:
        monkeypatch.delenv("RADLER_TPU_NO_BATCHED_FACETS", raising=False)
    else:
        monkeypatch.setenv("RADLER_TPU_NO_BATCHED_FACETS", "1")
    size, C = 128, 3
    psf1 = _gaussian_psf(size)
    psf = np.stack([psf1] * C)
    freqs = np.array([[1.0e8, 1.1e8], [1.2e8, 1.3e8], [1.4e8, 1.5e8]])
    centers = freqs.mean(axis=1)
    ref = centers.mean()
    # Spatially-varying spectral index: proves facet-LOCAL addressing of
    # the term images (a constant alpha would hide coordinate bugs).
    yy, xx = np.mgrid[0:size, 0:size]
    alpha = (-1.0 + 1.2 * (xx / size) + 0.5 * (yy / size)).astype(np.float32)
    rng = np.random.default_rng(4)
    residual = np.zeros((C, size, size), np.float32)
    ys = rng.integers(12, size - 12, 8)
    xs = rng.integers(12, size - 12, 8)
    amps = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    for c in range(C):
        cube = np.zeros((size, size), np.float32)
        np.add.at(
            cube,
            (ys, xs),
            amps * (centers[c] / ref) ** alpha[ys, xs],
        )
        residual[c] = np.real(
            np.fft.ifft2(
                np.fft.fft2(cube) * np.fft.fft2(np.fft.ifftshift(psf1))
            )
        ).astype(np.float32)
    model = np.zeros_like(residual)

    terms_path = str(tmp_path / f"forced_{algorithm}_{batched}.fits")
    write_fits_image(terms_path, alpha[None])
    s = rd.Settings()
    s.trimmed_image_width = size
    s.trimmed_image_height = size
    s.algorithm_type = (
        rd.AlgorithmType.MULTISCALE
        if algorithm == "multiscale"
        else rd.AlgorithmType.GENERIC_CLEAN
    )
    s.generic.use_sub_minor_optimization = False
    s.minor_iteration_count = 200
    s.absolute_threshold = 5e-3
    s.major_loop_gain = 0.8
    s.multiscale.max_scales = 3
    s.parallel.grid_width = 2
    s.parallel.grid_height = 2
    s.spectral_fitting.mode = rd.SpectralFittingMode.FORCED_TERMS
    s.spectral_fitting.terms = 2
    s.spectral_fitting.forced_filename = terms_path
    r = rd.Radler(
        s, psf, residual, model, 0.0, frequencies=freqs,
        weights=np.ones(C),
    )
    r.perform(0)
    return residual, model


@pytest.mark.parametrize("algorithm", ["generic", "multiscale"])
def test_batched_facets_forced_terms(monkeypatch, tmp_path, algorithm):
    res_s, mdl_s = _run_forced(False, monkeypatch, tmp_path, algorithm)
    from radler_tpu.models.generic_clean import GenericClean
    from radler_tpu.models.multiscale import MultiScaleAlgorithm

    cls = MultiScaleAlgorithm if algorithm == "multiscale" else GenericClean
    calls = []
    orig = cls.execute_batched_facets

    def spy(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    monkeypatch.setattr(cls, "execute_batched_facets", spy)
    res_b, mdl_b = _run_forced(True, monkeypatch, tmp_path, algorithm)
    assert calls, "forced-terms faceted run fell back to the serial loop"
    assert np.abs(mdl_s).max() > 0
    np.testing.assert_allclose(res_b, res_s, atol=3e-5)
    np.testing.assert_allclose(mdl_b, mdl_s, atol=3e-5)
    # The cleaned spectra follow the forced power law at component pixels.
    cpix = np.argwhere(np.abs(mdl_s[0]) > 0.1)
    assert len(cpix) > 0
