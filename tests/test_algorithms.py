"""Algorithm-family tests: IUWT, ASP, Python plugin.

Complements tests/test_radler.py (generic + multiscale parity).  The IUWT
accuracy gate mirrors the intent of the reference's diffuse-source test
(``cpp/test/test_radler.cc:193-226``): a substantial RMS reduction on an
extended source.
"""

import os
import textwrap

import numpy as np
import pytest
import jax.numpy as jnp

import radler_tpu as rd
from radler_tpu.ops.convolution import padded_convolve

PIXEL_SCALE = 1.0 / 60.0 * (np.pi / 180.0)


def make_settings(algorithm, size):
    s = rd.Settings()
    s.algorithm_type = algorithm
    s.trimmed_image_width = size
    s.trimmed_image_height = size
    s.pixel_scale.x = PIXEL_SCALE
    s.pixel_scale.y = PIXEL_SCALE
    return s


def gaussian_psf(size, sigma=2.0):
    yy, xx = np.mgrid[0:size, 0:size]
    r2 = (yy - size // 2) ** 2 + (xx - size // 2) ** 2
    return np.exp(-r2 / (2 * sigma**2)).astype(np.float32)


def test_iuwt_diffuse_source():
    size = 128
    rng = np.random.default_rng(0)
    psf = gaussian_psf(size)
    yy, xx = np.mgrid[0:size, 0:size]
    sky = np.exp(
        -((yy - 60.0) ** 2 + (xx - 70.0) ** 2) / (2 * 4.0**2)
    ).astype(np.float32)
    residual = np.asarray(
        padded_convolve(jnp.asarray(sky), jnp.asarray(psf))
    ).astype(np.float32)
    residual += rng.normal(scale=1e-3, size=residual.shape).astype(np.float32)
    model = np.zeros_like(residual)
    dirty_rms = float(np.sqrt((residual**2).mean()))
    dirty_peak = float(np.abs(residual).max())

    settings = make_settings(rd.AlgorithmType.IUWT, size)
    settings.minor_iteration_count = 50
    r = rd.Radler(settings, psf, residual, model, 0.0)
    r.perform(0)

    final_rms = float(np.sqrt((residual**2).mean()))
    final_peak = float(np.abs(residual).max())
    # Accuracy gates in the spirit of the reference's Vela test
    # (residual RMS <= 0.75 x dirty, peak <= 0.1 x dirty).
    assert final_rms <= 0.25 * dirty_rms
    assert final_peak <= 0.1 * dirty_peak
    # Recovered flux is close to the true sky flux.
    assert abs(model.sum() - sky.sum()) < 0.2 * sky.sum()


def test_iuwt_multichannel_flux_refit():
    """Multi-image IUWT exercises the per-image component flux refit
    (``PerformSubImageFitAll``, ``iuwt_deconvolution_algorithm.cc:628-742``,
    batched on device): per-channel models must track each channel's flux
    scale."""
    size = 128
    rng = np.random.default_rng(1)
    psf = gaussian_psf(size)
    yy, xx = np.mgrid[0:size, 0:size]
    sky = np.exp(
        -((yy - 60.0) ** 2 + (xx - 70.0) ** 2) / (2 * 4.0**2)
    ).astype(np.float32)
    conv = np.asarray(
        padded_convolve(jnp.asarray(sky), jnp.asarray(psf))
    ).astype(np.float32)
    scales = (1.0, 1.6)
    residual = np.stack([conv * s for s in scales])
    residual += rng.normal(scale=1e-3, size=residual.shape).astype(np.float32)
    model = np.zeros_like(residual)
    psfs = np.stack([psf, psf])
    dirty_rms = np.sqrt((residual**2).mean(axis=(1, 2)))

    settings = make_settings(rd.AlgorithmType.IUWT, size)
    settings.minor_iteration_count = 50
    freqs = np.array([[1.0e8, 1.1e8], [1.2e8, 1.3e8]])
    r = rd.Radler(settings, psfs, residual, model, 0.0, frequencies=freqs)
    r.perform(0)

    final_rms = np.sqrt((residual**2).mean(axis=(1, 2)))
    assert (final_rms <= 0.3 * dirty_rms).all()
    # The refit scales each channel's components by its own flux factor.
    flux = model.sum(axis=(1, 2))
    assert flux[1] / flux[0] == pytest.approx(scales[1] / scales[0], rel=0.1)


def test_asp_point_source():
    size = 64
    ps = np.array(
        [[0.0, 0.4, 0.0], [0.25, 1.0, 0.5], [0.0, 0.6, 0.0]], np.float32
    )
    psf = np.zeros((size, size), np.float32)
    psf[31:34, 31:34] = ps
    residual = np.zeros((size, size), np.float32)
    residual[21:24, 26:29] = 2.5 * ps
    model = np.zeros_like(residual)

    settings = make_settings(rd.AlgorithmType.ADAPTIVE_SCALE_PIXEL, size)
    settings.minor_iteration_count = 600
    settings.absolute_threshold = 1e-6
    r = rd.Radler(settings, psf, residual, model, 0.0)
    r.perform(0)
    np.testing.assert_allclose(residual, 0.0, atol=5e-6)
    assert model[22, 27] == pytest.approx(2.5, abs=1e-4)


def test_python_plugin(tmp_path):
    """The plugin contract of ``python_deconvolution.cc:216-323``."""
    plugin = tmp_path / "plugin.py"
    plugin.write_text(
        textwrap.dedent(
            """
            import numpy as np

            def deconvolve(residual, model, psf, meta):
                # Trivial algorithm: move the peak into the model.
                nfreq, npol, h, w = residual.shape
                for f in range(nfreq):
                    for p in range(npol):
                        idx = np.abs(residual[f, p]).argmax()
                        y, x = divmod(idx, w)
                        model[f, p, y, x] += residual[f, p, y, x]
                        residual[f, p, y, x] = 0.0
                meta.iteration_number += 1
                return {
                    "residual": residual,
                    "model": model,
                    "level": float(np.abs(residual).max()),
                    "continue": False,
                }
            """
        )
    )
    size = 32
    psf = np.zeros((size, size), np.float32)
    psf[size // 2, size // 2] = 1.0
    residual = np.zeros((size, size), np.float32)
    residual[10, 12] = 3.0
    model = np.zeros_like(residual)
    settings = make_settings(rd.AlgorithmType.PYTHON, size)
    settings.python.filename = str(plugin)
    settings.minor_iteration_count = 10
    r = rd.Radler(settings, psf, residual, model, 0.0)
    again = r.perform(0)
    assert again is False
    assert model[10, 12] == pytest.approx(3.0)
    assert residual[10, 12] == 0.0
    assert r.iteration_number == 1


def test_plugin_error_paths(tmp_path):
    """Mirrors ``cpp/test/test_python_deconvolution.cc`` error handling."""
    size = 16
    psf = np.zeros((size, size), np.float32)
    psf[8, 8] = 1.0
    img = np.zeros((size, size), np.float32)

    settings = make_settings(rd.AlgorithmType.PYTHON, size)
    settings.python.filename = str(tmp_path / "missing.py")
    with pytest.raises((RuntimeError, OSError)):
        rd.Radler(settings, psf, img.copy(), img.copy(), 0.0)

    bad = tmp_path / "bad.py"
    bad.write_text("def not_deconvolve():\n    pass\n")
    settings.python.filename = str(bad)
    with pytest.raises(RuntimeError):
        rd.Radler(settings, psf, img.copy(), img.copy(), 0.0)

    raises = tmp_path / "raises.py"
    raises.write_text(
        "def deconvolve(residual, model, psf, meta):\n"
        "    raise ValueError('boom')\n"
    )
    settings.python.filename = str(raises)
    settings.minor_iteration_count = 5
    r = rd.Radler(settings, psf, img.copy(), img.copy(), 0.0)
    with pytest.raises(RuntimeError, match="python deconvolution"):
        r.perform(0)

    wrong_return = tmp_path / "wrong.py"
    wrong_return.write_text(
        "def deconvolve(residual, model, psf, meta):\n    return 42\n"
    )
    settings.python.filename = str(wrong_return)
    r = rd.Radler(settings, psf, img.copy(), img.copy(), 0.0)
    with pytest.raises(RuntimeError, match="dictionary"):
        r.perform(0)


def test_ls_deconvolution_linear():
    """Experimental LS solver (``cpp/algorithms/ls_deconvolution.cc``
    equivalent): exact amplitudes at masked positions."""
    from radler_tpu.models.ls_deconvolution import LsDeconvolution
    from radler_tpu.image_set import ImageSet
    from radler_tpu.work_table import (
        LoadAndStoreImageAccessor,
        LoadOnlyImageAccessor,
        WorkTable,
        WorkTableEntry,
    )

    size = 32
    psf = np.zeros((size, size), np.float32)
    psf[size // 2, size // 2] = 1.0
    psf[size // 2, size // 2 + 1] = 0.4
    residual = np.zeros((size, size), np.float32)
    residual[10, 10] = 2.0
    residual[10, 11] = 0.8  # sidelobe of the source at (10, 10)
    model = np.zeros_like(residual)

    table = WorkTable([], 1, 1)
    e = WorkTableEntry()
    e.image_weight = 1.0
    e.psf_accessors = [LoadOnlyImageAccessor(psf)]
    e.residual_accessor = LoadAndStoreImageAccessor(residual)
    e.model_accessor = LoadAndStoreImageAccessor(model)
    table.add_entry(e)
    dirty_set = ImageSet.from_table(table, False, set(), size, size)
    model_set = ImageSet.from_table(table, False, set(), size, size)
    dirty_set.load_and_average(True)
    model_set.load_and_average(False)

    alg = LsDeconvolution(use_linear_solver=True)
    mask = np.zeros((size, size), bool)
    mask[10, 10] = True
    alg.clean_mask = mask
    alg.execute_major_iteration(dirty_set, model_set, jnp.asarray(psf)[None])
    out_model = np.asarray(model_set.data[0])
    out_res = np.asarray(dirty_set.data[0])
    assert out_model[10, 10] == pytest.approx(2.0, abs=1e-4)
    assert abs(out_res[10, 10]) < 1e-5
    assert abs(out_res[10, 11]) < 1e-4


def test_ls_deconvolution_nonlinear():
    """Regularized LM fit (``ls_deconvolution.cc:243-316`` equivalent): on an
    easy case it must agree with the exact linear solve up to the small L1
    shrinkage, and it must require a mask like the reference."""
    from radler_tpu.models.ls_deconvolution import LsDeconvolution
    from radler_tpu.ops.component_optimization import lm_nonlinear_fit
    from radler_tpu.image_set import ImageSet
    from radler_tpu.work_table import (
        LoadAndStoreImageAccessor,
        LoadOnlyImageAccessor,
        WorkTable,
        WorkTableEntry,
    )

    size = 32
    psf = np.zeros((size, size), np.float32)
    psf[size // 2, size // 2] = 1.0
    psf[size // 2, size // 2 + 1] = 0.4
    psf[size // 2 + 1, size // 2] = 0.25
    truth = {(10, 10): 2.0, (20, 14): 1.0}
    residual = np.zeros((size, size), np.float32)
    for (y, x), a in truth.items():
        residual[y, x] += a
        residual[y, x + 1] += 0.4 * a
        residual[y + 1, x] += 0.25 * a
    model = np.zeros_like(residual)

    table = WorkTable([], 1, 1)
    e = WorkTableEntry()
    e.image_weight = 1.0
    e.psf_accessors = [LoadOnlyImageAccessor(psf)]
    e.residual_accessor = LoadAndStoreImageAccessor(residual)
    e.model_accessor = LoadAndStoreImageAccessor(model)
    table.add_entry(e)
    dirty_set = ImageSet.from_table(table, False, set(), size, size)
    model_set = ImageSet.from_table(table, False, set(), size, size)
    dirty_set.load_and_average(True)
    model_set.load_and_average(False)

    mask = np.zeros((size, size), bool)
    for (y, x) in truth:
        mask[y, x] = True

    alg = LsDeconvolution(use_linear_solver=False)
    # The reference's nonLinearFit throws without a mask
    # (ls_deconvolution.cc:245-246).
    with pytest.raises(RuntimeError, match="mask"):
        alg.execute_major_iteration(
            dirty_set, model_set, jnp.asarray(psf)[None]
        )

    alg.clean_mask = mask
    alg.execute_major_iteration(dirty_set, model_set, jnp.asarray(psf)[None])
    out_model = np.asarray(model_set.data[0])
    out_res = np.asarray(dirty_set.data[0])
    # mu=0.1 shrinks slightly (~2% on this field); amplitudes must land
    # near the truth.
    for (y, x), a in truth.items():
        assert out_model[y, x] == pytest.approx(a, rel=0.05)
    assert float(np.abs(out_res).max()) < 0.1

    # Stronger regularization shrinks the total fitted flux (the L1-ish
    # penalty the reference's GD replacement lacked).
    weak, _ = lm_nonlinear_fit(
        mask, jnp.asarray(residual), jnp.asarray(psf), regularization=0.01
    )
    strong, _ = lm_nonlinear_fit(
        mask, jnp.asarray(residual), jnp.asarray(psf), regularization=2.0
    )
    assert float(jnp.sum(jnp.abs(strong))) < float(jnp.sum(jnp.abs(weak)))


def test_profiling_phase_timer():
    from radler_tpu.utils.profiling import PhaseTimer

    timer = PhaseTimer()
    with timer.phase("work"):
        _ = jnp.ones((8, 8)).sum()
    assert "work" in timer.report()
