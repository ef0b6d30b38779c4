"""Joined-polarization / multi-frequency deconvolution end-to-end.

The reference's headline capability (Offringa & Smirnov 2017): peak finding
on the joined sqrt-sum-of-squares over polarizations with per-plane
component values.  Exercises a 4-Stokes x 2-channel cube through the public
WorkTable API, plus local-RMS weighted cleaning.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import radler_tpu as rd
from radler_tpu.work_table import (
    LoadAndStoreImageAccessor,
    LoadOnlyImageAccessor,
    WorkTable,
    WorkTableEntry,
)

SIZE = 64
PIXEL_SCALE = 1.0 / 60.0 * (np.pi / 180.0)
P = rd.Polarization


def delta_psf():
    psf = np.zeros((SIZE, SIZE), np.float32)
    psf[SIZE // 2, SIZE // 2] = 1.0
    return psf


def test_iquv_two_channels():
    pols = [P.STOKES_I, P.STOKES_Q, P.STOKES_U, P.STOKES_V]
    n_chan = 2
    psf = delta_psf()
    # Per-plane fluxes at one source position; Q/U/V weaker and signed.
    flux = {
        (0, P.STOKES_I): 2.0,
        (0, P.STOKES_Q): 0.5,
        (0, P.STOKES_U): -0.3,
        (0, P.STOKES_V): 0.1,
        (1, P.STOKES_I): 1.5,
        (1, P.STOKES_Q): 0.4,
        (1, P.STOKES_U): -0.2,
        (1, P.STOKES_V): 0.05,
    }
    residuals = {}
    models = {}
    table = WorkTable([], n_chan, n_chan)
    for ch in range(n_chan):
        for i, pol in enumerate(pols):
            res = np.zeros((SIZE, SIZE), np.float32)
            res[20, 41] = flux[(ch, pol)]
            mod = np.zeros((SIZE, SIZE), np.float32)
            residuals[(ch, pol)] = res
            models[(ch, pol)] = mod
            e = WorkTableEntry()
            e.polarization = pol
            e.original_channel_index = ch
            e.image_weight = 1.0
            e.band_start_frequency = 1.0e8 + ch * 1e7
            e.band_end_frequency = 1.1e8 + ch * 1e7
            if i == 0:
                e.psf_accessors = [LoadOnlyImageAccessor(psf)]
            e.residual_accessor = LoadAndStoreImageAccessor(res)
            e.model_accessor = LoadAndStoreImageAccessor(mod)
            table.add_entry(e)

    s = rd.Settings()
    s.trimmed_image_width = SIZE
    s.trimmed_image_height = SIZE
    s.pixel_scale.x = PIXEL_SCALE
    s.pixel_scale.y = PIXEL_SCALE
    s.minor_iteration_count = 200
    s.absolute_threshold = 1e-6
    r = rd.Radler(s, table, beam_size=0.0)
    r.perform(0)

    for key, value in flux.items():
        np.testing.assert_allclose(
            models[key][20, 41], value, atol=1e-4
        )
        np.testing.assert_allclose(residuals[key], 0.0, atol=1e-5)


def test_linked_polarization_subset():
    """Only linked polarizations drive the peak search; unlinked planes are
    still updated with their own values (settings.h:160-166)."""
    pols = [P.XX, P.YY]
    psf = delta_psf()
    res_xx = np.zeros((SIZE, SIZE), np.float32)
    res_yy = np.zeros((SIZE, SIZE), np.float32)
    res_xx[10, 12] = 1.0
    res_yy[10, 12] = 0.5
    # A strong YY-only artifact that must NOT drive cleaning when only XX is
    # linked.
    res_yy[40, 40] = 3.0
    mod_xx = np.zeros_like(res_xx)
    mod_yy = np.zeros_like(res_yy)

    table = WorkTable([], 1, 1)
    for i, (pol, res, mod) in enumerate(
        [(P.XX, res_xx, mod_xx), (P.YY, res_yy, mod_yy)]
    ):
        e = WorkTableEntry()
        e.polarization = pol
        e.image_weight = 1.0
        if i == 0:
            e.psf_accessors = [LoadOnlyImageAccessor(psf)]
        e.residual_accessor = LoadAndStoreImageAccessor(res)
        e.model_accessor = LoadAndStoreImageAccessor(mod)
        table.add_entry(e)

    s = rd.Settings()
    s.trimmed_image_width = SIZE
    s.trimmed_image_height = SIZE
    s.pixel_scale.x = PIXEL_SCALE
    s.pixel_scale.y = PIXEL_SCALE
    s.minor_iteration_count = 100
    s.absolute_threshold = 1e-6
    s.linked_polarizations = {P.XX}
    r = rd.Radler(s, table, beam_size=0.0)
    r.perform(0)

    # The XX source position was cleaned in both planes...
    assert mod_xx[10, 12] == pytest.approx(1.0, abs=1e-4)
    assert mod_yy[10, 12] == pytest.approx(0.5, abs=1e-4)
    # ...but the YY-only artifact was never selected.
    assert mod_yy[40, 40] == 0.0
    assert res_yy[40, 40] == pytest.approx(3.0)


def test_local_rms_weighting():
    """Local-RMS weighted peak finding (settings.h:376-398 + rms_image.py):
    a source sitting in a high-noise region must not dominate peak selection
    over an equally bright source in a quiet region."""
    rng = np.random.default_rng(5)
    size = 128
    psf = np.zeros((size, size), np.float32)
    psf[size // 2, size // 2] = 1.0
    residual = np.zeros((size, size), np.float32)
    residual[:, : size // 2] += rng.normal(
        scale=0.2, size=(size, size // 2)
    ).astype(np.float32)
    residual[30, 20] += 1.0  # noisy half
    residual[30, 100] += 1.0  # quiet half
    model = np.zeros_like(residual)

    s = rd.Settings()
    s.trimmed_image_width = size
    s.trimmed_image_height = size
    s.pixel_scale.x = PIXEL_SCALE
    s.pixel_scale.y = PIXEL_SCALE
    s.minor_iteration_count = 1
    s.local_rms.method = rd.LocalRmsMethod.RMS_WINDOW
    s.local_rms.window = 25.0
    r = rd.Radler(s, psf, residual, model, beam_size=PIXEL_SCALE * 3)
    r.perform(0)
    # With only one iteration allowed, the quiet-region source (higher
    # RMS-weighted value) is the one cleaned.
    assert model[30, 100] != 0.0
    assert model[30, 20] == 0.0


def test_zero_weight_channel_does_not_poison_clean():
    """Regression: a weight-0 channel (whose plane the reference fills with
    non-finite garbage and then skips everywhere) must not NaN-poison the
    joined peak search (image_set.cc:423-462 skip-if-zero semantics)."""
    C = 2
    psf = np.zeros((C, SIZE, SIZE), np.float32)
    psf[:, SIZE // 2, SIZE // 2] = 1.0
    residual = np.zeros((C, SIZE, SIZE), np.float32)
    residual[:, 12, 17] = 2.0
    model = np.zeros_like(residual)
    s = rd.Settings()
    s.trimmed_image_width = SIZE
    s.trimmed_image_height = SIZE
    s.pixel_scale.x = PIXEL_SCALE
    s.pixel_scale.y = PIXEL_SCALE
    s.minor_iteration_count = 100
    s.absolute_threshold = 1e-6
    r = rd.Radler(
        s,
        psf,
        residual,
        model,
        0.0,
        rd.Polarization.STOKES_I,
        frequencies=np.array([[1.0e8, 1.1e8], [1.2e8, 1.3e8]]),
        weights=np.array([1.0, 0.0]),
    )
    r.perform(0)
    # Channel 0 cleaned normally.
    assert model[0, 12, 17] == pytest.approx(2.0, abs=1e-4)
    assert abs(residual[0, 12, 17]) < 1e-4
    assert np.isfinite(model).all()
