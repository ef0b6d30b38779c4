"""Fused on-device multiscale loop vs the host-orchestrated path.

The fused minor loop (``models/multiscale_fused.py``) must reproduce the
host-orchestrated multiscale path (dense subminor vs sparse candidate set,
unified vs per-scale padded FFT sizes) to floating-point tolerance — the
parity contract of the reference tests (``cpp/test/test_radler.cc:128-135``
uses absolute tolerances, not bitwise equality).
"""

import os

import numpy as np
import pytest

import radler_tpu as rd


def _diffuse_problem(size, n_channels, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    r2 = (yy - size // 2) ** 2 + (xx - size // 2) ** 2
    psfs = []
    for c in range(n_channels):
        w = 2.5 * (1.0 + 0.04 * c)
        p = np.exp(-r2 / (2 * w * w))
        p += 0.06 * np.exp(-((np.sqrt(r2) - 14 * (1 + 0.03 * c)) ** 2) / 6)
        psfs.append(p.astype(np.float32))
    psfs = np.stack(psfs)
    sky = np.zeros((size, size), np.float32)
    for _ in range(12):
        cy, cx = rng.integers(size // 8, 7 * size // 8, 2)
        s = rng.uniform(1.5, 12)
        a = rng.uniform(0.2, 1.0)
        m = max(1, int(4 * s))
        y0, y1 = max(0, cy - m), min(size, cy + m)
        x0, x1 = max(0, cx - m), min(size, cx + m)
        sky[y0:y1, x0:x1] += a * np.exp(
            -((yy[y0:y1, x0:x1] - cy) ** 2 + (xx[y0:y1, x0:x1] - cx) ** 2)
            / (2 * s * s)
        )
    residual = np.empty((n_channels, size, size), np.float32)
    for c in range(n_channels):
        fp = np.fft.rfft2(np.fft.ifftshift(psfs[c]))
        residual[c] = np.fft.irfft2(
            np.fft.rfft2(sky * (1 + 0.1 * c)) * fp, s=(size, size)
        ).astype(np.float32)
    return psfs, residual


def _run(
    fused: bool,
    size=128,
    nch=2,
    iters=120,
    with_fit=True,
    automask=False,
    n_majors=1,
):
    os.environ.pop("RADLER_TPU_NO_FUSED_MS", None)
    if not fused:
        os.environ["RADLER_TPU_NO_FUSED_MS"] = "1"
    try:
        psfs, residual = _diffuse_problem(size, nch)
        s = rd.Settings()
        s.trimmed_image_width = size
        s.trimmed_image_height = size
        s.algorithm_type = rd.AlgorithmType.MULTISCALE
        s.minor_iteration_count = iters
        s.minor_loop_gain = 0.1
        s.major_loop_gain = 0.85
        if automask:
            s.auto_mask_sigma = 4.0
        freqs = None
        if with_fit:
            s.spectral_fitting.mode = rd.SpectralFittingMode.POLYNOMIAL
            s.spectral_fitting.terms = 2
            freqs = np.array(
                [[1.0e8 + c * 1e7, 1.1e8 + c * 1e7] for c in range(nch)]
            )
        model = np.zeros_like(residual)
        resid = residual.copy()
        r = rd.Radler(s, psfs, resid, model, 0.0, frequencies=freqs)
        more = True
        for major in range(n_majors):
            more = r.perform(major)
            if not more:
                break
        alg = r._parallel.algorithms[0]
        ncomp = [e.n_components_cleaned for e in alg.scale_infos]
        masks = [
            None if m is None else np.asarray(m)
            for m in alg.scale_masks
        ]
        return resid, model, r.iteration_number, more, ncomp, masks
    finally:
        os.environ.pop("RADLER_TPU_NO_FUSED_MS", None)


def test_fused_matches_host_path():
    res_h, mod_h, it_h, more_h, nc_h, _ = _run(False)
    res_f, mod_f, it_f, more_f, nc_f, _ = _run(True)
    assert it_f == it_h
    assert more_f == more_h
    assert nc_f == nc_h
    scale = max(1.0, float(np.abs(res_h).max()))
    assert np.abs(res_f - res_h).max() / scale < 1e-4
    assert np.abs(mod_f - mod_h).max() / scale < 1e-4


def test_fused_single_channel_converges():
    res_f, mod_f, it_f, _, _, _ = _run(True, nch=1, with_fit=False, iters=400)
    psfs, residual = _diffuse_problem(128, 1)
    assert float(np.sqrt(np.mean(res_f**2))) < 0.5 * float(
        np.sqrt(np.mean(residual**2))
    )
    assert it_f > 10


def test_fused_matches_host_path_with_automask():
    """The flagship configuration (multiscale + auto-mask, the Vela case,
    ``cpp/test/test_radler.cc:193-226``) must take the fused path and
    reproduce the host path across BOTH auto-mask phases: phase 1 tracks
    per-scale masks on device, phase 2 cleans restricted to them."""
    kw = dict(nch=1, with_fit=False, iters=150, automask=True, n_majors=3)
    res_h, mod_h, it_h, more_h, nc_h, masks_h = _run(False, **kw)
    res_f, mod_f, it_f, more_f, nc_f, masks_f = _run(True, **kw)
    assert it_f == it_h
    assert more_f == more_h
    assert nc_f == nc_h
    scale = max(1.0, float(np.abs(res_h).max()))
    assert np.abs(res_f - res_h).max() / scale < 1e-4
    assert np.abs(mod_f - mod_h).max() / scale < 1e-4
    # The tracked per-scale auto-masks agree exactly.
    assert len(masks_f) == len(masks_h)
    for mf, mh in zip(masks_f, masks_h):
        assert (mf is None) == (mh is None)
        if mf is not None:
            np.testing.assert_array_equal(mf, mh)


def test_fused_eligible_with_tracking():
    """Auto-mask / component tracking no longer gates the fused path off:
    the accumulators are carried through the on-device loop."""
    size = 128
    psfs, residual = _diffuse_problem(size, 1)
    s = rd.Settings()
    s.trimmed_image_width = size
    s.trimmed_image_height = size
    s.algorithm_type = rd.AlgorithmType.MULTISCALE
    s.minor_iteration_count = 150
    s.minor_loop_gain = 0.1
    s.major_loop_gain = 0.85
    s.auto_mask_sigma = 4.0
    model = np.zeros_like(residual[0])
    resid = residual[0].copy()
    r = rd.Radler(s, psfs[0], resid, model, 0.0)
    r.perform(0)
    alg = r._parallel.algorithms[0]
    assert alg.track_per_scale_masks
    assert r.iteration_number > 0
    # Phase 1 built non-empty tracked masks on device.
    assert any(
        m is not None and np.asarray(m).any() for m in alg.scale_masks
    )
