"""Mesh-sharded fused multiscale through the public API.

The fused multiscale minor loop (``multiscale_fused.py``) must be a
numerical drop-in when partitioned over the 8-virtual-device
("chan", "tile") mesh — the reference's per-scale thread parallelism
(``threaded_deconvolution_tools.cc:30-50``) and its facet exchanges
(``parallel_deconvolution.cc:582-617``) become XLA collectives.
"""

import numpy as np
import jax
import pytest

import radler_tpu as rd


def _gaussian_psf(size, sigma=2.0):
    yy, xx = np.mgrid[0:size, 0:size]
    r2 = (yy - size // 2) ** 2.0 + (xx - size // 2) ** 2.0
    psf = np.exp(-r2 / (2 * sigma**2)).astype(np.float32)
    return psf / psf.max()


def _diffuse_residual(size, psf, seed=4):
    rng = np.random.default_rng(seed)
    sky = np.zeros((size, size), np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    blob = np.exp(
        -((yy - size // 3) ** 2 + (xx - size // 2) ** 2) / (2 * 6.0**2)
    )
    sky += 2.0 * blob.astype(np.float32)
    ys = rng.integers(10, size - 10, 6)
    xs = rng.integers(10, size - 10, 6)
    np.add.at(sky, (ys, xs), rng.uniform(0.5, 1.5, 6).astype(np.float32))
    conv = np.real(
        np.fft.ifft2(np.fft.fft2(sky) * np.fft.fft2(np.fft.ifftshift(psf)))
    ).astype(np.float32)
    return conv


def _run(use_mesh, size=128, n_chan=2):
    psf1 = _gaussian_psf(size)
    psf = np.stack([psf1] * n_chan)
    base = _diffuse_residual(size, psf1)
    residual = np.stack([base * (1.0 - 0.1 * c) for c in range(n_chan)])
    model = np.zeros_like(residual)

    s = rd.Settings()
    s.trimmed_image_width = size
    s.trimmed_image_height = size
    s.algorithm_type = rd.AlgorithmType.MULTISCALE
    s.minor_iteration_count = 200
    s.absolute_threshold = 1e-3
    s.major_loop_gain = 0.8
    s.multiscale.max_scales = 3
    s.parallel.use_device_mesh = use_mesh
    freqs = np.array([[1.0e8 + c * 1e7, 1.1e8 + c * 1e7] for c in range(n_chan)])
    r = rd.Radler(s, psf, residual, model, 0.0, frequencies=freqs)
    r.perform(0)
    return residual, model, r.iteration_number


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_multiscale_matches_single_device(monkeypatch):
    from radler_tpu.parallel import mesh as mesh_mod

    calls = []
    orig = mesh_mod.shard_multiscale_inputs

    def spy(*args, **kwargs):
        calls.append(args[0])
        return orig(*args, **kwargs)

    monkeypatch.setattr(mesh_mod, "shard_multiscale_inputs", spy)
    res_1, mdl_1, it_1 = _run(False)
    assert not calls  # single-device run must not shard
    res_m, mdl_m, it_m = _run(True)
    assert calls and calls[0].size >= 8  # the fused mesh path actually ran
    assert it_1 > 0
    assert it_m == it_1
    np.testing.assert_allclose(res_m, res_1, atol=2e-5)
    np.testing.assert_allclose(mdl_m, mdl_1, atol=2e-5)
    # And the run must actually have cleaned.
    base = np.abs(_diffuse_residual(128, _gaussian_psf(128))).max()
    assert np.abs(res_1).max() < 0.5 * base


def _run_automask(use_mesh, size=128):
    psf = _gaussian_psf(size)
    residual = _diffuse_residual(size, psf).copy()
    model = np.zeros_like(residual)
    s = rd.Settings()
    s.trimmed_image_width = size
    s.trimmed_image_height = size
    s.algorithm_type = rd.AlgorithmType.MULTISCALE
    s.minor_iteration_count = 200
    s.minor_loop_gain = 0.2
    s.auto_mask_sigma = 4.0
    s.multiscale.max_scales = 3
    s.parallel.use_device_mesh = use_mesh
    r = rd.Radler(s, psf, residual, model, 0.0)
    again = True
    major = 0
    while again and major < 3:
        again = r.perform(major)
        major += 1
    alg = r._parallel.algorithms[0]
    masks = [None if m is None else np.asarray(m) for m in alg.scale_masks]
    return residual, model, r.iteration_number, masks


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_multiscale_with_automask():
    """The fused loop's on-device mask accumulators work under the mesh:
    both auto-mask phases run partitioned, and the tracked per-scale masks
    match the single-device run exactly."""
    res_1, mdl_1, it_1, masks_1 = _run_automask(False)
    res_m, mdl_m, it_m, masks_m = _run_automask(True)
    assert it_1 > 0
    assert it_m == it_1
    np.testing.assert_allclose(res_m, res_1, atol=2e-5)
    np.testing.assert_allclose(mdl_m, mdl_1, atol=2e-5)
    assert len(masks_m) == len(masks_1)
    for mm, m1 in zip(masks_m, masks_1):
        assert (mm is None) == (m1 is None)
        if mm is not None:
            np.testing.assert_array_equal(mm, m1)
