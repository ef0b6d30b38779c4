"""Mesh-sharded generic clean through the public API.

Runs the reference's cross-PSF point-source case (``cpp/test/test_radler.cc``)
with ``settings.parallel.use_device_mesh`` over the 8 virtual CPU devices and
asserts the same tolerances as the single-device path: the sharded minor loop
must be numerically a drop-in.
"""

import numpy as np
import jax
import pytest

import radler_tpu as rd


def _cross_psf(size):
    psf = np.zeros((size, size), np.float32)
    c = size // 2
    psf[c, c] = 1.0
    psf[c - 1, c] = 0.4
    psf[c + 1, c] = 0.6
    psf[c, c - 1] = 0.25
    psf[c, c + 1] = 0.5
    return psf


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_point_source_parity():
    size = 64
    psf = _cross_psf(size)
    residual = np.zeros((size, size), np.float32)
    sy, sx = 21, 37
    scale = 2.5
    for dy, dx, v in [(0, 0, 1.0), (-1, 0, 0.4), (1, 0, 0.6), (0, -1, 0.25), (0, 1, 0.5)]:
        residual[sy + dy, sx + dx] = scale * v
    model = np.zeros_like(residual)

    s = rd.Settings()
    s.trimmed_image_width = size
    s.trimmed_image_height = size
    s.minor_iteration_count = 1000
    s.absolute_threshold = 1e-8
    s.generic.use_sub_minor_optimization = False
    s.parallel.use_device_mesh = True

    r = rd.Radler(s, psf, residual, model, 0.0)
    more = r.perform(0)
    assert not more
    assert np.abs(residual).max() < 2e-6
    assert abs(model[sy, sx] - scale) < 1e-4 * scale
    model[sy, sx] = 0.0
    assert np.abs(model).max() < 4e-6


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_multichannel_matches_single_device():
    size = 64
    C = 2
    rng = np.random.default_rng(11)
    psf = np.stack([_cross_psf(size)] * C)
    residual = np.zeros((C, size, size), np.float32)
    for c in range(C):
        residual[c, 20, 30] = 1.0 + 0.2 * c
        residual[c, 40, 45] = 0.7
    residual += np.float32(1e-4) * rng.standard_normal(residual.shape).astype(
        np.float32
    )
    freqs = np.array([[1.0e8, 1.1e8], [1.2e8, 1.3e8]])

    def run(use_mesh):
        s = rd.Settings()
        s.trimmed_image_width = size
        s.trimmed_image_height = size
        s.minor_iteration_count = 100
        s.absolute_threshold = 1e-3
        s.generic.use_sub_minor_optimization = False
        s.parallel.use_device_mesh = use_mesh
        res = residual.copy()
        mdl = np.zeros_like(res)
        r = rd.Radler(s, psf, res, mdl, 0.0, frequencies=freqs)
        r.perform(0)
        return res, mdl, r.iteration_number

    res1, mdl1, it1 = run(False)
    res8, mdl8, it8 = run(True)
    assert it1 == it8
    np.testing.assert_allclose(res8, res1, atol=2e-6)
    np.testing.assert_allclose(mdl8, mdl1, atol=2e-6)


def test_make_mesh_channel_major():
    """Channel-major factor selection: the chan axis takes the largest
    device factor dividing the channel count (FFTs stay device-local)."""
    from radler_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    if n < 8:
        pytest.skip("needs 8 virtual devices")
    assert dict(make_mesh(8, n_channels=64).shape) == {"chan": 8, "tile": 1}
    assert dict(make_mesh(8, n_channels=2).shape) == {"chan": 2, "tile": 4}
    assert dict(make_mesh(8, n_channels=3).shape) == {"chan": 1, "tile": 8}
    assert dict(make_mesh(8, n_channels=4).shape) == {"chan": 4, "tile": 2}
    assert dict(make_mesh(8).shape) == {"chan": 4, "tile": 2}
    assert dict(make_mesh(1, n_channels=64).shape) == {"chan": 1, "tile": 1}


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_pure_channel_sharding_matches_single_device():
    """C=8 on 8 devices -> chan=8, tile=1 (pure channel sharding): the
    sharded loop must stay a numeric drop-in."""
    size = 64
    C = 8
    rng = np.random.default_rng(12)
    psf = np.stack([_cross_psf(size)] * C)
    residual = np.zeros((C, size, size), np.float32)
    for c in range(C):
        residual[c, 20, 30] = 1.0 + 0.1 * c
        residual[c, 40, 45] = 0.7
    residual += np.float32(1e-4) * rng.standard_normal(residual.shape).astype(
        np.float32
    )
    freqs = np.array([[1.0e8 + c * 1e7, 1.1e8 + c * 1e7] for c in range(C)])

    def run(use_mesh):
        s = rd.Settings()
        s.trimmed_image_width = size
        s.trimmed_image_height = size
        s.minor_iteration_count = 100
        s.absolute_threshold = 1e-3
        s.generic.use_sub_minor_optimization = False
        s.parallel.use_device_mesh = use_mesh
        res = residual.copy()
        mdl = np.zeros_like(res)
        r = rd.Radler(s, psf, res, mdl, 0.0, frequencies=freqs)
        r.perform(0)
        return res, mdl, r.iteration_number

    res1, mdl1, it1 = run(False)
    res8, mdl8, it8 = run(True)
    assert it1 == it8
    np.testing.assert_allclose(res8, res1, atol=2e-6)
    np.testing.assert_allclose(mdl8, mdl1, atol=2e-6)
