"""Facet x mesh composition: the batched facet program's F axis sharded
over the device mesh.

The facet axis is embarrassingly parallel (the reference farms sub-images to
threads, ``parallel_deconvolution.cc:606-617``); on the mesh each device runs
its own facets' lockstep while-loops, with only the shared stop predicate
crossing devices.  Runs on the 8-virtual-device CPU platform (conftest)."""

import os

import numpy as np
import pytest

import radler_tpu as rd
from tests.test_batched_facets import _gaussian_psf, _sky_residual


def _run(use_mesh, monkeypatch, algorithm):
    monkeypatch.delenv("RADLER_TPU_NO_BATCHED_FACETS", raising=False)
    size = 128
    psf = _gaussian_psf(size)
    residual = _sky_residual(size, psf)
    model = np.zeros_like(residual)
    s = rd.Settings()
    s.trimmed_image_width = size
    s.trimmed_image_height = size
    s.algorithm_type = algorithm
    s.minor_iteration_count = 300
    s.absolute_threshold = 5e-3
    s.major_loop_gain = 0.8
    s.multiscale.max_scales = 3
    s.parallel.grid_width = 2
    s.parallel.grid_height = 2
    s.parallel.use_device_mesh = use_mesh
    r = rd.Radler(s, psf, residual, model, 0.0)
    more = r.perform(0)
    return residual, model, more, r.iteration_number


@pytest.mark.parametrize(
    "algorithm",
    [rd.AlgorithmType.MULTISCALE, rd.AlgorithmType.GENERIC_CLEAN],
)
def test_facets_sharded_over_mesh_match_single_device(monkeypatch, algorithm):
    res_1, mdl_1, more_1, it_1 = _run(False, monkeypatch, algorithm)
    res_m, mdl_m, more_m, it_m = _run(True, monkeypatch, algorithm)
    assert mdl_1.max() > 0
    assert more_m == more_1
    assert it_m == it_1
    np.testing.assert_allclose(res_m, res_1, atol=2e-5)
    np.testing.assert_allclose(mdl_m, mdl_1, atol=2e-5)


def test_facet_inputs_actually_sharded(monkeypatch):
    """The F axis really lands on the mesh (not silently replicated)."""
    import jax
    from radler_tpu.parallel.mesh import make_mesh, shard_facet_inputs

    mesh = make_mesh(8, n_channels=2)
    F = 8
    arrs = [
        jax.numpy.zeros((F, 2, 16, 16)),
        jax.numpy.zeros((4, 16, 16)),  # shared bank
        jax.numpy.float32(0.5),
    ]
    out = shard_facet_inputs(mesh, arrs, (0, None, None))
    spec = out[0].sharding.spec
    assert spec[0] is not None  # facet axis is sharded
    assert out[1].sharding.is_fully_replicated
