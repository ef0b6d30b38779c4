"""Faceted multiscale: per-scale auto-mask aggregation + component lists.

Exercises the multiscale-specific facet plumbing of
``parallel_deconvolution.cc:359-390`` (scale-mask load), ``:425-463``
(boundary-masked scale-mask union) and ``:465-479`` (component-list
aggregation) through a 2x2 grid run with auto-masking enabled.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import radler_tpu as rd
from radler_tpu.ops.convolution import padded_convolve

SIZE = 128
PIXEL_SCALE = 1.0 / 60.0 * (np.pi / 180.0)


@pytest.mark.slow
def test_faceted_multiscale_automask():
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    psf = np.exp(
        -((yy - SIZE // 2) ** 2 + (xx - SIZE // 2) ** 2) / (2 * 1.5**2)
    ).astype(np.float32)
    sky = np.zeros((SIZE, SIZE), np.float32)
    positions = [(30, 30), (30, 96), (96, 30), (96, 96)]
    for y, x in positions:
        sky[y, x] = 1.0
    residual = np.asarray(
        padded_convolve(jnp.asarray(sky), jnp.asarray(psf))
    ).astype(np.float32)
    residual += rng.normal(scale=5e-3, size=residual.shape).astype(np.float32)
    model = np.zeros_like(residual)

    s = rd.Settings()
    s.algorithm_type = rd.AlgorithmType.MULTISCALE
    s.trimmed_image_width = SIZE
    s.trimmed_image_height = SIZE
    s.pixel_scale.x = PIXEL_SCALE
    s.pixel_scale.y = PIXEL_SCALE
    s.minor_iteration_count = 2000
    s.parallel.grid_width = 2
    s.parallel.grid_height = 2
    s.auto_mask_sigma = 5.0
    s.auto_threshold_sigma = 1.0
    s.save_source_list = True

    r = rd.Radler(s, psf, residual, model, beam_size=1.5 * PIXEL_SCALE)
    major = 0
    again = True
    while again and major < 10:
        again = r.perform(major)
        major += 1

    # All four sources recovered near their true flux.
    for y, x in positions:
        patch = model[y - 1 : y + 2, x - 1 : x + 2].sum()
        assert patch == pytest.approx(1.0, rel=0.15), (y, x, patch)
    # Residual down to the noise level.
    assert np.abs(residual).max() < 0.05
    # Component list aggregated across facets covers all sources.
    comp_list = r.get_component_list()
    total = sum(
        comp_list.component_count(sc) for sc in range(comp_list.n_scales)
    )
    assert total >= 4
