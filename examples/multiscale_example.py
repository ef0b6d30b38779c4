#!/usr/bin/env python
"""Multiscale deconvolution example (equivalent of the reference's
``cpp/demo/multiscale_example.cc``): read a dirty image + PSF from FITS,
run multiscale CLEAN major iterations with auto-masking, write the model and
residual back out.

Usage: python examples/multiscale_example.py dirty.fits psf.fits out_prefix
(with no arguments, a synthetic demo field is generated).
"""

import sys

import numpy as np

import radler_tpu as rd
from radler_tpu.utils.fits import read_fits_image, write_fits_image


def synthetic_field(size=512, seed=11):
    import jax.numpy as jnp
    from radler_tpu.ops.convolution import padded_convolve

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size]
    r2 = (yy - size // 2) ** 2 + (xx - size // 2) ** 2
    psf = np.exp(-r2 / (2 * 2.0**2)).astype(np.float32)
    psf += 0.05 * np.exp(
        -((np.sqrt(r2) - 10.0) ** 2) / (2 * 1.5**2)
    ).astype(np.float32)
    sky = np.zeros((size, size), np.float32)
    # Point sources + one diffuse blob.
    for _ in range(30):
        sky[rng.integers(64, size - 64), rng.integers(64, size - 64)] += (
            rng.uniform(0.2, 1.0)
        )
    sky += 0.5 * np.exp(
        -((yy - 300.0) ** 2 + (xx - 200.0) ** 2) / (2 * 12.0**2)
    ).astype(np.float32)
    dirty = np.asarray(
        padded_convolve(jnp.asarray(sky), jnp.asarray(psf))
    ).astype(np.float32)
    dirty += rng.normal(scale=2e-3, size=dirty.shape).astype(np.float32)
    return psf, dirty


def main():
    if len(sys.argv) == 4:
        dirty = read_fits_image(sys.argv[1])
        psf = read_fits_image(sys.argv[2])
        prefix = sys.argv[3]
    else:
        psf, dirty = synthetic_field()
        prefix = "demo"

    size = dirty.shape[0]
    pixel_scale = np.deg2rad(1.0 / 3600.0)

    settings = rd.Settings()
    settings.algorithm_type = rd.AlgorithmType.MULTISCALE
    settings.trimmed_image_width = dirty.shape[1]
    settings.trimmed_image_height = dirty.shape[0]
    settings.pixel_scale.x = pixel_scale
    settings.pixel_scale.y = pixel_scale
    settings.minor_iteration_count = 10_000
    settings.minor_loop_gain = 0.1
    settings.major_loop_gain = 0.8
    settings.auto_mask_sigma = 4.0
    settings.auto_threshold_sigma = 1.0
    settings.save_source_list = True

    residual = dirty.copy()
    model = np.zeros_like(residual)
    radler = rd.Radler(
        settings, psf, residual, model, beam_size=2.0 * pixel_scale
    )

    major_iteration = 0
    while True:
        another = radler.perform(major_iteration)
        print(
            f"major {major_iteration}: {radler.iteration_number} minor "
            f"iterations, residual rms "
            f"{np.sqrt((residual**2).mean()):.3e}"
        )
        major_iteration += 1
        if not another:
            break

    write_fits_image(f"{prefix}-model.fits", model, pixel_scale, pixel_scale)
    write_fits_image(
        f"{prefix}-residual.fits", residual, pixel_scale, pixel_scale
    )
    comp_list = radler.get_component_list()
    comp_list.write_sources(
        radler, f"{prefix}-sources.txt", pixel_scale, pixel_scale, 0.0, 0.5
    )
    print(
        f"Wrote {prefix}-model.fits, {prefix}-residual.fits, "
        f"{prefix}-sources.txt "
        f"({sum(comp_list.component_count(s) for s in range(comp_list.n_scales))} "
        "components)"
    )


if __name__ == "__main__":
    main()
