#!/usr/bin/env python
"""IUWT wavelet-sparsity deconvolution example.

Demonstrates the MORESANE-like IUWT algorithm (reference:
``cpp/algorithms/iuwt_deconvolution_algorithm.cc``) on a diffuse synthetic
field: the caller owns the major loop and re-runs ``perform`` until the
algorithm reports it is done.

Usage: python examples/iuwt_example.py [dirty.fits psf.fits out_prefix]
(with no arguments, a synthetic demo field is generated).
"""

import sys

import numpy as np

import radler_tpu as rd
from radler_tpu.utils.fits import read_fits_image, write_fits_image


def synthetic_diffuse_field(size=512, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    r2 = (yy - size // 2) ** 2 + (xx - size // 2) ** 2
    psf = np.exp(-r2 / (2 * 2.5**2)).astype(np.float32)
    psf += 0.06 * np.exp(
        -((np.sqrt(r2) - 14.0) ** 2) / 6.0
    ).astype(np.float32)
    sky = np.zeros((size, size), np.float32)
    for _ in range(25):
        cy, cx = rng.integers(size // 8, 7 * size // 8, 2)
        s = rng.uniform(1.5, 15.0)
        m = max(1, int(4 * s))
        y0, y1 = max(0, cy - m), min(size, cy + m)
        x0, x1 = max(0, cx - m), min(size, cx + m)
        sky[y0:y1, x0:x1] += rng.uniform(0.2, 1.0) * np.exp(
            -((yy[y0:y1, x0:x1] - cy) ** 2 + (xx[y0:y1, x0:x1] - cx) ** 2)
            / (2 * s * s)
        )
    fp = np.fft.rfft2(np.fft.ifftshift(psf))
    dirty = np.fft.irfft2(np.fft.rfft2(sky) * fp, s=(size, size)).astype(
        np.float32
    )
    return psf, dirty


def main():
    if len(sys.argv) == 4:
        dirty = read_fits_image(sys.argv[1])
        psf = read_fits_image(sys.argv[2])
        prefix = sys.argv[3]
    else:
        psf, dirty = synthetic_diffuse_field()
        prefix = "iuwt_demo"

    settings = rd.Settings()
    settings.algorithm_type = rd.AlgorithmType.IUWT
    settings.trimmed_image_width = dirty.shape[1]
    settings.trimmed_image_height = dirty.shape[0]
    settings.pixel_scale.x = settings.pixel_scale.y = np.deg2rad(1 / 3600)
    settings.minor_iteration_count = 50
    settings.major_loop_gain = 0.8

    residual = dirty.copy()
    model = np.zeros_like(residual)
    radler = rd.Radler(settings, psf, residual, model, 0.0)

    major = 0
    while radler.perform(major) and major < 8:
        major += 1  # a real caller would re-predict the residual here
    rms = float(np.sqrt(np.mean(residual**2)))
    rms0 = float(np.sqrt(np.mean(dirty**2)))
    print(
        f"{radler.iteration_number} structure iterations, "
        f"{major + 1} major iterations, RMS {rms0:.4f} -> {rms:.4f}"
    )

    write_fits_image(f"{prefix}_model.fits", model)
    write_fits_image(f"{prefix}_residual.fits", residual)


if __name__ == "__main__":
    main()
