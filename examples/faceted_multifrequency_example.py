#!/usr/bin/env python
"""Faceted multi-frequency joined-channel CLEAN example.

Demonstrates the reference's "parallel deconvolution" mode
(``cpp/algorithms/parallel_deconvolution.cc``): the image splits into a
grid of facets along minimum-flux Dijkstra paths, each facet cleans to a
shared major-iteration threshold (global peak max-reduce), and per-channel
components are fit with a polynomial spectrum.  A component list (sky model)
is written at the end.

Usage: python examples/faceted_multifrequency_example.py
"""

import numpy as np

import radler_tpu as rd


def main():
    size, n_channels = 256, 4
    rng = np.random.default_rng(17)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    r2 = (yy - size // 2) ** 2 + (xx - size // 2) ** 2

    psfs = np.stack(
        [
            np.exp(-r2 / (2 * (2.0 * (1 + 0.05 * c)) ** 2)).astype(np.float32)
            for c in range(n_channels)
        ]
    )
    sky = np.zeros((size, size), np.float32)
    ys = rng.integers(32, size - 32, 40)
    xs = rng.integers(32, size - 32, 40)
    amps = rng.uniform(0.2, 1.0, 40).astype(np.float32)
    np.add.at(sky, (ys, xs), amps)

    residual = np.empty((n_channels, size, size), np.float32)
    for c in range(n_channels):
        spectrum = (1.0 + 0.1 * c)  # crude spectral slope
        fp = np.fft.rfft2(np.fft.ifftshift(psfs[c]))
        residual[c] = np.fft.irfft2(
            np.fft.rfft2(sky * spectrum) * fp, s=(size, size)
        ).astype(np.float32)
    model = np.zeros_like(residual)

    settings = rd.Settings()
    settings.trimmed_image_width = size
    settings.trimmed_image_height = size
    settings.pixel_scale.x = settings.pixel_scale.y = np.deg2rad(1 / 3600)
    settings.minor_iteration_count = 10_000
    settings.absolute_threshold = 5e-4
    settings.minor_loop_gain = 0.2
    settings.parallel.grid_width = 2
    settings.parallel.grid_height = 2
    settings.spectral_fitting.mode = rd.SpectralFittingMode.POLYNOMIAL
    settings.spectral_fitting.terms = 2
    settings.save_source_list = True

    frequencies = np.array(
        [[1.0e8 + c * 1e7, 1.1e8 + c * 1e7] for c in range(n_channels)]
    )
    radler = rd.Radler(
        settings, psfs, residual, model, 0.0, frequencies=frequencies
    )
    major = 0
    while radler.perform(major) and major < 10:
        major += 1

    components = radler.get_component_list()
    print(
        f"{radler.iteration_number} minor iterations, "
        f"{components.component_count(0)} components, "
        f"ch0 residual peak {np.abs(residual[0]).max():.2e}"
    )
    components.write_sources(
        radler, "faceted_demo-sources.txt",
        settings.pixel_scale.x, settings.pixel_scale.y, 0.0, 0.0,
    )
    print("wrote faceted_demo-sources.txt")


if __name__ == "__main__":
    main()
