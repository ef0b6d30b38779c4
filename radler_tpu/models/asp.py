"""Adaptive Scale Pixel (ASP) deconvolution (Bhatnagar & Cornwell 2004).

Behavioral equivalent of ``cpp/algorithms/asp_algorithm.{h,cc}``: multiscale-
style dominant-scale selection, then per iteration either point-source
removal (``DeconvolvePointSource``, ``asp_algorithm.cc:231-254``) or a full
2-D Gaussian fit at the peak, beam deconvolution of the fitted ellipse,
per-channel amplitude measurement through convolution peaks, spectral
fitting, and FFT subtraction of the drawn component
(``DeconvolveGaussian``, ``asp_algorithm.cc:256-371``).

The scale-selection machinery is shared with the multiscale module; per-
component Gaussian fits are small host-side least-squares solves while image
updates stay on device.
"""

from __future__ import annotations

import math
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..image_set import CubeMeta, get_integrated_psf, get_linear_integrated
from ..ops.convolution import convolve_same, padded_convolve
from ..ops.gaussian_fit import (
    Ellipse,
    deconvolve_gaussian,
    draw_gaussian,
    fit_2d_gaussian_centred,
    fit_2d_gaussian_full,
)
from ..ops.psf_subtract import subtract_psf_from_cube
from ..settings import MultiscaleSettings
from ..utils import logging as log
from ..utils.fft_size import get_convolution_size
from .base import DeconvolutionResult
from .multiscale import (
    MultiScaleAlgorithm,
    initialize_scales,
    select_maximum_scale,
)


class AspAlgorithm(MultiScaleAlgorithm):
    """Shares the scale bank / peak search with multiscale; overrides the
    inner loop with ASP's per-component processing."""

    def __init__(
        self,
        settings: MultiscaleSettings,
        beam_size: float,
        pixel_scale_x: float,
        pixel_scale_y: float,
    ):
        super().__init__(
            settings, beam_size, pixel_scale_x, pixel_scale_y, False
        )

    # ------------------------------------------------------------------
    def execute_major_iteration(
        self, dirty_set, model_set, psfs: jnp.ndarray
    ) -> DeconvolutionResult:
        meta: CubeMeta = dirty_set.meta
        width, height = dirty_set.width, dirty_set.height
        if self.stop_on_negative_components:
            self.allow_negative_components = True
        # Masks/borders may have changed between major iterations.
        self._valid_stack_cache = None

        if self.device_mesh is not None and self.device_mesh.size > 1:
            # ASP's hot path is the scale-bank convolutions and the
            # per-component FFT subtractions — all jitted over the cube.
            # Row-sharding the cube at entry makes XLA partition them over
            # the mesh (the reference's threaded per-scale search,
            # ``threaded_deconvolution_tools.cc:30-50``).
            from jax.sharding import NamedSharding, PartitionSpec as P

            rows = NamedSharding(self.device_mesh, P(None, "tile", None))
            n_tile = self.device_mesh.shape["tile"]
            pad = (-height) % n_tile

            def shard_rows(data):
                if pad == 0:
                    return jax.device_put(data, rows)
                # Non-divisible row counts: pad onto the mesh, slice the
                # padding back off (the sliced array keeps its mesh
                # placement; device_put alone rejects uneven shards).
                padded = jax.device_put(
                    jnp.pad(data, ((0, 0), (0, pad), (0, 0))), rows
                )
                return padded[:, :height, :]

            dirty_set.data = shard_rows(dirty_set.data)
            model_set.data = shard_rows(model_set.data)

        initialize_scales(
            self.scale_infos,
            self.beam_size_in_pixels,
            min(width, height),
            self.ms_settings.shape,
            self.ms_settings.max_scales,
            self.ms_settings.scale_list,
        )
        if self.rms_factor_image is not None and self.rms_factor_image.shape != (
            height,
            width,
        ):
            raise RuntimeError("Error in RMS factor image dimensions!")

        integrated_psf = get_integrated_psf(psfs, meta)
        psf_parameters = fit_2d_gaussian_centred(
            np.asarray(integrated_psf), self.beam_size_in_pixels
        )

        convolved_psfs: List[List[jnp.ndarray]] = [
            self._convolve_psfs(integrated_psf, True)
        ]
        if meta.n_channels > 1:
            convolved_psfs = [
                self._convolve_psfs(psfs[c], False)
                for c in range(meta.n_channels)
            ]

        integrated = get_linear_integrated(dirty_set.data, meta)
        self._find_active_scale_convolved_maxima(integrated, report_rms=False)
        result = DeconvolutionResult()
        scale_with_peak = select_maximum_scale(self.scale_infos)
        if scale_with_peak is None:
            log.warn("No peak found during ASP cleaning! Aborting.")
            result.another_iteration_required = False
            return result

        entry = self.scale_infos[scale_with_peak]
        is_final_threshold = False
        m_gain_threshold = abs(
            entry.max_unnormalized_image_value * entry.bias_factor
        ) * (1.0 - self.major_loop_gain)
        m_gain_threshold = max(m_gain_threshold, self.major_iteration_threshold)
        first_threshold = m_gain_threshold
        if self.threshold > first_threshold:
            first_threshold = self.threshold
            is_final_threshold = True

        while (
            self.iteration_number < self.max_iterations
            and abs(
                self.scale_infos[scale_with_peak].max_unnormalized_image_value
                * self.scale_infos[scale_with_peak].bias_factor
            )
            > first_threshold
            and (
                not self.stop_on_negative_components
                or self.scale_infos[scale_with_peak].max_unnormalized_image_value
                >= 0.0
            )
        ):
            entry = self.scale_infos[scale_with_peak]
            individual_convolved = self._scale_convolve(
                dirty_set.data, entry.scale
            )
            integrated = get_linear_integrated(individual_convolved, meta)
            self._find_peak_direct(integrated, scale_with_peak)

            self.iteration_number += 1
            self._find_active_scale_convolved_maxima(
                get_linear_integrated(dirty_set.data, meta), report_rms=False
            )
            scale_with_peak = select_maximum_scale(self.scale_infos)
            if scale_with_peak is None:
                log.warn("No peak found in main loop of ASP cleaning!")
                result.another_iteration_required = False
                return result
            entry = self.scale_infos[scale_with_peak]
            log.info(
                f"Iteration {self.iteration_number}, scale "
                f"{round(entry.scale)} px : "
                f"{entry.max_unnormalized_image_value * entry.bias_factor:.6g}"
                f" at {entry.max_image_value_x},{entry.max_image_value_y}"
            )
            if entry.scale == 0.0:
                self._deconvolve_point_source(
                    entry.max_image_value_x,
                    entry.max_image_value_y,
                    dirty_set,
                    model_set,
                    psfs,
                    meta,
                )
            else:
                # The Gaussian fit runs on the *unconvolved* integrated dirty
                # image (the reference's FindScaleConvolvedMaxima overwrites
                # the scratch with GetLinearIntegrated(data) before
                # DeconvolveGaussian reads it, asp_algorithm.cc:379,292-297).
                self._deconvolve_gaussian(
                    entry,
                    dirty_set,
                    model_set,
                    psfs,
                    get_linear_integrated(dirty_set.data, meta),
                    psf_parameters,
                    meta,
                )

        max_iter_reached = self.iteration_number >= self.max_iterations
        negative_reached = (
            self.stop_on_negative_components
            and self.scale_infos[scale_with_peak].max_unnormalized_image_value
            < 0.0
        )
        result.another_iteration_required = (
            not max_iter_reached and not is_final_threshold and not negative_reached
        )
        result.final_peak_value = (
            self.scale_infos[scale_with_peak].max_unnormalized_image_value
            * self.scale_infos[scale_with_peak].bias_factor
        )
        return result

    # ------------------------------------------------------------------
    def _deconvolve_point_source(
        self, x: int, y: int, dirty_set, model_set, psfs, meta: CubeMeta
    ) -> None:
        """``asp_algorithm.cc:231-254``."""
        component_values = dirty_set.data[:, y, x]
        if self.spectral_fitter is not None and self.spectral_fitter.is_active:
            vals = component_values.reshape(
                meta.n_channels, meta.n_polarizations
            )
            component_values = self.spectral_fitter.fit_and_evaluate(
                vals, x, y
            ).reshape(-1)
        component_values = component_values * self.minor_loop_gain
        model_set.data = model_set.data.at[:, y, x].add(component_values)
        dirty_set.data = subtract_psf_from_cube(
            dirty_set.data,
            psfs,
            jnp.asarray(meta.psf_indices),
            jnp.int32(x),
            jnp.int32(y),
            component_values,
        )

    def _deconvolve_gaussian(
        self,
        entry,
        dirty_set,
        model_set,
        psfs,
        integrated: jnp.ndarray,
        psf_parameters: Ellipse,
        meta: CubeMeta,
    ) -> None:
        """``asp_algorithm.cc:256-371``."""
        width, height = dirty_set.width, dirty_set.height
        fit_a = entry.max_unnormalized_image_value * entry.bias_factor
        fit_a, fit_x, fit_y, gaussian = fit_2d_gaussian_full(
            np.asarray(integrated),
            fit_a,
            float(entry.max_image_value_x),
            float(entry.max_image_value_y),
            entry.scale,
            entry.scale,
            0.0,
        )
        log.debug(
            f"ASP fit: x={fit_x}, y={fit_y}, a={fit_a}, maj={gaussian.major},"
            f" min={gaussian.minor}, pa={gaussian.position_angle}"
        )
        # NB: the reference computes std::clamp(0, width-1, round(fit_x)),
        # which has its arguments swapped; we implement the evident intent.
        peak_x = int(np.clip(round(fit_x), 0, width - 1))
        peak_y = int(np.clip(round(fit_y), 0, height - 1))

        gaussian = deconvolve_gaussian(gaussian, psf_parameters)
        if not math.isfinite(gaussian.major):
            # Fitted component smaller than the PSF -> treat as point source.
            self._deconvolve_point_source(
                peak_x, peak_y, dirty_set, model_set, psfs, meta
            )
            return
        gaussian.position_angle *= -1.0  # matches asp_algorithm.cc:292

        # Unit-peak kernel of the deconvolved Gaussian, centered.
        kernel = np.zeros((height, width), np.float32)
        kernel = draw_gaussian(
            kernel, width // 2, height // 2, gaussian, 1.0
        )
        kernel_j = jnp.asarray(kernel)

        # Per-channel PSF peaks through the Gaussian kernel.
        conv_psfs = convolve_same(psfs, kernel_j)
        psf_peaks = conv_psfs[:, height // 2, width // 2]  # [C]
        conv_residuals = convolve_same(dirty_set.data, kernel_j)
        component_peaks = conv_residuals[:, peak_y, peak_x]  # [N]
        component_values = component_peaks / psf_peaks[
            jnp.asarray(meta.psf_indices)
        ]
        if self.spectral_fitter is not None and self.spectral_fitter.is_active:
            vals = component_values.reshape(
                meta.n_channels, meta.n_polarizations
            )
            component_values = self.spectral_fitter.fit_and_evaluate(
                vals, peak_x, peak_y
            ).reshape(-1)

        host_values = np.asarray(component_values) * self.minor_loop_gain
        component_image = np.zeros((height, width), np.float32)
        component_image = draw_gaussian(
            component_image, fit_x, fit_y, gaussian, 1.0
        )
        comp_j = jnp.asarray(component_image)
        values_j = jnp.asarray(host_values)
        model_set.data = (
            model_set.data + values_j[:, None, None] * comp_j[None, :, :]
        )
        # Subtract component (x) psf from each residual with padding.
        pad_w = get_convolution_size(
            self.scale_infos[-1].scale, width, self.ms_settings.convolution_padding
        )
        pad_h = get_convolution_size(
            self.scale_infos[-1].scale, height, self.ms_settings.convolution_padding
        )
        conv = padded_convolve(
            comp_j[None, :, :], psfs, padded_shape=(pad_h, pad_w)
        )  # [C, H, W]
        per_image = conv[jnp.asarray(meta.psf_indices)]
        dirty_set.data = (
            dirty_set.data - values_j[:, None, None] * per_image
        )
