"""Algorithm base: shared knobs, result type, spectral-fit hook.

Behavioral equivalent of ``cpp/algorithms/deconvolution_algorithm.{h,cc}``.
Concrete algorithms operate functionally on ``[n_images, H, W]`` JAX cubes;
the base class carries host-side configuration (thresholds, gains, masks) and
the per-run iteration counter.
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..settings import OptimizationAlgorithm
from ..ops.spectral_fitting import SpectralFitter


@dataclasses.dataclass
class DeconvolutionResult:
    """Mirrors ``cpp/algorithms/deconvolution_algorithm.h:31-58``."""

    starting_peak_value: Optional[float] = None
    final_peak_value: float = 0.0
    another_iteration_required: bool = False
    is_diverging: bool = False


class DeconvolutionAlgorithm:
    """Common settings & state (``deconvolution_algorithm.h:60-210``)."""

    def __init__(self):
        # Defaults mirror ``deconvolution_algorithm.h:189-202``.
        self.threshold: float = 0.0
        self.major_iteration_threshold: float = 0.0
        self.minor_loop_gain: float = 0.1
        self.major_loop_gain: float = 1.0
        self.clean_border_ratio: float = 0.05
        self.max_iterations: int = 500
        self.divergence_limit: float = 4.0
        self.allow_negative_components: bool = True
        self.stop_on_negative_components: bool = False
        self.component_optimization_algorithm = OptimizationAlgorithm.CLEAN
        self.clean_mask: Optional[np.ndarray] = None  # bool [H, W]
        self.rms_factor_image: Optional[jnp.ndarray] = None
        self.iteration_number: int = 0
        self.spectral_fitter: Optional[SpectralFitter] = None
        self.n_polarizations: int = 1
        # Optional jax.sharding.Mesh; when set (and >1 device) algorithms
        # shard the cube over ("chan", "tile") and the minor loop's
        # reductions become ICI collectives (see radler_tpu/parallel/mesh.py).
        self.device_mesh = None

    # -- configuration ----------------------------------------------------
    def set_spectral_fitter(self, fitter: SpectralFitter, n_polarizations: int):
        self.spectral_fitter = fitter
        self.n_polarizations = n_polarizations

    def set_spectrally_forced_images(self, term_images: jnp.ndarray):
        self.spectral_fitter.set_forced_terms(term_images)

    def clone(self) -> "DeconvolutionAlgorithm":
        """Fresh instance sharing configuration (``Clone()``); used by the
        facet layer to give each sub-image its own iteration state."""
        return copy.copy(self)

    # -- helpers ----------------------------------------------------------
    def perform_spectral_fit(self, values: jnp.ndarray, x, y) -> jnp.ndarray:
        """Fit values ordered ``[channel, polarization]`` (each polarization
        independently) and return the fitted curve; equivalent of
        ``DeconvolutionAlgorithm::PerformSpectralFit``
        (``deconvolution_algorithm.cc:29-46``)."""
        if self.spectral_fitter is None or not self.spectral_fitter.is_active:
            return values
        C = len(self.spectral_fitter.frequencies)
        vals = values.reshape(C, self.n_polarizations)
        fitted = self.spectral_fitter.fit_and_evaluate(vals, x, y)
        return fitted.reshape(values.shape)

    def apply_spectral_constraints_to_components(self, component_list) -> None:
        """``deconvolution_algorithm.cc:48-63``."""
        if self.spectral_fitter is None or not self.spectral_fitter.is_active:
            return
        for scale_index in range(component_list.n_scales):
            n = component_list.component_count(scale_index)
            for ci in range(n):
                x, y, values = component_list.get_component(scale_index, ci)
                fitted = self.perform_spectral_fit(jnp.asarray(values), x, y)
                component_list.set_values(scale_index, ci, np.asarray(fitted))

    # -- interface ---------------------------------------------------------
    def execute_major_iteration(
        self, dirty_set, model_set, psfs
    ) -> DeconvolutionResult:
        """Run one major deconvolution iteration.

        ``dirty_set`` / ``model_set`` are :class:`radler_tpu.image_set.ImageSet`
        (mutated in place by rebinding ``.data``); ``psfs`` is a
        ``[n_channels, h, w]`` array for the selected direction's PSFs.
        """
        raise NotImplementedError
