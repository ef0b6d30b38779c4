"""Least-squares deconvolution (experimental).

Behavioral equivalent of ``cpp/algorithms/ls_deconvolution.{h,cc}``: fit the
amplitudes of masked pixel positions so the PSF-convolved model matches the
dirty image, by exact linear solve or (regularized) nonlinear iteration.
Like the reference, this algorithm is compiled but not reachable from
``Settings`` (no ``AlgorithmType`` case — see ``cpp/radler.cc:350-375``);
it is exposed for direct use and testing.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.component_optimization import gradient_descent, linear_component_solve
from .base import DeconvolutionAlgorithm, DeconvolutionResult


class LsDeconvolution(DeconvolutionAlgorithm):
    """Masked least-squares amplitude fit.

    ``linear``: exact solve at mask (or above-threshold) positions
    (``ls_deconvolution.cc`` ``linearFit``); otherwise an L2 gradient-descent
    refinement (the reference's ``nonLinearFit`` uses GSL with an L1-ish
    penalty; the convolution-based GD here minimizes the same residual RMS).
    """

    def __init__(self, use_linear_solver: bool = True):
        super().__init__()
        self.use_linear_solver = use_linear_solver

    def execute_major_iteration(
        self, dirty_set, model_set, psfs: jnp.ndarray
    ) -> DeconvolutionResult:
        meta = dirty_set.meta
        for i in range(dirty_set.n_images):
            residual = dirty_set.data[i]
            psf = psfs[meta.psf_index(i)]
            if self.clean_mask is not None:
                support = jnp.asarray(self.clean_mask, jnp.float32)
            else:
                # Without a mask, fit every pixel above 5x the image RMS.
                rms = jnp.sqrt(jnp.mean(residual * residual))
                support = (jnp.abs(residual) > 5.0 * rms).astype(jnp.float32)
            # Seed with a negligible value so the solver sees the support
            # positions; amplitudes are solved against the current residual.
            seed = support * jnp.float32(1e-30)
            if self.use_linear_solver:
                delta, residual = linear_component_solve(seed, residual, psf)
            else:
                delta, residual = gradient_descent(
                    jnp.zeros_like(seed),
                    residual,
                    psf,
                    n_iterations=10,
                    support_mask=support,
                )
            dirty_set.data = dirty_set.data.at[i].set(residual)
            model_set.data = model_set.data.at[i].add(delta)
        result = DeconvolutionResult()
        result.another_iteration_required = False
        return result
