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

from ..ops.component_optimization import (
    linear_component_solve,
    lm_nonlinear_fit,
)
from .base import DeconvolutionAlgorithm, DeconvolutionResult


class LsDeconvolution(DeconvolutionAlgorithm):
    """Masked least-squares amplitude fit.

    ``linear``: exact solve at mask (or above-threshold) positions
    (``ls_deconvolution.cc`` ``linearFit``).  Otherwise a regularized
    Levenberg–Marquardt fit mirroring the reference's ``nonLinearFit``
    (GSL lmsder over ``[dirty - A x; 0.1 * sum|x|]``,
    ``ls_deconvolution.cc:243-316``) — run in K-space on device
    (:func:`radler_tpu.ops.component_optimization.lm_nonlinear_fit`).
    """

    def __init__(self, use_linear_solver: bool = True):
        super().__init__()
        self.use_linear_solver = use_linear_solver

    def execute_major_iteration(
        self, dirty_set, model_set, psfs: jnp.ndarray
    ) -> DeconvolutionResult:
        meta = dirty_set.meta
        if not self.use_linear_solver and self.clean_mask is None:
            # ``nonLinearFit`` requires a mask (ls_deconvolution.cc:245-246).
            raise RuntimeError("No mask available")
        for i in range(dirty_set.n_images):
            residual = dirty_set.data[i]
            psf = psfs[meta.psf_index(i)]
            if self.clean_mask is not None:
                support = np.asarray(self.clean_mask, bool)
            else:
                # Without a mask, fit every pixel above 5x the image RMS.
                rms = float(jnp.sqrt(jnp.mean(residual * residual)))
                support = np.asarray(jnp.abs(residual) > 5.0 * rms)
            if self.use_linear_solver:
                # Seed with a negligible value so the solver sees the
                # support positions; amplitudes are solved against the
                # current residual.
                seed = jnp.asarray(support, jnp.float32) * jnp.float32(1e-30)
                delta, residual = linear_component_solve(seed, residual, psf)
            else:
                delta, residual = lm_nonlinear_fit(support, residual, psf)
            dirty_set.data = dirty_set.data.at[i].set(residual)
            model_set.data = model_set.data.at[i].add(delta)
        result = DeconvolutionResult()
        result.another_iteration_required = False
        return result
