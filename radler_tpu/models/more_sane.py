"""External PyMORESANE integration.

Behavioral equivalent of ``cpp/algorithms/more_sane.{h,cc}``: per image,
optionally add the PSF-convolved model back to the residual, write
dirty/PSF/mask FITS files, shell out to the MORESANE executable with
per-major-iteration sigma levels, and read back the model/residual FITS.
"""

from __future__ import annotations

import os
import subprocess

import numpy as np
import jax.numpy as jnp

from ..ops.convolution import convolve_same
from ..settings import MoreSaneSettings
from ..utils import logging as log
from ..utils.fits import read_fits_image, write_fits_image
from .base import DeconvolutionAlgorithm, DeconvolutionResult


class MoreSane(DeconvolutionAlgorithm):
    def __init__(self, settings: MoreSaneSettings, prefix_name: str):
        super().__init__()
        self.ms_settings = settings
        self.prefix_name = prefix_name

    def _execute_single(
        self, residual: jnp.ndarray, model: jnp.ndarray, psf: jnp.ndarray
    ):
        """``more_sane.cc:15-70``."""
        if self.iteration_number != 0:
            log.info("Convolving model with psf and adding back to residual...")
            residual = residual + convolve_same(model, psf)

        output_name = (
            f"{self.prefix_name}-tmp-moresaneoutput{self.iteration_number}"
        )
        dirty_name = f"{self.prefix_name}-tmp-moresaneinput-dirty.fits"
        psf_name = f"{self.prefix_name}-tmp-moresaneinput-psf.fits"
        mask_name = f"{self.prefix_name}-tmp-moresaneinput-mask.fits"
        if self.clean_mask is not None:
            write_fits_image(mask_name, self.clean_mask.astype(np.float32))
        write_fits_image(dirty_name, np.asarray(residual))
        write_fits_image(psf_name, np.asarray(psf))

        command = ["python", self.ms_settings.location]
        if not self.allow_negative_components:
            command.append("-ep")
        if self.clean_mask is not None:
            command += ["-m", mask_name]
        if self.ms_settings.arguments:
            command += self.ms_settings.arguments.split()
        command += [dirty_name, psf_name, output_name]
        if self.ms_settings.sigma_levels:
            idx = min(
                self.iteration_number, len(self.ms_settings.sigma_levels) - 1
            )
            command += ["-sl", str(self.ms_settings.sigma_levels[idx])]

        log.info("Running: " + " ".join(command))
        subprocess.run(command, check=True)

        model_out = jnp.asarray(read_fits_image(output_name + "_model.fits"))
        residual_out = jnp.asarray(
            read_fits_image(output_name + "_residual.fits")
        )
        for name in (
            dirty_name,
            psf_name,
            mask_name,
            output_name + "_model.fits",
            output_name + "_residual.fits",
        ):
            try:
                os.unlink(name)
            except OSError:
                pass
        return residual_out, model_out

    def execute_major_iteration(
        self, dirty_set, model_set, psfs: jnp.ndarray
    ) -> DeconvolutionResult:
        """``more_sane.cc:72-86``."""
        new_res = []
        new_mod = []
        for i in range(dirty_set.n_images):
            res, mod = self._execute_single(
                dirty_set.data[i],
                model_set.data[i],
                psfs[dirty_set.meta.psf_index(i)],
            )
            new_res.append(res)
            new_mod.append(mod)
        dirty_set.data = jnp.stack(new_res)
        model_set.data = jnp.stack(new_mod)
        self.iteration_number += 1
        result = DeconvolutionResult()
        result.another_iteration_required = (
            self.iteration_number < self.max_iterations
        )
        return result
