"""User-supplied Python deconvolution algorithm.

Behavioral equivalent of ``cpp/algorithms/python_deconvolution.{h,cc}``.  The
reference embeds a Python interpreter via pybind11; here the host *is* Python,
so the plugin file is simply exec'd and its ``deconvolve(residual, model,
psf, meta)`` function called with the same contract:

* ``residual``/``model``: float64 numpy arrays of shape
  ``[n_freq, n_pol, height, width]`` (``python_deconvolution.cc:227-291``);
* ``psf``: float64 ``[n_freq, height, width]``;
* ``meta``: object with ``channels`` (frequency/weight structs),
  ``gain``, ``iteration_number``, ``major_iter_threshold``,
  ``max_iterations``, ``mgain``, ``final_threshold``, ``square_joined_channels``,
  ``spectral_fitter`` (with ``fit``/``fit_and_evaluate``);
* returns a dict with ``residual``, ``model``, ``level`` and ``continue``
  (``python_deconvolution.cc:293-323``).
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np
import jax.numpy as jnp

from .base import DeconvolutionAlgorithm, DeconvolutionResult


@dataclasses.dataclass
class PyChannel:
    frequency: float = 0.0
    weight: float = 0.0


class PySpectralFitter:
    """Plugin-facing fitter wrapper (``python_deconvolution.cc:18-116``)."""

    def __init__(self, fitter):
        self._fitter = fitter

    def fit(self, values, x, y):
        return np.asarray(self._fitter.fit(np.asarray(values), x, y))

    def fit_and_evaluate(self, values, x, y):
        return np.asarray(
            self._fitter.fit_and_evaluate(jnp.asarray(values), x, y)
        )


class PyMetaData:
    """``python_deconvolution.cc:118-158``."""

    def __init__(self, fitter):
        self.channels: List[PyChannel] = []
        self.gain = 0.0
        self.iteration_number = 0
        self.major_iter_threshold = 0.0
        self.max_iterations = 0
        self.mgain = 0.0
        self.final_threshold = 0.0
        self.square_joined_channels = False
        self.spectral_fitter = PySpectralFitter(fitter)


class PythonDeconvolution(DeconvolutionAlgorithm):
    """Load the user's file and call its ``deconvolve`` per major iteration."""

    def __init__(self, filename: str):
        super().__init__()
        self.filename = filename
        namespace: dict = {}
        with open(filename, "r") as f:
            code = f.read()
        exec(compile(code, filename, "exec"), namespace)
        if "deconvolve" not in namespace:
            raise RuntimeError(
                f"Python file '{filename}' does not define a deconvolve() "
                "function"
            )
        self._deconvolve = namespace["deconvolve"]

    def clone(self) -> "PythonDeconvolution":
        return super().clone()

    def execute_major_iteration(
        self, dirty_set, model_set, psfs: jnp.ndarray
    ) -> DeconvolutionResult:
        meta_cube = dirty_set.meta
        n_freq = meta_cube.n_channels
        n_pol = meta_cube.n_polarizations
        height, width = dirty_set.height, dirty_set.width

        residual = (
            np.asarray(dirty_set.data)
            .astype(np.float64)
            .reshape(n_freq, n_pol, height, width)
        )
        model = (
            np.asarray(model_set.data)
            .astype(np.float64)
            .reshape(n_freq, n_pol, height, width)
        )
        psf = np.asarray(psfs).astype(np.float64)

        meta = PyMetaData(self.spectral_fitter)
        if self.spectral_fitter is not None:
            for f, w in zip(
                self.spectral_fitter.frequencies, self.spectral_fitter.weights
            ):
                meta.channels.append(PyChannel(float(f), float(w)))
        meta.gain = self.minor_loop_gain
        meta.iteration_number = self.iteration_number
        meta.major_iter_threshold = self.major_iteration_threshold
        meta.max_iterations = self.max_iterations
        meta.mgain = self.major_loop_gain
        meta.final_threshold = self.threshold

        try:
            result = self._deconvolve(residual, model, psf, meta)
        except Exception as e:
            raise RuntimeError(
                "Error occurred while executing python deconvolution "
                f"function: {e}"
            ) from e
        self.iteration_number = meta.iteration_number

        if not isinstance(result, dict):
            raise RuntimeError(
                "In python deconvolution code: Return value of deconvolve() "
                "should be a dictionary"
            )
        for key in ("residual", "model", "level", "continue"):
            if key not in result:
                raise RuntimeError(
                    "In python deconvolution code: Dictionary returned by "
                    "deconvolve() is missing items; should have 'residual', "
                    "'model', 'level' and 'continue'"
                )
        dirty_set.data = jnp.asarray(
            np.asarray(result["residual"], np.float64).reshape(
                n_freq * n_pol, height, width
            ),
            jnp.float32,
        )
        model_set.data = jnp.asarray(
            np.asarray(result["model"], np.float64).reshape(
                n_freq * n_pol, height, width
            ),
            jnp.float32,
        )
        out = DeconvolutionResult()
        out.final_peak_value = float(result["level"])
        out.another_iteration_required = bool(result["continue"])
        return out
