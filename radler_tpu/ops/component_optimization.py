"""Component-amplitude optimization (post-automask).

TPU-native equivalent of ``cpp/math/component_optimization.{h,cc}``:

* ``linear_component_solve`` — exact least-squares solve of the component
  amplitudes so the residual is zero at component positions
  (``component_optimization.cc:181-263``).  The reference builds a wrap-around
  PSF matrix and calls GSL; here the (K x K) system is built with one PSF
  gather and solved with ``jnp.linalg.solve`` on the MXU.
* ``gradient_descent`` — line-search gradient descent where gradient and
  residual are computed with FFT convolutions
  (``component_optimization.cc:265-321``); independent of the number of
  components.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..settings import OptimizationAlgorithm
from .convolution import padded_convolve


def linear_component_solve(
    model: jnp.ndarray, residual: jnp.ndarray, psf: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve amplitudes at the model's non-zero positions exactly.

    Mirrors ``LinearComponentSolve``: unknowns are amplitudes at the existing
    model component positions; equations demand the dirty image equals the
    model convolved with the PSF at those positions (wrap-around indexing,
    like the reference's ``(x + width + psf_x - x_i) % width``).  The residual
    is zeroed at component positions afterwards.
    """
    h, w = model.shape
    host_model = np.asarray(model)
    ys, xs = np.nonzero(host_model)
    k = len(xs)
    if k == 0:
        return model, residual
    xs_j = jnp.asarray(xs)
    ys_j = jnp.asarray(ys)
    # A[i, j] = psf value at position i for a component at position j
    # (wrap-around, matching component_optimization.cc:200-230).
    dyy = (ys_j[:, None] - ys_j[None, :] + h + h // 2) % h
    dxx = (xs_j[:, None] - xs_j[None, :] + w + w // 2) % w
    a = psf[dyy, dxx]
    # b: dirty value = residual + model ⊛ psf at the positions.
    dirty = residual + padded_convolve(model, psf)
    b = dirty[ys_j, xs_j]
    amplitudes, *_ = jnp.linalg.lstsq(a, b)
    new_model = jnp.zeros_like(model).at[ys_j, xs_j].set(amplitudes)
    new_residual = dirty - padded_convolve(new_model, psf)
    new_residual = new_residual.at[ys_j, xs_j].set(0.0)
    return new_model, new_residual


@partial(jax.jit, static_argnames=("n_iterations", "padded_h", "padded_w"))
def _gd_iterations(
    model, dirty, psf, mask, n_iterations, padded_h, padded_w
):
    def conv(x):
        return padded_convolve(x, psf, padded_shape=(padded_h, padded_w))

    def body(_, state):
        model, _ = state
        residual = dirty - conv(model)
        gradient = conv(residual) * mask
        conv_grad = conv(gradient)
        denom = jnp.sum(conv_grad * conv_grad)
        step = jnp.where(
            denom > 0.0, jnp.sum(residual * conv_grad) / denom, 0.0
        )
        model = model + step * gradient
        return model, residual

    model, _ = jax.lax.fori_loop(0, n_iterations, body, (model, dirty))
    residual = dirty - conv(model)
    return model, residual


def gradient_descent(
    model: jnp.ndarray,
    residual: jnp.ndarray,
    psf: jnp.ndarray,
    n_iterations: int = 4,
    support_mask: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Line-search GD over component amplitudes
    (``component_optimization.cc:265-321``): only positions in the support
    are adjusted (by default the model acts as its own support mask)."""
    h, w = model.shape
    if support_mask is None:
        mask = (model != 0.0).astype(model.dtype)
    else:
        mask = support_mask.astype(model.dtype)
    dirty = residual + padded_convolve(model, psf)
    ph, pw = 2 * h, 2 * w
    return _gd_iterations(model, dirty, psf, mask, n_iterations, ph, pw)


def gradient_descent_with_variable_psf(
    supports: "list[jnp.ndarray]",
    image: jnp.ndarray,
    psfs: "list[jnp.ndarray]",
    n_iterations: int = 10,
    padded_shape=None,
) -> "list[jnp.ndarray]":
    """Joint line-search GD over components with per-group PSFs.

    Mirrors ``GradientDescentWithVariablePsf``
    (``component_optimization.cc:323-400``): one delta image per PSF group
    (used by multiscale to jointly refine components of every scale, each
    convolved with its own scale-convolved PSF).  ``supports[g]`` is a 0/1
    image marking group ``g``'s component positions.
    """
    h, w = image.shape
    if padded_shape is None:
        padded_shape = (2 * h, 2 * w)

    def conv(x, psf):
        return padded_convolve(x, psf, padded_shape=padded_shape)

    models = [jnp.zeros((h, w), jnp.float32) for _ in psfs]
    for _ in range(n_iterations):
        residual = image
        for model, psf in zip(models, psfs):
            residual = residual - conv(model, psf)
        # Gradient per group: residual correlated with the PSF at component
        # positions; direction image = gradients re-convolved.
        gradients = [
            conv(residual, psf) * support
            for psf, support in zip(psfs, supports)
        ]
        direction = jnp.zeros((h, w), jnp.float32)
        for gradient, psf in zip(gradients, psfs):
            direction = direction + conv(gradient, psf)
        denom = jnp.sum(direction * direction)
        step = jnp.where(denom > 0.0, jnp.sum(residual * direction) / denom, 0.0)
        models = [
            model + step * gradient
            for model, gradient in zip(models, gradients)
        ]
    return models


def run_component_optimization(
    dirty_set, model_set, psfs: jnp.ndarray, algorithm: OptimizationAlgorithm
) -> None:
    """Dispatch per image (``generic_clean.cc:26-49``).

    Only the model is updated; the reference's solvers take the residual as
    const and leave the stored residual images untouched."""
    meta = dirty_set.meta
    new_mod = []
    for i in range(dirty_set.n_images):
        res = dirty_set.data[i]
        mod = model_set.data[i]
        psf = psfs[meta.psf_index(i)]
        if algorithm == OptimizationAlgorithm.LINEAR_EQUATION_SOLVER:
            mod, _ = linear_component_solve(mod, res, psf)
        elif algorithm == OptimizationAlgorithm.GRADIENT_DESCENT:
            mod, _ = gradient_descent(mod, res, psf)
        else:
            raise RuntimeError(
                f"Unsupported optimization algorithm {algorithm} for generic "
                "clean"
            )
        new_mod.append(mod)
    model_set.data = jnp.stack(new_mod)
