"""Fully on-device multiscale minor loop.

The host-orchestrated multiscale path (``multiscale.py``) mirrors the
reference's control flow (``cpp/algorithms/multiscale_algorithm.cc:183-543``):
per outer iteration it dispatches a scale-bank convolution, a sparse subminor
loop, an FFT residual correction, and a maxima refresh — each a separate
device dispatch with host scalar round-trips between them, and each padded
convolution size triggering its own compilation.  On a TPU (and doubly so on
a remote-dispatch backend) those syncs and compiles dominate.

This module compiles the ENTIRE minor loop — outer scale-selection loop plus
the dense subminor loop at a fixed scale — into one ``lax.while_loop`` so a
major iteration is a single device program with one host transfer at the end:

* the Clark-style candidate set becomes a *dense masked clean* over the
  scale-convolved cube (the candidate-set restriction is an optimization,
  not a semantic requirement: both subtract the twice-convolved PSF and stop
  at the same threshold — see ``subminor_loop.h:17-50``);
* on TPU the dense step is the fused Pallas kernel
  (``ops/pallas/hogbom_step.py``) in *linear* integration mode
  (``SubMinorModel::GetMaxComponent``, ``subminor_loop.cc:13-36``);
* all per-scale data (kernel spectra, twice-convolved PSF stacks, residual
  correction spectra, search windows) is precomputed into ``[S, ...]``
  stacks indexed with ``lax.dynamic_index_in_dim`` — every outer iteration
  has identical shapes, so the program compiles exactly once;
* a single unified padded FFT size (``fft_size_calculations.h:39-50`` for
  the *largest* scale) replaces the per-scale sizes, trading a few percent
  of FFT FLOPs for one compilation instead of S.

The fused path is used when no per-scale auto-mask tracking or component
tracking is requested (those need host-side state between outer iterations);
otherwise the host-orchestrated path runs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..image_set import CubeMeta, linear_integration_coefficients
from ..ops.convolution import forward_fft2, inverse_fft2_real

_FLT_MIN = np.float32(1.1754943508222875e-38)


class FusedMultiscaleResult(NamedTuple):
    residual: jnp.ndarray  # [N, H, W]
    model: jnp.ndarray  # [N, H, W]
    iteration_number: jnp.ndarray  # int32
    final_biased_peak: jnp.ndarray  # float32, signed: value * bias at best scale
    final_scale: jnp.ndarray  # int32
    any_peak_found: jnp.ndarray  # bool: a peak existed at loop exit
    diverging: jnp.ndarray  # bool
    no_components: jnp.ndarray  # bool: a subminor pass cleaned nothing
    is_final_threshold: jnp.ndarray  # bool: stopped at the absolute threshold
    components_per_scale: jnp.ndarray  # [S] int32
    flux_per_scale: jnp.ndarray  # [S] float32
    mask_acc: jnp.ndarray  # [S, H, W] bool (track_masks) or [1, 1, 1] dummy
    comp_acc: jnp.ndarray  # [S, N, H, W] f32 (track_components) or dummy




@partial(
    jax.jit,
    static_argnames=(
        "meta",
        "allow_negative",
        "stop_on_negative",
        "fitter",
        "use_rms",
        "use_pallas",
        "block_rows",
    ),
)
def dense_subminor_loop(
    conv_res: jnp.ndarray,  # [N, H, W] scale-convolved residual cube
    psf_pad: jnp.ndarray,  # [N, 2H+8, 2W+128] padded twice-convolved PSFs
    weight: jnp.ndarray,  # [H, W] window x mask x rms weight
    rms_factor: jnp.ndarray,  # [H, W] (ones when unused)
    threshold: jnp.ndarray,
    gain: jnp.ndarray,
    start_iteration: jnp.ndarray,
    max_iterations: jnp.ndarray,
    divergence_limit: jnp.ndarray,
    value0: jnp.ndarray,
    x0: jnp.ndarray,
    y0: jnp.ndarray,
    found0: jnp.ndarray,
    *,
    meta: CubeMeta,
    allow_negative: bool,
    stop_on_negative: bool,
    fitter,
    use_rms: bool,
    use_pallas: bool,
    block_rows: int,
):
    """Standalone dense Clark subminor pass at a fixed scale.

    Host-orchestrated twin of the inner loop of
    :func:`fused_multiscale_minor_loop` (same semantics as the sparse
    :class:`~radler_tpu.models.subminor.SubMinorLoop`, see the module
    docstring): used by the multiscale host path when per-scale masks or
    component tracking require per-outer-iteration host state.  Returns
    ``(conv_res, component_image, iteration, value, found, diverging)``.
    """
    N, H, W = conv_res.shape
    lin_np = linear_integration_coefficients(meta)
    lin = jnp.asarray(lin_np)
    lin_t = tuple(float(v) for v in lin_np)
    start_abs = jnp.abs(value0)

    def cond(st):
        _res, _comp, it, value, x, y, found, div = st
        ok = found & (jnp.abs(value) > threshold) & (it < max_iterations)
        if stop_on_negative:
            ok &= value >= 0.0
        return ok & ~div

    def body(st):
        res, comp, it, value, x, y, found, _ = st
        peak_values = res[:, y, x]
        if fitter is not None:
            v = peak_values.reshape(meta.n_channels, meta.n_polarizations)
            peak_values = fitter.fit_and_evaluate(v, x, y).reshape(-1)
        peak_values = peak_values * gain
        comp = comp.at[:, y, x].add(peak_values)
        if use_pallas:
            from ..ops.pallas.hogbom_step import fused_clean_step

            res, peak_index, peak_cmp = fused_clean_step(
                res,
                psf_pad,
                peak_values,
                weight,
                y,
                x,
                block_rows=block_rows,
                allow_negative=allow_negative,
                integration_mode="linear",
                chan_coefs=lin_t,
                pol_coefs=(1.0,),
                use_weight=True,
            )
            ny = (peak_index // W).astype(jnp.int32)
            nx = (peak_index % W).astype(jnp.int32)
            nfound = peak_cmp > _FLT_MIN
        else:
            shifted = jax.lax.dynamic_slice(
                psf_pad, (0, H - y, W - x), (N, H, W)
            )
            res = res - shifted * peak_values[:, None, None]
            integ = jnp.einsum("n,nhw->hw", lin, res)
            wgt = integ * weight
            cmp = jnp.abs(wgt) if allow_negative else wgt
            flat_idx = jnp.argmax(cmp.reshape(-1))
            peak_cmp = cmp.reshape(-1)[flat_idx]
            nfound = peak_cmp > _FLT_MIN
            nx = (flat_idx % W).astype(jnp.int32)
            ny = (flat_idx // W).astype(jnp.int32)
        nvalue = jnp.einsum("n,n->", lin, res[:, ny, nx])
        if use_rms:
            nvalue = nvalue * rms_factor[ny, nx]
        div = jnp.where(
            divergence_limit != 0.0,
            nfound & (jnp.abs(nvalue) > start_abs * divergence_limit),
            False,
        )
        return res, comp, it + 1, nvalue, nx, ny, nfound, div

    init = (
        conv_res,
        jnp.zeros_like(conv_res),
        start_iteration,
        value0,
        x0,
        y0,
        found0,
        jnp.asarray(False),
    )
    res, comp, it, value, x, y, found, div = jax.lax.while_loop(
        cond, body, init
    )
    return res, comp, it, value, found, div


@partial(
    jax.jit,
    static_argnames=(
        "meta",
        "allow_negative",
        "stop_on_negative",
        "fitter",
        "use_rms",
        "use_pallas",
        "block_rows",
        "split",
        "padded_small",
        "padded_large",
        "track_masks",
        "track_components",
    ),
)
def fused_multiscale_minor_loop(
    residual: jnp.ndarray,  # [N, H, W]
    model: jnp.ndarray,  # [N, H, W]
    kernel_f: jnp.ndarray,  # [S, H, W//2+1] c64 image-size scale spectra
    twice_psfs: jnp.ndarray,  # [S, C, H, W] twice-convolved per-channel PSFs
    corr_small: jnp.ndarray,  # [split, C, PHa, ...] c64 correction spectra
    kpf_small: jnp.ndarray,  # [split, PHa, ...] c64 add-back spectra
    corr_large: jnp.ndarray,  # [S-split, C, PHb, ...] (1-row dummy if unused)
    kpf_large: jnp.ndarray,  # [S-split, PHb, ...]
    valid_stack: jnp.ndarray,  # [S, H, W] bool searchable windows
    rms_factor: jnp.ndarray,  # [H, W] (ones when unused)
    bias: jnp.ndarray,  # [S]
    gain_arr: jnp.ndarray,  # [S]
    threshold: jnp.ndarray,  # final (absolute) threshold
    major_iteration_threshold: jnp.ndarray,
    major_loop_gain: jnp.ndarray,
    sub_loop_gain: jnp.ndarray,
    minor_loop_gain: jnp.ndarray,
    divergence_limit: jnp.ndarray,
    start_iteration: jnp.ndarray,  # int32
    max_iterations: jnp.ndarray,  # int32
    countdown0: jnp.ndarray,  # int32
    *,
    meta: CubeMeta,
    allow_negative: bool,
    stop_on_negative: bool,
    fitter,
    use_rms: bool,
    use_pallas: bool,
    block_rows: int,
    split: int,
    padded_small: tuple,
    padded_large: tuple,
    track_masks: bool = False,
    track_components: bool = False,
) -> FusedMultiscaleResult:
    N, H, W = residual.shape
    S = kernel_f.shape[0]
    lin_np = linear_integration_coefficients(meta)
    lin = jnp.asarray(lin_np)
    lin_t = tuple(float(v) for v in lin_np)
    psf_idx = jnp.asarray(meta.psf_indices)
    neg_inf = jnp.float32(-jnp.inf)

    # ---- maxima over all scales (FindActiveScaleConvolvedMaxima) --------
    def find_maxima(res):
        integ = jnp.einsum("n,nhw->hw", lin, res)
        int_f = forward_fft2(integ)
        conv = inverse_fft2_real(int_f[None] * kernel_f, (H, W))  # [S, H, W]
        weighted = conv * rms_factor if use_rms else conv
        cmp = jnp.abs(weighted) if allow_negative else weighted
        masked = jnp.where(valid_stack, cmp, neg_inf).reshape(S, H * W)
        idx = jnp.argmax(masked, axis=1)
        peak_cmp = jnp.take_along_axis(masked, idx[:, None], axis=1)[:, 0]
        found = peak_cmp > _FLT_MIN
        vals = jnp.take_along_axis(
            weighted.reshape(S, H * W), idx[:, None], axis=1
        )[:, 0]
        vals = jnp.where(found, vals, 0.0)
        xs = (idx % W).astype(jnp.int32)
        ys = (idx // W).astype(jnp.int32)
        return vals, xs, ys, found

    # ---- dense subminor loop at a fixed scale ----------------------------
    def integrate_at(res, yy, xx):
        return jnp.einsum("n,n->", lin, res[:, yy, xx])

    def dense_subminor(
        conv_res, psf_pad, weight, thr, gain, it0, value0, x0, y0, found0
    ):
        start_abs = jnp.abs(value0)

        def cond(st):
            _res, _comp, it, value, x, y, found, div = st
            ok = found & (jnp.abs(value) > thr) & (it < max_iterations)
            if stop_on_negative:
                ok &= value >= 0.0
            return ok & ~div

        def body(st):
            res, comp, it, value, x, y, found, _ = st
            peak_values = res[:, y, x]
            if fitter is not None:
                v = peak_values.reshape(meta.n_channels, meta.n_polarizations)
                peak_values = fitter.fit_and_evaluate(v, x, y).reshape(-1)
            peak_values = peak_values * gain
            comp = comp.at[:, y, x].add(peak_values)
            if use_pallas:
                from ..ops.pallas.hogbom_step import fused_clean_step

                res, peak_index, peak_cmp = fused_clean_step(
                    res,
                    psf_pad,
                    peak_values,
                    weight,
                    y,
                    x,
                    block_rows=block_rows,
                    allow_negative=allow_negative,
                    integration_mode="linear",
                    chan_coefs=lin_t,
                    pol_coefs=(1.0,),
                    use_weight=True,
                )
                ny = (peak_index // W).astype(jnp.int32)
                nx = (peak_index % W).astype(jnp.int32)
                nfound = peak_cmp > _FLT_MIN
            else:
                shifted = jax.lax.dynamic_slice(
                    psf_pad, (0, H - y, W - x), (N, H, W)
                )
                res = res - shifted * peak_values[:, None, None]
                integ = jnp.einsum("n,nhw->hw", lin, res)
                wgt = integ * weight
                cmp = jnp.abs(wgt) if allow_negative else wgt
                flat_idx = jnp.argmax(cmp.reshape(-1))
                peak_cmp = cmp.reshape(-1)[flat_idx]
                nfound = peak_cmp > _FLT_MIN
                nx = (flat_idx % W).astype(jnp.int32)
                ny = (flat_idx // W).astype(jnp.int32)
            nvalue = integrate_at(res, ny, nx)
            if use_rms:
                nvalue = nvalue * rms_factor[ny, nx]
            div = jnp.where(
                divergence_limit != 0.0,
                nfound & (jnp.abs(nvalue) > start_abs * divergence_limit),
                False,
            )
            return res, comp, it + 1, nvalue, nx, ny, nfound, div

        comp0 = jnp.zeros_like(conv_res)
        init = (conv_res, comp0, it0, value0, x0, y0, found0, jnp.asarray(False))
        res, comp, it, value, x, y, found, div = jax.lax.while_loop(
            cond, body, init
        )
        return res, comp, it, value, found, div

    # ---- thresholds (multiscale_algorithm.cc:286-321) --------------------
    vals0, xs0, ys0, found0 = find_maxima(residual)
    biased0 = jnp.abs(vals0 * bias)
    s0 = jnp.argmax(biased0)  # all scales start active
    initial_peak = biased0[s0]
    m_gain_threshold = jnp.maximum(
        initial_peak * (1.0 - major_loop_gain), major_iteration_threshold
    )
    first_threshold = jnp.maximum(m_gain_threshold, threshold)
    is_final_threshold = threshold > m_gain_threshold
    any_found0 = jnp.any(found0)

    scale_ids = jnp.arange(S)

    def select_scale(vals, active):
        sel = jnp.where(active, jnp.abs(vals * bias), neg_inf)
        return jnp.argmax(sel)

    # Auto-mask / component-list accumulators (the host path's
    # ``_mask_acc``/``_comp_acc``, here carried through the on-device loop;
    # ``SubMinorLoop``'s update hooks, ``subminor_loop.cc:220-246``).
    # Dummies keep the carried-state pytree shape-stable when not tracked.
    mask_acc0 = (
        jnp.zeros((S, H, W), bool)
        if track_masks
        else jnp.zeros((1, 1, 1), bool)
    )
    comp_acc0 = (
        jnp.zeros((S, N, H, W), jnp.float32)
        if track_components
        else jnp.zeros((1, 1, 1, 1), jnp.float32)
    )

    # ---- outer loop -------------------------------------------------------
    def outer_cond(state):
        (res, mod, it, countdown, vals, xs, ys, found, active, ncomp, flux,
         div, nocomp, _mask_acc, _comp_acc) = state
        s = select_scale(vals, active)
        peak_unnorm = vals[s]
        ok = it < max_iterations
        ok &= jnp.abs(peak_unnorm * bias[s]) > first_threshold
        if stop_on_negative:
            ok &= peak_unnorm >= 0.0
        ok &= countdown > 0
        return ok & ~div & ~nocomp & any_found0

    def outer_body(state):
        (res, mod, it, countdown, vals, xs, ys, found, active, ncomp, flux,
         div, _nocomp, mask_acc, comp_acc) = state
        s = select_scale(vals, active)
        biased_peak = jnp.abs(vals[s] * bias[s])
        sub_gain_threshold = biased_peak * (1.0 - sub_loop_gain)
        countdown = countdown - (
            first_threshold > sub_gain_threshold
        ).astype(countdown.dtype)
        first_sub = jnp.maximum(sub_gain_threshold, first_threshold)
        thr_sub = first_sub / bias[s]

        # Scale-convolved residual cube (multiscale_algorithm.cc:345-354).
        kf = jax.lax.dynamic_index_in_dim(kernel_f, s, 0, keepdims=False)
        conv_res = inverse_fft2_real(forward_fft2(res) * kf[None], (H, W))
        tp = jax.lax.dynamic_index_in_dim(twice_psfs, s, 0, keepdims=False)
        tp = jnp.take(tp, psf_idx, axis=0)  # [C,H,W] -> per-plane [N,H,W]
        psf_pad = jnp.pad(
            tp, ((0, 0), (H - H // 2, H // 2 + 8), (W - W // 2, W // 2 + 128))
        )
        weight = valid_stack[s].astype(jnp.float32)
        if use_rms:
            weight = weight * rms_factor

        it_before = it
        _cres, comp, it, value, sub_found, sub_div = dense_subminor(
            conv_res,
            psf_pad,
            weight,
            thr_sub,
            gain_arr[s],
            it,
            vals[s],
            xs[s],
            ys[s],
            found[s],
        )
        nocomp = it == it_before
        div = sub_div | jnp.where(
            divergence_limit != 0.0,
            jnp.abs(value) > initial_peak * divergence_limit,
            False,
        )

        # Residual correction with the single-convolved PSFs + model
        # add-back of the scale-convolved component image
        # (multiscale_algorithm.cc:432-461), sharing one padded forward FFT.
        # Two static padded-size buckets (small scales pay small FFTs, the
        # reference's per-scale sizing, fft_size_calculations.h:39-50).
        def correct_with(corr_bank, kpf_bank, ph, pw, s_local):
            def apply(res, mod, comp):
                comp_p = jnp.pad(
                    comp,
                    (
                        (0, 0),
                        (ph // 2 - H // 2, ph - H - (ph // 2 - H // 2)),
                        (pw // 2 - W // 2, pw - W - (pw // 2 - W // 2)),
                    ),
                )
                comp_f = forward_fft2(comp_p)  # [N, ph, pwf]
                cf = jax.lax.dynamic_index_in_dim(
                    corr_bank, s_local, 0, keepdims=False
                )
                cf = jnp.take(cf, psf_idx, axis=0)  # -> per-plane [N,...]
                corr = inverse_fft2_real(comp_f * cf, (ph, pw))
                kpf = jax.lax.dynamic_index_in_dim(
                    kpf_bank, s_local, 0, keepdims=False
                )
                madd = inverse_fft2_real(comp_f * kpf[None], (ph, pw))
                top = ph // 2 - H // 2
                left = pw // 2 - W // 2
                res2 = res - jax.lax.dynamic_slice(
                    corr, (0, top, left), (N, H, W)
                )
                mod2 = mod + jax.lax.dynamic_slice(
                    madd, (0, top, left), (N, H, W)
                )
                return res2, mod2

            return apply

        small_apply = correct_with(
            corr_small, kpf_small, padded_small[0], padded_small[1], s
        )
        if split >= S:
            res, mod = small_apply(res, mod, comp)
        elif split == 0:
            res, mod = correct_with(
                corr_large, kpf_large, padded_large[0], padded_large[1], s
            )(res, mod, comp)
        else:
            large_apply = correct_with(
                corr_large,
                kpf_large,
                padded_large[0],
                padded_large[1],
                jnp.maximum(s - split, 0),
            )
            res, mod = jax.lax.cond(
                s < split,
                lambda args: small_apply(*args),
                lambda args: large_apply(*args),
                (res, mod, comp),
            )

        ncomp = ncomp.at[s].add(it - it_before)
        flux = flux.at[s].add(
            jnp.sum(comp) * jnp.float32(1.0)
        )
        if track_masks:
            nonzero = jnp.any(comp != 0.0, axis=0)
            row = jax.lax.dynamic_index_in_dim(
                mask_acc, s, 0, keepdims=False
            )
            mask_acc = jax.lax.dynamic_update_index_in_dim(
                mask_acc, row | nonzero, s, 0
            )
        if track_components:
            row = jax.lax.dynamic_index_in_dim(
                comp_acc, s, 0, keepdims=False
            )
            comp_acc = jax.lax.dynamic_update_index_in_dim(
                comp_acc, row + comp, s, 0
            )

        # Scale (de)activation uses the pre-refresh maxima
        # (multiscale_algorithm.cc:636-656) ...
        act_thr = jnp.abs(vals[s]) * (1.0 - minor_loop_gain) * bias[s]
        active = (scale_ids == s) | (jnp.abs(vals * bias) > act_thr)
        # ... then every scale's maxima are refreshed (see the note in
        # multiscale.py::_find_active_scale_convolved_maxima).
        vals, xs, ys, found = find_maxima(res)
        return (
            res, mod, it, countdown, vals, xs, ys, found, active, ncomp,
            flux, div, nocomp, mask_acc, comp_acc,
        )

    init = (
        residual,
        model,
        start_iteration,
        countdown0,
        vals0,
        xs0,
        ys0,
        found0,
        jnp.ones((S,), bool),
        jnp.zeros((S,), jnp.int32),
        jnp.zeros((S,), jnp.float32),
        jnp.asarray(False),
        jnp.asarray(False),
        mask_acc0,
        comp_acc0,
    )
    (res, mod, it, countdown, vals, xs, ys, found, active, ncomp, flux,
     div, nocomp, mask_acc, comp_acc) = jax.lax.while_loop(
        outer_cond, outer_body, init
    )

    s_final = select_scale(vals, active)
    final_biased = vals[s_final] * bias[s_final]
    return FusedMultiscaleResult(
        residual=res,
        model=mod,
        iteration_number=it,
        final_biased_peak=final_biased,
        final_scale=s_final.astype(jnp.int32),
        any_peak_found=any_found0 & jnp.any(found),
        diverging=div,
        no_components=nocomp,
        is_final_threshold=is_final_threshold,
        components_per_scale=ncomp,
        flux_per_scale=flux,
        mask_acc=mask_acc,
        comp_acc=comp_acc,
    )
