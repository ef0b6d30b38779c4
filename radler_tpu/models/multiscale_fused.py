"""Fully on-device multiscale minor loop with a spectral-domain residual.

The host-orchestrated multiscale path (``multiscale.py``) mirrors the
reference's control flow (``cpp/algorithms/multiscale_algorithm.cc:183-543``):
per outer iteration it dispatches a scale-bank convolution, a sparse subminor
loop, an FFT residual correction, and a maxima refresh — each a separate
device dispatch with host scalar round-trips between them.  On a TPU (and
doubly so on a remote-dispatch backend) those syncs dominate: measured at
2048²×8ch the host path spends ~760 ms per outer iteration of which <10% is
FFT FLOPs.

This module compiles the ENTIRE minor loop — outer scale-selection loop plus
the dense subminor loop at a fixed scale — into one ``lax.while_loop`` so a
major iteration is a single device program with one host transfer at the
end.  Beyond the fusion itself, the loop is restructured around what the MXU
matmul-FFT backend makes cheap and what HBM makes expensive:

* **The residual cube lives in the Fourier domain** (``res_f``, one unified
  7-smooth padded size).  The reference re-transforms the residual twice per
  outer iteration (once for the scale-bank maxima refresh, once per-plane for
  the subminor's scale-convolved cube) and inverse-transforms the correction
  (``CorrectResidualDirty``, ``cpp/algorithms/subminor_loop.cc:195-218``).
  With a spectral residual, the maxima refresh is S inverse transforms of
  ``integ_f x kernel_f`` (no forwards: the integrated spectrum is an einsum
  over ``res_f``), the subminor cube is N inverse transforms, and the
  residual correction is a pure spectral multiply-subtract — the correction's
  inverse transforms disappear entirely.  The image-domain residual inside
  the image region is bit-identical to the trim-and-rezero dance of the
  reference's padded convolution (the correction operator is linear in the
  component image and independent of the residual); only the padding margin
  accumulates the wrapped tails the reference re-zeroes, which is outside
  the searchable windows.
* **Correction spectra are factorized.**  The reference prepares a
  (scale x channel) bank of single-convolved PSFs
  (``ConvolvePsfs``, ``multiscale_algorithm.cc:29-88``); as spectra that is
  S·C padded planes (~5.7 GB at 2048²×8ch — past HBM).  But the spectrum of
  ``kernel_s ⊛ psf_c`` is ``kernel_f[s] * psf_f[c]``, so only S + C planes
  are stored and the product fuses into the spectral subtraction.
* **The component image is tracked in spectral-fit coefficient space.**
  With polynomial fitting the per-iteration fitted peak values live in the
  T-dimensional column space of the design matrix
  (``fitted = design @ (fit_matrix @ values)``, see
  ``ops/spectral_fitting.py``), so the subminor accumulates T·P coefficient
  planes instead of C·P channel planes and the correction's forward
  transforms shrink from N to T·P (2 instead of 8 for a 2-term fit of 8
  channels).
* All per-scale data (kernel spectra, twice-convolved PSF stacks, search
  windows) is precomputed into ``[S, ...]`` stacks indexed with
  ``lax.dynamic_index_in_dim`` — every outer iteration has identical shapes,
  so the program compiles exactly once.
* Two padded-size buckets: the unified ``res_f`` size serves the small
  scales (the reference's per-scale sizing,
  ``cpp/utils/fft_size_calculations.h:39-50``, keeps small-scale FFTs
  cheap); rarely-selected large scales take a ``lax.cond`` branch that
  corrects at the large padded size in image space and re-syncs ``res_f``.

The dense subminor is the Clark-style candidate loop as a *dense masked
clean* over the scale-convolved cube (the candidate-set restriction is an
optimization, not a semantic requirement: both subtract the twice-convolved
PSF and stop at the same threshold — see ``subminor_loop.h:17-50``); on TPU
the dense step is the fused Pallas kernel (``ops/pallas/hogbom_step.py``) in
*linear* integration mode (``SubMinorModel::GetMaxComponent``,
``subminor_loop.cc:13-36``).

The fused path carries per-scale auto-mask and component-list accumulators
on device (flushed once per major iteration); the host-orchestrated path
remains for configurations whose working set exceeds device memory.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..image_set import CubeMeta, linear_integration_coefficients
from ..ops.convolution import (
    forward_fft2,
    forward_fft2_padded,
    inverse_fft2_real,
    inverse_fft2_real_trimmed,
    trim,
    untrim,
)
from ..settings import SpectralFittingMode

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


def _coefficient_basis(fitter, meta: CubeMeta) -> Optional[np.ndarray]:
    """Expansion matrix E [N, T*P] with ``component_plane = E @ coef_planes``
    when the fitter is a linear projection (polynomial mode), else None.

    For polynomial fitting ``fitted = design @ (fit_matrix @ values)`` per
    polarization, so accumulated fitted values live in the column space of
    ``design`` [C, T]; plane ``n = c*P + p`` maps to coefficient plane
    ``k = t*P + p`` with weight ``design[c, t]``.
    """
    if (
        fitter is None
        or not fitter.is_active
        or fitter.mode != SpectralFittingMode.POLYNOMIAL
        or fitter._design is None
    ):
        return None
    C, P = meta.n_channels, meta.n_polarizations
    design = np.asarray(fitter._design, np.float32)  # [C, T]
    T = design.shape[1]
    E = np.zeros((C * P, T * P), np.float32)
    for c in range(C):
        for p in range(P):
            for t in range(T):
                E[c * P + p, t * P + p] = design[c, t]
    return E


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
    docstring): used by the multiscale host path when the fused program's
    working set exceeds device memory.  Returns
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


def _make_mesh_dense_subminor(
    mesh,
    N: int,
    H: int,
    W: int,
    Tn: int,
    lin_t: tuple,
    *,
    E,  # [N, Tn] traced coefficient basis or None
    fit_m,  # [T, C] traced fit matrix (E path) or None
    C: int,
    Pp: int,
    allow_negative: bool,
    stop_on_negative: bool,
    interpret: bool,
):
    """Sharded twin of the fused loop's dense subminor: the per-minor-
    iteration subtract+integrate+argmax runs as the measured Pallas pass on
    each device's shard of the scale-convolved cube, with the reference's
    exchanges as explicit collectives (the same structure as
    ``parallel/mesh.py::_build_mesh_hogbom_program``, in "linear"
    integration mode with coefficient-space component tracking).

    Returns a callable with ``dense_subminor``'s signature; ``conv_res``'s
    final state is shard-local and discarded by the caller (only ``comp``,
    iteration count, and the peak scalars survive), matching the host
    path."""
    from ..ops.pallas.hogbom_step import (
        fused_clean_step,
        fused_subtract_integrate,
    )
    from ..parallel.mesh import _shard_map
    from .generic_clean import _choose_block_rows
    from jax.sharding import PartitionSpec as P

    n_chan = mesh.shape["chan"]
    n_tile = mesh.shape["tile"]
    N_loc = N // n_chan
    H_loc = H // n_tile
    complete = n_chan == 1
    if interpret:
        block_rows = next(
            b for b in (512, 256, 128, 64, 32, 16, 8, H_loc)
            if b <= H_loc and H_loc % b == 0
        )
    else:
        block_rows = _choose_block_rows(H_loc, W, N_loc)
    lin_arr = jnp.asarray(np.asarray(lin_t, np.float32))
    flt_min = jnp.float32(1.1754943508222875e-38)
    plane_axis = "chan" if n_chan > 1 else None
    cube_spec = P(plane_axis, "tile", None)
    comp_spec = P(None, "tile", None)
    psf_spec = P(plane_axis, None, None)
    img_spec = P("tile", None)
    scalar = P()

    def body(cr_l, psf_l, weight_l, rms_l, lin_all, E_r, fit_m_r,
             thr, gain, it0, value0, x0, y0, found0,
             max_iterations, divergence_limit):
        ci = jax.lax.axis_index("chan")
        ti = jax.lax.axis_index("tile")
        r0 = ti * H_loc
        lin_l = jax.lax.dynamic_slice(lin_all, (ci * N_loc,), (N_loc,))

        def values_at(cr_l, y, x):
            y_l = y - r0
            own = (y_l >= 0) & (y_l < H_loc)
            safe = jnp.clip(y_l, 0, H_loc - 1)
            v = jnp.where(own, cr_l[:, safe, x], 0.0)
            v = jax.lax.psum(v, "tile")
            return jax.lax.all_gather(v, "chan", tiled=True)  # [N]

        def image_at(img_l, y, x):
            y_l = y - r0
            own = (y_l >= 0) & (y_l < H_loc)
            safe = jnp.clip(y_l, 0, H_loc - 1)
            return jax.lax.psum(jnp.where(own, img_l[safe, x], 0.0), "tile")

        start_abs = jnp.abs(value0)

        def cond(st):
            _cr, _comp, it, value, x, y, vals, found, div = st
            ok = found & (jnp.abs(value) > thr) & (it < max_iterations)
            if stop_on_negative:
                ok &= value >= 0.0
            return ok & ~div

        def step(st):
            cr_l, comp_l, it, value, x, y, vals, found, _ = st
            if E is not None:
                v = vals.reshape(C, Pp)
                coef = (fit_m_r @ v).reshape(-1)  # [Tn]
                peak_values = jnp.einsum("nk,k->n", E_r, coef) * gain
                add = coef * gain
            else:
                peak_values = vals * gain
                add = peak_values
            y_l = y - r0
            own = (y_l >= 0) & (y_l < H_loc)
            safe = jnp.clip(y_l, 0, H_loc - 1)
            comp_l = comp_l.at[:, safe, x].add(
                jnp.where(own, add, 0.0)
            )
            pv_l = jax.lax.dynamic_slice(
                peak_values, (ci * N_loc,), (N_loc,)
            )
            y_k = y - r0 - H + H_loc
            if complete:
                cr_l, lidx, lmax = fused_clean_step(
                    cr_l,
                    psf_l,
                    pv_l,
                    weight_l,
                    y_k,
                    x,
                    block_rows=block_rows,
                    allow_negative=allow_negative,
                    integration_mode="linear",
                    chan_coefs=lin_t,
                    pol_coefs=(1.0,),
                    use_weight=True,
                    interpret=interpret,
                )
                gidx = lidx.astype(jnp.int32) + r0 * W
            else:
                cr_l, integ_part = fused_subtract_integrate(
                    cr_l,
                    psf_l,
                    pv_l,
                    lin_l,
                    y_k,
                    x,
                    block_rows=block_rows,
                    integration_mode="linear",
                    pol_coefs=(1.0,),
                    n_polarizations=1,
                    interpret=interpret,
                )
                integ = jax.lax.psum(integ_part, "chan")
                wgt = integ * weight_l
                cmp = jnp.abs(wgt) if allow_negative else wgt
                flat = cmp.reshape(-1)
                li = jnp.argmax(flat)
                lmax = flat[li]
                gidx = li.astype(jnp.int32) + r0 * W
            gmax = jax.lax.pmax(jax.lax.pmax(lmax, "tile"), "chan")
            cand = jnp.where(lmax >= gmax, gidx, -1)
            gsel = jax.lax.pmax(jax.lax.pmax(cand, "tile"), "chan")
            ny = (gsel // W).astype(jnp.int32)
            nx = (gsel % W).astype(jnp.int32)
            nfound = gmax > flt_min
            nvals = values_at(cr_l, ny, nx)
            nvalue = jnp.einsum("n,n->", lin_arr, nvals) * image_at(
                rms_l, ny, nx
            )
            div = jnp.where(
                divergence_limit != 0.0,
                nfound & (jnp.abs(nvalue) > start_abs * divergence_limit),
                False,
            )
            return (cr_l, comp_l, it + 1, nvalue, nx, ny, nvals, nfound,
                    div)

        vals0 = values_at(cr_l, y0, x0)
        comp0 = jnp.zeros((Tn, H_loc, W), jnp.float32)
        init = (cr_l, comp0, it0, value0, x0, y0, vals0, found0,
                jnp.asarray(False))
        cr_l, comp_l, it, value, x, y, vals, found, div = (
            jax.lax.while_loop(cond, step, init)
        )
        return comp_l, it, value, found, div

    sharded = _shard_map(
        body,
        mesh,
        in_specs=(
            cube_spec, psf_spec, img_spec, img_spec, scalar, scalar,
            scalar, scalar, scalar, scalar, scalar, scalar, scalar, scalar,
            scalar, scalar,
        ),
        out_specs=(comp_spec, scalar, scalar, scalar, scalar),
    )
    E_arg = E if E is not None else jnp.zeros((1, 1), jnp.float32)
    fit_arg = fit_m if fit_m is not None else jnp.zeros((1, 1), jnp.float32)

    def run(conv_res, psf_pad, weight, rms_l, thr, gain, it0, value0,
            x0, y0, found0, max_iterations, divergence_limit):
        comp, it, value, found, div = sharded(
            conv_res, psf_pad, weight, rms_l, lin_arr, E_arg, fit_arg,
            thr, gain, it0, value0, x0, y0, found0,
            max_iterations, divergence_limit,
        )
        return comp, it, value, found, div

    return run


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
        "mesh",
        "mesh_interpret",
    ),
)
def fused_multiscale_minor_loop(
    residual: jnp.ndarray,  # [N, H, W]
    model: jnp.ndarray,  # [N, H, W]
    kernel_f: jnp.ndarray,  # [S, PHa, ...] scale-kernel spectra @ padded_small
    twice_psfs: jnp.ndarray,  # [S, C, H, W] twice-convolved per-channel PSFs
    psf_f: jnp.ndarray,  # [C, PHa, ...] single-PSF spectra @ padded_small
    kernel_f_large: jnp.ndarray,  # [S-split, PHb, ...] (1-row dummy if unused)
    psf_f_large: jnp.ndarray,  # [C, PHb, ...] (1-row dummy if unused)
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
    forced_terms: jnp.ndarray = None,  # [T-1, H, W] (FORCED fit) or dummy
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
    mesh=None,
    mesh_interpret: bool = False,
) -> FusedMultiscaleResult:
    N, H, W = residual.shape
    S = kernel_f.shape[0]
    Ph, Pw = padded_small
    PhL, PwL = padded_large
    lin_np = linear_integration_coefficients(meta)
    lin = jnp.asarray(lin_np)
    lin_t = tuple(float(v) for v in lin_np)
    psf_idx = jnp.asarray(meta.psf_indices)
    neg_inf = jnp.float32(-jnp.inf)

    # Coefficient-space component tracking (see module docstring).
    E_np = _coefficient_basis(fitter, meta)
    if E_np is not None:
        E = jnp.asarray(E_np)  # [N, Tn]
        Tn = E_np.shape[1]
        fit_m = jnp.asarray(fitter._fit_matrix, jnp.float32)  # [T, C]
        n_terms = fit_m.shape[0]

        def expand_planes(planes):  # [Tn, ...] -> [N, ...]
            return jnp.einsum("nk,k...->n...", E.astype(planes.dtype), planes)

    else:
        E = None
        Tn = N

        def expand_planes(planes):
            return planes

    # Mesh-partitioned dense subminor (shard_map + the measured Pallas
    # pass); the caller gates eligibility (plane/row divisibility and a
    # linear-projection or absent fitter).
    mesh_subminor = None
    if mesh is not None:
        mesh_subminor = _make_mesh_dense_subminor(
            mesh,
            N,
            H,
            W,
            Tn,
            lin_t,
            E=E,
            fit_m=fit_m if E is not None else None,
            C=meta.n_channels,
            Pp=meta.n_polarizations,
            allow_negative=allow_negative,
            stop_on_negative=stop_on_negative,
            interpret=mesh_interpret,
        )

    # The residual cube in the Fourier domain at the unified padded size.
    res_f = forward_fft2_padded(residual, (Ph, Pw))  # [N, Ph, Pwf]

    # ---- maxima over all scales (FindActiveScaleConvolvedMaxima) --------
    # The scale-bank convolution runs on the padded canvas: no forward
    # transform (the integrated spectrum is a linear combination of res_f),
    # S inverse transforms, trim.  The padding margin carries the wrapped
    # correction tails the reference re-zeroes; the searchable windows
    # exclude the affected border ring (multiscale_algorithm.cc:597-603).
    # The maxima refresh is a SEARCH (its outputs pick a scale and a start
    # pixel; the subminor re-derives exact values from conv_res), so it CAN
    # run at native-bf16 matmul precision — measured back-to-back at
    # 2048²×8ch: 4.8 s vs 6.5 s warm (+35%) — but the ~1e-2 peak errors
    # mis-rank near ties and the end state after 600 iterations degrades
    # (ch0 rms 1.6825 vs the ground-truth-verified 1.6363).  Exact (bf16x3)
    # stays the default; RADLER_TPU_MS_MAXIMA_PRECISION=fast opts into the
    # throughput trade for workloads that iterate to a threshold anyway.
    import os as _os

    _maxima_prec = (
        "fast"
        if _os.environ.get("RADLER_TPU_MS_MAXIMA_PRECISION", "").lower()
        == "fast"
        else None
    )

    def find_maxima(res_f):
        integ_f = jnp.einsum("n,nhw->hw", lin, res_f)
        conv = inverse_fft2_real_trimmed(
            integ_f[None] * kernel_f, (Ph, Pw), (H, W),
            precision=_maxima_prec,
        )  # [S, H, W]
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
            vals = res[:, y, x]
            if E is not None:
                v = vals.reshape(meta.n_channels, meta.n_polarizations)
                coef = fit_m @ v  # [T, P]
                peak_values = (
                    jnp.einsum("nk,k->n", E, coef.reshape(-1)) * gain
                )
                comp = comp.at[:, y, x].add(coef.reshape(-1) * gain)
            else:
                peak_values = vals
                if fitter is not None:
                    v = vals.reshape(meta.n_channels, meta.n_polarizations)
                    tv = (
                        forced_terms[:, y, x]
                        if (
                            fitter.mode == SpectralFittingMode.FORCED_TERMS
                            and forced_terms is not None
                        )
                        else None
                    )
                    peak_values = fitter.fit_and_evaluate(
                        v, x, y, forced_terms=tv
                    ).reshape(-1)
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

        comp0 = jnp.zeros((Tn, H, W), jnp.float32)
        init = (conv_res, comp0, it0, value0, x0, y0, found0, jnp.asarray(False))
        res, comp, it, value, x, y, found, div = jax.lax.while_loop(
            cond, body, init
        )
        return res, comp, it, value, found, div

    # ---- thresholds (multiscale_algorithm.cc:286-321) --------------------
    vals0, xs0, ys0, found0 = find_maxima(res_f)
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

    # ---- residual correction -------------------------------------------
    # Small-bucket scales: pure spectral subtraction at the unified size
    # (the spectrum of kernel_s ⊛ psf_c is kernel_f[s] * psf_f[c]).
    def small_correct(res_f, mod, comp, s):
        kf = jax.lax.dynamic_index_in_dim(kernel_f, s, 0, keepdims=False)
        comp_f = forward_fft2_padded(comp, (Ph, Pw))  # [Tn, ...]
        madd = inverse_fft2_real_trimmed(comp_f * kf[None], (Ph, Pw), (H, W))
        mod = mod + expand_planes(madd)
        comp_fn = expand_planes(comp_f)  # [N, ...]
        cfac = jnp.take(psf_f, psf_idx, axis=0)  # per-plane PSF spectra
        res_f = res_f - comp_fn * cfac * kf[None]
        return res_f, mod

    # Large-bucket scales (rarely selected): image-space correction at the
    # large padded size, then re-sync the spectral residual.
    def large_correct(res_f, mod, comp, s_local):
        kfL = jax.lax.dynamic_index_in_dim(
            kernel_f_large, s_local, 0, keepdims=False
        )
        comp_fL = forward_fft2_padded(comp, (PhL, PwL))  # [Tn, ...]
        madd = inverse_fft2_real_trimmed(
            comp_fL * kfL[None], (PhL, PwL), (H, W)
        )
        mod = mod + expand_planes(madd)
        comp_fLn = expand_planes(comp_fL)
        cfacL = jnp.take(psf_f_large, psf_idx, axis=0)
        delta = inverse_fft2_real_trimmed(
            comp_fLn * cfacL * kfL[None], (PhL, PwL), (H, W)
        )  # [N, H, W]
        res_f = res_f - forward_fft2_padded(delta, (Ph, Pw))
        return res_f, mod

    # ---- outer loop -------------------------------------------------------
    def outer_cond(state):
        (res_f, mod, it, countdown, vals, xs, ys, found, active, ncomp, flux,
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
        (res_f, mod, it, countdown, vals, xs, ys, found, active, ncomp, flux,
         div, _nocomp, mask_acc, comp_acc) = state
        s = select_scale(vals, active)
        biased_peak = jnp.abs(vals[s] * bias[s])
        sub_gain_threshold = biased_peak * (1.0 - sub_loop_gain)
        countdown = countdown - (
            first_threshold > sub_gain_threshold
        ).astype(countdown.dtype)
        first_sub = jnp.maximum(sub_gain_threshold, first_threshold)
        thr_sub = first_sub / bias[s]

        # Scale-convolved residual cube (multiscale_algorithm.cc:345-354):
        # N inverse transforms of res_f x kernel_f[s], no forwards.
        kf = jax.lax.dynamic_index_in_dim(kernel_f, s, 0, keepdims=False)
        conv_res = inverse_fft2_real_trimmed(
            res_f * kf[None], (Ph, Pw), (H, W)
        )
        tp = jax.lax.dynamic_index_in_dim(twice_psfs, s, 0, keepdims=False)
        tp = jnp.take(tp, psf_idx, axis=0)  # [C,H,W] -> per-plane [N,H,W]
        psf_pad = jnp.pad(
            tp, ((0, 0), (H - H // 2, H // 2 + 8), (W - W // 2, W // 2 + 128))
        )
        weight = valid_stack[s].astype(jnp.float32)
        if use_rms:
            weight = weight * rms_factor

        it_before = it
        if mesh_subminor is not None:
            comp, it, value, sub_found, sub_div = mesh_subminor(
                conv_res,
                psf_pad,
                weight,
                rms_factor if use_rms else jnp.ones((H, W), jnp.float32),
                thr_sub,
                gain_arr[s],
                it,
                vals[s],
                xs[s],
                ys[s],
                found[s],
                max_iterations,
                divergence_limit,
            )
        else:
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

        if split >= S:
            res_f, mod = small_correct(res_f, mod, comp, s)
        elif split == 0:
            res_f, mod = large_correct(res_f, mod, comp, s)
        else:
            res_f, mod = jax.lax.cond(
                s < split,
                lambda args: small_correct(*args, s),
                lambda args: large_correct(*args, jnp.maximum(s - split, 0)),
                (res_f, mod, comp),
            )

        ncomp = ncomp.at[s].add(it - it_before)
        if E is not None:
            flux_add = jnp.sum(E @ jnp.sum(comp, axis=(1, 2)))
        else:
            flux_add = jnp.sum(comp)
        flux = flux.at[s].add(flux_add)
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
                comp_acc, row + expand_planes(comp), s, 0
            )

        # Scale (de)activation uses the pre-refresh maxima
        # (multiscale_algorithm.cc:636-656) ...
        act_thr = jnp.abs(vals[s]) * (1.0 - minor_loop_gain) * bias[s]
        active = (scale_ids == s) | (jnp.abs(vals * bias) > act_thr)
        # ... then every scale's maxima are refreshed (see the note in
        # multiscale.py::_find_active_scale_convolved_maxima).
        vals, xs, ys, found = find_maxima(res_f)
        return (
            res_f, mod, it, countdown, vals, xs, ys, found, active, ncomp,
            flux, div, nocomp, mask_acc, comp_acc,
        )

    init = (
        res_f,
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
    (res_f, mod, it, countdown, vals, xs, ys, found, active, ncomp, flux,
     div, nocomp, mask_acc, comp_acc) = jax.lax.while_loop(
        outer_cond, outer_body, init
    )

    res_out = inverse_fft2_real_trimmed(res_f, (Ph, Pw), (H, W)).astype(
        residual.dtype
    )
    s_final = select_scale(vals, active)
    final_biased = vals[s_final] * bias[s_final]
    return FusedMultiscaleResult(
        residual=res_out,
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
