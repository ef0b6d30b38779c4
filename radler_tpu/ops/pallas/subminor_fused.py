"""Clark subminor loop fused into a single Pallas TPU kernel.

Round-1 measurements (BASELINE.md "Measured dead ends", 2026-08-19) showed
the sparse subminor loop costs ~600-770 us/iteration and is bound by the
*fixed overhead of the many small sequential XLA kernels* in the
``lax.while_loop`` body — not by the per-iteration PSF gather.  This module
removes that overhead entirely: the whole loop runs inside ONE Pallas
program.  The ``[n_images, K]`` candidate residual/model live in VMEM for
the duration; the only HBM traffic per iteration is a single contiguous DMA
of one row of the pre-built PSF interaction matrix
``mat[c, m, j] = psf[c, ys[j]-ys[m]+H/2, xs[j]-xs[m]+W/2]``
(positions are fixed for a run, so the pairwise response table can be
hoisted — same observation as the reverted XLA-level matrix path, commit
b99729e, which failed only because the dispatch overhead dominated).

Reference semantics: ``cpp/algorithms/subminor_loop.cc:38-117`` (the loop),
``:13-36`` (integrated argmax over the set), ``:91-105`` (PSF values at the
candidate offsets).  Numerics match the XLA path to float32 tolerance
(reduction order inside one iteration is identical; see
``tests/test_subminor_fused.py``).

Spectral fitting: NO_FITTING and POLYNOMIAL modes are supported in-kernel
(the polynomial fit is a constant linear projection per polarization,
``ops/spectral_fitting.py``); other modes fall back to the XLA path.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@partial(jax.jit, static_argnames=("height", "width", "chunk"))
def build_interaction_matrix(
    psfs: jnp.ndarray,  # [C, H, W]
    xs: jnp.ndarray,  # [K]
    ys: jnp.ndarray,  # [K]
    valid: jnp.ndarray,  # [K] bool
    *,
    height: int,
    width: int,
    chunk: int = 512,
) -> jnp.ndarray:
    """``mat[c, m, j] = psf[c, ys[j]-ys[m]+H/2, xs[j]-xs[m]+W/2]`` with
    out-of-bounds and invalid-j entries zeroed — the table of PSF responses
    at every candidate j from a component at candidate m
    (``subminor_loop.cc:91-105`` hoisted out of the loop).  Row m is
    contiguous so the kernel reads one row per iteration with one DMA.

    Built in m-chunks via ``lax.map`` over a flat 1-D take: materializing
    the full [K, K] int32 index/mask planes costs ~4x the matrix itself in
    HBM traffic (measured 12.5 s at K=32k); chunking keeps the index
    intermediates VMEM-resident and only the output hits HBM."""
    k = xs.shape[0]
    psf_flat = psfs.reshape(psfs.shape[0], height * width)  # [C, H*W]
    validf = valid

    def one_chunk(args):
        ys_m, xs_m = args  # [chunk]
        dy = ys[None, :] - ys_m[:, None] + height // 2  # [chunk, K(j)]
        dx = xs[None, :] - xs_m[:, None] + width // 2
        inb = (dy >= 0) & (dy < height) & (dx >= 0) & (dx < width)
        inb &= validf[None, :]
        lin = jnp.clip(dy, 0, height - 1) * width + jnp.clip(
            dx, 0, width - 1
        )
        vals = jnp.take(psf_flat, lin.reshape(-1), axis=1)
        vals = vals.reshape(psfs.shape[0], dy.shape[0], k)
        return jnp.where(inb[None], vals, 0.0)  # [C, chunk, K]

    if k <= chunk:
        return one_chunk((ys, xs))
    while k % chunk != 0:  # capacity buckets are {2^n, 3*2^n} multiples of 128
        chunk //= 2
    n_chunks = k // chunk
    out = jax.lax.map(
        one_chunk,
        (ys.reshape(n_chunks, chunk), xs.reshape(n_chunks, chunk)),
    )  # [n_chunks, C, chunk, K]
    return jnp.transpose(out, (1, 0, 2, 3)).reshape(psfs.shape[0], k, k)


def _loop_kernel(
    scal_f_ref,  # SMEM [4]: threshold, gain, divergence_limit, (pad)
    scal_i_ref,  # SMEM [2]: start_iteration, max_iterations
    res_in,  # VMEM [N, R, 128] (aliased to res_out)
    mod_in,  # VMEM [N, R, 128] (aliased to mod_out)
    rms_ref,  # VMEM [R, 128]
    pen_ref,  # VMEM [R, 128]: 0 where valid else -inf
    mat_hbm,  # HBM [C, K, R, 128]: interaction matrix, row-major
    res_ref,  # VMEM out [N, R, 128]
    mod_ref,  # VMEM out [N, R, 128]
    it_out,  # VMEM out [1, 1] int32
    max_out,  # VMEM out [1, 1] float32
    div_out,  # VMEM out [1, 1] int32
    row_buf,  # VMEM scratch [C, 1, R, 128]
    sem,  # DMA semaphore
    *,
    coef: Tuple[float, ...],  # [N] linear integration coefficients
    proj: Optional[Tuple[Tuple[float, ...], ...]],  # [C, C] or None
    n_channels: int,
    n_polarizations: int,
    rows: int,
    allow_negative: bool,
    stop_on_negative: bool,
    use_rms: bool,
):
    n_images = n_channels * n_polarizations
    threshold = scal_f_ref[0]
    gain = scal_f_ref[1]
    div_limit = scal_f_ref[2]
    start_it = scal_i_ref[0]
    max_it = scal_i_ref[1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    flat = rowi * 128 + lane
    big = jnp.int32(2**30)

    def find_max():
        """``SubMinorModel::GetMaxComponent`` (subminor_loop.cc:13-36):
        the linearly integrated, rms-weighted argmax over the set."""
        s = None
        for i in range(n_images):
            t = res_ref[i] * np.float32(coef[i])
            s = t if s is None else s + t
        if use_rms:
            s = s * rms_ref[...]
        v = jnp.abs(s) if allow_negative else s
        vm = v + pen_ref[...]
        mx = jnp.max(vm)
        idx = jnp.min(jnp.where(vm >= mx, flat, big))
        val = jnp.sum(jnp.where(flat == idx, s, 0.0))
        return idx, val

    m0, v0 = find_max()
    max_at_start = jnp.abs(v0)

    def cond(carry):
        it, m, val, div = carry
        ok = (jnp.abs(val) > threshold) & (it < max_it) & jnp.logical_not(div)
        if stop_on_negative:
            ok &= val >= 0.0
        return ok

    def body(carry):
        it, m, val, _ = carry
        r = m // 128
        lq = m - r * 128
        # Fetch the interaction-matrix row for component m while the scalar
        # work below proceeds (the DMA only depends on m).
        dma = pltpu.make_async_copy(
            mat_hbm.at[:, pl.ds(m, 1)], row_buf, sem
        )
        dma.start()
        onehot = (lane[0:1, :] == lq).astype(jnp.float32)  # [1, 128]
        # component values = residual at m, gain-scaled
        # (subminor_loop.cc:75-83)
        cvs = []
        for i in range(n_images):
            rowv = res_ref[i, pl.ds(r, 1), :]  # [1, 128]
            cvs.append(jnp.sum(rowv * onehot) * gain)
        if proj is not None:
            # Polynomial spectral fit: a constant [C, C] projection applied
            # per polarization (deconvolution_algorithm.cc:29-46).
            fitted = []
            for c in range(n_channels):
                for p in range(n_polarizations):
                    acc = None
                    for c2 in range(n_channels):
                        term = np.float32(proj[c][c2]) * cvs[
                            c2 * n_polarizations + p
                        ]
                        acc = term if acc is None else acc + term
                    fitted.append(acc)
            cvs = fitted
        for i in range(n_images):
            mod_ref[i, pl.ds(r, 1), :] = (
                mod_ref[i, pl.ds(r, 1), :] + cvs[i] * onehot
            )
        dma.wait()
        for i in range(n_images):
            ch = i // n_polarizations
            res_ref[i] = res_ref[i] - row_buf[ch, 0] * cvs[i]
        m2, v2 = find_max()
        div = jnp.logical_and(
            div_limit != 0.0, jnp.abs(v2) > max_at_start * div_limit
        )
        return it + 1, m2, v2, div

    # State planes live in the aliased output refs for the whole loop; only
    # scalars ride the while carry.
    it, m, val, div = jax.lax.while_loop(
        cond, body, (start_it, m0, v0, jnp.bool_(False))
    )
    # Mosaic rejects scalar stores to VMEM; store (1, 1) arrays instead.
    it_out[...] = jnp.reshape(it, (1, 1))
    max_out[...] = jnp.reshape(val, (1, 1))
    div_out[...] = jnp.reshape(jnp.int32(div), (1, 1))


@partial(
    jax.jit,
    static_argnames=(
        "coef",
        "proj",
        "n_channels",
        "n_polarizations",
        "allow_negative",
        "stop_on_negative",
        "use_rms",
        "interpret",
    ),
)
def subminor_loop_fused(
    residual_k: jnp.ndarray,  # [N, K]
    model_k: jnp.ndarray,  # [N, K]
    rms_k: jnp.ndarray,  # [K]
    valid: jnp.ndarray,  # [K] bool
    matrix: jnp.ndarray,  # [C, K, K] interaction matrix (row m contiguous)
    threshold: jnp.ndarray,
    gain: jnp.ndarray,
    start_iteration: jnp.ndarray,
    max_iterations: jnp.ndarray,
    divergence_limit: jnp.ndarray,
    *,
    coef: Tuple[float, ...],
    proj: Optional[Tuple[Tuple[float, ...], ...]],
    n_channels: int,
    n_polarizations: int,
    allow_negative: bool,
    stop_on_negative: bool,
    use_rms: bool,
    interpret: bool = False,
):
    """Run the whole subminor while-loop in one Pallas program.

    Returns ``(res_k, mod_k, iteration, max_value, diverging)`` with the
    same contract as ``models.subminor._subminor_while``.
    """
    n, k = residual_k.shape
    c = matrix.shape[0]
    assert k % 128 == 0, k
    rows = k // 128
    res3 = residual_k.reshape(n, rows, 128)
    mod3 = model_k.reshape(n, rows, 128)
    rms2 = rms_k.reshape(rows, 128)
    pen2 = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32).reshape(
        rows, 128
    )
    mat4 = matrix.reshape(c, k, rows, 128)
    scal_f = jnp.stack(
        [
            threshold.astype(jnp.float32),
            gain.astype(jnp.float32),
            divergence_limit.astype(jnp.float32),
            jnp.float32(0.0),
        ]
    )
    scal_i = jnp.stack(
        [start_iteration.astype(jnp.int32), max_iterations.astype(jnp.int32)]
    )

    kernel = partial(
        _loop_kernel,
        coef=coef,
        proj=proj,
        n_channels=n_channels,
        n_polarizations=n_polarizations,
        rows=rows,
        allow_negative=allow_negative,
        stop_on_negative=stop_on_negative,
        use_rms=use_rms,
    )
    res_out, mod_out, it, max_val, div = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # matrix stays in HBM
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, 1, rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
    )(scal_f, scal_i, res3, mod3, rms2, pen2, mat4)
    return (
        res_out.reshape(n, k),
        mod_out.reshape(n, k),
        it[0, 0],
        max_val[0, 0],
        div[0, 0].astype(jnp.bool_),
    )
