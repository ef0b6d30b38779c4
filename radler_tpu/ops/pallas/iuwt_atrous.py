"""Fused à-trous IUWT decomposition as a Pallas TPU kernel.

``ops/iuwt.py::decompose`` runs ~4 separable axis passes per scale as XLA
ops — dozens of full-image HBM round trips at 4096².  This kernel fuses the
LOW scales (s < ``n_lo``) into a single streamed pass: each grid step DMAs
one halo'd image block into VMEM, runs the whole dilated 5-tap convolution
cascade on-chip (VPU), and writes the ``n_lo`` coefficient planes plus the
next smoothed image once.  High scales (dilation 2^s − 1 grows the halo
past what VMEM blocking tolerates) stay on the XLA path — the scale-split
design from BASELINE.md round-4 headroom notes.

Reference semantics: ``iuwt_decomposition.h:243-261`` (B3-spline taps
[1,4,6,4,1]/16 at spacing 2^scale − 1, zero boundary), and
``iuwt_decomposition.h:100-119`` (w_s = i0 − C(C(i0)), carry i1).  The
zero boundary applies at EVERY convolution — the carry is zeroed outside
the image region between stages (the in-kernel indicator mask), exactly
like the reference's per-stage dropped taps.

Within a block the shifts use wrap-around rolls: rolled-in garbage lands
strictly outside the remaining dependency cone of the centered output
window (the halo equals the cascade's total reach), so the emitted values
are exact — verified against ``ops/iuwt.decompose`` to f32 ulp.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_H0 = np.float32(6.0 / 16.0)
_H1 = np.float32(4.0 / 16.0)
_H2 = np.float32(1.0 / 16.0)


def cascade_reach(n_lo: int) -> int:
    """Total tap reach (per side, per axis) of scales 0..n_lo-1.

    Emitting w_s needs the carried chain (one convolution per earlier
    scale, reach 2·d_k each) plus TWO convolutions at this scale's own
    dilation (4·d_s); the deepest requirement over all emitted planes sets
    the halo (n_lo=5 → 176)."""
    reach = 0
    carried = 0
    for s in range(n_lo):
        d = (1 << (s + 1)) - 1
        reach = max(reach, carried + 4 * d)
        carried += 2 * d
    return reach


def _roll(x, shift: int, axis: int):
    """Static-shift wrap-around roll (Mosaic lowers to a rotate)."""
    if shift == 0:
        return x
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _conv_axis_block(x, dist: int, axis: int):
    """5-tap dilated B3 filter along ``axis`` with wrap-around boundary
    (valid inside the shrinking dependency cone)."""
    return (
        _H0 * x
        + _H1 * (_roll(x, dist, axis) + _roll(x, -dist, axis))
        + _H2 * (_roll(x, 2 * dist, axis) + _roll(x, -2 * dist, axis))
    )


def _atrous_kernel(
    img_hbm,  # HBM [Hp, Wp] pre-padded image
    out_w_ref,  # VMEM [n_lo, Bh, Bw] coefficient planes
    out_smooth_ref,  # VMEM [Bh, Bw] carry into scale n_lo
    buf,  # VMEM [2, Bh + 2*Rr, Bw + 2*Rc] double-buffered input blocks
    sem,
    *,
    n_lo: int,
    block_h: int,
    block_w: int,
    rr: int,
    rc: int,
    grid_w: int,
    image_h: int,
    image_w: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    step = i * grid_w + j

    def dma(slot, st):
        bi = st // grid_w
        bj = st % grid_w
        return pltpu.make_async_copy(
            img_hbm.at[
                pl.ds(bi * block_h, block_h + 2 * rr),
                pl.ds(bj * block_w, block_w + 2 * rc),
            ],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(step == 0)
    def _():
        dma(0, 0).start()

    @pl.when(step + 1 < pl.num_programs(0) * pl.num_programs(1))
    def _():
        dma((step + 1) % 2, step + 1).start()

    dma(step % 2, step).wait()
    cur = buf[step % 2]

    # Zero-boundary at EVERY stage (iuwt_decomposition.h:199-211: taps
    # outside the image are dropped per convolution, i.e. the carry is
    # zero outside the image region).  The mask is this block's window of
    # the global image indicator; it also kills wrapped-in garbage beyond
    # the image bounds.
    bh_t, bw_t = block_h + 2 * rr, block_w + 2 * rc
    rows_p = jax.lax.broadcasted_iota(jnp.int32, (bh_t, bw_t), 0) + (
        i * block_h
    )
    cols_p = jax.lax.broadcasted_iota(jnp.int32, (bh_t, bw_t), 1) + (
        j * block_w
    )
    mask = (
        (rows_p >= rr)
        & (rows_p < rr + image_h)
        & (cols_p >= rc)
        & (cols_p < rc + image_w)
    ).astype(jnp.float32)

    for s in range(n_lo):
        d = (1 << (s + 1)) - 1
        i1 = _conv_axis_block(_conv_axis_block(cur, d, 1), d, 0) * mask
        i2 = _conv_axis_block(_conv_axis_block(i1, d, 1), d, 0)
        out_w_ref[s] = (cur - i2)[rr : rr + block_h, rc : rc + block_w]
        cur = i1
    out_smooth_ref[...] = cur[rr : rr + block_h, rc : rc + block_w]


@partial(jax.jit, static_argnames=("n_lo", "block_h", "block_w", "interpret"))
def atrous_decompose_lo(
    image: jnp.ndarray,  # [H, W] float32
    n_lo: int,
    *,
    block_h: int = 256,
    block_w: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused low-scale decomposition: returns ``(w [n_lo, H, W],
    smooth [H, W])`` where ``smooth`` is the input for scale ``n_lo``
    (identical to the XLA path's carry)."""
    H, W = image.shape
    reach = cascade_reach(n_lo)
    rr = -(-reach // 8) * 8  # row halo, 8-aligned
    rc = -(-reach // 128) * 128  # col halo, lane-aligned
    grid_h = -(-H // block_h)
    grid_w = -(-W // block_w)
    Hp = grid_h * block_h + 2 * rr
    Wp = grid_w * block_w + 2 * rc
    padded = jnp.zeros((Hp, Wp), jnp.float32)
    padded = jax.lax.dynamic_update_slice(padded, image, (rr, rc))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(grid_h, grid_w),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(
                (n_lo, block_h, block_w),
                lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_h, block_w),
                lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM(
                (2, block_h + 2 * rr, block_w + 2 * rc), jnp.float32
            ),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = partial(
        _atrous_kernel,
        n_lo=n_lo,
        block_h=block_h,
        block_w=block_w,
        rr=rr,
        rc=rc,
        grid_w=grid_w,
        image_h=H,
        image_w=W,
    )
    w, smooth = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (n_lo, grid_h * block_h, grid_w * block_w), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (grid_h * block_h, grid_w * block_w), jnp.float32
            ),
        ],
        interpret=interpret,
    )(padded)
    return w[:, :H, :W], smooth[:H, :W]
