"""Fused Högbom clean step as a Pallas TPU kernel.

The dense minor-loop body — shifted-PSF subtraction, joined-channel
integration, and masked peak argmax — normally costs ~4-5 HBM passes as
separate XLA ops.  This kernel fuses them into a single pass: each grid step
streams one row-block of the residual cube through VMEM, DMAs the matching
(shifted) PSF row-block from the zero-padded PSF in HBM, subtracts, reduces
the block's weighted peak, and writes the block back — ~3 HBM touches total,
the speed-of-light for this update.

This is the TPU equivalent of the reference's AVX kernels
(``cpp/algorithms/simple_clean.cc:137-188`` PSF subtraction and
``cpp/math/peak_finder.cc:133-265`` argmax), fused.

The shifted PSF read uses the identity
``shifted[p] = psf_padded[p - (x, y) + (W, H)]`` where ``psf_padded`` is the
PSF embedded centered in a ``[2H, 2W]`` zero canvas, so clipping at the image
edge (``simple_clean.cc:61-96`` semantics) falls out of the padding.

Integration coefficients are baked into the kernel as compile-time constants
(they are fixed for a run); the per-component values arrive as scalar
prefetch so no vector-scalar ops hit the Mosaic lowering.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _step_kernel(
    # scalar prefetch
    peak_ref,  # SMEM [2]: (y, x)
    values_ref,  # SMEM [N]: gain-scaled component values (float32)
    # inputs
    residual_ref,  # VMEM [N, Bh, W] block
    weight_ref,  # VMEM [Bh, W] peak-search weight block
    psf_hbm,  # HBM [N, 2H, 2W] padded PSF per image plane
    # outputs
    out_res_ref,  # VMEM [N, Bh, W]
    out_max_ref,  # VMEM [1, 1] global max (comparison value)
    out_idx_ref,  # VMEM [1, 1] global flat arg index
    # scratch
    psf_vmem,  # VMEM [2, N, Bh+8, W+128] double-buffered PSF blocks
    sem,  # DMA semaphores [2]
    run_max_ref,  # SMEM [1, 1] running max across grid steps
    run_idx_ref,  # SMEM [1, 1] running argmax
    *,
    chan_coefs: Tuple[float, ...],
    pol_coefs: Tuple[float, ...],
    block_rows: int,
    width: int,
    height: int,
    allow_negative: bool,
    use_weight: bool,
    integration_mode: str,  # "signed" | "normal" | "squared" | "linear"
):
    n_channels = len(chan_coefs)
    n_polarizations = len(pol_coefs)
    i = pl.program_id(0)
    y = peak_ref[0]
    x = peak_ref[1]

    # Shifted-PSF block: rows [H - y + i*Bh, ...), cols [W - x, W - x + W).
    # HBM slices must start on (8, 128) tile boundaries, so fetch the aligned
    # superset and rotate the sub-tile offset away in VMEM (tpu dynamic
    # rotate); the padded PSF has 8 extra rows / 128 extra cols at the end.
    col_start = width - x
    col_off = jax.lax.rem(col_start, 128)
    col_al = pl.multiple_of(jax.lax.div(col_start, 128) * 128, 128)

    def psf_dma(slot, block_index):
        row_start = height - y + block_index * block_rows
        row_al = pl.multiple_of(jax.lax.div(row_start, 8) * 8, 8)
        return pltpu.make_async_copy(
            psf_hbm.at[
                :,
                pl.ds(row_al, block_rows + 8),
                pl.ds(col_al, width + 128),
            ],
            psf_vmem.at[slot],
            sem.at[slot],
        )

    # Double buffering: the first step issues its own fetch; every step
    # prefetches the next block's PSF while computing on the current one.
    @pl.when(i == 0)
    def _():
        psf_dma(0, 0).start()

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        psf_dma((i + 1) % 2, i + 1).start()

    psf_dma(i % 2, i).wait()
    slot = i % 2

    row_start = height - y + i * block_rows
    row_off = jax.lax.rem(row_start, 8)

    if integration_mode == "signed":
        n_images = 1
    elif integration_mode == "linear":
        # chan_coefs carries one linear coefficient per cube plane
        # (``SubMinorModel::GetMaxComponent``, subminor_loop.cc:13-36).
        n_images = n_channels
    else:
        n_images = n_channels * n_polarizations
    # Rotate the sub-tile offsets away.  tpu.dynamic_rotate requires a
    # non-negative shift; rolling left by k equals rolling right by
    # (size - k) mod size.
    shift_r = jax.lax.rem(block_rows + 8 - row_off, block_rows + 8)
    shift_c = jax.lax.rem(width + 128 - col_off, width + 128)
    planes = []
    for plane in range(n_images):
        value = values_ref[plane]
        psf_block = pltpu.roll(psf_vmem[slot, plane], shift_r, 0)
        psf_block = pltpu.roll(psf_block, shift_c, 1)
        psf_block = psf_block[:block_rows, :width]
        new_plane = residual_ref[plane] - value * psf_block
        out_res_ref[plane] = new_plane
        planes.append(new_plane)

    # Joined integration (image_set.cc:309-421): the reference's square
    # integration takes a per-channel sqrt over linked polarizations, then a
    # channel-weighted average ("normal"), or one global sqrt ("squared"
    # joins), or the raw plane for a single image ("signed").
    if integration_mode == "signed":
        integ = planes[0] * np.float32(chan_coefs[0])
    elif integration_mode == "linear":
        # Weighted linear sum over all planes (image_set.cc:423-462), the
        # integration the Clark subminor loop peaks on.
        integ = None
        for p in range(n_images):
            term = planes[p] * np.float32(chan_coefs[p])
            integ = term if integ is None else integ + term
    elif integration_mode == "normal":
        integ = None
        for c in range(n_channels):
            if n_polarizations == 1:
                # Single polarization: the raw (signed) per-channel plane
                # (image_set.cc:349-352), not sqrt(x^2).
                per_chan = planes[c]
            else:
                sq = None
                for p in range(n_polarizations):
                    plane = planes[c * n_polarizations + p]
                    term = plane * plane * np.float32(pol_coefs[p])
                    sq = term if sq is None else sq + term
                per_chan = jnp.sqrt(jnp.maximum(sq, 0.0))
            term = per_chan * np.float32(chan_coefs[c])
            integ = term if integ is None else integ + term
    else:  # squared joins
        sq = None
        for c in range(n_channels):
            for p in range(n_polarizations):
                plane = planes[c * n_polarizations + p]
                term = plane * plane * np.float32(chan_coefs[c] * pol_coefs[p])
                sq = term if sq is None else sq + term
        integ = jnp.sqrt(jnp.maximum(sq, 0.0))

    weighted = integ * weight_ref[...] if use_weight else integ
    cmp = jnp.abs(weighted) if allow_negative else weighted
    # Two-pass argmax: block max, then the smallest flat index attaining it.
    # Mosaic lowers jnp.argmax as a slow serial scan (~250 us/iter at 4096^2,
    # measured); max + iota-select-min costs nothing over the plain max.
    block_max = jnp.max(cmp)
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, width), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block_rows, width), 1)
    flat_ids = rows * width + cols
    big = jnp.int32(2**30)
    block_idx = jnp.min(
        jnp.where(cmp >= block_max, flat_ids, big)
    ) + i * (block_rows * width)

    # Grid steps run sequentially on a TPU core, so SMEM scratch carries the
    # running reduction across blocks; the final step publishes it.
    @pl.when(i == 0)
    def _():
        run_max_ref[0, 0] = block_max
        run_idx_ref[0, 0] = block_idx

    @pl.when((i > 0) & (block_max > run_max_ref[0, 0]))
    def _():
        run_max_ref[0, 0] = block_max
        run_idx_ref[0, 0] = block_idx

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_max_ref[...] = run_max_ref[0, 0][None, None]
        out_idx_ref[...] = run_idx_ref[0, 0][None, None]


def integration_coefficients(meta) -> Tuple[str, np.ndarray, np.ndarray]:
    """(mode, chan_coefs, pol_coefs) reproducing the reference's square
    integration (``image_set.cc:309-421``) inside the kernel."""
    C, P = meta.n_channels, meta.n_polarizations
    w = np.asarray(meta.weights, dtype=np.float64)
    wsum = w[w != 0].sum()
    linked = np.asarray(meta.linked, np.float64)
    if meta.n_images == 1:
        return "signed", np.ones(1, np.float32), np.ones(1, np.float32)
    if meta.squared_joins:
        chan = w * (meta.polarization_norm_factor / wsum) if wsum > 0 else w * 0
        return "squared", chan.astype(np.float32), linked.astype(np.float32)
    if C == 1:
        chan = np.asarray([np.sqrt(meta.polarization_norm_factor)], np.float64)
    else:
        chan = (
            w * (np.sqrt(meta.polarization_norm_factor) / wsum)
            if wsum > 0
            else w * 0
        )
    return "normal", chan.astype(np.float32), linked.astype(np.float32)


@partial(
    jax.jit,
    static_argnames=(
        "block_rows",
        "allow_negative",
        "integration_mode",
        "chan_coefs",
        "pol_coefs",
        "use_weight",
        "interpret",
    ),
)
def fused_clean_step(
    residual: jnp.ndarray,  # [N, H, W]
    psf_padded: jnp.ndarray,  # [N, 2H, 2W] per-plane padded PSFs
    values: jnp.ndarray,  # [N] gain-scaled component values
    weight: jnp.ndarray,  # [H, W] peak-search weight (mask x border x rms)
    peak_y: jnp.ndarray,
    peak_x: jnp.ndarray,
    *,
    block_rows: int = 256,
    allow_negative: bool = True,
    integration_mode: str = "signed",
    chan_coefs: Tuple[float, ...] = (1.0,),
    pol_coefs: Tuple[float, ...] = (1.0,),
    use_weight: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused clean step.  Returns (new_residual, peak_index, peak_cmp).

    When ``use_weight`` is False (no mask, no border, no RMS factor) the
    weight array is never read, saving an HBM pass per iteration.
    """
    n, height, width = residual.shape
    if not use_weight:
        weight = jnp.zeros((8, 128), jnp.float32)
    assert height % block_rows == 0, (height, block_rows)
    n_blocks = height // block_rows
    peak = jnp.stack([peak_y, peak_x]).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (n, block_rows, width),
                lambda i, s, v: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_rows, width),
                lambda i, s, v: (i, 0),
                memory_space=pltpu.VMEM,
            )
            if use_weight
            else pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # psf stays in HBM
        ],
        out_specs=[
            pl.BlockSpec(
                (n, block_rows, width),
                lambda i, s, v: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1), lambda i, s, v: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1), lambda i, s, v: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, n, block_rows + 8, width + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
    )
    kernel = partial(
        _step_kernel,
        chan_coefs=chan_coefs,
        pol_coefs=pol_coefs,
        block_rows=block_rows,
        width=width,
        height=height,
        allow_negative=allow_negative,
        use_weight=use_weight,
        integration_mode=integration_mode,
    )
    new_res, global_max, global_idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, height, width), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        # Alias the residual into the output: halves the VMEM pipeline
        # footprint and measured 594 -> 382 us/iter at 4096^2 (the input is
        # consumed — callers thread the new residual through loop carries).
        input_output_aliases={2: 0},
        interpret=interpret,
    )(peak, values, residual, weight, psf_padded)
    return new_res, global_idx[0, 0], global_max[0, 0]


def _subtract_integrate_kernel(
    # scalar prefetch
    peak_ref,  # SMEM [2]: (y, x) in the LOCAL row frame (may be negative)
    values_ref,  # SMEM [N_loc]: gain-scaled component values
    coefs_ref,  # SMEM [N_loc]: this shard's channel coefficients
    # inputs
    residual_ref,  # VMEM [N_loc, Bh, W] block
    psf_hbm,  # HBM [N_loc, 2H+8, 2W+128] padded PSF per local plane
    # outputs
    out_res_ref,  # VMEM [N_loc, Bh, W]
    out_integ_ref,  # VMEM [Bh, W] additive integration part
    # scratch
    psf_vmem,
    sem,
    *,
    n_polarizations: int,
    pol_coefs: Tuple[float, ...],
    block_rows: int,
    width: int,
    height: int,
    integration_mode: str,  # "signed" | "normal" | "squared" | "linear"
):
    """Shard-local fused clean step: subtract the shifted PSF from the local
    planes and emit the shard's ADDITIVE part of the joined integration
    (summed across channel shards with a psum outside; "squared" mode emits
    the pre-sqrt sum).  The peak (y, x) is given in this shard's local row
    frame — negative / beyond-block values simply select the matching rows
    of the padded PSF, which covers every global offset
    (``simple_clean.cc:61-96`` clipping via the zero padding).

    ``height`` is the LOCAL row count of the shard's residual; the caller
    adjusts the peak row so that ``height - y_local`` lands on the right
    global PSF row (see ``parallel/mesh.py::mesh_hogbom_loop``).
    """
    n_images = residual_ref.shape[0]
    i = pl.program_id(0)
    y = peak_ref[0]
    x = peak_ref[1]

    col_start = width - x
    col_off = jax.lax.rem(col_start, 128)
    col_al = pl.multiple_of(jax.lax.div(col_start, 128) * 128, 128)

    def psf_dma(slot, block_index):
        row_start = height - y + block_index * block_rows
        row_al = pl.multiple_of(jax.lax.div(row_start, 8) * 8, 8)
        return pltpu.make_async_copy(
            psf_hbm.at[
                :,
                pl.ds(row_al, block_rows + 8),
                pl.ds(col_al, width + 128),
            ],
            psf_vmem.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        psf_dma(0, 0).start()

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        psf_dma((i + 1) % 2, i + 1).start()

    psf_dma(i % 2, i).wait()
    slot = i % 2

    row_start = height - y + i * block_rows
    row_off = jax.lax.rem(row_start, 8)
    shift_r = jax.lax.rem(block_rows + 8 - row_off, block_rows + 8)
    shift_c = jax.lax.rem(width + 128 - col_off, width + 128)
    planes = []
    for plane in range(n_images):
        value = values_ref[plane]
        psf_block = pltpu.roll(psf_vmem[slot, plane], shift_r, 0)
        psf_block = pltpu.roll(psf_block, shift_c, 1)
        psf_block = psf_block[:block_rows, :width]
        new_plane = residual_ref[plane] - value * psf_block
        out_res_ref[plane] = new_plane
        planes.append(new_plane)

    if integration_mode in ("signed", "linear"):
        integ = None
        for p in range(n_images):
            term = planes[p] * coefs_ref[p]
            integ = term if integ is None else integ + term
    elif integration_mode == "normal":
        n_chan_local = n_images // n_polarizations
        integ = None
        for c in range(n_chan_local):
            if n_polarizations == 1:
                per_chan = planes[c]
            else:
                sq = None
                for p in range(n_polarizations):
                    plane = planes[c * n_polarizations + p]
                    term = plane * plane * np.float32(pol_coefs[p])
                    sq = term if sq is None else sq + term
                per_chan = jnp.sqrt(jnp.maximum(sq, 0.0))
            term = per_chan * coefs_ref[c * n_polarizations]
            integ = term if integ is None else integ + term
    else:  # squared joins: emit the pre-sqrt sum (additive across shards)
        n_chan_local = n_images // n_polarizations
        sq = None
        for c in range(n_chan_local):
            for p in range(n_polarizations):
                plane = planes[c * n_polarizations + p]
                term = (
                    plane
                    * plane
                    * coefs_ref[c * n_polarizations]
                    * np.float32(pol_coefs[p])
                )
                sq = term if sq is None else sq + term
        integ = sq
    out_integ_ref[...] = integ


@partial(
    jax.jit,
    static_argnames=(
        "block_rows",
        "integration_mode",
        "pol_coefs",
        "n_polarizations",
        "interpret",
    ),
)
def fused_subtract_integrate(
    residual: jnp.ndarray,  # [N_loc, H_loc, W]
    psf_padded: jnp.ndarray,  # [N_loc, 2H+8, 2W+128] (GLOBAL-size padding)
    values: jnp.ndarray,  # [N_loc] gain-scaled component values
    chan_coefs: jnp.ndarray,  # [N_loc] runtime integration coefficients
    peak_y: jnp.ndarray,  # LOCAL-frame peak row (see kernel docstring)
    peak_x: jnp.ndarray,
    *,
    block_rows: int = 256,
    integration_mode: str = "signed",
    pol_coefs: Tuple[float, ...] = (1.0,),
    n_polarizations: int = 1,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shard-local fused subtract + additive-integration emit: the
    shard_map building block of ``parallel/mesh.py::mesh_hogbom_loop``.
    Returns ``(new_residual, integ_part [H_loc, W])``."""
    n, height, width = residual.shape
    assert height % block_rows == 0, (height, block_rows)
    n_blocks = height // block_rows
    peak = jnp.stack([peak_y, peak_x]).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (n, block_rows, width),
                lambda i, s, v, c: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # psf stays in HBM
        ],
        out_specs=[
            pl.BlockSpec(
                (n, block_rows, width),
                lambda i, s, v, c: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_rows, width),
                lambda i, s, v, c: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, n, block_rows + 8, width + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = partial(
        _subtract_integrate_kernel,
        n_polarizations=n_polarizations,
        pol_coefs=pol_coefs,
        block_rows=block_rows,
        width=width,
        height=height,
        integration_mode=integration_mode,
    )
    new_res, integ = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, height, width), jnp.float32),
            jax.ShapeDtypeStruct((height, width), jnp.float32),
        ],
        input_output_aliases={3: 0},
        interpret=interpret,
    )(peak, values, chan_coefs.astype(jnp.float32), residual, psf_padded)
    return new_res, integ


def integrate_values(
    vals: jnp.ndarray,  # [N] per-plane residual values at one pixel
    mode: str,
    chan_coefs: jnp.ndarray,  # [C] ("signed"/"linear": per-plane)
    pol_coefs: jnp.ndarray,  # [P]
    n_channels: int,
    n_polarizations: int,
) -> jnp.ndarray:
    """The joined integration (``image_set.cc:309-421``) of one pixel's
    per-plane values — the scalar twin of the kernel's in-block integration,
    used to recover the signed comparison value at a found peak."""
    if mode in ("signed", "linear"):
        return jnp.einsum("n,n->", chan_coefs, vals)
    cube = vals.reshape(n_channels, n_polarizations)
    if mode == "normal":
        if n_polarizations == 1:
            per_chan = cube[:, 0]
        else:
            per_chan = jnp.sqrt(
                jnp.maximum(
                    jnp.einsum("cp,cp,p->c", cube, cube, pol_coefs), 0.0
                )
            )
        return jnp.einsum("c,c->", per_chan, chan_coefs)
    return jnp.sqrt(
        jnp.maximum(
            jnp.einsum("cp,cp,c,p->", cube, cube, chan_coefs, pol_coefs),
            0.0,
        )
    )


def pad_psfs(psfs: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad centered PSFs [*, H, W] -> [*, 2H+8, 2W+128] so that the
    slice at (H - y, W - x) is the PSF shifted to (x, y) with edge clipping;
    the extra tail rows/cols allow tile-aligned overfetch in the kernel."""
    h, w = psfs.shape[-2:]
    pad = [(0, 0)] * (psfs.ndim - 2) + [
        (h - h // 2, h // 2 + 8),
        (w - w // 2, w // 2 + 128),
    ]
    return jnp.pad(psfs, pad)


@partial(
    jax.jit,
    static_argnames=(
        "meta",
        "allow_negative",
        "stop_on_negative",
        "fitter",
        "block_rows",
        "use_weight",
        "interpret",
    ),
)
def hogbom_loop_pallas(
    residual: jnp.ndarray,  # [N, H, W]
    model: jnp.ndarray,  # [N, H, W]
    psf_padded: jnp.ndarray,  # [N, 2H, 2W]
    weight: jnp.ndarray,  # [H, W] combined window/mask/rms weight
    rms_factor: jnp.ndarray,  # [H, W] (ones when unused)
    peak0_value: jnp.ndarray,
    peak0_x: jnp.ndarray,
    peak0_y: jnp.ndarray,
    peak0_found: jnp.ndarray,
    first_threshold: jnp.ndarray,
    gain: jnp.ndarray,
    initial_abs_peak: jnp.ndarray,
    divergence_limit: jnp.ndarray,
    start_iteration: jnp.ndarray,
    max_iterations: jnp.ndarray,
    *,
    meta,
    allow_negative: bool,
    stop_on_negative: bool,
    fitter,
    block_rows: int = 256,
    use_weight: bool = True,
    interpret: bool = False,
):
    """Full Högbom minor loop with the fused Pallas step.

    Same contract as ``generic_clean._hogbom_loop`` but each iteration is a
    single streamed pass over the cube.  The peak-search weight must already
    encode the clean border and mask; masked-out pixels never win because
    their weighted value is 0 (below the found threshold, matching
    ``peak_finder.cc:25`` semantics).
    """
    n, height, width = residual.shape
    flt_min = jnp.float32(1.1754943508222875e-38)
    mode, chan_np, pol_np = integration_coefficients(meta)
    chan_t = tuple(float(v) for v in chan_np)
    pol_t = tuple(float(v) for v in pol_np)
    chan_coefs = jnp.asarray(chan_np)
    pol_coefs = jnp.asarray(pol_np)
    C, P = meta.n_channels, meta.n_polarizations

    def integrate_at(res, yy, xx):
        """The integrated (pre-rms-weight) value at one pixel, matching the
        kernel's integration mode."""
        return integrate_values(res[:, yy, xx], mode, chan_coefs, pol_coefs,
                                C, P)

    def cond(state):
        res, mod, it, value, x, y, found, diverging = state
        ok = found & (jnp.abs(value) > first_threshold)
        ok &= it < max_iterations
        if stop_on_negative:
            ok &= value >= 0.0
        return ok & ~diverging

    def body(state):
        res, mod, it, value, x, y, found, _ = state
        peak_values = res[:, y, x]
        if fitter is not None:
            vals = peak_values.reshape(meta.n_channels, meta.n_polarizations)
            peak_values = fitter.fit_and_evaluate(vals, x, y).reshape(-1)
        peak_values = peak_values * gain
        mod = mod.at[:, y, x].add(peak_values)
        res, peak_index, peak_cmp = fused_clean_step(
            res,
            psf_padded,
            peak_values,
            weight,
            y,
            x,
            block_rows=block_rows,
            allow_negative=allow_negative,
            integration_mode=mode,
            chan_coefs=chan_t,
            pol_coefs=pol_t,
            use_weight=use_weight,
            interpret=interpret,
        )
        ny = (peak_index // width).astype(jnp.int32)
        nx = (peak_index % width).astype(jnp.int32)
        nfound = peak_cmp > flt_min
        # Recover the signed *rms-weighted* value at the peak (the weight
        # also contains the hard window; the reference's comparison value is
        # integrated * rms_factor).
        nvalue = integrate_at(res, ny, nx) * rms_factor[ny, nx]
        diverging = jnp.where(
            divergence_limit != 0.0,
            nfound & (jnp.abs(nvalue) > initial_abs_peak * divergence_limit),
            False,
        )
        return res, mod, it + 1, nvalue, nx, ny, nfound, diverging

    init = (
        residual,
        model,
        start_iteration,
        peak0_value,
        peak0_x,
        peak0_y,
        peak0_found,
        jnp.asarray(False),
    )
    res, mod, it, value, x, y, found, diverging = jax.lax.while_loop(
        cond, body, init
    )
    return res, mod, it, value, found, diverging
