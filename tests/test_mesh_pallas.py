"""The shard_map-partitioned fused Pallas Högbom loop (parallel/mesh.py::
mesh_hogbom_loop) against the single-device reference loop.

Runs the Pallas kernel in interpreter mode on the 8-virtual-device CPU mesh
(conftest.py); on real TPU hardware the same program runs compiled.  This is
the round-4 closure of "the mesh path does not run the measured kernel": the
sharded program IS the measured fused subtract+integrate pass, with the
reference's four exchange patterns as explicit collectives
(``parallel_deconvolution.cc:592-617``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radler_tpu.image_set import CubeMeta
from radler_tpu.ops.pallas.hogbom_step import (
    hogbom_loop_pallas,
    pad_psfs,
)
from radler_tpu.parallel.mesh import (
    make_mesh,
    mesh_hogbom_loop,
    mesh_pallas_eligible,
)


def _problem(n_chan, n_pol, size, seed=3):
    rng = np.random.default_rng(seed)
    N = n_chan * n_pol
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    r2 = (yy - size // 2) ** 2 + (xx - size // 2) ** 2
    psf = np.exp(-r2 / 18.0).astype(np.float32)
    sky = np.zeros((size, size), np.float32)
    for _ in range(8):
        cy, cx = rng.integers(10, size - 10, 2)
        sky[cy, cx] = rng.uniform(0.5, 2.0)
    res = np.stack(
        [
            np.fft.irfft2(
                np.fft.rfft2(sky * (1 + 0.1 * i))
                * np.fft.rfft2(np.fft.ifftshift(psf)),
                s=(size, size),
            )
            for i in range(N)
        ]
    ).astype(np.float32)
    psfs = np.stack([psf] * N)
    return psfs, res


def _run_pair(meta, psfs, res, n_iter=40):
    N, H, W = res.shape
    psf_pad = pad_psfs(jnp.asarray(psfs))
    weight = jnp.ones((H, W), jnp.float32)
    rms = jnp.ones((H, W), jnp.float32)

    # Initial peak from the integrated image (both paths get the same).
    from radler_tpu.ops.pallas.hogbom_step import integration_coefficients

    mode, chan, pol = integration_coefficients(meta)
    if mode == "signed":
        integ = res[0] * chan[0]
    elif mode == "normal" and meta.n_polarizations == 1:
        integ = np.einsum("c,chw->hw", chan, res)
    else:
        cube = res.reshape(meta.n_channels, meta.n_polarizations, H, W)
        sq = np.einsum("cphw,cphw,c,p->hw", cube, cube, chan, pol)
        integ = np.sqrt(np.maximum(sq, 0.0))
    idx = np.argmax(np.abs(integ))
    y0, x0 = divmod(int(idx), W)
    v0 = float(integ[y0, x0])

    args = dict(
        peak0_value=jnp.float32(v0),
        peak0_x=jnp.int32(x0),
        peak0_y=jnp.int32(y0),
        peak0_found=jnp.asarray(True),
        first_threshold=jnp.float32(1e-6),
        gain=jnp.float32(0.2),
        initial_abs_peak=jnp.float32(abs(v0)),
        divergence_limit=jnp.float32(4.0),
        start_iteration=jnp.int32(0),
        max_iterations=jnp.int32(n_iter),
    )
    ref = hogbom_loop_pallas(
        jnp.asarray(res),
        jnp.zeros_like(jnp.asarray(res)),
        psf_pad,
        weight,
        rms,
        *args.values(),
        meta=meta,
        allow_negative=True,
        stop_on_negative=False,
        fitter=None,
        block_rows=16,
        use_weight=True,
        interpret=True,
    )
    mesh = make_mesh(n_channels=meta.n_channels)
    assert mesh.size == 8, mesh
    assert mesh_pallas_eligible(mesh, meta, H, W)
    got = mesh_hogbom_loop(
        mesh,
        jnp.asarray(res),
        jnp.zeros_like(jnp.asarray(res)),
        psf_pad,
        weight,
        rms,
        *args.values(),
        meta=meta,
        allow_negative=True,
        stop_on_negative=False,
        fitter=None,
        interpret=True,
    )
    return ref, got


def _check(ref, got):
    res_r, mod_r, it_r, val_r, found_r, div_r = ref
    res_g, mod_g, it_g, val_g, found_g, div_g = got
    assert int(it_g) == int(it_r)
    np.testing.assert_allclose(
        np.asarray(res_g), np.asarray(res_r), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(mod_g), np.asarray(mod_r), atol=2e-5
    )
    assert bool(found_g) == bool(found_r)
    assert abs(float(val_g) - float(val_r)) < 2e-4 + 1e-3 * abs(float(val_r))


def test_mesh_pallas_single_channel():
    meta = CubeMeta(
        n_channels=1,
        n_polarizations=1,
        weights=(1.0,),
        linked=(True,),
        polarization_norm_factor=1.0,
        squared_joins=False,
        frequencies=(1e8,),
    )
    psfs, res = _problem(1, 1, 64)
    _check(*_run_pair(meta, psfs, res))


def test_mesh_pallas_joined_channels():
    meta = CubeMeta(
        n_channels=4,
        n_polarizations=1,
        weights=(1.0,) * 4,
        linked=(True,),
        polarization_norm_factor=1.0,
        squared_joins=False,
        frequencies=tuple(1e8 + 1e7 * c for c in range(4)),
    )
    psfs, res = _problem(4, 1, 64)
    _check(*_run_pair(meta, psfs, res))


def test_mesh_pallas_joined_polarizations_squared():
    meta = CubeMeta(
        n_channels=2,
        n_polarizations=2,
        weights=(1.0,) * 2,
        linked=(True, True),
        polarization_norm_factor=2.0,
        squared_joins=True,
        frequencies=(1e8, 1.1e8),
    )
    psfs, res = _problem(2, 2, 64)
    _check(*_run_pair(meta, psfs, res))
