"""Measured rate of the shard_map-partitioned fused Pallas clean step.

Runs ``parallel/mesh.py::mesh_hogbom_loop`` on a 1x1 mesh on the real chip —
the identical sharded program with degenerate collectives — against the
plain ``hogbom_loop_pallas``, at (a) the config-5 per-device shape
(8 planes x 2048^2, squared joins) and (b) 1 plane x 4096^2.  These are the
measured per-chip numbers behind BASELINE.md's config-5 extrapolation.

Reproduce: python benchmarks/mesh_step_bench.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from radler_tpu.image_set import CubeMeta
from radler_tpu.models.generic_clean import _choose_block_rows
from radler_tpu.ops.pallas.hogbom_step import hogbom_loop_pallas, pad_psfs
from radler_tpu.parallel.mesh import mesh_hogbom_loop
from radler_tpu.utils.profiling import force_sync


def run_shape(C, P_, H, W, squared, n_iter=2000):
    N = C * P_
    meta = CubeMeta(
        n_channels=C,
        n_polarizations=P_,
        weights=(1.0,) * C,
        linked=(True,) * P_,
        polarization_norm_factor=float(P_),
        squared_joins=squared,
        frequencies=tuple(1e8 + 1e7 * c for c in range(C)),
    )
    rng = np.random.default_rng(0)
    res = jnp.asarray(rng.standard_normal((N, H, W)).astype(np.float32) * 0.01)
    res = res.at[:, H // 2, W // 2].set(1.0)
    psf = np.zeros((N, H, W), np.float32)
    psf[:, H // 2, W // 2] = 1.0
    psf_pad = pad_psfs(jnp.asarray(psf))
    weight = jnp.asarray(np.ones((H, W), np.float32))
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("chan", "tile"))
    br = _choose_block_rows(H, W, N)
    common = dict(
        meta=meta, allow_negative=True, stop_on_negative=False, fitter=None
    )
    scalars = (
        jnp.float32(1.0), jnp.int32(W // 2), jnp.int32(H // 2),
        jnp.asarray(True), jnp.float32(1e-8), jnp.float32(0.05),
        jnp.float32(1.0), jnp.float32(0.0), jnp.int32(0), jnp.int32(n_iter),
    )

    def run_mesh():
        out = mesh_hogbom_loop(
            mesh, res, jnp.zeros_like(res), psf_pad, weight, weight,
            *scalars, **common,
        )
        force_sync(out[0])
        return out

    def run_plain():
        out = hogbom_loop_pallas(
            res, jnp.zeros_like(res), psf_pad, weight, weight,
            *scalars, block_rows=br, use_weight=True, **common,
        )
        force_sync(out[0])
        return out

    for name, fn in (("mesh(1x1) shard_map", run_mesh), ("plain fused", run_plain)):
        fn()  # compile
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        it = int(out[2])
        print(
            f"[{N}x{H}^2 squared={squared}] {name}: {it} iters in "
            f"{best:.3f}s = {it / best:.0f} it/s "
            f"({best / max(it, 1) * 1e6:.0f} us/iter)",
            flush=True,
        )


if __name__ == "__main__":
    run_shape(2, 4, 2048, 2048, True)
    run_shape(1, 1, 4096, 4096, False)
