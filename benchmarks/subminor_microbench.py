"""Micro-benchmark: sparse subminor loop timing on TPU.

Small-K deep-clean regime: 2048^2 field, ~100 sources, threshold chosen so
K ~ 1-2k candidates, thousands of iterations.  Pass ``--k30`` to use a low
threshold targeting the K~30k regime instead.

History note: the ``force_matrix`` leg compares the (reverted) XLA-level
K x K interaction-matrix path against the per-iteration gather; that path
only exists on commit b99729e (measurements recorded in BASELINE.md and
docs/architecture.md were taken there: 606->643 us at K=1k, 737->704 us at
K=32k).  At HEAD the leg is skipped unless the module exposes
``_MATRIX_MAX_K``.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import radler_tpu.models.subminor as sm
from radler_tpu.image_set import CubeMeta


def make_problem(size=2048, n_sources=100, seed=7):
    rng = np.random.default_rng(seed)
    psf = np.zeros((size, size), np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    r2 = (yy - size // 2) ** 2.0 + (xx - size // 2) ** 2.0
    psf += np.exp(-r2 / (2.0 * 2.5**2)).astype(np.float32)
    ring = np.exp(-((np.sqrt(r2) - 12.0) ** 2) / (2.0 * 2.0**2))
    psf += 0.08 * ring.astype(np.float32)
    sky = np.zeros((size, size), np.float32)
    margin = size // 8
    ys = rng.integers(margin, size - margin, n_sources)
    xs = rng.integers(margin, size - margin, n_sources)
    amps = rng.uniform(0.2, 1.0, n_sources).astype(np.float32)
    np.add.at(sky, (ys, xs), amps)
    pad = 1 << (size - 1).bit_length()

    def _pad_center(img, n):
        out = np.zeros((n, n), np.float32)
        o = (n - img.shape[0]) // 2
        out[o : o + img.shape[0], o : o + img.shape[1]] = img
        return out

    psf_f = np.fft.rfft2(np.fft.ifftshift(_pad_center(psf, 2 * pad)))
    sky_f = np.fft.rfft2(_pad_center(sky, 2 * pad))
    conv = np.fft.irfft2(psf_f * sky_f, s=(2 * pad, 2 * pad))
    o = (2 * pad - size) // 2
    residual = conv[o : o + size, o : o + size].astype(np.float32)
    return psf, residual


def run_once(force_matrix, psf, residual, threshold, max_iters):
    size = residual.shape[-1]
    meta = CubeMeta(1, 1, (1.0,), (True,), 1.0, False, (1e8,))
    loop = sm.SubMinorLoop(size, size, 2 * size, 2 * size)
    loop.set_threshold(threshold, threshold)
    loop.set_iteration_info(0, max_iters)
    loop.set_gain(0.1)
    saved = getattr(sm, "_MATRIX_MAX_K", None)
    if force_matrix and saved is None:
        print(
            "force_matrix leg skipped: the XLA interaction-matrix path was "
            "reverted (see b99729e); check out that commit to reproduce the "
            "matrix-vs-gather comparison."
        )
        return None
    if saved is not None:
        sm._MATRIX_MAX_K = (1 << 20) if force_matrix else 0
    try:
        res = jnp.asarray(residual)[None]
        psfs = jnp.asarray(psf)[None]
        count = loop.find_peak_positions(res, meta)
        print(f"candidates={count} cap={loop._xs.shape[0]}")
        assert count > 0, "no candidates selected; lower the threshold"
        # warm-up compile
        t0 = time.time()
        div, peak = loop.run(res, meta, psfs)
        t1 = time.time()
        iters = loop.current_iteration
        print(
            f"force_matrix={force_matrix}: {iters} iters in {t1-t0:.2f}s "
            f"(incl compile) -> peak={peak:.4g}"
        )
        # warm second run
        loop2 = sm.SubMinorLoop(size, size, 2 * size, 2 * size)
        loop2.set_threshold(threshold, threshold)
        loop2.set_iteration_info(0, max_iters)
        loop2.set_gain(0.1)
        t0 = time.time()
        div, peak = loop2.run(res, meta, psfs)
        t1 = time.time()
        iters = loop2.current_iteration
        rate = iters / (t1 - t0)
        print(
            f"force_matrix={force_matrix} WARM: {iters} iters in {t1-t0:.2f}s"
            f" = {rate:.0f} it/s ({1e6*(t1-t0)/max(iters,1):.0f} us/iter)"
        )
        return rate
    finally:
        if saved is not None:
            sm._MATRIX_MAX_K = saved


def main():
    import sys

    print("devices:", jax.devices())
    psf, residual = make_problem()
    if "--k30" in sys.argv:
        # threshold for K ~ 30k candidates (the VERDICT target regime)
        thr = 0.004 * float(np.abs(residual).max())
    else:
        # threshold for K ~ 1-2k candidates
        thr = 0.05 * float(np.abs(residual).max())
    max_iters = 20000
    r_gather = run_once(False, psf, residual, thr, max_iters)
    r_matrix = run_once(True, psf, residual, thr, max_iters)
    if r_matrix is not None and r_gather:
        print(f"speedup: {r_matrix / r_gather:.2f}x")


if __name__ == "__main__":
    main()
