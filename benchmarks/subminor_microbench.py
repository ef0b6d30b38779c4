"""Micro-benchmark: sparse subminor loop timing on TPU.

2048^2 field, ~100 sources.  Regimes (candidate-set size K is set by the
selection threshold):

* default   — threshold 0.08 x peak, K ~ 7.8k (bucket 8192): the fused
  single-Pallas-program path (ops/pallas/subminor_fused.py) qualifies.
* ``--k4``  — threshold 0.2 x peak, K ~ 4.1k (bucket 6144).
* ``--k20`` — threshold 0.05 x peak, K ~ 20k (bucket 24576): above the
  default fused K-cap, shows the XLA while-loop regime.

Each regime runs twice: once with the fused path enabled (when it
qualifies) and once forced onto the XLA path
(``RADLER_TPU_NO_FUSED_SUBMINOR=1``), so the printout is a direct
fused-vs-XLA comparison including the one-time interaction-matrix build.

History note: an earlier XLA-level K x K interaction-matrix experiment
lives only on commit b99729e (measurements in BASELINE.md: 606->643 us at
K=1k, 737->704 us at K=32k — no win, because the XLA loop is dispatch-
overhead-bound).  The Pallas kernel removes that overhead: measured
17.8 us/iter at K=32768 on a v5e.
"""
import os
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


def run_once(disable_fused, psf, residual, threshold, max_iters, gain=0.1):
    size = residual.shape[-1]
    meta = CubeMeta(1, 1, (1.0,), (True,), 1.0, False, (1e8,))
    if disable_fused:
        os.environ["RADLER_TPU_NO_FUSED_SUBMINOR"] = "1"
    else:
        os.environ.pop("RADLER_TPU_NO_FUSED_SUBMINOR", None)
    label = "xla" if disable_fused else "auto"
    try:
        res = jnp.asarray(residual)[None]
        psfs = jnp.asarray(psf)[None]
        probe = sm.SubMinorLoop(size, size, 2 * size, 2 * size)
        probe.set_threshold(threshold, threshold)
        probe.set_gain(gain)
        count = probe.find_peak_positions(res, meta)
        cap = int(probe._xs.shape[0])
        fused = (not disable_fused) and probe.fused_qualifies(1, None)
        est = probe._est_logsum / -np.log1p(-gain)
        print(
            f"[{label}] candidates={count} cap={cap} est_iters={est:.0f} "
            f"path={'fused-pallas' if fused else 'xla-while'}"
        )
        assert count > 0, "no candidates selected; lower the threshold"

        def one_run():
            loop = sm.SubMinorLoop(size, size, 2 * size, 2 * size)
            loop.set_threshold(threshold, threshold)
            loop.set_iteration_info(0, max_iters)
            loop.set_gain(gain)
            t0 = time.time()
            div, peak = loop.run(res, meta, psfs)
            t1 = time.time()
            return loop.current_iteration, t1 - t0, peak

        iters, dt, peak = one_run()
        assert peak is not None
        print(
            f"[{label}] cold: {iters} iters in {dt:.2f}s (incl compile) "
            f"-> peak={peak:.4g}"
        )
        iters, dt, peak = one_run()
        rate = iters / dt
        print(
            f"[{label}] WARM: {iters} iters in {dt:.3f}s = {rate:.0f} it/s "
            f"({1e6 * dt / max(iters, 1):.1f} us/iter incl. selection"
            f"{' + matrix build' if fused else ''})"
        )
        return rate
    finally:
        os.environ.pop("RADLER_TPU_NO_FUSED_SUBMINOR", None)


def main():
    import sys

    print("devices:", jax.devices())
    psf, residual = make_problem()
    gain = 0.1
    max_iters = 20000
    if "--k20" in sys.argv:
        frac = 0.05  # K ~ 20k: above the fused cap by default
    elif "--k4" in sys.argv:
        frac = 0.2  # K ~ 4.1k
    elif "--deep" in sys.argv:
        # Deep-clean regime: low gain -> ~20k expected iterations over an
        # 8k candidate set; the fused path's matrix build amortizes.
        frac = 0.08
        gain = 0.01
        max_iters = 50000
    else:
        frac = 0.08  # K ~ 7.8k (bucket 8192), ~1.9k iterations at gain 0.1
    thr = frac * float(np.abs(residual).max())
    r_auto = run_once(False, psf, residual, thr, max_iters, gain=gain)
    r_xla = run_once(True, psf, residual, thr, max_iters, gain=gain)
    print(f"speedup (auto vs xla): {r_auto / r_xla:.2f}x")


if __name__ == "__main__":
    main()
