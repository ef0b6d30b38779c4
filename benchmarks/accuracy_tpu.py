"""Reference point-source accuracy contract on the LIVE backend.

The reference's data-driven accuracy test covers {GenericClean, Multiscale,
ASP} (``cpp/test/test_radler.cc:98-135``): residual |.| < 2e-6 everywhere,
model peak within 1e-4 (rel) of the 2.5 Jy source.  The unit tests enforce
this on the CPU platform; this script replays it on the real TPU so the
BASELINE.md hardware-accuracy table is measured, not assumed.

Reproduce: python benchmarks/accuracy_tpu.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import radler_tpu as rd

SIZE = 64
SHIFT = (-9, 15)  # (x, y) source shift, the reference's off-center case


def _psf():
    ps = np.array(
        [[0.0, 0.4, 0.0], [0.25, 1.0, 0.5], [0.0, 0.6, 0.0]], np.float32
    )
    psf = np.zeros((SIZE, SIZE), np.float32)
    psf[31:34, 31:34] = ps
    return psf


def _residual(scale=2.5, shift=SHIFT):
    ps = np.array(
        [[0.0, 0.4, 0.0], [0.25, 1.0, 0.5], [0.0, 0.6, 0.0]], np.float32
    )
    cy, cx = SIZE // 2 + shift[1], SIZE // 2 + shift[0]
    res = np.zeros((SIZE, SIZE), np.float32)
    res[cy - 1 : cy + 2, cx - 1 : cx + 2] = scale * ps
    return res


def run(algorithm):
    s = rd.Settings()
    s.trimmed_image_width = SIZE
    s.trimmed_image_height = SIZE
    s.algorithm_type = algorithm
    s.minor_iteration_count = 1000
    s.absolute_threshold = (
        1e-6 if algorithm == rd.AlgorithmType.ADAPTIVE_SCALE_PIXEL else 1e-7
    )
    res = _residual()
    mdl = np.zeros_like(res)
    r = rd.Radler(s, _psf(), res, mdl, 0.0)
    # Major loop: run until perform reports convergence (<= 10 majors).
    for major in range(10):
        if not r.perform(major):
            break
    cy, cx = SIZE // 2 + SHIFT[1], SIZE // 2 + SHIFT[0]
    res_max = float(np.abs(res).max())
    peak = float(mdl[cy, cx])
    off = mdl.copy()
    off[cy, cx] = 0.0
    stray = float(np.abs(off).max())
    ok = res_max < 2e-6 and abs(peak - 2.5) < 2.5 * 1e-4 and stray < 2e-6
    print(
        f"{algorithm.name:22s} residual_max={res_max:.3e} "
        f"model_peak={peak:.6f} stray={stray:.3e} "
        f"iters={r.iteration_number} -> "
        f"{'PASS' if ok else 'FAIL'} (bounds 2e-6 abs / 1e-4 rel, "
        f"test_radler.cc:128-135)",
        flush=True,
    )
    return ok


def main():
    import jax

    print(f"backend: {jax.devices()}", flush=True)
    algos = [
        rd.AlgorithmType.GENERIC_CLEAN,
        rd.AlgorithmType.MULTISCALE,
        rd.AlgorithmType.ADAPTIVE_SCALE_PIXEL,
    ]
    results = [run(a) for a in algos]
    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()
