"""Compile watchdog (utils/watchdog.py): a hung first compile of the big
fused multiscale program must degrade to the single-bucket retry and then
the host-orchestrated path instead of hanging the process (the round-3
remote-compiler hang, BASELINE.md).  Fault injection: the fused minor loop
is replaced with a stub that blocks far beyond the watchdog budget.
"""

import threading
import time

import numpy as np
import pytest

import radler_tpu as rd
from radler_tpu.utils.watchdog import (
    CompileTimeoutError,
    run_with_watchdog,
)


def test_watchdog_passthrough():
    assert run_with_watchdog(lambda: 41 + 1, timeout_s=5.0) == 42


def test_watchdog_propagates_errors():
    def boom():
        raise ValueError("inner")

    with pytest.raises(ValueError, match="inner"):
        run_with_watchdog(boom, timeout_s=5.0)


def test_watchdog_times_out():
    ev = threading.Event()

    def hang():
        ev.wait(30.0)
        return "late"

    t0 = time.perf_counter()
    with pytest.raises(CompileTimeoutError):
        run_with_watchdog(hang, timeout_s=0.2, description="stub")
    assert time.perf_counter() - t0 < 5.0
    ev.set()  # release the daemon worker promptly


def test_watchdog_disabled_runs_inline():
    assert run_with_watchdog(lambda: "x", timeout_s=0) == "x"


def _small_multiscale_problem(size=64, n_chan=2):
    yy, xx = np.mgrid[0:size, 0:size]
    g = np.exp(
        -((yy - size // 2) ** 2.0 + (xx - size // 2) ** 2.0) / (2 * 2.0**2)
    ).astype(np.float32)
    psf = np.stack([g / g.max()] * n_chan)
    sky = np.zeros((size, size), np.float32)
    sky[size // 3, size // 3] = 1.0
    sky[2 * size // 3, size // 2] = 0.7
    conv = np.real(
        np.fft.ifft2(np.fft.fft2(sky) * np.fft.fft2(np.fft.ifftshift(g)))
    ).astype(np.float32)
    res = np.stack([conv * (1.0 - 0.1 * c) for c in range(n_chan)])
    return psf, res


def test_multiscale_falls_back_when_compiler_hangs(monkeypatch):
    """Kill-the-compiler injection: the fused loop blocks past the budget;
    the perform must still complete through the host path and clean."""
    import radler_tpu.models.multiscale_fused as msf

    release = threading.Event()
    calls = []

    def hanging_loop(*args, **kwargs):
        calls.append(kwargs.get("split"))
        release.wait(60.0)  # far beyond the watchdog budget
        raise RuntimeError("compiler never recovered")

    monkeypatch.setattr(msf, "fused_multiscale_minor_loop", hanging_loop)
    monkeypatch.setenv("RADLER_TPU_COMPILE_TIMEOUT_S", "0.5")

    psf, res = _small_multiscale_problem()
    before = float(np.abs(res).max())
    model = np.zeros_like(res)
    s = rd.Settings()
    s.trimmed_image_width = res.shape[2]
    s.trimmed_image_height = res.shape[1]
    s.algorithm_type = rd.AlgorithmType.MULTISCALE
    s.minor_iteration_count = 40
    s.absolute_threshold = 1e-3
    s.major_loop_gain = 0.8
    s.multiscale.max_scales = 2
    freqs = np.array([[1.0e8 + c * 1e7, 1.1e8 + c * 1e7] for c in range(2)])
    r = rd.Radler(s, psf, res, model, 0.0, frequencies=freqs)
    t0 = time.perf_counter()
    r.perform(0)
    elapsed = time.perf_counter() - t0
    release.set()
    # Two watchdog timeouts (two-bucket, then single-bucket retry) then the
    # host path — the perform must complete promptly and actually clean.
    assert len(calls) == 2, calls
    assert elapsed < 60.0
    assert np.isfinite(res).all() and np.isfinite(model).all()
    assert np.abs(res).max() < before
    assert np.abs(model).max() > 0.0
