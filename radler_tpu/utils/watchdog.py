"""Compile watchdog for the big fused device programs.

On a remote-compile backend a degraded compiler service has been observed
hanging a fresh process inside the FIRST invocation of a large jitted
program (the round-3 fused-multiscale hang; the persistent compile cache
makes later processes immune, but the first one still blocks forever).  The
reference has no equivalent failure mode — FFTW plans locally — so this is
a TPU-deployment-specific guard: run the invocation on a worker thread and,
if it does not come back within the budget, raise ``CompileTimeoutError``
so the caller can degrade to a smaller program or the host-orchestrated
path instead of hanging.

The abandoned worker thread is a daemon: if the compiler eventually
responds, the (functional, non-donating) program's result is discarded.
"""

from __future__ import annotations

import os
import threading
from typing import Any, Callable


class CompileTimeoutError(RuntimeError):
    """A jitted-program invocation did not return within the budget."""


def compile_timeout_seconds(default: float = 900.0) -> float:
    """Watchdog budget in seconds; RADLER_TPU_COMPILE_TIMEOUT_S overrides,
    0 disables the watchdog entirely."""
    try:
        return float(os.environ.get("RADLER_TPU_COMPILE_TIMEOUT_S", default))
    except ValueError:
        return default


def run_with_watchdog(
    fn: Callable[[], Any],
    *,
    timeout_s: float | None = None,
    description: str = "jitted program",
) -> Any:
    """Invoke ``fn()`` on a worker thread with a wall-clock budget.

    Returns ``fn()``'s result; raises :class:`CompileTimeoutError` when the
    budget elapses first (the worker keeps running as a daemon and its
    eventual result is discarded — callers must only pass functional,
    non-donating invocations).  A budget of 0 (or None resolving to 0)
    calls ``fn`` inline with no watchdog.
    """
    if timeout_s is None:
        timeout_s = compile_timeout_seconds()
    if not timeout_s or timeout_s <= 0:
        return fn()
    box: dict = {}
    done = threading.Event()

    def worker():
        try:
            box["result"] = fn()
        except BaseException as e:  # noqa: BLE001 — re-raised on the caller
            box["error"] = e
        finally:
            done.set()

    t = threading.Thread(
        target=worker, name=f"radler-compile-watchdog({description})",
        daemon=True,
    )
    t.start()
    if not done.wait(timeout_s):
        raise CompileTimeoutError(
            f"{description} did not return within {timeout_s:.0f}s "
            "(degraded compiler service?); falling back"
        )
    if "error" in box:
        raise box["error"]
    return box["result"]
