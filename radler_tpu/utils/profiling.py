"""Profiling hooks (aux subsystem the reference lacks — SURVEY.md §5).

Wraps the JAX profiler so a major iteration (or any region) can be captured
as an xplane trace viewable in TensorBoard / xprof, plus a lightweight
wall-time phase timer for host-side breakdowns.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace (xplane) of the enclosed region:

    >>> with profiling.trace("/tmp/radler-trace"):
    ...     radler.perform(0)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region inside a trace (shows up in the xplane timeline)."""
    return jax.profiler.TraceAnnotation(name)


_probe_cache: Dict[object, object] = {}


def force_sync(x) -> None:
    """Truly drain the device pipeline up to the production of ``x``.

    ``jax.block_until_ready`` returns without waiting on remote-dispatch
    backends (the axon tunnel acknowledges enqueue, not completion), which
    silently breaks any wall-clock attribution.  Fetching a value produced
    by a jitted reduction of ``x`` is a real barrier everywhere.
    """
    import numpy as np

    # In-order execution is per device: one leaf suffices only for the
    # devices it touches.  Probe until every device appearing anywhere in
    # the pytree has been drained (sharded leaves cover all their devices
    # at once — fetching the jitted reduction waits on every shard).
    drained: set = set()
    for leaf in jax.tree_util.tree_leaves(x):
        if not isinstance(leaf, jax.Array) or leaf.size == 0:
            continue
        try:
            leaf_devices = frozenset(d.id for d in leaf.sharding.device_set)
        except Exception:
            leaf_devices = frozenset([-1])
        if leaf_devices <= drained:
            continue
        key = (leaf.ndim, leaf.dtype)
        probe = _probe_cache.get(key)
        if probe is None:
            probe = jax.jit(
                lambda a: jax.numpy.abs(a.ravel()[:1]).astype("float32")
            )
            _probe_cache[key] = probe
        np.asarray(probe(leaf))
        drained |= leaf_devices


class PhaseTimer:
    """Accumulating wall-clock timer for host-side phase breakdowns."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync: Optional[object] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                force_sync(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"{name}: {self.totals[name]:.3f}s over {self.counts[name]} "
                "calls"
            )
        return "\n".join(lines)
