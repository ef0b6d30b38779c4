"""Test configuration: run on a virtual 8-device CPU platform.

Real-TPU benchmarking happens through bench.py; unit tests exercise the same
jitted code paths on CPU with 8 virtual devices so mesh/sharding tests can
run anywhere (see the multi-chip dry-run in ``__graft_entry__.py``).

Note: this environment's sitecustomize registers the remote ``axon`` TPU
platform and forces ``jax_platforms="axon,cpu"`` regardless of the
``JAX_PLATFORMS`` env var, so the config must be re-pinned to cpu *after*
importing jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("RADLER_TPU_LOG", "none")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
