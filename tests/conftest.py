"""Test configuration: run everything hermetically on CPU with 8 fake
devices (SURVEY.md §5.7: pjit/shard_map DP tests run in CI with no TPU).

This environment injects an 'axon' remote-TPU PJRT plugin via sitecustomize
which force-sets jax_platforms='axon,cpu' at interpreter start — overriding
both the JAX_PLATFORMS env var and any value set before importing jax. JAX
backends initialize lazily, so updating the config here (before the first
backend use) reliably pins tests to CPU.

XLA_FLAGS must carry the fake-device count before the CPU backend
initializes; conftest import time is early enough.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# XLA-CPU compiles are slow here (~1.5 s each); the persistent cache makes
# repeat test runs cheap.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-test")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
