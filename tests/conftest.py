"""Test configuration: run everything on CPU with 8 fake devices.

SURVEY.md §5.7: `--xla_force_host_platform_device_count=8` gives 8 virtual CPU
devices so pjit/shard_map data-parallel tests run in CI without a TPU. Pallas
kernel tests run in interpreter mode on CPU (dispatch in the ops layer picks
this automatically when the backend is not TPU).

Must run before the first `import jax` anywhere in the test session; pytest
imports conftest.py before collecting test modules, which guarantees that.
"""

import os

# Hard override: the ambient environment may point JAX at a remote TPU
# (JAX_PLATFORMS=axon); CI/unit tests must run hermetically on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"

# XLA-CPU compiles cost ~1.5 s each here; the persistent cache makes repeat
# test runs cheap.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-test")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
