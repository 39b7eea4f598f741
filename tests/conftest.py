"""Test configuration: force an 8-device virtual CPU mesh so multi-chip sharding
logic is exercised without TPU hardware.

Note: this image's sitecustomize imports jax at interpreter start (to register
the TPU tunnel backend), so env vars set here are too late for jax's import-time
config read. `jax.config.update` still works because backends initialize lazily,
as does XLA_FLAGS (read when the CPU client is created).
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeated suite runs skip recompiles.
# NOTE: run ONE pytest process at a time — two concurrent processes sharing
# this cache dir were observed (twice) to SIGABRT inside XLA:CPU value
# fetch/compile; every serial run is clean.
try:
    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/tamf_xla_tests")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
