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
# Two processes sharing ONE cache dir were observed (twice) to SIGABRT inside
# XLA:CPU value fetch/compile, so each xdist worker gets its OWN dir (keyed on
# PYTEST_XDIST_WORKER, set by pytest-xdist before this conftest imports in the
# worker) — `pytest -n 4` is safe; so is plain serial `pytest` (worker "gw0"
# absent -> the shared serial dir). Ad-hoc concurrent *serial* pytest runs
# remain unsupported.
_worker = os.environ.get("PYTEST_XDIST_WORKER", "")
_cache = os.path.expanduser(
    f"~/.cache/tamf_xla_tests_{_worker}" if _worker else "~/.cache/tamf_xla_tests"
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
