"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Multi-chip TPU hardware is unavailable in CI; sharding tests use XLA's
forced host-platform device count (the standard JAX pattern for testing
pjit/shard_map logic without hardware).
"""

import os

_USE_TPU = os.environ.get("PIQP_TPU_TEST_TPU", "0") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize may have already imported jax and pointed it
# at the TPU platform; force the CPU backend for tests regardless (unless
# PIQP_TPU_TEST_TPU=1 opts into running on the real chip).
if not _USE_TPU:
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the IPM while_loop is expensive to compile on
# the CPU backend; cache across test processes.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# The CPU backend's compiler segfaults after enough large executables
# accumulate in one process (reproduced: the same shard_map compile that
# passes standalone crashes at the tail of the full suite).  Dropping the
# in-memory executable caches periodically keeps the process well below the
# blowup point; the persistent disk cache makes re-compiles cheap.
_TESTS_BETWEEN_CACHE_CLEARS = 25
_test_counter = {"n": 0}


def pytest_runtest_teardown(item, nextitem):
    _test_counter["n"] += 1
    if _test_counter["n"] % _TESTS_BETWEEN_CACHE_CLEARS == 0:
        jax.clear_caches()
