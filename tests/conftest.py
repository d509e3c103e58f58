"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host-platform virtual devices instead (the driver
separately dry-run-compiles the multi-chip path via __graft_entry__).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the global env pins 'axon' (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU backend via
# jax.config.update("jax_platforms", "axon,cpu"), which beats env vars —
# override it back after import so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# persistent compilation cache: READS always on (warm local runs skip the
# big pipeline compiles); WRITES opt-in via LVIO_TEST_CACHE_WRITE=1.
# Rationale (measured r4): XLA:CPU LoadedExecutable.serialize() can
# SEGFAULT late in a long many-program process (reproducibly at test
# ~130 of a cold full-suite run, jax 0.9.0, stack in
# compilation_cache.put_executable_and_time) — and within a single
# pytest process the in-memory jit cache already dedups, so write-backs
# never pay for themselves in one run anyway. To (re)build the local
# cache safely, write per-file from fresh processes:
#   for f in tests/test_*.py; do LVIO_TEST_CACHE_WRITE=1 \
#       python -m pytest "$f" -q; done
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
_write = os.environ.get("LVIO_TEST_CACHE_WRITE", "") == "1"
jax.config.update("jax_persistent_cache_min_compile_time_secs",
                  1.0 if _write else 1e9)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long end-to-end gates (hostile sequence); "
        "deselect with -m 'not slow' for a quick pass")


def pytest_collection_modifyitems(config, items):
    """Abort a full-suite run in ONE process before it hits the known
    XLA:CPU accumulated-JIT-state segfault (~test 132, root-caused r5 —
    not fixable from Python). The chunked runner is the supported entry.
    Override with LVIO_ALLOW_FULL_SUITE=1 if you really mean it.
    """
    files = {item.fspath for item in items}
    if (len(files) > 12
            and os.environ.get("LVIO_ALLOW_FULL_SUITE", "") != "1"
            and os.environ.get("LVIO_SUITE_CHUNK", "") != "1"):
        import pytest
        raise pytest.UsageError(
            f"{len(files)} test files collected in one process: a full "
            "single-process run segfaults deterministically in XLA:CPU "
            "at ~test 132 (accumulated JIT state — see CLAUDE.md). Use "
            "`python tests/run_suite.py` (chunked across processes), or "
            "set LVIO_ALLOW_FULL_SUITE=1 to proceed anyway.")
