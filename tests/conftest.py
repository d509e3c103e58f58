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

# persistent compilation cache: the suite is dominated by XLA compiles of
# the big pipeline programs; caching them across runs cuts the wall time
# from ~20 min to a few minutes on warm runs
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long end-to-end gates (hostile sequence); "
        "deselect with -m 'not slow' for a quick pass")
