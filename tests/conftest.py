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
