"""Device mesh + sharding helpers.

The reference's parallelism is 7 POSIX threads over shared memory plus ROS
RPC (SURVEY §2.4) — nothing distributed. The TPU-native scaling model is:

  * ``data`` axis: batch parallelism over independent SLAM/RL-env instances
    (replay of multiple sequences, vectorized TD3 environments) — the
    analogue of the reference's DummyVectorEnv fan-out, but on ICI.
  * within one instance the dense stages (LK, BA linearization) are single
    fixed-shape XLA programs; cross-chip sharding of factor tables rides
    the same mesh when problems grow.

Helpers here build the mesh and common NamedSharding specs.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Device-put every leaf with its leading dim sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
