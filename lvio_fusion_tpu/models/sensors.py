"""IMU / Lidar / Navsat sensor parameter pytrees.

Parity: reference `imu/imu.h` (noise densities, gravity), `lidar/lidar.h`
(resolution + extrinsic), `navsat/navsat.h` (extrinsic + accuracy).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from lvio_fusion_tpu.geometry.se3 import se3_identity

GRAVITY = 9.81007  # reference preintegration.cpp:13


@flax.struct.dataclass
class ImuParams:
    acc_n: jnp.ndarray  # accelerometer noise density
    gyr_n: jnp.ndarray  # gyro noise density
    acc_w: jnp.ndarray  # accel bias random walk
    gyr_w: jnp.ndarray  # gyro bias random walk
    g_norm: jnp.ndarray  # gravity magnitude
    extrinsic: jnp.ndarray  # SE3, imu->robot (identity: imu IS the body frame)

    @staticmethod
    def create(acc_n=0.1, gyr_n=0.01, acc_w=0.001, gyr_w=1e-4, g_norm=GRAVITY,
               extrinsic=None):
        f = lambda v: jnp.asarray(v, dtype=jnp.float32)
        if extrinsic is None:
            extrinsic = se3_identity()
        return ImuParams(f(acc_n), f(gyr_n), f(acc_w), f(gyr_w), f(g_norm),
                         jnp.asarray(extrinsic, dtype=jnp.float32))

    @property
    def gravity(self):
        return jnp.array([0.0, 0.0, self.g_norm], dtype=jnp.float32)


@flax.struct.dataclass
class LidarParams:
    num_scans: int = flax.struct.field(pytree_node=False, default=64)
    horizon_scan: int = flax.struct.field(pytree_node=False, default=1800)
    ang_res_y: float = flax.struct.field(pytree_node=False, default=0.427)
    ang_bottom: float = flax.struct.field(pytree_node=False, default=24.9)
    ground_rows: int = flax.struct.field(pytree_node=False, default=60)
    cycle_time: float = flax.struct.field(pytree_node=False, default=0.1036)
    min_range: float = flax.struct.field(pytree_node=False, default=5.0)
    max_range: float = flax.struct.field(pytree_node=False, default=30.0)
    deskew: bool = flax.struct.field(pytree_node=False, default=False)
    resolution: float = flax.struct.field(pytree_node=False, default=0.2)
    extrinsic: jnp.ndarray = flax.struct.field(
        default_factory=lambda: se3_identity())  # lidar->robot


@flax.struct.dataclass
class NavsatParams:
    accuracy: jnp.ndarray  # position accuracy gate (m)
    extrinsic: jnp.ndarray  # SE3 navsat(ENU)->map, estimated online

    @staticmethod
    def create(accuracy=1.0, extrinsic=None):
        if extrinsic is None:
            extrinsic = se3_identity()
        return NavsatParams(jnp.asarray(accuracy, dtype=jnp.float32),
                            jnp.asarray(extrinsic, dtype=jnp.float32))
