"""Pinhole stereo camera model, batched over points.

Parity target: reference `visual/camera.h` (Sensor2Pixel/Pixel2Sensor/
World2Pixel chains, `Far()` = depth > 50*baseline, extrinsic composition in
`sensor.h:10-52`). Here a camera is a flax.struct pytree usable inside jit;
all point transforms broadcast over leading dims.

Frames: `world` (gravity-aligned map), `robot` (body/IMU), `sensor` (camera
optical). A frame pose ``Twb`` maps robot->world; ``extrinsic`` maps
sensor->robot (same convention as the reference's `Sensor::Sensor2Robot`).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from lvio_fusion_tpu.geometry.se3 import se3_apply, se3_inv, se3_mul


@flax.struct.dataclass
class Camera:
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    extrinsic: jnp.ndarray  # SE3 7-vec, sensor->robot
    # plumb distortion for completeness (KITTI configs run undistorted)
    k1: jnp.ndarray = flax.struct.field(default_factory=lambda: jnp.zeros(()))
    k2: jnp.ndarray = flax.struct.field(default_factory=lambda: jnp.zeros(()))
    p1: jnp.ndarray = flax.struct.field(default_factory=lambda: jnp.zeros(()))
    p2: jnp.ndarray = flax.struct.field(default_factory=lambda: jnp.zeros(()))

    @staticmethod
    def create(fx, fy, cx, cy, extrinsic, k1=0.0, k2=0.0, p1=0.0, p2=0.0):
        f = jnp.asarray
        return Camera(f(fx, dtype=jnp.float32), f(fy, dtype=jnp.float32),
                      f(cx, dtype=jnp.float32), f(cy, dtype=jnp.float32),
                      jnp.asarray(extrinsic, dtype=jnp.float32),
                      f(k1, dtype=jnp.float32), f(k2, dtype=jnp.float32),
                      f(p1, dtype=jnp.float32), f(p2, dtype=jnp.float32))

    # --- projection chains (batched over leading dims of p) ---

    def sensor2pixel(self, pc):
        # clamp |z| away from 0: masked/garbage points must not emit NaN
        # (NaN * 0 = NaN would poison masked normal equations downstream)
        z = pc[..., 2:3]
        z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        xy = pc[..., :2] / z
        return xy * jnp.stack([self.fx, self.fy]) + jnp.stack([self.cx, self.cy])

    def pixel2sensor(self, pp, depth=1.0):
        depth = jnp.asarray(depth)[..., None] if jnp.ndim(depth) == jnp.ndim(pp) - 1 else depth
        x = (pp[..., 0:1] - self.cx) / self.fx
        y = (pp[..., 1:2] - self.cy) / self.fy
        ones = jnp.ones_like(x)
        return jnp.concatenate([x, y, ones], axis=-1) * depth

    def world2sensor(self, pw, Twb):
        return se3_apply(se3_inv(se3_mul(Twb, self.extrinsic)), pw)

    def sensor2world(self, pc, Twb):
        return se3_apply(se3_mul(Twb, self.extrinsic), pc)

    def world2pixel(self, pw, Twb):
        return self.sensor2pixel(self.world2sensor(pw, Twb))

    def pixel2world(self, pp, Twb, depth=1.0):
        return self.sensor2world(self.pixel2sensor(pp, depth), Twb)

    def robot2sensor(self, pb):
        return se3_apply(se3_inv(self.extrinsic), pb)

    def sensor2robot(self, pc):
        return se3_apply(self.extrinsic, pc)

    def robot2pixel(self, pb):
        return self.sensor2pixel(self.robot2sensor(pb))

    def pixel2robot(self, pp, depth=1.0):
        return self.sensor2robot(self.pixel2sensor(pp, depth))

    def far(self, pw, Twb, baseline):
        """depth > 50*baseline => treat landmark as 'far' (camera.h:38-41)."""
        return self.world2sensor(pw, Twb)[..., 2] > 50.0 * baseline

    def distort(self, xy):
        """Apply radial-tangential distortion to normalized coords (..., 2)."""
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + self.k1 * r2 + self.k2 * r2 * r2
        dx = 2 * self.p1 * x * y + self.p2 * (r2 + 2 * x * x)
        dy = self.p1 * (r2 + 2 * y * y) + 2 * self.p2 * x * y
        return jnp.stack([x * radial + dx, y * radial + dy], axis=-1)

    def undistort_points(self, pp, iters: int = 5):
        """Iteratively invert distortion on pixel coords (fixed iterations)."""
        f = jnp.stack([self.fx, self.fy])
        c = jnp.stack([self.cx, self.cy])
        xy_d = (pp - c) / f
        xy = xy_d
        for _ in range(iters):
            xy = xy_d - (self.distort(xy) - xy)
        return xy * f + c


def stereo_baseline(cam0: Camera, cam1: Camera):
    """Baseline between two rigidly mounted cameras (robot-frame distance)."""
    rel = se3_mul(se3_inv(cam0.extrinsic), cam1.extrinsic)
    return jnp.linalg.norm(rel[4:])
