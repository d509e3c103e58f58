"""KITTI odometry dataset reader.

Replaces the reference's rosbag/kitti2bag intake (README.md:37-46 +
lvio_fusion_node topic callbacks): reads the standard KITTI odometry
layout directly —

    sequences/XX/image_0/*.png   left gray
    sequences/XX/image_1/*.png   right gray
    sequences/XX/velodyne/*.bin  lidar scans (optional)
    sequences/XX/times.txt
    sequences/XX/calib.txt       P0/P1 projection matrices (+ Tr velo->cam0)
    poses/XX.txt                 ground truth (optional)

Image/scan decoding goes through the native C++ loader (threaded batch
prefetch) with Python fallbacks. Frames stream lazily.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional

import jax.numpy as jnp
import numpy as np

from lvio_fusion_tpu.datasets import native
from lvio_fusion_tpu.geometry.se3 import se3_make
from lvio_fusion_tpu.geometry.so3 import mat_to_quat
from lvio_fusion_tpu.models.camera import Camera


@dataclass
class KittiFrame:
    index: int
    time: float
    left: np.ndarray
    right: np.ndarray
    scan: Optional[np.ndarray]  # (N, 4) velodyne or None


class KittiOdometry:
    def __init__(self, root: str, sequence: str = "00",
                 prefetch: int = 8, with_lidar: bool = False):
        self.seq_dir = os.path.join(root, "sequences", sequence)
        self.poses_file = os.path.join(root, "poses", f"{sequence}.txt")
        self.with_lidar = with_lidar
        self.prefetch = prefetch

        self.times = np.loadtxt(os.path.join(self.seq_dir, "times.txt"))
        self.left_files = sorted(os.listdir(
            os.path.join(self.seq_dir, "image_0")))
        self.n = min(len(self.times), len(self.left_files))
        self._parse_calib()

    def _parse_calib(self):
        calib = {}
        with open(os.path.join(self.seq_dir, "calib.txt")) as f:
            for line in f:
                if ":" in line:
                    k, v = line.split(":", 1)
                    calib[k.strip()] = np.fromstring(v, sep=" ")
        P0 = calib["P0"].reshape(3, 4)
        P1 = calib["P1"].reshape(3, 4)
        fx, fy, cx, cy = P0[0, 0], P0[1, 1], P0[0, 2], P0[1, 2]
        # right camera offset: baseline = -P1[0,3]/fx along camera x
        baseline = -P1[0, 3] / P1[0, 0]
        from lvio_fusion_tpu.geometry.se3 import se3_identity
        self.cam_left = Camera.create(fx, fy, cx, cy, se3_identity())
        self.cam_right = Camera.create(
            P1[0, 0], P1[1, 1], P1[0, 2], P1[1, 2],
            se3_make(jnp.asarray([1.0, 0, 0, 0]),
                     jnp.asarray([baseline, 0.0, 0.0])))
        self.baseline = float(baseline)
        if "Tr" in calib:
            Tr = calib["Tr"].reshape(3, 4)  # velodyne -> cam0
            q = mat_to_quat(jnp.asarray(Tr[:, :3], jnp.float32))
            self.lidar_extrinsic = np.asarray(se3_make(
                q, jnp.asarray(Tr[:, 3], jnp.float32)))
        else:
            self.lidar_extrinsic = None

    def ground_truth(self):
        """(times, poses (N,7)) from the KITTI pose file (cam0 frame)."""
        if not os.path.exists(self.poses_file):
            return None
        P = np.loadtxt(self.poses_file).reshape(-1, 3, 4)
        qs = np.asarray(mat_to_quat(jnp.asarray(P[:, :, :3], jnp.float32)))
        return (self.times[:len(P)],
                np.concatenate([qs, P[:, :, 3]], axis=1).astype(np.float32))

    def frames(self, start: int = 0, count: Optional[int] = None
               ) -> Iterator[KittiFrame]:
        end = self.n if count is None else min(self.n, start + count)
        idxs = list(range(start, end))
        B = max(1, self.prefetch)
        for b0 in range(0, len(idxs), B):
            chunk = idxs[b0:b0 + B]
            lpaths = [os.path.join(self.seq_dir, "image_0",
                                   self.left_files[i]) for i in chunk]
            rpaths = [os.path.join(self.seq_dir, "image_1",
                                   self.left_files[i]) for i in chunk]
            lefts = native.load_png_gray_batch(lpaths)
            rights = native.load_png_gray_batch(rpaths)
            scans = [None] * len(chunk)
            if self.with_lidar:
                spaths = [os.path.join(
                    self.seq_dir, "velodyne",
                    self.left_files[i].replace(".png", ".bin"))
                    for i in chunk]
                if all(os.path.exists(p) for p in spaths):
                    scans = native.load_velodyne_batch(spaths)
            for j, i in enumerate(chunk):
                yield KittiFrame(
                    index=i, time=float(self.times[i]),
                    left=np.asarray(lefts[j], np.float32) / 255.0,
                    right=np.asarray(rights[j], np.float32) / 255.0,
                    scan=scans[j])
