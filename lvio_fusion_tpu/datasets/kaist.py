"""KAIST Complex Urban dataset reader (urban28/urban39 sensor suite).

The reference consumes KAIST through rosbags with the kaist28/39 YAML
configs (`/root/reference/src/lvio_fusion_node/config/kaist28.yaml`:
stereo + xsens IMU + GPS; kaist39 adds a VLP-16). This reads the raw
"Complex Urban Data Set" directory layout directly and produces the
estimator's time-sorted input streams.

Expected layout (the dataset's published `sensor_data/` format; file
names are nanosecond timestamps):

    <root>/sensor_data/
        stereo_stamp.csv            one ns timestamp per line
        stereo/left/<ns>.png        left gray (or Bayer-coded) image
        stereo/right/<ns>.png
        xsens_imu.csv               ns, qx,qy,qz,qw, ex,ey,ez,
                                    wx,wy,wz (rad/s), ax,ay,az (m/s^2), ...
        gps.csv                     ns, latitude, longitude, altitude, cov...
        VLP_left_stamp.csv          one ns timestamp per line (optional)
        VLP_left/<ns>.bin           float32 x y z intensity (optional)

Timestamps are re-based to seconds from the first stereo frame. GPS
lat/lon/alt is converted to local ENU (utils.geodesy, the reference's
GeographicLib LocalCartesian path, lvio_fusion_node.cpp:196-213).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from lvio_fusion_tpu.datasets import native
from lvio_fusion_tpu.utils.geodesy import LocalCartesian

NS = 1e-9


@dataclass
class KaistFrame:
    index: int
    time: float
    left: np.ndarray
    right: np.ndarray


@dataclass
class ImuStream:
    times: np.ndarray  # (N,) seconds
    acc: np.ndarray    # (N, 3)
    gyr: np.ndarray    # (N, 3)


@dataclass
class GpsStream:
    times: np.ndarray  # (N,) seconds
    enu: np.ndarray    # (N, 3)


def _read_stamps(path: str) -> np.ndarray:
    return np.loadtxt(path, dtype=np.int64, usecols=0, ndmin=1)


class KaistUrban:
    def __init__(self, root: str, prefetch: int = 8,
                 with_lidar: bool = False):
        sd = os.path.join(root, "sensor_data")
        self.sd = sd
        self.with_lidar = with_lidar
        self.prefetch = prefetch
        self.stamps = _read_stamps(os.path.join(sd, "stereo_stamp.csv"))
        self.t0 = int(self.stamps[0])
        # tolerate missing files at the tail (truncated downloads)
        self.left_dir = os.path.join(sd, "stereo", "left")
        self.right_dir = os.path.join(sd, "stereo", "right")
        self.n = len(self.stamps)
        self.lidar_stamps = None
        if with_lidar:
            p = os.path.join(sd, "VLP_left_stamp.csv")
            if os.path.exists(p):
                self.lidar_stamps = _read_stamps(p)

    def _sec(self, stamp_ns) -> float:
        return float((np.int64(stamp_ns) - self.t0) * NS)

    def imu(self) -> ImuStream:
        """xsens_imu.csv columns: t, quat(4), euler(3), gyro(3), acc(3)..."""
        raw = np.loadtxt(os.path.join(self.sd, "xsens_imu.csv"),
                         delimiter=",", ndmin=2)
        t = (raw[:, 0].astype(np.int64) - self.t0) * NS
        gyr = raw[:, 8:11].astype(np.float32)
        acc = raw[:, 11:14].astype(np.float32)
        return ImuStream(times=t.astype(np.float64), acc=acc, gyr=gyr)

    def gps(self) -> GpsStream:
        """gps.csv columns: t, lat, lon, alt, covariance..."""
        raw = np.loadtxt(os.path.join(self.sd, "gps.csv"),
                         delimiter=",", ndmin=2)
        t = (raw[:, 0].astype(np.int64) - self.t0) * NS
        lc = LocalCartesian()
        enu = np.stack([lc.forward(la, lo, al)
                        for la, lo, al in raw[:, 1:4]])
        return GpsStream(times=t.astype(np.float64),
                         enu=enu.astype(np.float64))

    def lidar_scan(self, i: int) -> Optional[np.ndarray]:
        """(N, 4) float32 x y z intensity of VLP_left scan i."""
        if self.lidar_stamps is None:
            return None
        p = os.path.join(self.sd, "VLP_left",
                         f"{int(self.lidar_stamps[i])}.bin")
        if not os.path.exists(p):
            return None
        return np.fromfile(p, np.float32).reshape(-1, 4)

    def frames(self, start: int = 0, count: Optional[int] = None
               ) -> Iterator[KaistFrame]:
        end = self.n if count is None else min(self.n, start + count)
        idxs = [i for i in range(start, end)
                if os.path.exists(os.path.join(
                    self.left_dir, f"{int(self.stamps[i])}.png"))]
        B = max(1, self.prefetch)
        for b0 in range(0, len(idxs), B):
            chunk = idxs[b0:b0 + B]
            lp = [os.path.join(self.left_dir, f"{int(self.stamps[i])}.png")
                  for i in chunk]
            rp = [os.path.join(self.right_dir, f"{int(self.stamps[i])}.png")
                  for i in chunk]
            lefts = native.load_png_gray_batch(lp)
            rights = native.load_png_gray_batch(rp)
            for j, i in enumerate(chunk):
                yield KaistFrame(
                    index=i, time=self._sec(self.stamps[i]),
                    left=np.asarray(lefts[j], np.float32) / 255.0,
                    right=np.asarray(rights[j], np.float32) / 255.0)
