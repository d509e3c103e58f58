"""KITTI raw-format OXTS reader: GNSS + IMU streams.

The reference consumes KITTI raw through kitti2bag rosbags
(/kitti/oxts/imu + /kitti/oxts/gps/fix topics); this reads the raw
`oxts/` directory directly and produces the estimator's input streams:
per-sample (time, acc, gyr) and (time, ENU position).

OXTS record fields (oxts/dataformat.txt): lat lon alt roll pitch yaw ...
af al au (body-frame accelerations) ... wf wl wu (body rates) — fields
11-13 and 17-19 (0-based) are the body-frame specific force and angular
rate used here.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime
from typing import Optional

import numpy as np

from lvio_fusion_tpu.utils.geodesy import LocalCartesian


def _parse_timestamps(path: str) -> np.ndarray:
    times = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            # 2011-09-26 13:02:25.594360375
            base, frac = line.rsplit(".", 1)
            t = datetime.strptime(base, "%Y-%m-%d %H:%M:%S").timestamp()
            times.append(t + float("0." + frac))
    t = np.asarray(times)
    return t - t[0]


@dataclass
class OxtsData:
    times: np.ndarray      # (N,) seconds from first sample
    enu: np.ndarray        # (N, 3) local ENU positions
    acc: np.ndarray        # (N, 3) body-frame specific force
    gyr: np.ndarray        # (N, 3) body-frame angular rate
    rpy: np.ndarray        # (N, 3) roll/pitch/yaw (for reference)


def read_oxts(drive_dir: str) -> OxtsData:
    """drive_dir: .../2011_09_26_drive_0002_sync (contains oxts/)."""
    oxts = os.path.join(drive_dir, "oxts")
    times = _parse_timestamps(os.path.join(oxts, "timestamps.txt"))
    data_dir = os.path.join(oxts, "data")
    files = sorted(os.listdir(data_dir))
    n = min(len(times), len(files))

    lc = LocalCartesian()
    enu = np.zeros((n, 3))
    acc = np.zeros((n, 3), np.float32)
    gyr = np.zeros((n, 3), np.float32)
    rpy = np.zeros((n, 3), np.float32)
    for i in range(n):
        v = np.fromstring(open(os.path.join(data_dir, files[i])).read(),
                          sep=" ")
        enu[i] = lc.forward(v[0], v[1], v[2])
        rpy[i] = v[3:6]
        acc[i] = v[11:14]   # af, al, au
        gyr[i] = v[17:20]   # wf, wl, wu
    return OxtsData(times=times[:n], enu=enu, acc=acc, gyr=gyr, rpy=rpy)
