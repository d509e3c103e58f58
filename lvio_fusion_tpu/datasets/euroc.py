"""EuRoC MAV dataset reader (ASL format).

The reference's test matrix includes EuRoC via `config/euroc.yaml`
(stereo VO on /cam0 + /cam1 topics; rosbag playback). This reads the ASL
directory layout directly:

    mav0/cam0/data.csv                 timestamp [ns], filename
    mav0/cam0/data/<ts>.png            left gray
    mav0/cam1/...                      right gray
    mav0/imu0/data.csv                 ts, wx wy wz [rad/s], ax ay az [m/s2]
    mav0/state_groundtruth_estimate0/data.csv   ts, p(3), q(wxyz), v, bw, ba

Camera intrinsics/extrinsics come from a reference-format YAML
(`Estimator.from_config` parses the shipped euroc.yaml as-is), exactly
like the KAIST path. Stereo pairs are associated by timestamp (cam0/cam1
are hardware-synced; tolerance guards dropped frames). Images decode
through the native C++ loader with Python fallback.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from lvio_fusion_tpu.datasets import native

NS = 1e-9


@dataclass
class EurocFrame:
    index: int
    time: float
    left: np.ndarray
    right: np.ndarray


@dataclass
class ImuStream:
    times: np.ndarray
    acc: np.ndarray
    gyr: np.ndarray


def _read_cam_csv(path: str):
    """(timestamps int64, filenames list) from a cam data.csv."""
    ts, names = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(",")
            ts.append(int(parts[0]))
            names.append(parts[1].strip())
    return np.asarray(ts, np.int64), names


class EurocMav:
    def __init__(self, root: str, prefetch: int = 8,
                 sync_tol_ms: float = 2.0):
        mav = os.path.join(root, "mav0")
        if not os.path.isdir(mav):
            mav = root  # allow pointing straight at mav0
        self.mav = mav
        self.prefetch = prefetch
        self.t_left, self.f_left = _read_cam_csv(
            os.path.join(mav, "cam0", "data.csv"))
        self.t_right, self.f_right = _read_cam_csv(
            os.path.join(mav, "cam1", "data.csv"))
        self.t0 = int(self.t_left[0])
        # associate stereo pairs by nearest timestamp
        tol = int(sync_tol_ms * 1e6)
        j = np.searchsorted(self.t_right, self.t_left)
        j = np.clip(j, 0, len(self.t_right) - 1)
        jm = np.clip(j - 1, 0, len(self.t_right) - 1)
        pick = np.where(
            np.abs(self.t_right[jm] - self.t_left)
            < np.abs(self.t_right[j] - self.t_left), jm, j)
        ok = np.abs(self.t_right[pick] - self.t_left) <= tol
        self.pairs = [(i, int(pick[i])) for i in np.where(ok)[0]]
        self.n = len(self.pairs)

    def _sec(self, stamp_ns) -> float:
        return float((np.int64(stamp_ns) - self.t0) * NS)

    def imu(self) -> Optional[ImuStream]:
        p = os.path.join(self.mav, "imu0", "data.csv")
        if not os.path.exists(p):
            return None
        raw = np.loadtxt(p, delimiter=",", ndmin=2)
        t = (raw[:, 0].astype(np.int64) - self.t0) * NS
        gyr = raw[:, 1:4].astype(np.float32)
        acc = raw[:, 4:7].astype(np.float32)
        return ImuStream(times=t.astype(np.float64), acc=acc, gyr=gyr)

    def ground_truth(self):
        """(times, poses (N,7) [qw qx qy qz, t]) from the GT estimate, or
        None. TUM-convention reshuffle: ASL stores p(3) then q(wxyz)."""
        p = os.path.join(self.mav, "state_groundtruth_estimate0",
                         "data.csv")
        if not os.path.exists(p):
            return None
        raw = np.loadtxt(p, delimiter=",", ndmin=2)
        t = (raw[:, 0].astype(np.int64) - self.t0) * NS
        poses = np.concatenate([raw[:, 4:8], raw[:, 1:4]],
                               axis=1).astype(np.float32)
        return t.astype(np.float64), poses

    def frames(self, start: int = 0, count: Optional[int] = None
               ) -> Iterator[EurocFrame]:
        end = self.n if count is None else min(self.n, start + count)
        idxs = list(range(start, end))
        B = max(1, self.prefetch)
        ld = os.path.join(self.mav, "cam0", "data")
        rd = os.path.join(self.mav, "cam1", "data")
        for b0 in range(0, len(idxs), B):
            chunk = idxs[b0:b0 + B]
            lp = [os.path.join(ld, self.f_left[self.pairs[i][0]])
                  for i in chunk]
            rp = [os.path.join(rd, self.f_right[self.pairs[i][1]])
                  for i in chunk]
            lefts = native.load_png_gray_batch(lp)
            rights = native.load_png_gray_batch(rp)
            for j, i in enumerate(chunk):
                li = self.pairs[i][0]
                yield EurocFrame(
                    index=i, time=self._sec(self.t_left[li]),
                    left=np.asarray(lefts[j], np.float32) / 255.0,
                    right=np.asarray(rights[j], np.float32) / 255.0)
