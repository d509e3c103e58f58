"""Config loader compatible with the reference's OpenCV-YAML files.

The reference reads per-dataset YAMLs (e.g. kitti.yaml) through
`cv::FileStorage` with `Config::Get<T>(key)` (reference config.h:24-30).
Those files start with ``%YAML:1.0`` and embed ``!!opencv-matrix`` nodes;
this loader normalizes both so standard PyYAML can parse them, and exposes
the same flat key lookup plus typed helpers to build sensor models.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np
import yaml

from lvio_fusion_tpu.geometry.so3 import mat_to_quat
from lvio_fusion_tpu.geometry.se3 import se3_make

import jax.numpy as jnp


def _opencv_matrix_constructor(loader, node):
    mapping = loader.construct_mapping(node, deep=True)
    data = np.array(mapping["data"], dtype=np.float64)
    return data.reshape(mapping["rows"], mapping["cols"])


def loads(text: str) -> dict:
    text = re.sub(r"^%YAML:\d+\.\d+\s*", "", text)
    # normalize "!!opencv-matrix" tag to an explicit local tag pyyaml accepts
    text = text.replace("!!opencv-matrix", "!opencv-matrix")

    class _Loader(yaml.SafeLoader):
        pass

    _Loader.add_constructor("!opencv-matrix", _opencv_matrix_constructor)
    return yaml.load(text, Loader=_Loader) or {}


def load(path: str) -> "Config":
    with open(path) as f:
        return Config(loads(f.read()))


class Config:
    """Flat typed key lookup over a parsed config dict (Config::Get<T>)."""

    def __init__(self, data: dict):
        self._data = data

    def get(self, key: str, default: Any = None) -> Any:
        return self._data.get(key, default)

    def __contains__(self, key):
        return key in self._data

    def mat44_to_se3(self, key: str):
        """Read a 4x4 homogeneous matrix entry into an SE3 7-vector."""
        m = np.asarray(self._data[key], dtype=np.float64)
        q = mat_to_quat(jnp.asarray(m[:3, :3], dtype=jnp.float32))
        return se3_make(q, jnp.asarray(m[:3, 3], dtype=jnp.float32))

    def flags(self) -> dict:
        """Sensor-suite flags (reference estimator.h:18-27 Flag enum)."""
        return {
            "use_imu": bool(self.get("use_imu", 0)),
            "use_lidar": bool(self.get("use_lidar", 0)),
            "use_navsat": bool(self.get("use_navsat", 0)),
            "use_loop": bool(self.get("use_loop", 0)),
            "use_adapt": bool(self.get("use_adapt", 0)),
        }
