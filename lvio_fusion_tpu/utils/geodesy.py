"""Geodetic -> local ENU conversion.

Replaces the reference's GeographicLib::LocalCartesian usage
(lvio_fusion_node.cpp:196-213): GNSS lat/lon/alt fixes are converted to a
local East-North-Up frame anchored at the first fix before entering the
estimator. WGS-84 ellipsoid, standard ECEF round trip.
"""

from __future__ import annotations

import numpy as np

_A = 6378137.0                # WGS-84 semi-major axis
_F = 1.0 / 298.257223563      # flattening
_E2 = _F * (2.0 - _F)         # first eccentricity squared


def geodetic_to_ecef(lat_deg, lon_deg, alt):
    lat = np.radians(lat_deg)
    lon = np.radians(lon_deg)
    s, c = np.sin(lat), np.cos(lat)
    n = _A / np.sqrt(1.0 - _E2 * s * s)
    x = (n + alt) * c * np.cos(lon)
    y = (n + alt) * c * np.sin(lon)
    z = (n * (1.0 - _E2) + alt) * s
    return np.stack(np.broadcast_arrays(x, y, z), axis=-1)


class LocalCartesian:
    """ENU frame anchored at the first fix (GeographicLib semantics)."""

    def __init__(self):
        self._origin = None
        self._rot = None

    def reset(self, lat_deg, lon_deg, alt):
        self._origin = geodetic_to_ecef(lat_deg, lon_deg, alt)
        lat = np.radians(lat_deg)
        lon = np.radians(lon_deg)
        sl, cl = np.sin(lat), np.cos(lat)
        so, co = np.sin(lon), np.cos(lon)
        # rows: east, north, up (ECEF -> ENU rotation)
        self._rot = np.array([
            [-so, co, 0.0],
            [-sl * co, -sl * so, cl],
            [cl * co, cl * so, sl],
        ])

    def forward(self, lat_deg, lon_deg, alt):
        """lat/lon/alt -> ENU (meters). Anchors on the first call."""
        if self._origin is None:
            self.reset(lat_deg, lon_deg, alt)
        ecef = geodetic_to_ecef(lat_deg, lon_deg, alt)
        return self._rot @ (ecef - self._origin)
