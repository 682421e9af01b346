"""Per-vendor LiDAR decoding + filtering (host-side NumPy, vectorized).

Capability parity with the reference's `Preprocess`
(reference: src/preprocess.cpp — avia_handler :249, oust64_handler :354,
velodyne_handler :459, xt32_handler :641; blind/tag/decimation filters and
ms time offsets stored in `curvature`). Instead of ROS messages, decoders
take structured field arrays (as extracted from vendor logs / bag dumps)
and return a time-sorted `LidarScan`.

All handlers apply, in reference order:
  1. vendor field extraction + per-point relative time (-> ms),
  2. tag/ring validity (Avia tag & 0x30 in {0x00, 0x10}),
  3. blind-range and max-range gates on the horizontal radius,
  4. `point_filter_num` decimation (keep every Nth point).
"""

from __future__ import annotations

from enum import IntEnum
from typing import Dict, Optional

import numpy as np

from fastlivo_tpu.io.sensors import LidarScan
from fastlivo_tpu.utils.config import LidarParams


class LidarType(IntEnum):
    """reference: preprocess.h:14 LID_TYPE enum."""

    AVIA = 1
    VELO16 = 2
    OUST64 = 3
    XT32 = 4


def _finish(
    stamp: float,
    pts: np.ndarray,
    t_ms: np.ndarray,
    intensity: Optional[np.ndarray],
    keep: np.ndarray,
    params: LidarParams,
) -> LidarScan:
    r2 = pts[:, 0] ** 2 + pts[:, 1] ** 2
    keep = (
        keep
        & np.isfinite(pts).all(axis=1)
        & (r2 > params.blind**2)
        & (r2 < params.max_range**2)
    )
    if params.point_filter_num > 1:
        dec = np.zeros(len(pts), bool)
        dec[:: params.point_filter_num] = True
        keep = keep & dec
    scan = LidarScan(
        stamp=stamp,
        pts=np.ascontiguousarray(pts[keep], np.float32),
        t_offs_ms=np.ascontiguousarray(t_ms[keep], np.float32),
        intensity=None if intensity is None else np.ascontiguousarray(intensity[keep], np.float32),
    )
    return scan.sort_by_time()


def decode_avia(
    stamp: float, fields: Dict[str, np.ndarray], params: LidarParams
) -> LidarScan:
    """Livox Avia custom message (reference: preprocess.cpp:249-352).

    fields: x, y, z, reflectivity, offset_time (ns), line, tag.
    """
    pts = np.stack([fields["x"], fields["y"], fields["z"]], axis=1)
    t_ms = fields["offset_time"].astype(np.float64) / 1e6
    tag = fields.get("tag")
    line = fields.get("line")
    keep = np.ones(len(pts), bool)
    if tag is not None:
        t30 = tag.astype(np.int64) & 0x30
        keep &= (t30 == 0x10) | (t30 == 0x00)
    if line is not None:
        keep &= line < params.scan_line
    return _finish(stamp, pts, t_ms, fields.get("reflectivity"), keep, params)


def decode_velodyne(
    stamp: float, fields: Dict[str, np.ndarray], params: LidarParams
) -> LidarScan:
    """Velodyne-16 (reference: preprocess.cpp:459-640).

    fields: x, y, z, intensity, ring, time (s relative to scan start).
    If `time` is absent, per-point times are reconstructed from azimuth at
    a 10 Hz sweep (the reference's given_offset_time=false branch).
    """
    pts = np.stack([fields["x"], fields["y"], fields["z"]], axis=1)
    if "time" in fields:
        t_ms = fields["time"].astype(np.float64) * 1e3
    else:
        az = np.degrees(np.arctan2(fields["y"], fields["x"]))
        az0 = az[0]
        rel = (az0 - az) % 360.0  # clockwise sweep
        t_ms = rel / 360.0 * 100.0  # 10 Hz -> 100 ms per rev
    keep = np.ones(len(pts), bool)
    ring = fields.get("ring")
    if ring is not None:
        keep &= ring < max(params.scan_line, 16)
    return _finish(stamp, pts, t_ms, fields.get("intensity"), keep, params)


def decode_ouster64(
    stamp: float, fields: Dict[str, np.ndarray], params: LidarParams
) -> LidarScan:
    """Ouster-64 (reference: preprocess.cpp:354-457).

    fields: x, y, z, intensity, t (ns relative), ring.
    """
    pts = np.stack([fields["x"], fields["y"], fields["z"]], axis=1)
    t_ms = fields["t"].astype(np.float64) / 1e6
    keep = np.ones(len(pts), bool)
    return _finish(stamp, pts, t_ms, fields.get("intensity"), keep, params)


def decode_xt32(
    stamp: float, fields: Dict[str, np.ndarray], params: LidarParams
) -> LidarScan:
    """Hesai XT32 (reference: preprocess.cpp:641-682).

    fields: x, y, z, intensity, timestamp (s, absolute), ring.
    """
    pts = np.stack([fields["x"], fields["y"], fields["z"]], axis=1)
    t_ms = (fields["timestamp"].astype(np.float64) - stamp) * 1e3
    keep = np.ones(len(pts), bool)
    return _finish(stamp, pts, t_ms, fields.get("intensity"), keep, params)


_DECODERS = {
    LidarType.AVIA: decode_avia,
    LidarType.VELO16: decode_velodyne,
    LidarType.OUST64: decode_ouster64,
    LidarType.XT32: decode_xt32,
}


def decode(
    lidar_type: int,
    stamp: float,
    fields: Dict[str, np.ndarray],
    params: LidarParams,
) -> LidarScan:
    """Dispatch on LID_TYPE (reference: Preprocess::process, preprocess.h:104)."""
    return _DECODERS[LidarType(lidar_type)](stamp, fields, params)
