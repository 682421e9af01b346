"""Trajectory and point-cloud export.

Capability parity with the reference's outputs: TUM-format trajectories
(reference: src/laser_mapping.cpp:1440-1442 `tum.txt`, :1195-1211
`loop_tum.txt`) and PCD map dumps at shutdown (laser_mapping.cpp:286-307).
"""

from __future__ import annotations

import struct
from typing import Iterable, Sequence, Tuple

import numpy as np


def write_tum(
    path: str, trajectory: Iterable[Tuple[float, np.ndarray, np.ndarray]]
) -> None:
    """TUM format: `t x y z qx qy qz qw` per line. Quaternions arrive as
    (w, x, y, z) from `so3.rot_to_quat` and are reordered here."""
    with open(path, "w") as f:
        for t, pos, q_wxyz in trajectory:
            w, x, y, z = (float(v) for v in q_wxyz)
            f.write(
                f"{t:.6f} {pos[0]:.6f} {pos[1]:.6f} {pos[2]:.6f} "
                f"{x:.6f} {y:.6f} {z:.6f} {w:.6f}\n"
            )


def read_tum(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (stamps (N,), positions (N,3), quats_wxyz (N,4))."""
    data = np.loadtxt(path).reshape(-1, 8)
    stamps = data[:, 0]
    pos = data[:, 1:4]
    q = data[:, [7, 4, 5, 6]]  # xyzw -> wxyz
    return stamps, pos, q


def write_pcd(
    path: str,
    pts: np.ndarray,
    intensity: np.ndarray | None = None,
    binary: bool = True,
) -> None:
    """Minimal PCD v0.7 writer (x y z [intensity])."""
    n = len(pts)
    fields = "x y z" + (" intensity" if intensity is not None else "")
    count = "1 1 1" + (" 1" if intensity is not None else "")
    size = "4 4 4" + (" 4" if intensity is not None else "")
    typ = "F F F" + (" F" if intensity is not None else "")
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        f"FIELDS {fields}\n"
        f"SIZE {size}\n"
        f"TYPE {typ}\n"
        f"COUNT {count}\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        f"DATA {'binary' if binary else 'ascii'}\n"
    )
    arr = pts.astype(np.float32)
    if intensity is not None:
        arr = np.concatenate([arr, intensity.astype(np.float32)[:, None]], axis=1)
    with open(path, "wb") as f:
        f.write(header.encode())
        if binary:
            f.write(np.ascontiguousarray(arr).tobytes())
        else:
            np.savetxt(f, arr, fmt="%.6f")


def colorize_cloud(
    pts_world: np.ndarray,
    img: np.ndarray,
    rcw: np.ndarray,
    pcw: np.ndarray,
    cam,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-point intensity/color by reprojection into the current frame
    (parity with publish_frame_world_rgb / RGBpointBodyToWorld,
    laser_mapping.cpp:1351-1423 which colors the world cloud through the
    live camera). Returns (values (N,) or (N,3), visible_mask (N,))."""
    import jax.numpy as jnp

    from fastlivo_tpu.ops import image as img_ops

    p_c = pts_world @ rcw.T + pcw
    uv = np.asarray(cam.project(jnp.asarray(p_c, jnp.float32)))
    vis = (p_c[:, 2] > 0.1) & (
        (uv[:, 0] >= 1)
        & (uv[:, 0] < cam.width - 1)
        & (uv[:, 1] >= 1)
        & (uv[:, 1] < cam.height - 1)
    )
    if img.ndim == 2:
        vals = np.asarray(
            img_ops.bilinear(jnp.asarray(img, jnp.float32), jnp.asarray(uv, jnp.float32))
        )
    else:
        vals = np.stack(
            [
                np.asarray(
                    img_ops.bilinear(
                        jnp.asarray(img[..., c], jnp.float32),
                        jnp.asarray(uv, jnp.float32),
                    )
                )
                for c in range(img.shape[-1])
            ],
            axis=-1,
        )
    return vals, vis


def map_to_cloud(lidar_map, max_points: int | None = None) -> np.ndarray:
    """Extract all valid points from a VoxelHashMap arena as (N, 3)."""
    counts = np.asarray(lidar_map.counts)
    pts = np.asarray(lidar_map.points)
    s = pts.shape[1]
    valid = np.arange(s)[None, :] < counts[:, None]
    cloud = pts[valid]
    if max_points is not None and len(cloud) > max_points:
        idx = np.random.default_rng(0).choice(len(cloud), max_points, replace=False)
        cloud = cloud[idx]
    return cloud
