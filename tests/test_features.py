"""LOAM-style feature classification + normal estimation (io/features.py).

Covers the reference's give_feature / plane_judge / edge_jump_judge path
(reference: src/preprocess.cpp:683-1002, :1117) and the range-image normal
extraction analog (:130-246) on synthetic corner/plane scenes.
"""

import numpy as np

from fastlivo_tpu.io.features import classify_features, estimate_normals
from fastlivo_tpu.io.sensors import LidarScan


def _corner_scan(n_per_wall=200, noise=0.0, seed=0):
    """A horizontal sweep across a room corner: wall A (x=4 plane) then
    wall B (y=4 plane), meeting at the corner (4, 4). Points are ordered
    by sweep angle, like a time-ordered LiDAR line."""
    rng = np.random.default_rng(seed)
    # Sensor at origin; sweep angle from 20 deg to 70 deg hits wall x=4
    # until 45 deg, then wall y=4.
    angles = np.linspace(np.deg2rad(20), np.deg2rad(70), 2 * n_per_wall)
    pts = []
    for a in angles:
        d = np.array([np.cos(a), np.sin(a)])
        # Intersect the ray with whichever wall it hits first.
        t_a = 4.0 / d[0]  # x = 4
        t_b = 4.0 / d[1]  # y = 4
        t = min(t_a, t_b)
        p = t * d
        pts.append([p[0], p[1], 0.5])
    pts = np.asarray(pts, np.float32)
    if noise:
        pts += rng.normal(0, noise, pts.shape).astype(np.float32)
    t_offs = np.linspace(0, 100, len(pts)).astype(np.float32)
    return LidarScan(stamp=0.0, pts=pts, t_offs_ms=t_offs)


def test_classify_features_corner_scene():
    scan = _corner_scan()
    plane_mask, edge_mask = classify_features(scan)
    n = len(scan.pts)

    # Most of each flat wall should classify as plane points.
    interior_a = slice(20, n // 2 - 20)
    interior_b = slice(n // 2 + 20, n - 20)
    assert plane_mask[interior_a].mean() > 0.8
    assert plane_mask[interior_b].mean() > 0.8

    # Edge points should exist and concentrate at the corner (the sweep
    # index where the two walls meet).
    assert edge_mask.any()
    corner_idx = n // 2
    edge_idx = np.where(edge_mask)[0]
    assert np.min(np.abs(edge_idx - corner_idx)) <= 10

    # The corner itself must not be a plane point.
    assert not plane_mask[corner_idx - 2 : corner_idx + 2].any()


def test_classify_features_caps_and_short_scans():
    # Short scan: degenerate input returns all-false masks of the right size.
    scan = LidarScan(
        stamp=0.0,
        pts=np.zeros((5, 3), np.float32),
        t_offs_ms=np.zeros(5, np.float32),
    )
    p, e = classify_features(scan)
    assert p.shape == (5,) and e.shape == (5,)
    assert not p.any() and not e.any()

    # Per-segment edge cap: a noisy scan can't return more than
    # n_segments x max_per_segment edges.
    rng = np.random.default_rng(1)
    pts = rng.uniform(1, 5, size=(600, 3)).astype(np.float32)
    scan = LidarScan(
        stamp=0.0, pts=pts, t_offs_ms=np.arange(600, dtype=np.float32)
    )
    _, e = classify_features(scan, max_per_segment=3, n_segments=6)
    # ceil(600/6)=100 per segment -> 6 segments x 3 edges max
    assert e.sum() <= 18


def test_classify_features_occlusion_rejected():
    """A range jump caused by occlusion (foreground object edge) must not
    produce edge features on the occluded far side (edge_jump_judge parity,
    preprocess.cpp:1117)."""
    # Flat near wall segment, then a far wall (big range jump).
    n = 100
    near = np.stack(
        [np.full(n, 2.0), np.linspace(-1, 0, n), np.zeros(n)], axis=1
    )
    far = np.stack(
        [np.full(n, 20.0), np.linspace(0.05, 10, n), np.zeros(n)], axis=1
    )
    pts = np.concatenate([near, far]).astype(np.float32)
    scan = LidarScan(
        stamp=0.0, pts=pts, t_offs_ms=np.arange(2 * n, dtype=np.float32)
    )
    _, edge_mask = classify_features(scan)
    # No edges within the jump neighborhood (indices ~n-5..n+5).
    assert not edge_mask[n - 5 : n + 5].any()


def test_estimate_normals_two_planes():
    rng = np.random.default_rng(2)
    n = 400
    floor = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-3, 3, n), np.full(n, -1.0)], 1
    )
    wall = np.stack(
        [np.full(n, 4.0), rng.uniform(-3, 3, n), rng.uniform(-1, 2, n)], 1
    )
    pts = np.concatenate([floor, wall]).astype(np.float64)
    normals, valid = estimate_normals(pts, k=8)

    assert valid.mean() > 0.9
    # Floor normals ~ +-z, oriented toward the sensor (origin above floor
    # => normal points up, +z).
    nf = normals[:n][valid[:n]]
    assert np.abs(nf[:, 2]).min() > 0.95
    assert (nf[:, 2] > 0).all()  # oriented toward origin
    # Wall normals ~ +-x, oriented toward the sensor (-x).
    nw = normals[n:][valid[n:]]
    assert np.abs(nw[:, 0]).min() > 0.95
    assert (nw[:, 0] < 0).all()


def test_estimate_normals_isolated_points_invalid():
    """Points with no close neighbors (radius gate) must come back invalid."""
    rng = np.random.default_rng(3)
    n = 200
    plane = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), np.zeros(n)], 1
    )
    stragglers = np.array([[50.0, 50.0, 50.0], [-60.0, 10.0, 30.0]])
    pts = np.concatenate([plane, stragglers])
    _, valid = estimate_normals(pts, k=8, max_radius=1.0)
    assert not valid[-2:].any()
