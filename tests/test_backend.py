"""STD loop closure + pose graph tests."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from fastlivo_tpu.backend import pose_graph as pg
from fastlivo_tpu.backend import std_loop


def make_structured_scene(rng, n=30000, layout_seed=7):
    """A scene with walls + boxes giving corners where planes meet."""
    pts = []
    # ground
    g = rng.uniform(-20, 20, (n // 3, 2))
    pts.append(np.stack([g[:, 0], g[:, 1], np.zeros(n // 3)], 1))
    # a few buildings (vertical planes with distinct corners)
    rng2 = np.random.default_rng(layout_seed)
    for _ in range(6):
        cx, cy = rng2.uniform(-15, 15, 2)
        w, d, h = rng2.uniform(3, 6, 3)
        for axis, val in ((0, -w / 2), (0, w / 2), (1, -d / 2), (1, d / 2)):
            u = rng.uniform(0, 1, (n // 40, 2))
            face = np.zeros((n // 40, 3))
            face[:, axis] = val
            face[:, 1 - axis] = (u[:, 0] - 0.5) * (d if axis == 0 else w)
            face[:, 2] = u[:, 1] * h
            face[:, 0] += cx
            face[:, 1] += cy
            pts.append(face)
        # dense vertical edges at the building corners — LiDAR returns
        # concentrate there, and they are what makes projected density
        # peaks repeatable between visits.
        for ex, ey in ((-w / 2, -d / 2), (-w / 2, d / 2), (w / 2, -d / 2), (w / 2, d / 2)):
            z = rng.uniform(0, h, n // 150)
            edge = np.stack(
                [np.full_like(z, cx + ex), np.full_like(z, cy + ey), z], 1
            )
            edge[:, :2] += rng.normal(0, 0.02, (len(z), 2))
            pts.append(edge)
    return np.concatenate(pts).astype(np.float32)


def test_fit_voxel_planes(rng):
    cloud = make_structured_scene(rng, n=20000)
    out = std_loop._fit_voxel_planes_jit(
        jnp.asarray(cloud), jnp.ones(len(cloud), bool),
        voxel_size=2.0, max_voxels=2048, min_points=10, plane_thresh=0.01,
    )
    is_plane = np.asarray(out["is_plane"])
    assert is_plane.sum() > 20
    # ground-plane voxels must have ~vertical normals
    normals = np.asarray(out["normal"])[is_plane]
    centers = np.asarray(out["center"])[is_plane]
    ground = np.abs(centers[:, 2]) < 0.5
    assert ground.sum() > 5
    assert np.all(np.abs(normals[ground][:, 2]) > 0.95)


def test_loop_detection_same_place(rng):
    """Two visits of the same structured place, second shifted by a known
    SE(3): the detector must find the loop and recover the transform."""
    cfg = std_loop.StdConfig(skip_near_num=1, corner_thre=6.0, icp_threshold=0.3)
    det = std_loop.StdLoopDetector(cfg)

    cloud1 = make_structured_scene(rng, n=40000)
    r = det.detect(cloud1)
    assert r is None  # empty database

    # a 'different place' frame to pad the database
    far = make_structured_scene(np.random.default_rng(99), n=30000, layout_seed=31)
    det.detect(far)

    # revisit: same world points observed in a drifted odometry frame:
    # cloud2 = T * cloud1-world (drift transform applied)
    rot_d = Rotation.from_euler("z", 0.1).as_matrix().astype(np.float32)
    t_d = np.array([1.5, -0.8, 0.1], np.float32)
    cloud2 = make_structured_scene(np.random.default_rng(5), n=40000)
    cloud2 = cloud2 @ rot_d.T + t_d

    result = det.detect(cloud2)
    assert result is not None, "loop not detected"
    fid, score, rot, t = result
    assert fid == 0
    assert score > 0.3
    # recovered transform maps cloud2-frame -> cloud1-frame: inverse of drift
    rot_err = Rotation.from_matrix(rot @ rot_d).magnitude()
    t_err = np.linalg.norm(rot @ t_d + t)
    assert rot_err < 0.05, rot_err
    assert t_err < 0.5, t_err


def test_pose_graph_closes_drift():
    """A square loop with accumulated yaw drift: the loop factor must pull
    the trajectory closed."""
    g = pg.PoseGraph()
    true_poses = []
    rot = np.eye(3)
    t = np.zeros(3)
    # walk a square, 4 sides x 5 steps
    for side in range(4):
        for _ in range(5):
            g.maybe_add_keyframe(rot, t, trans_thresh=0.5)
            true_poses.append((rot.copy(), t.copy()))
            t = t + rot @ np.array([1.0, 0, 0])
        rot = rot @ Rotation.from_euler("z", np.pi / 2).as_matrix()

    # corrupt: inject drift into stored poses (simulate odometry error)
    drift = Rotation.from_euler("z", 0.1).as_matrix()
    for i in range(len(g.rots)):
        alpha = i / len(g.rots)
        dr = Rotation.from_euler("z", 0.1 * alpha).as_matrix()
        g.trans[i] = g.trans[i] + np.array([0.5, 0.3, 0.0]) * alpha
        g.rots[i] = g.rots[i] @ dr

    # loop factor: last keyframe should coincide with the first
    # (identity relative pose since the square closes at ~the start).
    rel_r = true_poses[0][0].T @ true_poses[0][0]
    g.add_loop(0, len(g.rots) - 1, np.eye(3), np.zeros(3), weight=10.0)

    rots, trans = g.optimize()
    # after optimization the last pose must be near the first
    assert np.linalg.norm(trans[-1] - trans[0]) < 0.15
    # and pose 0 unchanged (anchored)
    assert np.linalg.norm(trans[0]) < 1e-3


def test_pose_graph_odometry_only_consistent():
    g = pg.PoseGraph()
    rot = np.eye(3)
    t = np.zeros(3)
    inputs = []
    for i in range(6):
        g.maybe_add_keyframe(rot, t, trans_thresh=0.5)
        inputs.append(t.copy())
        t = t + np.array([1.0, 0.2, 0.0])
    rots, trans = g.optimize()
    np.testing.assert_allclose(trans, np.asarray(inputs), atol=1e-4)


def test_keyframe_gating():
    g = pg.PoseGraph()
    assert g.maybe_add_keyframe(np.eye(3), np.zeros(3)) == 0
    assert g.maybe_add_keyframe(np.eye(3), np.array([0.1, 0, 0])) is None
    assert g.maybe_add_keyframe(np.eye(3), np.array([1.5, 0, 0])) == 1
