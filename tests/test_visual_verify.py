"""Visual loop verification: matcher on rendered views + essential pose."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from fastlivo_tpu.backend import visual_verify as vv
from fastlivo_tpu.io import render
from fastlivo_tpu.io import features
from fastlivo_tpu.io.sensors import LidarScan
from fastlivo_tpu.ops.camera import Pinhole

CAM = Pinhole(width=320, height=256, fx=200.0, fy=200.0, cx=160.0, cy=128.0)
jrender = jax.jit(render.render_room, static_argnames="cam")


def render_pose(rot_wc, pos):
    rcw = np.asarray(rot_wc).T
    pcw = -rcw @ np.asarray(pos)
    return np.asarray(jrender(CAM, jnp.asarray(rcw, jnp.float32), jnp.asarray(pcw, jnp.float32)))


BASE = Rotation.from_euler("x", -90, degrees=True).as_matrix()


def test_same_view_matches():
    img = render_pose(BASE, [0, 0, 0])
    ok, res = vv.verify_loop(img, img)
    assert ok
    assert res.match_ratio > 0.5
    np.testing.assert_allclose(res.pts1, res.pts2, atol=0.6)


def test_nearby_view_matches_distant_rejected():
    img1 = render_pose(BASE, [0.0, 0.0, 0.0])
    img2 = render_pose(
        BASE @ Rotation.from_rotvec([0, 0.02, 0.02]).as_matrix(), [0.15, 0.1, 0.02]
    )
    ok, res = vv.verify_loop(img1, img2)
    assert ok, f"ratio {res.match_ratio}"

    img3 = render_pose(
        BASE @ Rotation.from_euler("y", 140, degrees=True).as_matrix(),
        [4.0, 3.0, 0.5],
    )
    ok3, res3 = vv.verify_loop(img1, img3)
    assert res3.match_ratio < res.match_ratio


def test_essential_pose_direction():
    t_true = np.array([0.4, 0.05, 0.0])
    img1 = render_pose(BASE, [0, 0, 0])
    img2 = render_pose(BASE, t_true)
    ok, res = vv.verify_loop(img1, img2)
    assert ok and len(res.pts1) >= 20
    out = vv.essential_pose(res, CAM)
    assert out is not None
    rot, t, inl = out
    assert inl >= 12
    # rotation ~ identity
    assert Rotation.from_matrix(rot).magnitude() < 0.08
    # translation direction (in camera frame of view 2, up to sign/scale):
    # camera x axis = world x here, so |t| should be dominated by x
    assert abs(t[0]) > 0.8, t


def test_superpoint_interface_raises():
    with pytest.raises(FileNotFoundError):
        vv.SuperPointLightGlue(None)


def test_feature_classification(rng):
    # synthetic "sweep": smooth arc (wall) with one sharp depth jump (edge)
    n = 720
    ang = np.linspace(-0.5, 0.5, n)
    r = np.full(n, 10.0)
    r[360:] = 4.0  # depth discontinuity at index 360
    pts = np.stack([r * np.cos(ang), r * np.sin(ang), np.zeros(n)], 1).astype(
        np.float32
    )
    scan = LidarScan(stamp=0.0, pts=pts, t_offs_ms=np.arange(n, dtype=np.float32))
    plane_mask, edge_mask = features.classify_features(scan)
    assert plane_mask.sum() > n // 2  # most of the smooth arc is planar
    # the discontinuity neighborhood is flagged as edge
    assert edge_mask[350:370].any()


def test_normal_estimation(rng):
    pts = np.zeros((500, 3), np.float32)
    pts[:, :2] = rng.uniform(-3, 3, (500, 2))
    pts[:, 2] = 5.0  # plane z=5 viewed from origin
    normals, ok = features.estimate_normals(pts)
    assert ok.mean() > 0.9
    nz = np.abs(normals[ok][:, 2])
    assert (nz > 0.99).mean() > 0.95
