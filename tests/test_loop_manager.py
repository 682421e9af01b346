"""Loop backend end-to-end: a drifted revisit must produce a loop factor
that pulls the pose graph back toward truth."""

import numpy as np
from scipy.spatial.transform import Rotation

from fastlivo_tpu.backend.loop_manager import LoopBackend
from fastlivo_tpu.utils.config import FastLivoConfig
from tests.test_backend import make_structured_scene


def run_backend(background: bool):
    cfg = FastLivoConfig()
    cfg.loop.loop_en = True
    cfg.loop.sub_frame_num = 5
    cfg.loop.skip_near_num = 1
    cfg.loop.corner_thre = 6.0
    cfg.loop.icp_threshold = 0.3
    cfg.keyframe.trans_thresh_m = 0.5
    be = LoopBackend(cfg, background=background)

    rng = np.random.default_rng(3)
    place_a = make_structured_scene(rng, n=30000)

    # drift: by the time we return to A, odometry is off by this transform
    rot_d = Rotation.from_euler("z", 0.08).as_matrix()
    t_d = np.array([1.2, -0.6, 0.05])

    true_poses = []
    # visit A (5 scans, poses walking slowly)
    for i in range(5):
        pos = np.array([0.6 * i, 0.0, 0.0])
        be.on_scan(np.eye(3), pos, place_a[rng.permutation(len(place_a))[:15000]])
        true_poses.append(pos)
    # away (5 scans at a different place)
    place_b = make_structured_scene(np.random.default_rng(50), n=20000, layout_seed=77)
    for i in range(5):
        pos = np.array([40.0 + 0.6 * i, 10.0, 0.0])
        be.on_scan(np.eye(3), pos, place_b + pos * 0)
        true_poses.append(pos)
    # return to A with drift: odometry-frame cloud = drift(world)
    place_a2 = make_structured_scene(np.random.default_rng(9), n=30000)
    cloud_drifted = place_a2 @ rot_d.T + t_d
    for i in range(5):
        pos_true = np.array([0.6 * i, 0.2, 0.0])
        pos_odo = rot_d @ pos_true + t_d
        be.on_scan(rot_d, pos_odo, cloud_drifted[rng.permutation(len(cloud_drifted))[:15000]])
        true_poses.append(pos_true)

    be.finish()
    return be, true_poses


def test_loop_backend_corrects_drift():
    be, true_poses = run_backend(background=False)
    assert len(be.loops) >= 1, "no loop detected"
    ev = be.loops[-1]
    assert ev.score > 0.3

    rots, trans = be.corrected_trajectory()
    # the last keyframe was at drifted pose; after correction it should be
    # near its true position
    err_before = np.linalg.norm(be.graph.trans[-1] - true_poses[-1])
    err_after = np.linalg.norm(trans[-1] - true_poses[-1])
    assert err_after < 0.5 * err_before + 0.05, (err_before, err_after)


def test_loop_backend_background_thread():
    be, _ = run_backend(background=True)
    assert len(be.loops) >= 1
