"""GNSS-fused LIO pipeline on a synthetic sequence: the ENU->world yaw must
be recovered and the observation blocks applied without degrading ATE."""

import numpy as np
import jax.numpy as jnp

from fastlivo_tpu.io import synthetic
from fastlivo_tpu.io.sync import MeasurementSynchronizer, WindowBuilder
from fastlivo_tpu.models.pipeline import LivoPipeline
from fastlivo_tpu.utils.config import FastLivoConfig
from fastlivo_tpu.utils.metrics import ate_rmse

T_UNIX0 = 1.7e9


def test_lio_with_gnss(rng):
    seq = synthetic.generate(
        duration=4.0, imu_rate=100.0, scan_rate=10.0, pts_per_scan=6000, seed=5
    )
    gnss_samples = synthetic.generate_gnss(
        seq, yaw_enu_to_world=0.4, rate=10.0, noise_m=0.02
    )

    cfg = FastLivoConfig()
    cfg.lio.max_points = 8192
    cfg.map.capacity = 1 << 16
    cfg.imu.imu_int_frame = 32
    cfg.gnss.gnss_en = True
    cfg.gnss.init_window = 10

    pipe = LivoPipeline(cfg)
    for s in gnss_samples:
        pipe.gnss.push(s)
    pipe.initializer.done = True
    pipe.initializer.mean_acc = np.array([0.0, 0.0, 9.81])
    pipe.initializer.mean_gyr = np.zeros(3)
    pipe.state = pipe.initializer.initial_state()

    sync = MeasurementSynchronizer(img_enabled=False)
    builder = WindowBuilder(n_pts=8192, imu_window=32)
    imu_iter = iter(seq.imu)
    pending = next(imu_iter)
    est = []
    for scan in seq.scans:
        sync.push_lidar(scan)
        while pending is not None and pending.stamp < scan.end_time + 0.05:
            sync.push_imu(pending)
            pending = next(imu_iter, None)
        group = sync.next_group()
        if group is None:
            continue
        si, t_abs = builder.build(group)
        si = si._replace(acc_scale=np.float32(1.0))
        info = pipe.process_scan(si, T_UNIX0 + t_abs)
        if info is not None:
            est.append((t_abs, np.asarray(pipe.state.pos)))

    assert pipe.gnss.initialized, "GNSS alignment did not initialize"
    # Yaw recovered.
    from scipy.spatial.transform import Rotation

    yaw_est = Rotation.from_matrix(pipe.gnss.rot_we).as_euler("zyx")[0]
    assert abs(yaw_est - 0.4) < 0.05, yaw_est

    est_t = np.array([t for t, _ in est])
    est_p = np.array([p for _, p in est])
    gt_p = np.stack(
        [seq.gt_pos[np.argmin(np.abs(seq.gt_stamps - t))] for t in est_t]
    )
    err = ate_rmse(est_p, gt_p)
    assert err < 0.06, f"GNSS-fused ATE {err * 100:.1f} cm"
