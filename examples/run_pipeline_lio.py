"""Drive the full LIO pipeline (sync -> window builder -> fused device
step -> TUM/PCD export) on a synthetic motion-distorted sequence.

Usage: PYTHONPATH=/root/repo python examples/run_pipeline_lio.py [--cpu]
"""

import sys
import time

if "--cpu" in sys.argv:
    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from fastlivo_tpu.io import export, synthetic
from fastlivo_tpu.io.sync import MeasurementSynchronizer, WindowBuilder
from fastlivo_tpu.models.pipeline import LivoPipeline
from fastlivo_tpu.utils.config import FastLivoConfig
from fastlivo_tpu.utils.metrics import ate_rmse


def main():
    print("generating synthetic sequence (8 s, 10 Hz scans, distorted)...")
    seq = synthetic.generate(
        duration=8.0, imu_rate=200.0, scan_rate=10.0, pts_per_scan=12000, seed=3
    )

    cfg = FastLivoConfig()
    cfg.lio.max_points = 8192
    cfg.map.capacity = 1 << 17
    cfg.imu.imu_int_frame = 64

    pipe = LivoPipeline(cfg)
    # Known-rest initialization (synthetic starts moving at t=0).
    pipe.initializer.done = True
    pipe.initializer.mean_acc = np.array([0.0, 0.0, 9.81])
    pipe.initializer.mean_gyr = np.zeros(3)
    pipe.state = pipe.initializer.initial_state()

    sync = MeasurementSynchronizer(img_enabled=False)
    builder = WindowBuilder(n_pts=16384, imu_window=cfg.imu.imu_int_frame)

    imu_iter = iter(seq.imu)
    pending = next(imu_iter)
    est_t, est_p = [], []
    t0 = time.perf_counter()
    for scan in seq.scans:
        sync.push_lidar(scan)
        while pending is not None and pending.stamp < scan.end_time + 0.05:
            sync.push_imu(pending)
            pending = next(imu_iter, None)
        group = sync.next_group()
        if group is None:
            continue
        scan_input, t_abs = builder.build(group)
        scan_input = scan_input._replace(acc_scale=np.float32(pipe.acc_scale))
        info = pipe.process_scan(scan_input, t_abs)
        if info is not None:
            est_t.append(t_abs)
            est_p.append(np.asarray(pipe.state.pos))
    wall = time.perf_counter() - t0

    est_p = np.asarray(est_p)
    gt_p = np.stack(
        [seq.gt_pos[np.argmin(np.abs(seq.gt_stamps - t))] for t in est_t]
    )
    err = ate_rmse(est_p, gt_p)
    print(
        f"{len(est_p)} updates in {wall:.1f}s "
        f"({wall / max(len(est_p), 1) * 1e3:.1f} ms/scan incl. host)"
    )
    print(f"ATE RMSE: {err * 100:.2f} cm")

    export.write_tum("/tmp/fastlivo_tum.txt", pipe.trajectory)
    cloud = export.map_to_cloud(pipe.map)
    export.write_pcd("/tmp/fastlivo_map.pcd", cloud)
    print(f"wrote /tmp/fastlivo_tum.txt ({len(pipe.trajectory)} poses), "
          f"/tmp/fastlivo_map.pcd ({len(cloud)} pts)")
    # Unclosed-loop LIO drifts ~0.5 cm/s on this sequence; gate on a drift
    # rate rather than an absolute bound (the 4 s golden test gates <5 cm).
    assert err < 0.15, "trajectory diverged"
    print("OK")


if __name__ == "__main__":
    main()
