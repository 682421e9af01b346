"""Loop-closure showcase: out-and-back street sequence through the FULL
pipeline (LIO + keyframing + STD detection + pose graph), comparing the
odometry trajectory against the loop-corrected one.

Usage: PYTHONPATH=/root/repo python examples/run_loop_closure.py [--cpu]
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

from fastlivo_tpu.io import synthetic
from fastlivo_tpu.io.sync import MeasurementSynchronizer, WindowBuilder
from fastlivo_tpu.models.pipeline import LivoPipeline
from fastlivo_tpu.utils.config import FastLivoConfig


def main():
    print("generating street sequence (out-and-back, ~36 s)...")
    seq = synthetic.generate_street(
        duration=36.0, pts_per_scan=8000, seed=6,
        gyro_bias=np.array([0.0, 0.0, 0.004]),  # realistic uncompensated drift
    )

    cfg = FastLivoConfig()
    cfg.lio.max_points = 8192
    cfg.map.capacity = 1 << 18
    cfg.imu.imu_int_frame = 64
    cfg.loop.loop_en = True
    cfg.loop.sub_frame_num = 10
    cfg.loop.skip_near_num = 20  # STD frames (20 s): excludes overlapping same-leg clouds
    cfg.loop.corner_thre = 6.0
    cfg.loop.icp_threshold = 0.25
    cfg.keyframe.trans_thresh_m = 1.0

    pipe = LivoPipeline(cfg)
    pipe.initializer.done = True
    pipe.initializer.mean_acc = np.array([0.0, 0.0, 9.81])
    pipe.initializer.mean_gyr = np.zeros(3)
    pipe.state = pipe.initializer.initial_state()

    sync = MeasurementSynchronizer(img_enabled=False)
    builder = WindowBuilder(n_pts=8192, imu_window=cfg.imu.imu_int_frame)
    it = iter(seq.imu)
    pending = next(it)
    est = []
    t0 = time.perf_counter()
    for scan in seq.scans:
        sync.push_lidar(scan)
        while pending is not None and pending.stamp < scan.end_time + 0.05:
            sync.push_imu(pending)
            pending = next(it, None)
        g = sync.next_group()
        if g is None:
            continue
        si, t = builder.build(g)
        si = si._replace(acc_scale=np.float32(1.0))
        info = pipe.process_scan(si, t)
        if info is not None:
            est.append((t, np.asarray(pipe.state.pos)))
    wall = time.perf_counter() - t0

    corrected = pipe.finish("/tmp/loop_out")
    print(f"{len(est)} scans in {wall:.0f}s; "
          f"keyframes={len(pipe.loop_backend.graph.rots)}, "
          f"loops detected={len(pipe.loop_backend.loops)}")
    for ev in pipe.loop_backend.loops:
        print(f"  loop kf{ev.kf_from} <-> kf{ev.kf_to} score={ev.score:.2f}")

    # keyframe ATE: odometry vs loop-corrected, at keyframe timestamps
    g = pipe.loop_backend.graph
    kf_t = np.asarray(g.stamps)
    gt_kf = np.stack([seq.gt_pos[np.argmin(np.abs(seq.gt_stamps - t))] for t in kf_t])
    odo_kf = np.asarray(g.trans)
    from fastlivo_tpu.utils.metrics import ate_rmse
    odo_ate = ate_rmse(odo_kf, gt_kf)
    print(f"odometry keyframe ATE: {odo_ate * 100:.1f} cm")
    if corrected is not None and len(pipe.loop_backend.loops) > 0:
        rots, trans = corrected
        corr_ate = ate_rmse(trans, gt_kf)
        print(f"loop-corrected keyframe ATE: {corr_ate * 100:.1f} cm")
        assert len(pipe.loop_backend.loops) >= 1
        # the consensus gate must keep corrections from degrading a clean run
        assert corr_ate < odo_ate * 1.1 + 0.01, (odo_ate, corr_ate)
        print("OK")
    else:
        print("NOTE: no loop detected on this run")


if __name__ == "__main__":
    main()
