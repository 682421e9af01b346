"""CLI entry point: run the full LIVO pipeline over a measurement log.

Replaces the reference's ROS node main + launch files
(reference: src/laserMapping.cpp:15-36, launch/mapping_*.launch): instead
of `roslaunch fast_livo mapping_avia.launch` + `rosbag play`, run

    python -m fastlivo_tpu.run --config configs/avia_livo.yaml \
        --log sequence.flvo --out Log/

The runner streams the log through the measurement synchronizer and the
fused device pipeline, prints per-stage timing at the end, and writes
tum.txt / loop_tum.txt / map.pcd (and a timing CSV) to --out.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Optional

import numpy as np


def run_log(
    log_path: str,
    cfg,
    out_dir: Optional[str] = None,
    max_scans: Optional[int] = None,
    checkpoint_every: Optional[int] = None,
    checkpoint_path: Optional[str] = None,
    resume_from: Optional[str] = None,
    progress: bool = True,
    profile_dir: Optional[str] = None,
    dump_states: Optional[str] = None,
):
    """Programmatic runner. Returns the pipeline after the run."""
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: first compiles on the tunneled TPU cost
    # 30-90 s PER PROGRAM; repeat runs should pay none of it (tests already
    # do this via conftest).
    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/jax_fastlivo"),
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from fastlivo_tpu.io import logio
    from fastlivo_tpu.io.sensors import ImageFrame, ImuSample, LidarScan
    from fastlivo_tpu.io.sync import MeasurementSynchronizer, WindowBuilder
    from fastlivo_tpu.models.pipeline import LivoPipeline
    from fastlivo_tpu.utils.timing import StageTimer

    # The CLI --out dir wins over the config's runtime.out_dir so every
    # output (trajectories, PCD, annotated frames) lands in one place.
    if out_dir is not None:
        cfg.runtime.out_dir = out_dir

    pipe = LivoPipeline(cfg)
    if resume_from is not None:
        from fastlivo_tpu.utils import checkpoint as ckpt

        meta = ckpt.load_pipeline(resume_from, pipe)
        skip_scans = int(meta.get("n_scans", 0))
        if progress:
            print(f"resumed from {resume_from} at scan {skip_scans}")
    else:
        skip_scans = 0
    sync = MeasurementSynchronizer(
        img_enabled=cfg.vio.img_enable,
        img_delta_time=cfg.vio.delta_time,
        imu_acc_scale=cfg.imu.acc_scale_factor,
        imu_axis_remap=None
        if tuple(cfg.imu.axis_remap) == (1, 0, 0, 0, 1, 0, 0, 0, 1)
        else cfg.imu.axis_remap,
    )
    builder = WindowBuilder(
        n_pts=cfg.lio.max_points * 2, imu_window=cfg.imu.imu_int_frame
    )
    timer = StageTimer()
    pipe.timer = timer

    if profile_dir is not None:
        # Kernel-level traces (SURVEY.md section 5: the TPU counterpart of
        # the reference's omp_get_wtime CSV rows) — open with TensorBoard
        # or xprof.
        import jax

        jax.profiler.start_trace(profile_dir)

    n_scans = 0
    t_start = time.perf_counter()
    stream = logio.read_log(
        log_path,
        blind=cfg.preprocess.blind,
        max_range=cfg.preprocess.max_range,
        point_filter_num=cfg.preprocess.point_filter_num,
    )
    for rec in stream:
        if isinstance(rec, ImuSample):
            sync.push_imu(rec)
        elif isinstance(rec, LidarScan):
            if cfg.preprocess.feature_extract_en:
                # LOAM-style surface selection (reference give_feature mode,
                # preprocess.cpp:683-1002): keep plane-classified points.
                from fastlivo_tpu.io.features import classify_features

                plane_mask, edge_mask = classify_features(rec)
                keep = plane_mask | edge_mask
                if keep.sum() > 100:
                    rec = LidarScan(
                        stamp=rec.stamp,
                        pts=rec.pts[keep],
                        t_offs_ms=rec.t_offs_ms[keep],
                        intensity=None
                        if rec.intensity is None
                        else rec.intensity[keep],
                    )
            sync.push_lidar(rec)
        elif isinstance(rec, ImageFrame):
            sync.push_image(rec)

        while True:
            with timer.stage("sync"):
                group = sync.next_group()
            if group is None:
                break
            with timer.stage("window_build"):
                scan_input, t_abs = builder.build(group)
                scan_input = scan_input._replace(
                    acc_scale=np.float32(pipe.acc_scale)
                )
            if n_scans < skip_scans:
                # Resumed: ALL groups before the checkpoint (scan-end AND
                # image-bounded) only advance the sync stream — re-applying
                # pre-checkpoint VIO updates to the restored state would
                # diverge from the original run. Only scan-end groups count
                # toward the scan counter (matching checkpoint meta).
                if group.is_lidar_end:
                    n_scans += 1
                continue
            if group.is_lidar_end:
                with timer.stage("lio_step"):
                    info = pipe.process_scan(scan_input, t_abs)
                timer.tick(t_abs)
                n_scans += 1
                if dump_states is not None and info is not None:
                    # full-state rows (the reference's mat_out.txt dump,
                    # laser_mapping.cpp:240-241)
                    st = pipe.state
                    row = np.concatenate(
                        [
                            [t_abs],
                            np.asarray(st.pos),
                            np.asarray(st.vel),
                            np.asarray(st.bg),
                            np.asarray(st.ba),
                            np.asarray(st.grav),
                        ]
                    )
                    with open(dump_states, "a") as f:
                        f.write(" ".join(f"{v:.6f}" for v in row) + "\n")
                if progress and info is not None and n_scans % 50 == 0:
                    pos = np.asarray(pipe.state.pos)
                    print(
                        f"[{n_scans:5d}] t={t_abs:.2f} pos=({pos[0]:+7.2f},"
                        f"{pos[1]:+7.2f},{pos[2]:+7.2f}) "
                        f"n_eff={int(info.n_effective)}"
                    )
                if (
                    checkpoint_every
                    and checkpoint_path
                    and n_scans % checkpoint_every == 0
                ):
                    from fastlivo_tpu.utils import checkpoint as ckpt

                    # Batched mode: apply queued scans before snapshotting
                    # so the saved state matches the n_scans counter.
                    pipe.flush_scans()
                    ckpt.save_pipeline(
                        checkpoint_path, pipe, meta={"n_scans": n_scans}
                    )
            else:
                with timer.stage("vio_step"):
                    pipe.process_image(
                        scan_input, group.measures[-1].img.img, t_abs
                    )
        if max_scans is not None and n_scans >= max_scans:
            break

    if profile_dir is not None:
        import jax

        jax.profiler.stop_trace()
    wall = time.perf_counter() - t_start
    if progress:
        print(
            f"processed {n_scans} scans in {wall:.1f}s "
            f"({wall / max(n_scans, 1) * 1e3:.1f} ms/scan incl. host)"
        )
        print(timer.report())
    pipe.finish(out_dir)
    if out_dir is not None:
        timer.write_csv(os.path.join(out_dir, "time_log.csv"))
    return pipe


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--log", required=True, help="FLVO measurement log")
    parser.add_argument("--config", default=None, help="reference-format YAML")
    parser.add_argument("--out", default=None, help="output directory")
    parser.add_argument("--max-scans", type=int, default=None)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--checkpoint-every", type=int, default=None)
    parser.add_argument("--resume", default=None, help="checkpoint to resume from")
    parser.add_argument("--profile", default=None, help="write a jax profiler trace here")
    parser.add_argument("--dump-states", default=None, help="append full state rows here")
    parser.add_argument(
        "--set", action="append", default=[],
        help="override, e.g. --set vio.img_enable=0",
    )
    parser.add_argument(
        "--platform", default=None, choices=("cpu", "tpu"),
        help="force the jax platform (default: environment's default backend)",
    )
    args = parser.parse_args(argv)

    if args.platform is not None:
        # Must happen before jax initializes any backend (a sitecustomize
        # may preload a TPU plugin; the env var alone is too late there).
        import jax

        jax.config.update("jax_platforms", args.platform)

    from fastlivo_tpu.utils.config import load_config

    overrides = {}
    for s in args.set:
        k, v = s.split("=", 1)
        try:
            v = eval(v, {}, {})  # noqa: S307 - literals only from the CLI
        except Exception:
            pass
        overrides[k] = v
    cfg = load_config(args.config, overrides)
    if cfg.parallel.n_devices > 1 and args.platform == "cpu":
        # Virtual-device mesh on CPU (tests / dry runs): the host platform
        # must be told its device count BEFORE the backend initializes.
        import os

        if "xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""
        ):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + " --xla_force_host_platform_device_count="
                + str(cfg.parallel.n_devices)
            )
    run_log(
        args.log,
        cfg,
        out_dir=args.out,
        max_scans=args.max_scans,
        checkpoint_every=args.checkpoint_every,
        checkpoint_path=args.checkpoint,
        resume_from=args.resume,
        profile_dir=args.profile,
        dump_states=args.dump_states,
    )


if __name__ == "__main__":
    main()
