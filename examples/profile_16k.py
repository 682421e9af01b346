"""Profile the 16k matched-operating-point LIO step and A/B config knobs.

The VERDICT r4 target: get per_scan_ms_16k under the reference's 20.6 ms
warm-up best case (its steady state is 42.2 ms — BASELINE.md). This tool
reproduces bench.py's 16k chain under a jax.profiler trace and prints the
top device ops, so probe_depth / lookup_unique_cap / capacity experiments
are one flag away.

Usage (TPU, run ALONE — CLAUDE.md):
    python examples/profile_16k.py [--probe-depth 8] [--unique-cap 8192]
        [--capacity-log2 18] [--steps 20] [--ops]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe-depth", type=int, default=8)
    ap.add_argument("--unique-cap", type=int, default=8192)
    ap.add_argument("--capacity-log2", type=int, default=18)
    ap.add_argument("--max-points", type=int, default=32)
    ap.add_argument("--nearby", type=int, default=18)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--ds-cap", type=int, default=16384)
    ap.add_argument("--n-raw", type=int, default=20480)
    ap.add_argument("--ops", action="store_true", help="print top device ops")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from fastlivo_tpu.maps import voxel_map as vm
    from fastlivo_tpu.models import lio as lio_mod
    from fastlivo_tpu.models import pipeline as pl_mod
    from fastlivo_tpu.models.imu import ImuWindow
    from fastlivo_tpu.state import NavState

    n_raw, ds_cap, imu_m, n_pool = args.n_raw, args.ds_cap, 32, 12
    cfg16 = pl_mod.StepConfig(
        map_cfg=vm.VoxelMapConfig(
            resolution=0.5,
            capacity=1 << args.capacity_log2,
            max_points=args.max_points,
            probe_depth=args.probe_depth,
            nearby_type=args.nearby,
            lookup_unique_cap=args.unique_cap,
        ),
        lio_cfg=lio_mod.LioConfig(measurement_model="surfel"),
        ds_capacity=ds_cap,
        imu_window=imu_m,
    )
    i3 = jnp.eye(3, dtype=jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)
    rng = np.random.default_rng(0)

    # Same scan geometry as bench.py: points on the faces of a 16 m box
    # observed from a slowly moving pose.
    def room_scan(pose_pos, n):
        per = n // 5
        h = 8.0
        pts = []
        for face in range(5):
            u = rng.uniform(-h, h, size=(per, 2))
            if face == 0:
                p = np.stack([u[:, 0], u[:, 1], np.full(per, -2.0)], 1)
            else:
                axis, val = [(0, -h), (0, h), (1, -h), (1, h)][face - 1]
                p = np.zeros((per, 3))
                p[:, axis] = val
                p[:, 1 - axis] = u[:, 0]
                p[:, 2] = u[:, 1] + 2
            pts.append(p)
        w = np.concatenate(pts)
        if len(w) < n:
            w = np.concatenate([w, w[: n - len(w)]])
        return (w - np.asarray(pose_pos)).astype(np.float32)

    def make_scan(k):
        pose = np.array([0.02 * k, 0.015 * k, 0.0])
        pts = room_scan(pose, n_raw)
        return pl_mod.ScanInput(
            pts=jnp.asarray(pts),
            t_offs=jnp.asarray(
                np.sort(rng.uniform(0, 0.1, n_raw)).astype(np.float32)
            ),
            mask=jnp.ones(n_raw, bool),
            imu=ImuWindow(
                stamps=jnp.asarray(np.linspace(0, 0.1, imu_m), jnp.float32),
                gyr=jnp.asarray(np.tile([0.0, 0.0, 0.1], (imu_m, 1)), jnp.float32),
                acc=jnp.asarray(np.tile([0.05, 0.0, 9.81], (imu_m, 1)), jnp.float32),
                mask=jnp.ones(imu_m, bool),
            ),
            t_end=jnp.float32(0.1),
            acc_scale=jnp.float32(1.0),
        )

    scans = [make_scan(k) for k in range(n_pool)]
    jax.block_until_ready(scans[-1].pts)

    def lio_scan_step_16k(state, lidar_map, scan, rot_il, t_il, cfg):
        return pl_mod.lio_scan_step(state, lidar_map, scan, rot_il, t_il, cfg)

    step16 = jax.jit(
        lio_scan_step_16k, static_argnames=("cfg",),
        donate_argnames=("lidar_map",),
    )
    state16 = NavState.identity()._replace(cov=jnp.eye(18) * 1e-4)
    m16 = vm.make_map(cfg16.map_cfg)
    m16 = jax.jit(
        pl_mod.bootstrap_map, static_argnames=("cfg", "axis_name"),
        donate_argnames=("lidar_map",),
    )(m16, scans[0], state16, i3, z3, cfg16)

    idx = [1]

    def once():
        nonlocal_state = idx[0]
        k = nonlocal_state
        idx[0] += 1
        s, m, info, _, _ = step16(state_box[0], map_box[0], scans[k % n_pool],
                                  i3, z3, cfg16)
        state_box[0], map_box[0] = s, m
        return info

    state_box, map_box = [state16], [m16]
    for _ in range(6):  # warm the executable + mature the arena
        info = once()
    jax.block_until_ready(state_box[0].pos)

    trace_dir = tempfile.mkdtemp(prefix="prof16_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            info = once()
        n_eff = int(info.n_effective)
        iters = int(info.iterations)

    # Summarize per-program device totals (bench.py's parser).
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib

    bench = importlib.import_module("bench")
    dur, cnt = bench._trace_device_totals(trace_dir)
    per = {
        k: dur[k] / max(cnt[k], 1) / 1e3
        for k in dur
        if "lio_scan_step_16k" in k
    }
    ms = per.get("jit_lio_scan_step_16k")
    print(
        f"probe_depth={args.probe_depth} unique_cap={args.unique_cap} "
        f"capacity=2^{args.capacity_log2} nearby={args.nearby} "
        f"max_points={args.max_points}: "
        f"per_scan_ms_16k={ms:.3f} n_eff={n_eff} iters={iters}"
    )
    if args.ops:
        from trace_summary import summarize  # examples/trace_summary.py

        summarize(trace_dir, top=30, steps=args.steps)


if __name__ == "__main__":
    main()
