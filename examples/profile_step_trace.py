"""Device-op trace profile of the flagship lio_scan_step at the bench
operating point (surfel model, 65k budget by default).

Wall-clock on this environment's PJRT client measures ENQUEUE rate
(block_until_ready returns before execution completes — CLAUDE.md), so
this profiles with jax.profiler and prints per-op DEVICE time per step
via examples/trace_summary.py.

    timeout 600 python examples/profile_step_trace.py [ds_cap] [k_steps]
"""

import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from fastlivo_tpu.maps import voxel_map as vm
    from fastlivo_tpu.models import lio as lio_mod
    from fastlivo_tpu.models import pipeline as pl_mod
    from fastlivo_tpu.models.imu import ImuWindow
    from fastlivo_tpu.state import NavState

    ds_cap = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    k_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    n_raw = ds_cap + ds_cap // 4
    imu_m = 32

    cfg = pl_mod.StepConfig(
        map_cfg=vm.VoxelMapConfig(
            resolution=0.5, capacity=1 << 19, max_points=32, nearby_type=18,
            lookup_unique_cap=16384,
        ),
        lio_cfg=lio_mod.LioConfig(measurement_model="surfel"),
        ds_capacity=ds_cap,
        imu_window=imu_m,
    )
    i3 = jnp.eye(3, dtype=jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)
    rng = np.random.default_rng(0)

    # Same scene generator as bench.py (box room, circular trajectory).
    def room_scan(pose_pos, n):
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

    n_pool = 24

    def pose_at(k):
        th = 2 * np.pi * k / n_pool
        return np.array([np.cos(th), np.sin(th), 0.0])

    def make_scan(k):
        return pl_mod.ScanInput(
            pts=jnp.asarray(room_scan(pose_at(k), n_raw)),
            t_offs=jnp.asarray(
                np.sort(rng.uniform(0, 0.1, n_raw)).astype(np.float32)
            ),
            mask=jnp.ones(n_raw, bool),
            imu=ImuWindow(
                stamps=jnp.asarray(np.linspace(0, 0.1, imu_m), jnp.float32),
                gyr=jnp.asarray(np.tile([0.0, 0.0, 0.05], (imu_m, 1)), jnp.float32),
                acc=jnp.asarray(np.tile([0.2, 0.1, 9.81], (imu_m, 1)), jnp.float32),
                mask=jnp.ones(imu_m, bool),
            ),
            t_end=jnp.float32(0.1),
            acc_scale=jnp.float32(1.0),
        )

    state = NavState.identity()._replace(cov=jnp.eye(18) * 1e-4)
    m = vm.make_map(cfg.map_cfg)
    scans = [make_scan(k) for k in range(n_pool)]
    m = jax.jit(
        pl_mod.bootstrap_map, static_argnames=("cfg", "axis_name"),
        donate_argnames=("lidar_map",),
    )(m, scans[0], state, i3, z3, cfg)

    step = jax.jit(
        pl_mod.lio_scan_step,
        static_argnames=("cfg", "axis_name"),
        donate_argnames=("lidar_map",),
    )

    idx = [0]

    def next_scan():
        s = scans[idx[0] % n_pool]
        idx[0] += 1
        return s

    info = None
    for _ in range(6):
        state, m, info, _, _ = step(state, m, next_scan(), i3, z3, cfg)
    jax.block_until_ready(state)

    trace_dir = tempfile.mkdtemp(prefix="step_trace_")
    with jax.profiler.trace(trace_dir):
        for _ in range(k_steps):
            state, m, info, _, _ = step(state, m, next_scan(), i3, z3, cfg)
        _ = np.asarray(info.n_effective)  # force materialization (LAST)
    print("n_eff", int(info.n_effective), "iters", int(info.iterations))
    print("trace:", trace_dir, flush=True)

    from examples import trace_summary

    trace_summary.summarize(trace_dir, top=45, steps=k_steps)


if __name__ == "__main__":
    main()
