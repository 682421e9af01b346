"""Weak-scaling harness for the sharded LIO step.

BASELINE.json's north star asks for nnz/s scaling efficiency at N devices.
Real multi-chip hardware is not available in this environment, so this
harness runs the SPMD program on an N-virtual-device CPU mesh: it validates
that the sharded program's *work partitioning* scales (per-device point
count constant as devices grow) and reports wall-clock weak-scaling
efficiency. CPU-mesh timings share one physical socket, so the efficiency
number here is a lower bound sanity check, not an ICI measurement — on a
TPU slice the only cross-device traffic is two 18x18 psums and two
scan-sized all-gathers per iteration (~100 KB), far under ICI bandwidth at
10 Hz scan rate.

Usage: python bench_scaling.py [max_devices]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from fastlivo_tpu import parallel
    from fastlivo_tpu.maps import voxel_map as vm
    from fastlivo_tpu.models import pipeline as pl_mod

    max_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    per_device_pts = 2048  # weak scaling: constant work per device
    results = {}
    base = None
    for ndev in [1, 2, 4, 8]:
        if ndev > max_dev or ndev > len(jax.devices()):
            break
        cfg = pl_mod.StepConfig(
            map_cfg=vm.VoxelMapConfig(
                resolution=0.5, capacity=1 << 16, max_points=16, nearby_type=18
            ),
            ds_capacity=per_device_pts * ndev,
            imu_window=16,
        )
        state, m, scan = ge._make_inputs(
            per_device_pts * ndev * 2, 16, cfg.map_cfg, cfg.ds_capacity
        )
        i3 = jnp.eye(3, dtype=jnp.float32)
        z3 = jnp.zeros(3, jnp.float32)
        m = pl_mod.bootstrap_map(m, scan, state, i3, z3, cfg)
        mesh = parallel.make_mesh(ndev)
        step = parallel.make_sharded_lio_step(mesh, cfg)
        sscan = parallel.shard_scan(scan, mesh)

        out = step(state, m, sscan, i3, z3)
        jax.block_until_ready(out[0])
        n_rep = 10
        t0 = time.perf_counter()
        st, mm = state, out[1]
        for _ in range(n_rep):
            st, mm, info, _, _ = step(st, mm, sscan, i3, z3)
        jax.block_until_ready(st)
        dt = (time.perf_counter() - t0) / n_rep
        pts_s = cfg.ds_capacity / dt
        if base is None:
            base = pts_s
        results[ndev] = {
            "points_per_sec": round(pts_s, 1),
            "weak_scaling_efficiency": round(pts_s / (base * ndev), 3),
            "per_step_ms": round(dt * 1e3, 2),
        }
        print(f"devices={ndev}: {results[ndev]}")
    print(json.dumps({"metric": "weak_scaling", "results": results}))


if __name__ == "__main__":
    main()
