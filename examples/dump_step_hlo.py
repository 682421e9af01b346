"""Dump the optimized HLO of lio_scan_step (bench operating point) so
trace op names (fusion.N / while.N / cond.N) can be attributed to source.

    timeout 600 python examples/dump_step_hlo.py [ds_cap] [out.txt]
"""

import sys

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
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/step_hlo.txt"
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
    state = NavState.identity()._replace(cov=jnp.eye(18) * 1e-4)
    m = vm.make_map(cfg.map_cfg)
    scan = pl_mod.ScanInput(
        pts=jnp.zeros((n_raw, 3), jnp.float32),
        t_offs=jnp.zeros((n_raw,), jnp.float32),
        mask=jnp.ones(n_raw, bool),
        imu=ImuWindow(
            stamps=jnp.zeros((imu_m,), jnp.float32),
            gyr=jnp.zeros((imu_m, 3), jnp.float32),
            acc=jnp.zeros((imu_m, 3), jnp.float32),
            mask=jnp.ones(imu_m, bool),
        ),
        t_end=jnp.float32(0.1),
        acc_scale=jnp.float32(1.0),
    )

    step = jax.jit(
        pl_mod.lio_scan_step,
        static_argnames=("cfg", "axis_name"),
        donate_argnames=("lidar_map",),
    )
    compiled = step.lower(state, m, scan, i3, z3, cfg).compile()
    txt = compiled.as_text()
    with open(out_path, "w") as fh:
        fh.write(txt)
    print("wrote", out_path, len(txt), "bytes")


if __name__ == "__main__":
    main()
