"""Isolate the lio_update slowdown seen in profile_surfel: donation vs
not, scene vs random queries, chained vs per-call blocking."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from fastlivo_tpu.maps import voxel_map as vm
    from fastlivo_tpu.models import lio as lio_mod
    from fastlivo_tpu.models import pipeline as pl_mod
    from __graft_entry__ import _make_inputs

    ds_cap = 16384
    cfg = pl_mod.StepConfig(
        map_cfg=vm.VoxelMapConfig(
            resolution=0.5, capacity=1 << 19, max_points=32, nearby_type=18
        ),
        lio_cfg=lio_mod.LioConfig(measurement_model="surfel"),
        ds_capacity=ds_cap,
        imu_window=32,
    )
    i3 = jnp.eye(3, dtype=jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)
    state, m, scan = _make_inputs(ds_cap + ds_cap // 4, 32, cfg.map_cfg, ds_cap)
    m = jax.jit(pl_mod.bootstrap_map, static_argnames="cfg")(
        m, scan, state, i3, z3, cfg
    )

    step_don = jax.jit(
        pl_mod.lio_scan_step, static_argnames=("cfg", "axis_name"),
        donate_argnames=("lidar_map",),
    )
    step_nodon = jax.jit(
        pl_mod.lio_scan_step, static_argnames=("cfg", "axis_name"),
    )

    def timeit(label, fn, m_in, iters=10, block_each=False):
        mm = m_in
        st = state
        out = fn(st, mm, scan, i3, z3, cfg)
        jax.block_until_ready(out[0])
        mm = out[1]
        t0 = time.perf_counter()
        for _ in range(iters):
            st, mm, info, _, _ = fn(st, mm, scan, i3, z3, cfg)
            if block_each:
                jax.block_until_ready(st)
        jax.block_until_ready(st)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:40s} {dt*1e3:10.3f} ms (iters={int(info.iterations)})",
              flush=True)
        return mm

    # donation: reuse fresh map copies so donation doesn't consume `m`
    import copy
    m_a = jax.tree.map(lambda x: x + 0, m)
    timeit("step WITH donation, chained", step_don, m_a)
    m_b = jax.tree.map(lambda x: x + 0, m)
    timeit("step NO donation, chained", step_nodon, m_b)
    m_c = jax.tree.map(lambda x: x + 0, m)
    timeit("step WITH donation, block each", step_don, m_c, block_each=True)

    # lio_update alone (no map output), scene queries vs random
    ds_pts, ds_mask = jax.jit(
        lambda p, mk: __import__("fastlivo_tpu.ops.voxelize", fromlist=["x"])
        .voxel_downsample(p, mk, cfg.ds_leaf, ds_cap)
    )(scan.pts, scan.mask)
    f_upd = jax.jit(
        lambda s, mm, q, mk: lio_mod.lio_update(
            s, mm, q, mk, i3, z3, cfg.map_cfg, cfg.lio_cfg
        )
    )
    rnd = jnp.asarray(
        np.random.default_rng(0).uniform(-4, 4, (ds_cap, 3)).astype(np.float32)
    )

    def time_upd(label, q, mk):
        out = f_upd(state, m, q, mk)
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        for _ in range(10):
            out = f_upd(state, m, q, mk)
        jax.block_until_ready(out[0])
        print(f"{label:40s} {(time.perf_counter()-t0)/10*1e3:10.3f} ms "
              f"(iters={int(out[1].iterations)}, n_eff={int(out[1].n_effective)})",
              flush=True)

    time_upd("lio_update scene queries", ds_pts, ds_mask)
    time_upd("lio_update random queries", rnd, jnp.ones(ds_cap, bool))


if __name__ == "__main__":
    main()
