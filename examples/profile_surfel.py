"""Component-level timing of the surfel LIO step at growing point budgets.

Isolates the 65k->262k cliff (ROADMAP item 2): times each stage of
lio_scan_step separately (undistort, downsample, surfel_lookup, knn-gate,
insert, full step) so the regressing lowering is identifiable.

Run on the default platform (TPU under the driver): python examples/profile_surfel.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench(fn, *args, iters=10, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from fastlivo_tpu.maps import voxel_map as vm
    from fastlivo_tpu.models import lio as lio_mod
    from fastlivo_tpu.models import pipeline as pl_mod
    from fastlivo_tpu.ops import voxelize

    print("platform:", jax.devices()[0].platform, flush=True)
    budgets = [16384, 65536, 262144]
    if len(sys.argv) > 1:
        budgets = [int(x) for x in sys.argv[1:]]

    for ds_cap in budgets:
        n_raw = ds_cap + ds_cap // 4
        cfg = pl_mod.StepConfig(
            map_cfg=vm.VoxelMapConfig(
                resolution=0.5, capacity=1 << 19, max_points=32, nearby_type=18
            ),
            lio_cfg=lio_mod.LioConfig(measurement_model="surfel"),
            ds_capacity=ds_cap,
            imu_window=32,
        )
        sys.path.insert(0, ".")
        from __graft_entry__ import _make_inputs

        state, m, scan = _make_inputs(n_raw, 32, cfg.map_cfg, ds_cap)
        i3 = jnp.eye(3, dtype=jnp.float32)
        z3 = jnp.zeros(3, jnp.float32)
        m = jax.jit(pl_mod.bootstrap_map, static_argnames="cfg")(
            m, scan, state, i3, z3, cfg
        )
        queries = jnp.asarray(
            np.random.default_rng(0)
            .uniform(-4, 4, (ds_cap, 3))
            .astype(np.float32)
        )
        qmask = jnp.ones(ds_cap, bool)

        f_ds = jax.jit(lambda p, mk: voxelize.voxel_downsample(p, mk, 0.15, ds_cap))
        f_surf = jax.jit(
            lambda mm, q: vm.surfel_lookup(mm, q, cfg.map_cfg), static_argnums=()
        )
        f_knn = jax.jit(lambda mm, q: vm.knn(mm, q, cfg.map_cfg, k=5))
        f_ins = jax.jit(
            lambda mm, q, mk: vm.insert(mm, q, mk, cfg.map_cfg)
        )
        f_upd = jax.jit(
            lambda s, mm, q, mk: lio_mod.lio_update(
                s, mm, q, mk, i3, z3, cfg.map_cfg, cfg.lio_cfg
            ),
            static_argnums=(),
        )
        step = jax.jit(
            pl_mod.lio_scan_step, static_argnames=("cfg", "axis_name")
        )

        # NB: the full step MUST donate the arena (CLAUDE.md: undonated
        # arena => XLA copies ~250 MB per step, a ~1500x artifact).
        step_don = jax.jit(
            pl_mod.lio_scan_step,
            static_argnames=("cfg", "axis_name"),
            donate_argnames=("lidar_map",),
        )

        def bench_step(iters=10):
            mm = jax.tree.map(lambda x: x + 0, m)
            st = state
            st2, mm, *_ = step_don(st, mm, scan, i3, z3, cfg)
            jax.block_until_ready(st2)
            t0 = time.perf_counter()
            for _ in range(iters):
                st, mm, info, _, _ = step_don(st, mm, scan, i3, z3, cfg)
            jax.block_until_ready(st)
            return (time.perf_counter() - t0) / iters

        r = {}
        t0 = time.perf_counter()
        r["downsample"] = bench(f_ds, scan.pts, scan.mask)
        r["surfel_lookup"] = bench(f_surf, m, queries)
        r["knn_k5"] = bench(f_knn, m, queries)
        r["insert"] = bench(f_ins, m, queries, qmask)
        r["full_step(donated)"] = bench_step()
        total = time.perf_counter() - t0
        print(f"\n=== budget {ds_cap} (incl compiles: {total:.1f}s) ===", flush=True)
        for k, v in r.items():
            print(f"  {k:24s} {v * 1e3:10.3f} ms", flush=True)


if __name__ == "__main__":
    main()
