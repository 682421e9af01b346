"""Per-phase timing of the photometric VIO update on the default platform.

vio_update = select (phase A) -> photometric_update (phase B, coarse-to-
fine while_loops) -> maintain (phase C). Pair with
examples/trace_summary.py for per-HLO-op attribution.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from fastlivo_tpu.maps import visual_map as vmap_mod
    from fastlivo_tpu.models import vio as vio_mod
    from fastlivo_tpu.ops.camera import Pinhole
    from fastlivo_tpu.state import NavState

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    cam = Pinhole(width=640, height=512, fx=400.0, fy=400.0, cx=320.0, cy=256.0)
    vm_cfg = vmap_mod.VisualMapConfig(capacity=4096, max_obs=4)
    cfg = vio_mod.VioConfig()
    i3 = jnp.eye(3, dtype=jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)

    state = NavState.identity()._replace(cov=jnp.eye(18) * 1e-4)
    vmap = vmap_mod.make_visual_map(vm_cfg)
    img = jnp.asarray(rng.uniform(0.2, 0.8, (512, 640)).astype(np.float32))
    n_wc = 65536
    wc = jnp.asarray(
        np.stack(
            [rng.uniform(-8, 8, n_wc), rng.uniform(1, 9, n_wc),
             rng.uniform(-2, 2, n_wc)], 1
        ).astype(np.float32)
    )
    wmask = jnp.ones(n_wc, bool)

    full = jax.jit(
        vio_mod.vio_update, static_argnames=("cam", "vm_cfg", "cfg"),
        donate_argnames=("vmap",),
    )

    def timeit(label, fn, *args, iters=5, **kw):
        out = fn(*args, **kw)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, **kw)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        print(f"{label:28s} {(time.perf_counter()-t0)/iters*1e3:10.3f} ms",
              flush=True)
        return out

    # Populate the visual map once (first call does maintain on empty map).
    post, vmap, info = full(state, vmap, img, wc, wmask, cam, i3, z3, vm_cfg, cfg)
    jax.block_until_ready(post)
    print("n_selected after warm:", int(info.n_selected), flush=True)

    # Phase A: select
    f_sel = jax.jit(
        vio_mod.select, static_argnames=("cam", "vm_cfg", "cfg")
    )
    sel, _ = f_sel(state, vmap, img, wc, wmask, cam, i3, z3, vm_cfg, cfg)
    timeit("select", f_sel, state, vmap, img, wc, wmask, cam, i3, z3, vm_cfg, cfg)

    # Phase B: photometric update
    f_upd = jax.jit(
        vio_mod.photometric_update, static_argnames=("cam", "cfg")
    )
    timeit("photometric_update", f_upd, state, sel, img, cam, i3, z3, cfg)

    # Phase C: maintain
    f_mnt = jax.jit(
        vio_mod.maintain, static_argnames=("cam", "vm_cfg", "cfg"),
    )
    timeit("maintain", f_mnt, state, vmap, sel, img, wc, wmask, cam, i3, z3,
           vm_cfg, cfg)

    # Full step (fresh map copy each call since vmap is donated)
    def full_copy():
        vm2 = jax.tree.map(lambda x: x + 0, vmap)
        return full(state, vm2, img, wc, wmask, cam, i3, z3, vm_cfg, cfg)

    timeit("vio_update(full)", full_copy)


if __name__ == "__main__":
    main()
