"""Multi-device SPMD LIO step vs the single-device program: same physics,
innovations reduced by psum — results must agree to f32 reduction tolerance."""

import numpy as np
import jax
import jax.numpy as jnp

from fastlivo_tpu import parallel
from fastlivo_tpu.maps import voxel_map as vm
from fastlivo_tpu.models import pipeline as pl_mod
from fastlivo_tpu.models.imu import ImuWindow
from fastlivo_tpu.state import NavState

CFG = pl_mod.StepConfig(
    map_cfg=vm.VoxelMapConfig(
        resolution=0.5, capacity=1 << 13, max_points=16, nearby_type=18, probe_depth=8
    ),
    ds_capacity=1024,
    imu_window=8,
)

I3 = jnp.eye(3, dtype=jnp.float32)
Z3 = jnp.zeros(3, jnp.float32)


def make_scan(rng, n=2048):
    # Planar scene (floor + wall) so the update has real constraints.
    half = n // 2
    floor = np.stack(
        [rng.uniform(-4, 4, half), rng.uniform(-4, 4, half), np.full(half, -1.2)], 1
    )
    wall = np.stack(
        [np.full(n - half, 3.5), rng.uniform(-4, 4, n - half), rng.uniform(-1, 3, n - half)], 1
    )
    pts = np.concatenate([floor, wall]).astype(np.float32)
    return pl_mod.ScanInput(
        pts=jnp.asarray(pts),
        t_offs=jnp.asarray(np.sort(rng.uniform(0, 0.1, n)).astype(np.float32)),
        mask=jnp.ones(n, bool),
        imu=ImuWindow(
            stamps=jnp.asarray(np.linspace(0, 0.1, 8), jnp.float32),
            gyr=jnp.asarray(np.tile([0.0, 0.0, 0.1], (8, 1)), jnp.float32),
            acc=jnp.asarray(np.tile([0.05, 0.0, 9.81], (8, 1)), jnp.float32),
            mask=jnp.ones(8, bool),
        ),
        t_end=jnp.float32(0.1),
        acc_scale=jnp.float32(1.0),
    )


def test_sharded_matches_single_device(rng):
    scan = make_scan(rng)
    state = NavState.identity()._replace(cov=jnp.eye(18) * 1e-4)

    m0 = vm.make_map(CFG.map_cfg)
    m0 = jax.jit(pl_mod.bootstrap_map, static_argnames="cfg")(
        m0, scan, state, I3, Z3, CFG
    )

    # Single device.
    single = jax.jit(pl_mod.lio_scan_step, static_argnames=("cfg", "axis_name"))
    s1, m1, info1, _, _ = single(state, m0, scan, I3, Z3, CFG)

    # 8-device mesh.
    mesh = parallel.make_mesh(8)
    step = parallel.make_sharded_lio_step(mesh, CFG)
    sharded_scan = parallel.shard_scan(scan, mesh)
    s8, m8, info8, _, _ = step(state, m0, sharded_scan, I3, Z3)

    assert int(info1.n_effective) > 200
    assert int(info8.n_effective) == int(info1.n_effective)
    np.testing.assert_allclose(np.asarray(s8.pos), np.asarray(s1.pos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s8.rot), np.asarray(s1.rot), atol=1e-4)
    assert int(vm.num_points(m8)) == int(vm.num_points(m1))


def test_sharded_runs_on_subset_mesh(rng):
    scan = make_scan(rng, n=1024)
    state = NavState.identity()
    mesh = parallel.make_mesh(2)
    step = parallel.make_sharded_lio_step(mesh, CFG)
    m0 = vm.make_map(CFG.map_cfg)
    m0 = jax.jit(pl_mod.bootstrap_map, static_argnames="cfg")(
        m0, scan, state, I3, Z3, CFG
    )
    s, m, info, _, _ = step(state, m0, parallel.shard_scan(scan, mesh), I3, Z3)
    assert bool(jnp.all(jnp.isfinite(s.pos)))
