"""Multi-device SPMD execution of the LIVO hot path.

The reference has no distributed story (single C++ process; its parallelism
is OpenMP over scan points, reference: src/laser_mapping.cpp:499-502 and
CMakeLists.txt:26-44). Two SPMD modes over a 1-D `Mesh`:

**Points-sharded, replicated map** (map_sharded=False): scan points (and
their undistortion/kNN/plane-fit/Jacobian work) are sharded over the mesh
axis; the innovation matrices H^T R^-1 H / H^T R^-1 z are psummed over ICI
(sum-decomposable over points), after which every device runs the identical
small 18x18 solve. Scales residual compute; map memory per device is the
full arena.

**Sharded map arena** (map_sharded=True): the arena itself is partitioned
by hash-partitioned voxel ownership (maps/voxel_map.owner_of) — every
voxel's slab, LRU stamp, and surfel moments live on exactly one device, so
per-device map memory is capacity_global / n_devices and the mappable
environment grows linearly with the mesh (the reference's iVox,
include/ivox3d/ivox3d.h:37-105, is its central scaling structure). The
(small, ~100s of KB) downsampled scan is replicated; per-shard lookup
results merge over ICI (surfel: two pmins + one psum; kNN: all_gather of
per-shard top-k); inserts are shard-local. Raw-scan undistortion stays
points-sharded in both modes.

Built on `jax.shard_map`, so the same code compiles for 1 chip, one host's
chips, or a multi-host slice (DCN axes would simply extend the mesh).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastlivo_tpu.models import pipeline as pl_mod
from fastlivo_tpu.state import NavState

POINTS_AXIS = "points"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D device mesh over the points axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (POINTS_AXIS,))


def shard_scan(scan: pl_mod.ScanInput, mesh: Mesh) -> pl_mod.ScanInput:
    """Place a scan with points sharded, IMU window + scalars replicated."""
    pspec = NamedSharding(mesh, P(POINTS_AXIS))
    rspec = NamedSharding(mesh, P())
    return pl_mod.ScanInput(
        pts=jax.device_put(scan.pts, pspec),
        t_offs=jax.device_put(scan.t_offs, pspec),
        mask=jax.device_put(scan.mask, pspec),
        imu=jax.tree.map(lambda x: jax.device_put(x, rspec), scan.imu),
        t_end=jax.device_put(scan.t_end, rspec),
        acc_scale=jax.device_put(scan.acc_scale, rspec),
    )


def _map_specs(m: pl_mod.vm.VoxelHashMap, sharded: bool):
    """PartitionSpecs for the map pytree: sharded on the capacity axis
    (except the scalar epoch) or fully replicated."""
    if not sharded:
        return jax.tree.map(lambda _: P(), m)
    return jax.tree.map(
        lambda x: P() if x.ndim == 0 else P(POINTS_AXIS), m
    )


def make_sharded_map(
    map_cfg: pl_mod.vm.VoxelMapConfig, mesh: Mesh, dtype=None
) -> pl_mod.vm.VoxelHashMap:
    """Create an empty GLOBAL arena for map_sharded mode: per-device local
    capacity `map_cfg.capacity`, global arrays of capacity * n_devices
    sharded over the mesh axis (epoch replicated)."""
    import jax.numpy as jnp

    ndev = mesh.devices.size
    kw = {} if dtype is None else {"dtype": dtype}
    local = pl_mod.vm.make_map(map_cfg, **kw)

    def expand(x):
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        rep = jnp.tile(x, (ndev,) + (1,) * (x.ndim - 1))
        return jax.device_put(
            rep, NamedSharding(mesh, P(*((POINTS_AXIS,) + (None,) * (x.ndim - 1))))
        )

    return jax.tree.map(expand, local)


def make_sharded_lio_step(mesh: Mesh, cfg: pl_mod.StepConfig):
    """Compile the fused per-scan program as an SPMD program over `mesh`.

    Returns a jitted callable with the same signature as
    `pipeline.lio_scan_step` minus cfg/axis_name. Raw point arrays must be
    divisible by the mesh size (pad the scan budget accordingly).

    With cfg.map_sharded the map argument must come from `make_sharded_map`
    (global capacity = cfg.map_cfg.capacity * n_devices) and the returned
    world cloud is replicated; otherwise the map is replicated and the
    world cloud comes back points-sharded.
    """
    from fastlivo_tpu.models.imu import ImuWindow

    scan_specs = pl_mod.ScanInput(
        pts=P(POINTS_AXIS),
        t_offs=P(POINTS_AXIS),
        mask=P(POINTS_AXIS),
        imu=ImuWindow(stamps=P(), gyr=P(), acc=P(), mask=P()),
        t_end=P(),
        acc_scale=P(),
    )

    state_specs = jax.tree.map(lambda _: P(), NavState.identity())
    map_specs = _map_specs(pl_mod.vm.make_map(cfg.map_cfg), cfg.map_sharded)
    info_specs = pl_mod.lio.LioInfo(
        n_effective=P(), res_mean=P(), iterations=P(), converged=P()
    )
    cloud_spec = P() if cfg.map_sharded else P(POINTS_AXIS)

    fn = partial(pl_mod.lio_scan_step, cfg=cfg, axis_name=POINTS_AXIS)

    sharded = jax.shard_map(
        lambda state, m, scan, rot_il, t_il: fn(state, m, scan, rot_il, t_il),
        mesh=mesh,
        in_specs=(state_specs, map_specs, scan_specs, P(), P()),
        out_specs=(
            state_specs,
            map_specs,
            info_specs,
            (cloud_spec, cloud_spec),
            P(),  # packed host summary (replicated)
        ),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))


def make_sharded_bootstrap(mesh: Mesh, cfg: pl_mod.StepConfig):
    """SPMD first-scan map init matching `make_sharded_lio_step`'s specs."""
    from fastlivo_tpu.models.imu import ImuWindow

    scan_specs = pl_mod.ScanInput(
        pts=P(POINTS_AXIS),
        t_offs=P(POINTS_AXIS),
        mask=P(POINTS_AXIS),
        imu=ImuWindow(stamps=P(), gyr=P(), acc=P(), mask=P()),
        t_end=P(),
        acc_scale=P(),
    )
    state_specs = jax.tree.map(lambda _: P(), NavState.identity())
    map_specs = _map_specs(pl_mod.vm.make_map(cfg.map_cfg), cfg.map_sharded)

    fn = partial(pl_mod.bootstrap_map, cfg=cfg, axis_name=POINTS_AXIS)
    sharded = jax.shard_map(
        lambda m, scan, state, rot_il, t_il: fn(m, scan, state, rot_il, t_il),
        mesh=mesh,
        in_specs=(map_specs, scan_specs, state_specs, P(), P()),
        out_specs=map_specs,
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
