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
HOSTS_AXIS = "hosts"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D device mesh over the points axis (default devices: jax.devices();
    pass `devices` explicitly to build e.g. a CPU mesh while another
    platform is the default backend)."""
    devs = jax.devices() if devices is None else list(devices)
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (POINTS_AXIS,))


def make_mesh_2d(n_hosts: int, n_chips: int, devices=None) -> Mesh:
    """2-D (hosts x chips) mesh for multi-host map sharding: the map is
    partitioned over the fast inner axis (ICI within a host/slice) and
    queries/innovation work over the outer axis (DCN between hosts) — the
    only DCN traffic per iteration is the 6x6+6 innovation psum plus one
    gathered gated scan per step."""
    devs = jax.devices() if devices is None else list(devices)
    devs = np.asarray(devs[: n_hosts * n_chips]).reshape(n_hosts, n_chips)
    return Mesh(devs, (HOSTS_AXIS, POINTS_AXIS))


def _point_axes(mesh: Mesh):
    names = tuple(mesh.axis_names)
    return names[0] if len(names) == 1 else names


def shard_scan(scan: pl_mod.ScanInput, mesh: Mesh) -> pl_mod.ScanInput:
    """Place a scan with points sharded over ALL mesh axes, IMU window +
    scalars replicated."""
    pspec = NamedSharding(mesh, P(_point_axes(mesh)))
    rspec = NamedSharding(mesh, P())
    return pl_mod.ScanInput(
        pts=jax.device_put(scan.pts, pspec),
        t_offs=jax.device_put(scan.t_offs, pspec),
        mask=jax.device_put(scan.mask, pspec),
        imu=jax.tree.map(lambda x: jax.device_put(x, rspec), scan.imu),
        t_end=jax.device_put(scan.t_end, rspec),
        acc_scale=jax.device_put(scan.acc_scale, rspec),
    )


def _map_axis(mesh: Mesh) -> str:
    """The mesh axis the arena shards over: the last (fastest/ICI) axis."""
    return tuple(mesh.axis_names)[-1]


def _map_specs(m: pl_mod.vm.VoxelHashMap, sharded: bool, mesh: Mesh):
    """PartitionSpecs for the map pytree: sharded on the capacity axis over
    the inner mesh axis (replicated over any outer axes; scalar epoch
    replicated), or fully replicated."""
    if not sharded:
        return jax.tree.map(lambda _: P(), m)
    ax = _map_axis(mesh)
    return jax.tree.map(lambda x: P() if x.ndim == 0 else P(ax), m)


def make_sharded_map(
    map_cfg: pl_mod.vm.VoxelMapConfig, mesh: Mesh, dtype=None
) -> pl_mod.vm.VoxelHashMap:
    """Create an empty GLOBAL arena for map_sharded mode: per-device local
    capacity `map_cfg.capacity`, global arrays of capacity * n_chips
    sharded over the inner mesh axis (replicated over outer axes; epoch
    replicated)."""
    import jax.numpy as jnp

    ax = _map_axis(mesh)
    n_shards = mesh.shape[ax]
    kw = {} if dtype is None else {"dtype": dtype}
    local = pl_mod.vm.make_map(map_cfg, **kw)

    def expand(x):
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        rep = jnp.tile(x, (n_shards,) + (1,) * (x.ndim - 1))
        return jax.device_put(
            rep, NamedSharding(mesh, P(*((ax,) + (None,) * (x.ndim - 1))))
        )

    return jax.tree.map(expand, local)


def make_sharded_lio_step(
    mesh: Mesh, cfg: pl_mod.StepConfig, with_extras: bool = False
):
    """Compile the fused per-scan program as an SPMD program over `mesh`.

    Returns a jitted callable with the same signature as
    `pipeline.lio_scan_step` minus cfg/axis_name. Raw point arrays must be
    divisible by the mesh size (pad the scan budget accordingly).

    With cfg.map_sharded the map argument must come from `make_sharded_map`
    (global capacity = cfg.map_cfg.capacity * n_devices) and the returned
    world cloud is replicated; otherwise the map is replicated and the
    world cloud comes back points-sharded.

    with_extras adds two trailing REPLICATED arguments (extra_hth (18,18),
    extra_hty (18,)) — the GNSS innovation injection (models/gnss.py). The
    per-point innovations are psummed BEFORE the extras are added
    (models/lio.py:163-167), so the replicated extra contributes exactly
    once, same as single-device.
    """
    from fastlivo_tpu.models.imu import ImuWindow

    axes = _point_axes(mesh)
    if isinstance(axes, tuple) and not cfg.map_sharded:
        raise ValueError("multi-axis meshes require cfg.map_sharded=True")
    scan_specs = pl_mod.ScanInput(
        pts=P(axes),
        t_offs=P(axes),
        mask=P(axes),
        imu=ImuWindow(stamps=P(), gyr=P(), acc=P(), mask=P()),
        t_end=P(),
        acc_scale=P(),
    )

    state_specs = jax.tree.map(lambda _: P(), NavState.identity())
    map_specs = _map_specs(pl_mod.vm.make_map(cfg.map_cfg), cfg.map_sharded, mesh)
    info_specs = pl_mod.lio.LioInfo(
        n_effective=P(), res_mean=P(), iterations=P(), converged=P()
    )
    cloud_spec = P() if cfg.map_sharded else P(axes)

    fn = partial(pl_mod.lio_scan_step, cfg=cfg, axis_name=axes)

    if with_extras:
        body = lambda state, m, scan, rot_il, t_il, ehth, ehty: fn(
            state, m, scan, rot_il, t_il, extra_hth=ehth, extra_hty=ehty
        )
        in_specs = (state_specs, map_specs, scan_specs, P(), P(), P(), P())
    else:
        body = lambda state, m, scan, rot_il, t_il: fn(
            state, m, scan, rot_il, t_il
        )
        in_specs = (state_specs, map_specs, scan_specs, P(), P())

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=in_specs,
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


def make_sharded_reanchor(mesh: Mesh, cfg: pl_mod.StepConfig, chunk: int = 65536):
    """SPMD loop-corrected arena re-anchoring over a sharded map.

    The correction moves points across voxels (and therefore across shard
    owners); vm.reanchor with axis_name all-gathers each transformed chunk
    and re-inserts shard-locally so ownership changes never drop points.
    seg_of_epoch / rots / trans are replicated.
    """
    if not cfg.map_sharded:
        raise ValueError("make_sharded_reanchor requires cfg.map_sharded=True")
    ax = _map_axis(mesh)
    map_specs = _map_specs(pl_mod.vm.make_map(cfg.map_cfg), True, mesh)

    fn = partial(
        pl_mod.vm.reanchor, cfg=cfg.map_cfg, chunk=chunk, axis_name=ax
    )
    sharded = jax.shard_map(
        lambda m, seg, rots, trans: fn(
            m, seg_of_epoch=seg, rots=rots, trans=trans
        ),
        mesh=mesh,
        in_specs=(map_specs, P(), P(), P()),
        out_specs=map_specs,
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_sharded_bootstrap(mesh: Mesh, cfg: pl_mod.StepConfig):
    """SPMD first-scan map init matching `make_sharded_lio_step`'s specs."""
    from fastlivo_tpu.models.imu import ImuWindow

    axes = _point_axes(mesh)
    scan_specs = pl_mod.ScanInput(
        pts=P(axes),
        t_offs=P(axes),
        mask=P(axes),
        imu=ImuWindow(stamps=P(), gyr=P(), acc=P(), mask=P()),
        t_end=P(),
        acc_scale=P(),
    )
    state_specs = jax.tree.map(lambda _: P(), NavState.identity())
    map_specs = _map_specs(pl_mod.vm.make_map(cfg.map_cfg), cfg.map_sharded, mesh)

    fn = partial(pl_mod.bootstrap_map, cfg=cfg, axis_name=axes)
    sharded = jax.shard_map(
        lambda m, scan, state, rot_il, t_il: fn(m, scan, state, rot_il, t_il),
        mesh=mesh,
        in_specs=(map_specs, scan_specs, state_specs, P(), P()),
        out_specs=map_specs,
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
