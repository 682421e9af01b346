"""Multi-device SPMD execution of the LIVO hot path.

The reference has no distributed story (single C++ process; its parallelism
is OpenMP over scan points, reference: src/laser_mapping.cpp:499-502 and
CMakeLists.txt:26-44). The TPU-native scaling axis is the same one OpenMP
exploited — **points** — lifted to a device mesh:

- scan points (and their undistortion/kNN/plane-fit/Jacobian work) are
  sharded over the `points` mesh axis;
- the innovation matrices H^T R^-1 H / H^T R^-1 z are psummed over ICI
  (they are sum-decomposable over points), after which every device runs
  the identical small 18x18 solve — replicated control flow keeps the
  iterated/re-match `while_loop` in lockstep;
- the map arena is replicated; map updates are computed from the
  all-gathered gated scan so replicas never diverge. (Scan-sized
  all-gathers are ~100 KB — noise next to the arena-sized gathers the
  kNN does locally.)

Built on `jax.shard_map` over a 1-D `Mesh`, so the same code compiles for
1 chip, one host's chips, or a multi-host slice (DCN axes would simply
extend the mesh).
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


def make_sharded_lio_step(mesh: Mesh, cfg: pl_mod.StepConfig):
    """Compile the fused per-scan program as an SPMD program over `mesh`.

    Returns a jitted callable with the same signature as
    `pipeline.lio_scan_step` minus cfg/axis_name. Point arrays must be
    divisible by the mesh size (pad the scan budget accordingly).
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
    map_specs = jax.tree.map(lambda _: P(), pl_mod.vm.make_map(cfg.map_cfg))
    info_specs = pl_mod.lio.LioInfo(
        n_effective=P(), res_mean=P(), iterations=P(), converged=P()
    )

    fn = partial(pl_mod.lio_scan_step, cfg=cfg, axis_name=POINTS_AXIS)

    sharded = jax.shard_map(
        lambda state, m, scan, rot_il, t_il: fn(state, m, scan, rot_il, t_il),
        mesh=mesh,
        in_specs=(state_specs, map_specs, scan_specs, P(), P()),
        out_specs=(
            state_specs,
            map_specs,
            info_specs,
            (P(POINTS_AXIS), P(POINTS_AXIS)),  # world cloud stays sharded
            P(),  # packed host summary (replicated)
        ),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))
