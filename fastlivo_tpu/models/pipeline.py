"""The fused per-scan device program + host orchestration.

Capability parity with the reference's `LaserMapping::Run` LIO path
(reference: src/laser_mapping.cpp:37-284): one measurement group in, one
posterior state + updated map out. TPU-first: the entire chain

    IMU propagate -> undistort -> voxel downsample -> iterated ESKF
    -> insert gate -> map scatter

is ONE jitted program per scan (`lio_scan_step`) — no host round-trips
between stages, donated map buffers, and an `axis_name` switch that turns
the same program into its multi-device SPMD form (points sharded,
innovations psummed; see `fastlivo_tpu.parallel`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastlivo_tpu.maps import visual_map as vmap_mod
from fastlivo_tpu.maps import voxel_map as vm
from fastlivo_tpu.models import imu as imu_mod
from fastlivo_tpu.models import lio
from fastlivo_tpu.models import vio as vio_mod
from fastlivo_tpu.ops import so3
from fastlivo_tpu.ops import voxelize
from fastlivo_tpu.ops.camera import Pinhole
from fastlivo_tpu.state import NavState
from fastlivo_tpu.utils.config import FastLivoConfig


@dataclass(frozen=True)
class StepConfig:
    """All static shapes/params of the per-scan program (hashable)."""

    map_cfg: vm.VoxelMapConfig = vm.VoxelMapConfig()
    lio_cfg: lio.LioConfig = lio.LioConfig()
    ds_leaf: float = 0.15  # filter_size_surf
    ds_capacity: int = 16384  # static downsampled-scan budget
    imu_window: int = 128  # static IMU samples per group
    cov_gyr: float = 0.01
    cov_acc: float = 0.01
    cov_bias_gyr: float = 1e-4
    cov_bias_acc: float = 1e-4
    # Visual path (None camera => LIO-only, the reference's img_enable=0).
    cam: Optional[Pinhole] = None
    vio_cfg: vio_mod.VioConfig = vio_mod.VioConfig()
    vm_cfg: vmap_mod.VisualMapConfig = vmap_mod.VisualMapConfig()
    # Multi-device map mode (only meaningful when axis_name is set):
    #   False -> map REPLICATED, scan points sharded, innovations psummed.
    #   True  -> map arena SHARDED by hash-partitioned voxel ownership
    #            (map_cfg.capacity is the PER-DEVICE capacity); the scan is
    #            replicated after downsample, lookups merge over the axis,
    #            inserts are shard-local. Per-device map memory stays
    #            constant as the mesh grows.
    map_sharded: bool = False

    @staticmethod
    def from_config(cfg: FastLivoConfig) -> "StepConfig":
        par = getattr(cfg, "parallel", None)
        map_sharded = bool(
            par is not None and par.n_devices > 1 and par.map_sharded
        )
        return StepConfig(
            map_sharded=map_sharded,
            cam=Pinhole.from_config(cfg.camera) if cfg.vio.img_enable else None,
            vio_cfg=vio_mod.VioConfig(
                grid_size=cfg.vio.grid_size,
                patch_size=cfg.vio.patch_size,
                max_iterations=cfg.vio.max_iterations,
                outlier_threshold=cfg.vio.outlier_threshold,
                img_point_cov=cfg.vio.img_point_cov,
                depth_continuous_thresh=cfg.vio.depth_continuous_thresh,
                ncc_en=cfg.vio.ncc_en,
                ncc_thre=cfg.vio.ncc_thre,
                levels=cfg.vio.pyr_levels,
                exposure_en=cfg.vio.exposure_en,
            ),
            vm_cfg=vmap_mod.VisualMapConfig(
                capacity=cfg.vio.max_visual_points,
                max_obs=cfg.vio.max_obs_per_point,
                patch_size=cfg.vio.patch_size,
            ),
            map_cfg=vm.VoxelMapConfig(
                resolution=cfg.map.resolution,
                capacity=cfg.map.capacity,
                max_points=cfg.map.max_points_per_voxel,
                nearby_type=cfg.map.nearby_type,
                probe_depth=cfg.map.probe_depth,
                surfel_decay=cfg.map.surfel_decay,
                surfel_freeze_n=cfg.map.surfel_freeze_n,
                lookup_unique_cap=cfg.map.lookup_unique_cap,
            ),
            lio_cfg=lio.LioConfig(
                max_iteration=cfg.lio.max_iteration,
                num_match_points=cfg.map.num_match_points,
                laser_point_cov=cfg.lio.laser_point_cov,
                plane_threshold=cfg.lio.plane_threshold,
                residual_limit=cfg.lio.residual_limit,
                converge_rot_deg=cfg.lio.converge_rot_deg,
                converge_trans_cm=cfg.lio.converge_trans_cm,
                filter_size_map=cfg.lio.filter_size_map,
                measurement_model=cfg.lio.measurement_model,
                max_jump_m=cfg.lio.max_jump_m,
                min_effective=cfg.lio.min_effective,
                vgicp_source_cov=cfg.lio.vgicp_source_cov,
                vgicp_source_mode=cfg.lio.vgicp_source_mode,
                vgicp_source_k=cfg.lio.vgicp_source_k,
                surfel_min_points=cfg.lio.surfel_min_points,
                surfel_planarity_max=cfg.lio.surfel_planarity_max,
                surfel_conf_weight=cfg.lio.surfel_conf_weight,
            ),
            ds_leaf=cfg.lio.filter_size_surf,
            ds_capacity=cfg.lio.max_points,
            imu_window=cfg.imu.imu_int_frame,
            cov_gyr=cfg.imu.cov_gyr,
            cov_acc=cfg.imu.cov_acc,
            cov_bias_gyr=cfg.imu.cov_bias_gyr,
            cov_bias_acc=cfg.imu.cov_bias_acc,
        )


class ScanInput(NamedTuple):
    """One LiDAR measurement group (fixed shapes, padded)."""

    pts: jnp.ndarray  # (N, 3) raw points, LiDAR frame
    t_offs: jnp.ndarray  # (N,) seconds relative to window start
    mask: jnp.ndarray  # (N,) validity
    imu: imu_mod.ImuWindow  # fixed-size IMU window
    t_end: jnp.ndarray  # () scan-end time relative to window start
    acc_scale: jnp.ndarray  # () G / |mean_acc| normalization


def _maybe_dedup(pts_w, mask, map_cfg):
    """Unique-voxel dedup shared between the insert gate and the insert
    (one sort instead of two). Always worthwhile with the bucketized
    arena: the table sizes to min(cap, N)."""
    n = pts_w.shape[0]
    cap = min(map_cfg.lookup_unique_cap or n, n)
    return vm.unique_voxels(
        vm.voxel_coord(pts_w, map_cfg.resolution), mask, cap
    )


def lio_scan_step(
    state: NavState,
    lidar_map: vm.VoxelHashMap,
    scan: ScanInput,
    rot_il: jnp.ndarray,
    t_il: jnp.ndarray,
    cfg: StepConfig,
    extra_hth: Optional[jnp.ndarray] = None,
    extra_hty: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> Tuple[
    NavState,
    vm.VoxelHashMap,
    lio.LioInfo,
    Tuple[jnp.ndarray, jnp.ndarray],
    jnp.ndarray,
]:
    """One full scan-end measurement update (the flagship device program).

    Returns a 5-tuple: (posterior state, updated map, LioInfo,
    (world_cloud, world_mask) for the next VIO frames, packed host summary
    vector — see `step_summary`).

    The update health gate runs ON-DEVICE: if the measurement correction
    jumped more than `lio_cfg.max_jump_m` past the propagated prior, or the
    posterior went non-finite, the step returns the propagated state and the
    map/world-cloud are left untouched (insert masked off) — a rejected
    update can never pollute the donated arena.

    Under shard_map (axis_name set): scan.pts/t_offs/mask arrive sharded on
    the points axis, state + map replicated. Undistortion and the residual
    chain run shard-local; the downsample runs on the all-gathered
    undistorted scan so voxel dedup is global (same semantics as the
    single-chip path), then each device takes its slice; map updates are
    computed from the all-gathered gated points so replicas stay identical.
    """
    state_prop, poses = imu_mod.propagate(
        state,
        scan.imu,
        scan.t_end,
        scan.acc_scale,
        cfg.cov_gyr,
        cfg.cov_acc,
        cfg.cov_bias_gyr,
        cfg.cov_bias_acc,
    )

    pts_und = imu_mod.undistort(
        scan.pts, scan.t_offs, scan.mask, poses, state_prop, rot_il, t_il
    )

    # Axis roles. axis_name may be a single mesh axis or a (hosts, chips)
    # tuple: with cfg.map_sharded the LAST axis shards the map (merged over
    # ICI) and any LEADING axes shard the queries/innovation work (psummed
    # — the only DCN traffic on a multi-host mesh is that 6x6+6 psum plus
    # the gathered gated scan).
    if axis_name is None:
        map_axis = query_axis = None
    elif cfg.map_sharded:
        if isinstance(axis_name, tuple):
            map_axis = axis_name[-1]
            query_axis = (
                axis_name[0] if len(axis_name) == 2 else axis_name[:-1]
            ) if len(axis_name) > 1 else None
        else:
            map_axis, query_axis = axis_name, None
    else:
        map_axis, query_axis = None, axis_name

    if axis_name is None:
        ds_pts, ds_mask = voxelize.voxel_downsample(
            pts_und, scan.mask, cfg.ds_leaf, cfg.ds_capacity
        )
    else:
        # Global voxel dedup: gather the (small) undistorted scan, downsample
        # identically everywhere, then each group takes its query slice.
        all_pts = jax.lax.all_gather(pts_und, axis_name, tiled=True)
        all_mask = jax.lax.all_gather(scan.mask, axis_name, tiled=True)
        ds_all, ds_all_mask = voxelize.voxel_downsample(
            all_pts, all_mask, cfg.ds_leaf, cfg.ds_capacity
        )
        if query_axis is None:
            # Map-sharded 1-D mesh: queries stay fully replicated.
            ds_pts, ds_mask = ds_all, ds_all_mask
        else:
            ndev = jax.lax.axis_size(query_axis)
            shard = cfg.ds_capacity // ndev
            idx = jax.lax.axis_index(query_axis)
            ds_pts = jax.lax.dynamic_slice_in_dim(ds_all, idx * shard, shard)
            ds_mask = jax.lax.dynamic_slice_in_dim(ds_all_mask, idx * shard, shard)

    posterior, info, (nbr, nv) = lio.lio_update(
        state_prop,
        lidar_map,
        ds_pts,
        ds_mask,
        rot_il,
        t_il,
        cfg.map_cfg,
        cfg.lio_cfg,
        extra_hth=extra_hth,
        extra_hty=extra_hty,
        axis_name=query_axis,
        map_axis=map_axis,
    )

    # --- on-device update health gate. jump is the MEASUREMENT correction
    # (posterior vs propagated prior), not total motion over the window, so
    # fast platforms don't trip it (ADVICE r1). Rejection selects the
    # propagated state and masks the map insert off.
    jump = jnp.linalg.norm(posterior.pos - state_prop.pos)
    finite = jnp.all(jnp.isfinite(posterior.pos)) & jnp.all(
        jnp.isfinite(posterior.cov)
    )
    accept = finite & (jump <= cfg.lio_cfg.max_jump_m)
    posterior = jax.tree.map(
        lambda a, b: jnp.where(accept, a, b), posterior, state_prop
    )

    _, p_w = lio.transform_to_world(
        ds_pts, posterior.rot, posterior.pos, rot_il, t_il
    )
    # Zero out a rejected scan's world cloud so downstream consumers (VIO,
    # loop backend) never see points registered with a rejected pose.
    ds_mask = ds_mask & accept
    p_w = jnp.where(jnp.isfinite(p_w), p_w, 0.0)
    surfel = cfg.lio_cfg.measurement_model == "surfel"
    if surfel:
        # Surfel mode skips the per-iteration kNN, but the map insert still
        # needs a density gate: without it every scan re-inserts duplicates
        # and the unbounded moment accumulators get poisoned by transient
        # pose error (measured: 9 cm -> 224 cm ATE with VIO interleaving).
        # The gate reads the point's OWN voxel slab (one probe + one slab
        # gather, vm.slab_insert_gate) instead of a 19-voxel kNN — the kNN
        # gate was the single most expensive op left in the surfel step
        # (~20 gather passes for one bit per point).
        if map_axis is not None:
            # Gather the query slices first (no-op on a 1-D map mesh),
            # gate against the LOCAL shard (only the owner resolves its
            # voxel; non-owners default to add=True and are masked off
            # inside sharded_insert anyway). The RETURNED p_w keeps its
            # own layout (replicated in map-sharded mode).
            p_w_ins, m_ins = p_w, ds_mask
            if query_axis is not None:
                p_w_ins = jax.lax.all_gather(p_w, query_axis, tiled=True)
                m_ins = jax.lax.all_gather(ds_mask, query_axis, tiled=True)
                p_w, ds_mask = p_w_ins, m_ins  # cloud replicated here too
            dd = _maybe_dedup(p_w_ins, m_ins, cfg.map_cfg)
            add = vm.slab_insert_gate(
                lidar_map, p_w_ins, m_ins, cfg.map_cfg,
                cfg.lio_cfg.filter_size_map, cfg.lio_cfg.num_match_points,
                dedup=dd,
            )
            lidar_map = vm.sharded_insert(
                lidar_map, p_w_ins, add, cfg.map_cfg, map_axis, dedup=dd
            )
        else:
            p_w_ins, m_ins = p_w, ds_mask
            if axis_name is not None:
                # Replicated map on a points mesh: insert the full gathered
                # scan everywhere; the returned cloud stays sharded.
                p_w_ins = jax.lax.all_gather(p_w, axis_name, tiled=True)
                m_ins = jax.lax.all_gather(ds_mask, axis_name, tiled=True)
            dd = _maybe_dedup(p_w_ins, m_ins, cfg.map_cfg)
            add = vm.slab_insert_gate(
                lidar_map, p_w_ins, m_ins, cfg.map_cfg,
                cfg.lio_cfg.filter_size_map, cfg.lio_cfg.num_match_points,
                dedup=dd,
            )
            lidar_map = vm.insert(lidar_map, p_w_ins, add, cfg.map_cfg, dedup=dd)
    else:
        add = lio.map_insert_gate(
            p_w, ds_mask, nbr, nv, cfg.lio_cfg.filter_size_map
        )
        if axis_name is None:
            lidar_map = vm.insert(lidar_map, p_w, add, cfg.map_cfg)
        elif map_axis is not None:
            # Sharded arena: every device needs the full gated scan to
            # insert its owned voxels; gather the query slices (no-op when
            # queries were replicated on a 1-D map mesh).
            if query_axis is not None:
                p_w = jax.lax.all_gather(p_w, query_axis, tiled=True)
                add = jax.lax.all_gather(add, query_axis, tiled=True)
                ds_mask = jax.lax.all_gather(ds_mask, query_axis, tiled=True)
            lidar_map = vm.sharded_insert(
                lidar_map, p_w, add, cfg.map_cfg, map_axis
            )
        else:
            # Keep map replicas identical: insert the full gated scan
            # everywhere (the returned cloud stays sharded).
            p_w_all = jax.lax.all_gather(p_w, axis_name, tiled=True)
            add_all = jax.lax.all_gather(add, axis_name, tiled=True)
            lidar_map = vm.insert(lidar_map, p_w_all, add_all, cfg.map_cfg)

    # World cloud for the next VIO frames (the reference's pcl_wait_pub,
    # laser_mapping.cpp:270-274).
    summary = step_summary(posterior, info, jump, accept)
    return posterior, lidar_map, info, (p_w, ds_mask), summary


def lio_scan_multi(
    state: NavState,
    lidar_map: vm.VoxelHashMap,
    scans: ScanInput,
    rot_il: jnp.ndarray,
    t_il: jnp.ndarray,
    cfg: StepConfig,
    axis_name: Optional[str] = None,
) -> Tuple[
    NavState,
    vm.VoxelHashMap,
    jnp.ndarray,
    Tuple[jnp.ndarray, jnp.ndarray],
]:
    """K scan-end measurement updates in ONE dispatch (lax.scan over a
    stacked batch of measurement groups).

    `scans` is a ScanInput whose leaves carry a leading K axis. Returns
    (posterior state, map, summaries (K, 11), (world clouds (K, N, 3),
    masks (K, N))) — identical results to K sequential `lio_scan_step`
    calls (regression-tested).

    CAVEAT (measured on TPU v5e): lax.scan double-buffers its carry, so
    the sparsely-scatter-updated map arena is fully copied every
    iteration (~0.2 s/scan for a 250 MB arena) — slower than chaining the
    per-scan program. LivoPipeline therefore batches by chaining
    `lio_scan_step` dispatches and deferring the summary fetches
    (process_scan/flush_scans); this function remains for offline stacked
    replay on hosts where the arena fits cache-friendly sizes.
    """

    def body(carry, scan):
        st, m = carry
        post, m, _info, (p_w, msk), summary = lio_scan_step(
            st, m, scan, rot_il, t_il, cfg, axis_name=axis_name
        )
        return (post, m), (summary, p_w, msk)

    (state, lidar_map), (summaries, clouds, masks) = jax.lax.scan(
        body, (state, lidar_map), scans
    )
    return state, lidar_map, summaries, (clouds, masks)


def step_summary(
    state_out: NavState, info, jump: jnp.ndarray, accept: jnp.ndarray
) -> jnp.ndarray:
    """Pack everything the host loop reads per scan into ONE small vector:
    [pos(3), quat wxyz(4), n_eff, jump_m, accepted, res_mean] — a single
    device->host fetch instead of six (each fetch is a full round trip,
    which dominates when the device is remote). jump_m is the measurement
    correction |pos_posterior - pos_propagated|."""
    from fastlivo_tpu.ops import so3 as so3_ops

    q = so3_ops.rot_to_quat(state_out.rot)
    return jnp.concatenate(
        [
            state_out.pos,
            q,
            jnp.stack(
                [
                    info.n_effective.astype(state_out.pos.dtype),
                    jump,
                    accept.astype(state_out.pos.dtype),
                    info.res_mean,
                ]
            ),
        ]
    )


def vio_scan_step(
    state: NavState,
    visual_map: vmap_mod.VisualMap,
    scan: ScanInput,
    img: jnp.ndarray,
    world_cloud: jnp.ndarray,
    world_mask: jnp.ndarray,
    rot_ci: jnp.ndarray,
    t_ci: jnp.ndarray,
    cfg: StepConfig,
) -> Tuple[NavState, vmap_mod.VisualMap, vio_mod.VioInfo, jnp.ndarray]:
    """One image-bounded measurement update (reference: Run VIO branch,
    laser_mapping.cpp:86-126): propagate to the image timestamp, then the
    photometric iterated EKF against the last completed scan's world cloud.

    Returns (posterior, visual map, VioInfo, packed summary) — the summary
    is [pos(3), quat wxyz(4), n_selected] so a batched host loop can defer
    its per-frame bookkeeping fetch (see LivoPipeline.flush_scans)."""
    state_prop, _ = imu_mod.propagate(
        state,
        scan.imu,
        scan.t_end,
        scan.acc_scale,
        cfg.cov_gyr,
        cfg.cov_acc,
        cfg.cov_bias_gyr,
        cfg.cov_bias_acc,
    )
    posterior, visual_map, info = vio_mod.vio_update(
        state_prop,
        visual_map,
        img,
        world_cloud,
        world_mask,
        cfg.cam,
        rot_ci,
        t_ci,
        cfg.vm_cfg,
        cfg.vio_cfg,
    )
    q = so3.rot_to_quat(posterior.rot)
    summary = jnp.concatenate(
        [
            posterior.pos,
            q,
            info.n_selected.astype(posterior.pos.dtype)[None],
        ]
    )
    return posterior, visual_map, info, summary


def bootstrap_map(
    lidar_map: vm.VoxelHashMap,
    scan: ScanInput,
    state: NavState,
    rot_il: jnp.ndarray,
    t_il: jnp.ndarray,
    cfg: StepConfig,
    axis_name: Optional[str] = None,
) -> vm.VoxelHashMap:
    """First-scan map initialization (reference: laser_mapping.cpp:145-152
    `flg_first_scan` branch): downsample and insert at the current pose, no
    filter update. Under shard_map, scan points arrive sharded on
    `axis_name`; with cfg.map_sharded each device inserts its owned voxels,
    otherwise replicas insert the full gathered scan identically."""
    pts, mask = scan.pts, scan.mask
    if axis_name is not None:
        pts = jax.lax.all_gather(pts, axis_name, tiled=True)
        mask = jax.lax.all_gather(mask, axis_name, tiled=True)
    ds_pts, ds_mask = voxelize.voxel_downsample(
        pts, mask, cfg.ds_leaf, cfg.ds_capacity
    )
    _, p_w = lio.transform_to_world(ds_pts, state.rot, state.pos, rot_il, t_il)
    if axis_name is not None and cfg.map_sharded:
        map_axis = axis_name[-1] if isinstance(axis_name, tuple) else axis_name
        return vm.sharded_insert(lidar_map, p_w, ds_mask, cfg.map_cfg, map_axis)
    return vm.insert(lidar_map, p_w, ds_mask, cfg.map_cfg)


class LivoPipeline:
    """Host-side orchestrator (thin): owns the device state, compiles the
    fused step once, feeds it measurement groups produced by the sync layer.

    This is the class-based `LaserMapping` equivalent minus ROS: sensors
    arrive through `fastlivo_tpu.io` as replayable logs instead of
    callbacks, and everything per-scan happens in one device program.
    """

    def __init__(self, cfg: FastLivoConfig, dtype=jnp.float32, devices=None):
        self.cfg = cfg
        self.step_cfg = StepConfig.from_config(cfg)
        self.dtype = dtype

        # Multi-device SPMD mode (cfg.parallel, see fastlivo_tpu.parallel):
        # the production pipeline itself runs its fused per-scan program
        # over a jax.sharding.Mesh — points sharded + innovations psummed
        # (map replicated), or the arena hash-partitioned across devices
        # (map_sharded; map.capacity becomes PER-DEVICE capacity).
        self.mesh = None
        par = getattr(cfg, "parallel", None)
        n_dev = int(par.n_devices) if par is not None else 1
        if n_dev > 1:
            from fastlivo_tpu import parallel as par_mod

            if par.n_hosts > 1:
                if not self.step_cfg.map_sharded:
                    raise ValueError(
                        "parallel.n_hosts > 1 requires parallel.map_sharded"
                    )
                if n_dev % par.n_hosts:
                    raise ValueError("n_devices must be divisible by n_hosts")
                self.mesh = par_mod.make_mesh_2d(
                    par.n_hosts, n_dev // par.n_hosts, devices=devices
                )
            else:
                self.mesh = par_mod.make_mesh(n_dev, devices=devices)
            if (cfg.lio.max_points * 2) % n_dev or cfg.lio.max_points % n_dev:
                raise ValueError(
                    f"lio.max_points ({cfg.lio.max_points}) must be divisible "
                    f"by parallel.n_devices ({n_dev}) for point sharding"
                )

        rot = np.asarray(cfg.extrinsics.extrinsic_r, np.float32).reshape(3, 3)
        self.rot_il = self._replicate(jnp.asarray(rot, dtype))
        self.t_il = self._replicate(jnp.asarray(cfg.extrinsics.extrinsic_t, dtype))

        # Camera-IMU from camera-LiDAR + LiDAR-IMU (reference composes the
        # same way in LidarSelector::init): p_c = Rcl p_l + Pcl.
        rcl = np.asarray(cfg.camera.rcl, np.float32).reshape(3, 3)
        pcl = np.asarray(cfg.camera.pcl, np.float32)
        rot_ci_np = rcl @ rot.T
        self.rot_ci = jnp.asarray(rot_ci_np, dtype)
        self.t_ci = jnp.asarray(
            pcl - rot_ci_np @ np.asarray(cfg.extrinsics.extrinsic_t, np.float32),
            dtype,
        )

        self.state = self._replicate(NavState.identity(dtype))
        if self.mesh is not None and self.step_cfg.map_sharded:
            from fastlivo_tpu import parallel as par_mod

            self.map = par_mod.make_sharded_map(
                self.step_cfg.map_cfg, self.mesh, dtype
            )
        else:
            self.map = self._replicate(vm.make_map(self.step_cfg.map_cfg, dtype))
        self.visual_map = self._replicate(
            vmap_mod.make_visual_map(self.step_cfg.vm_cfg, dtype)
        )
        self.initializer = imu_mod.StaticInitializer(
            init_count=cfg.imu.init_count,
            zero_velocity_thresh=cfg.imu.zero_velocity_thresh,
        )
        # Loop closure + pose graph back-end (reference: loop_en wiring +
        # loop thread, laser_mapping.cpp:1071-1094, :1223-1349).
        self.loop_backend = None
        if cfg.loop.loop_en:
            from fastlivo_tpu.backend.loop_manager import LoopBackend

            # Detection runs on a worker thread by default (the reference's
            # std::thread loop, laser_mapping.cpp:1223-1349) so STD cost
            # stays off the scan critical path; finish() drains it.
            self.loop_backend = LoopBackend(cfg, background=cfg.loop.background)

        # GNSS fusion (reference: gnss_en + GNSSProcessing wiring,
        # laser_mapping.cpp:1059-1069, :616-621).
        self.gnss = None
        if cfg.gnss.gnss_en:
            from fastlivo_tpu.models.gnss import GnssFusion

            self.gnss = GnssFusion(
                antlever=np.asarray(cfg.gnss.antenna_lever),
                outlier_gate_m=cfg.gnss.outlier_gate_m,
                init_window=cfg.gnss.init_window,
            )
            if cfg.gnss.rtk_file:
                self.gnss.load_rtk_file(cfg.gnss.rtk_file)
        self.first_scan = True
        self._first_scan_t = None
        self._init_time = cfg.lio.init_time
        # Insert-epoch -> timestamp: vm.insert bumps the arena epoch by one
        # per call (each bootstrap and each scan step inserts exactly once),
        # so appending here per insert keeps epoch k <-> stamp mapping for
        # loop-corrected map re-anchoring (reanchor_map).
        self._epoch_stamps: list = []
        self.trajectory: list = []  # (t, pos, quat) tuples for TUM export
        self._last_vio_img = None  # most recent camera frame (loop verify)
        # Failure detection (SURVEY.md section 5: the reference only has
        # timestamp-loopback reset + the disabled degeneracy guard; here
        # update health is monitored and anomalous updates are rejected).
        self.health = {"rejected": 0, "low_constraint": 0, "resets": 0}
        self._min_effective = self.step_cfg.lio_cfg.min_effective
        # Last completed scan's world cloud (the reference's pcl_wait_pub).
        self.world_cloud = self._replicate(
            jnp.zeros((self.step_cfg.ds_capacity, 3), dtype)
        )
        self.world_mask = self._replicate(
            jnp.zeros((self.step_cfg.ds_capacity,), bool)
        )

        if self.mesh is None:
            self._step = jax.jit(
                lio_scan_step,
                static_argnames=("cfg", "axis_name"),
                donate_argnames=("lidar_map",),
            )
        else:
            # SPMD step over the mesh. with_extras is always on: the GNSS
            # injection arrives as replicated (18,18)/(18,) blocks (zeros
            # when absent — additive identity), keeping one compiled
            # program for both cases.
            from fastlivo_tpu import parallel as par_mod

            raw_step = par_mod.make_sharded_lio_step(
                self.mesh, self.step_cfg, with_extras=True
            )
            raw_boot = par_mod.make_sharded_bootstrap(self.mesh, self.step_cfg)
            _zh = self._replicate(jnp.zeros((18, 18), dtype))
            _zy = self._replicate(jnp.zeros((18,), dtype))

            def _step(state, lidar_map, scan, rot_il, t_il, _cfg,
                      extra_hth=None, extra_hty=None):
                scan = par_mod.shard_scan(scan, self.mesh)
                ehth = _zh if extra_hth is None else jnp.asarray(extra_hth, dtype)
                ehty = _zy if extra_hty is None else jnp.asarray(extra_hty, dtype)
                return raw_step(state, lidar_map, scan, rot_il, t_il, ehth, ehty)

            def _bootstrap(lidar_map, scan, state, rot_il, t_il, _cfg):
                scan = par_mod.shard_scan(scan, self.mesh)
                return raw_boot(lidar_map, scan, state, rot_il, t_il)

            self._step = _step
            self._sharded_bootstrap = _bootstrap
        # Scan batching (ROADMAP item 3): dispatch scan steps back-to-back
        # WITHOUT fetching results, and drain the (tiny) summary fetches
        # once per K scans. On a remote TPU a synchronizing fetch costs
        # ~300 ms while chained dispatches cost ~0.15 ms — and chaining the
        # already-compiled per-scan program keeps the donated arena
        # in-place (a lax.scan over the map carry double-buffers it, which
        # measured ~0.2 s/scan in XLA copies). VIO interleaving batches too
        # (vio_scan_step keeps everything device-side and returns a packed
        # summary); only GNSS blocks batching — its observation must be
        # linearized host-side at each scan's propagated prior.
        # Semantics note vs unbatched: when a scan is REJECTED mid-batch,
        # the chained VIO dispatches that follow see that scan's masked-off
        # world cloud (an empty photometric update) instead of the host
        # rollback to the last accepted cloud; both recover at the next
        # accepted scan.
        #
        # scan_batch semantics: 1 = fetch per scan; K>1 = flush every K
        # scans; 0 = FETCH-FREE steady state — flush only at finish()/
        # checkpoint. 0 is the right mode for tunneled remote TPUs, whose
        # PJRT client PERMANENTLY degrades all subsequent dispatches
        # (~0.15 ms -> ~850 ms) after the first device->host transfer of
        # any program output, however small (measured; this — not buffer
        # freshness — is the round-2 "e2e floor"). In mode 0 without a
        # loop backend, pending entries do not retain world clouds (a
        # whole run's clouds would exhaust HBM); the rejected-scan cloud
        # rollback is skipped (the on-device gate already zeroed the
        # rejected cloud's mask, so downstream consumers see an empty —
        # never a wrong — cloud).
        self.scan_batch = int(getattr(cfg.lio, "scan_batch", 1))
        self._batch_eligible = self.scan_batch != 1 and not cfg.gnss.gnss_en
        # Mixed pending queue, in dispatch order:
        #   ("scan", t_abs, cloud, mask, last_img)   |   ("img", t_abs)
        # Summaries are NOT kept as per-measurement handles: on the
        # tunneled TPU each individual device->host read after the first
        # costs seconds (measured ~8 s/row draining a 60-scan run), so the
        # packed rows accumulate into ONE device-side buffer via a tiny
        # donated append dispatch (~us) and flush fetches the whole buffer
        # once.
        self._pending_scans: list = []
        self._pending_n_scans = 0
        self._retain_clouds = self.loop_backend is not None
        self._sum_cap = 65536  # deferred measurements per flush (1.8 h @ 10 Hz)
        if self._batch_eligible:
            self._sum_buf = self._replicate(
                jnp.zeros((self._sum_cap, 11), dtype)
            )
            self._sum_idx = self._replicate(jnp.zeros((), jnp.int32))
            cap = self._sum_cap

            def _append(buf, idx, row):
                if row.shape[0] < 11:
                    row = jnp.concatenate(
                        [row, jnp.zeros((11 - row.shape[0],), row.dtype)]
                    )
                return buf.at[jnp.minimum(idx, cap - 1)].set(row), idx + 1

            self._append_sum = jax.jit(_append, donate_argnums=(0,))
        self._vio_step = jax.jit(
            vio_scan_step,
            static_argnames=("cfg",),
            donate_argnames=("visual_map",),
        )
        if self.mesh is None:
            self._bootstrap = jax.jit(
                bootstrap_map,
                static_argnames=("cfg",),
                donate_argnames=("lidar_map",),
            )
        else:
            self._bootstrap = self._sharded_bootstrap
        self._propagate = jax.jit(imu_mod.propagate)

    def _replicate(self, tree):
        """Place a pytree replicated over the mesh (no-op single-device)."""
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(self.mesh, PartitionSpec())
        return jax.tree.map(lambda x: jax.device_put(x, rep), tree)

    @property
    def n_map_shards(self) -> int:
        """Shard count of the map arena (1 = replicated/single-device)."""
        if self.mesh is None or not self.step_cfg.map_sharded:
            return 1
        return self.mesh.shape[tuple(self.mesh.axis_names)[-1]]

    def place_map(self, m: vm.VoxelHashMap) -> vm.VoxelHashMap:
        """Place a host-restored arena with the pipeline's map sharding
        (checkpoint resume: the npz holds the GLOBAL arrays; re-shard them
        onto the mesh, or replicate on a points-sharded mesh)."""
        if self.mesh is None:
            return m
        from jax.sharding import NamedSharding

        from fastlivo_tpu.parallel import sharded as _sh

        specs = _sh._map_specs(m, self.step_cfg.map_sharded, self.mesh)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)), m, specs
        )

    def _advance(self, scan: ScanInput):
        """Propagate the state through a group's IMU window WITHOUT a
        measurement update. Every group must advance the state — the window
        builder's clock moves forward regardless of whether an update runs,
        so skipping propagation would silently drop motion."""
        self.state, _ = self._propagate(
            self.state, scan.imu, scan.t_end, scan.acc_scale
        )

    def process_scan(self, scan: ScanInput, t_abs: float):
        """Feed one scan-end measurement group. Returns LioInfo or None
        (during static initialization)."""
        if not self.initializer.done:
            ok = self.initializer.push(
                np.asarray(scan.imu.gyr)[np.asarray(scan.imu.mask)],
                np.asarray(scan.imu.acc)[np.asarray(scan.imu.mask)],
            )
            if ok:
                self.state = self._replicate(
                    self.initializer.initial_state(self.dtype)
                )
            return None

        if self.first_scan:
            self._first_scan_t = t_abs

        # EKF warm-up (the reference's flg_EKF_inited / INIT_TIME gate,
        # laser_mapping.h:58, laser_mapping.cpp:170): propagate + insert,
        # no update, until the map has accumulated enough structure (the
        # surfel model's voxel moments need several scans before planes
        # become valid).
        if self.first_scan or (
            self._first_scan_t is not None
            and t_abs - self._first_scan_t < self._init_time
        ):
            self._advance(scan)
            self.map = self._bootstrap(
                self.map, scan, self.state, self.rot_il, self.t_il, self.step_cfg
            )
            self._epoch_stamps.append(t_abs)
            self.first_scan = False
            return None

        if self._batch_eligible:
            # Dispatch now (chained, async), defer the host fetch.
            if self._pending_n_scans == 0:
                # Rollback target if every scan in this batch is rejected.
                self._batch_prev_cloud = (self.world_cloud, self.world_mask)
            (
                self.state,
                self.map,
                _info,
                (self.world_cloud, self.world_mask),
                summary,
            ) = self._step(
                self.state, self.map, scan, self.rot_il, self.t_il,
                self.step_cfg,
            )
            self._epoch_stamps.append(t_abs)
            self._sum_buf, self._sum_idx = self._append_sum(
                self._sum_buf, self._sum_idx, summary
            )
            if self._retain_clouds:
                self._pending_scans.append(
                    ("scan", t_abs, self.world_cloud, self.world_mask,
                     self._last_vio_img)
                )
            else:
                # scan_batch=0 holds a whole run's queue; retained clouds
                # would pin ~0.8 MB x n_scans of HBM for nothing — no loop
                # backend consumes them.
                self._pending_scans.append(("scan", t_abs, None, None, None))
            self._pending_n_scans += 1
            full = len(self._pending_scans) >= self._sum_cap
            if (
                self.scan_batch > 0 and self._pending_n_scans >= self.scan_batch
            ) or full:
                self.flush_scans()
            elif self._pending_n_scans % 32 == 0:
                # Sync heartbeat (NO fetch): forces the enqueued chain to
                # execute on the fast path now. Work still queued when the
                # terminal fetch arrives drains ~200x slower (tunneled-
                # client pathology, see CLAUDE.md), so an unbounded async
                # queue turns the finish() drain from seconds into minutes.
                jax.block_until_ready(self._sum_idx)
            return None

        prev_cloud, prev_cloud_mask = self.world_cloud, self.world_mask
        extra = None
        if self.gnss is not None:
            # Linearize the GNSS block at the propagated prior (the
            # reference re-linearizes each ESKF iteration; a position-only
            # observation is insensitive to that difference).
            sp, _ = self._propagate(
                self.state, scan.imu, scan.t_end, scan.acc_scale
            )
            extra = self.gnss.observe(
                t_abs, np.asarray(sp.rot), np.asarray(sp.pos)
            )

        (
            self.state,
            self.map,
            info,
            (self.world_cloud, self.world_mask),
            summary,
        ) = self._step(
            self.state,
            self.map,
            scan,
            self.rot_il,
            self.t_il,
            self.step_cfg,
            extra_hth=None if extra is None else extra[0],
            extra_hty=None if extra is None else extra[1],
        )
        self._epoch_stamps.append(t_abs)
        # One device->host fetch for everything the host loop needs.
        s = np.asarray(summary)
        pos, quat = s[0:3], s[3:7]
        n_eff, accepted = int(s[7]), bool(s[9] > 0.5)

        # Health bookkeeping — the gate itself already ran ON-DEVICE (see
        # lio_scan_step): a rejected update returned the propagated state
        # and left the map untouched. Here only counters + the world-cloud
        # rollback (keep the last accepted scan's cloud for VIO/loop).
        if n_eff < self._min_effective:
            self.health["low_constraint"] += 1
        if not accepted:
            self.health["rejected"] += 1
            self.health["resets"] += 1
            self.world_cloud, self.world_mask = prev_cloud, prev_cloud_mask

        if self.loop_backend is not None:
            wc = np.asarray(self.world_cloud)[np.asarray(self.world_mask)]
            self.loop_backend.on_scan(
                np.asarray(self.state.rot), pos, wc, stamp=t_abs,
                img=self._last_vio_img,
            )
        self.trajectory.append((t_abs, pos, quat))
        return info

    def flush_scans(self):
        """Drain the pending (already-dispatched) measurement steps: one
        blocking sync, then the per-measurement host bookkeeping from the
        tiny summary fetches (cheap once results are ready). The device work
        itself was chained asynchronously by process_scan/process_image."""
        if not self._pending_scans:
            return
        pending, self._pending_scans = self._pending_scans, []
        self._pending_n_scans = 0
        jax.block_until_ready(self._sum_idx)  # one sync for the chain
        # ONE device->host transfer for the whole batch, through a jitted
        # copy: on the tunneled TPU the first fetch of a long-donation-
        # chain buffer costs ~55 s while fetching a fresh single-hop copy
        # costs ~9 s (both one-time; per-row reads cost seconds EACH).
        rows = np.asarray(jax.jit(lambda b: b + 0.0)(self._sum_buf))
        self._sum_idx = self._replicate(jnp.zeros((), jnp.int32))
        last_ok = None
        from scipy.spatial.transform import Rotation as _R

        for k, entry in enumerate(pending):
            kind, t_abs = entry[0], entry[1]
            s = rows[k]
            pos, quat = s[0:3], s[3:7]
            if kind == "img":
                self.trajectory.append((t_abs, pos, quat))
                continue
            _, _, cloud, mask, img = entry
            n_eff, accepted = int(s[7]), bool(s[9] > 0.5)
            if n_eff < self._min_effective:
                self.health["low_constraint"] += 1
            if not accepted:
                self.health["rejected"] += 1
                self.health["resets"] += 1
            else:
                last_ok = k
                if self.loop_backend is not None and cloud is not None:
                    wc = np.asarray(cloud)[np.asarray(mask)]
                    # quat is wxyz; scipy expects xyzw
                    rot = _R.from_quat(
                        [quat[1], quat[2], quat[3], quat[0]]
                    ).as_matrix()
                    self.loop_backend.on_scan(
                        rot, pos, wc, stamp=t_abs, img=img
                    )
            self.trajectory.append((t_abs, pos, quat))
        if not self._retain_clouds:
            # Clouds were not kept; self.world_cloud already holds the
            # last dispatched scan's cloud (empty-masked if rejected).
            return
        if last_ok is not None:
            self.world_cloud, self.world_mask = pending[last_ok][2:4]
        elif any(e[0] == "scan" for e in pending):
            self.world_cloud, self.world_mask = self._batch_prev_cloud

    def reanchor_map(self) -> bool:
        """Re-anchor the live voxel arena with loop-corrected keyframe
        poses (beyond the reference, which only corrects the exported
        trajectory — laser_mapping.cpp:1181-1215; ROADMAP item 10).

        Every arena point moves by the rigid correction of the keyframe
        segment it was inserted under (voxel LRU stamps map insert epochs
        to stamps, stamps to nearest keyframes); the arena is rebuilt
        device-side by vm.reanchor. Returns True if a correction was
        applied."""
        if self.loop_backend is None or not self.loop_backend.loops:
            return False
        if not self._epoch_stamps:
            return False
        self.flush_scans()
        g = self.loop_backend.graph
        rots_c, trans_c = self.loop_backend.corrected_trajectory()
        rots_d = np.asarray(g.rots)
        trans_d = np.asarray(g.trans)
        kf_stamps = np.asarray(g.stamps)
        if len(kf_stamps) == 0:
            return False
        # Per-keyframe rigid correction: corrected = R_seg @ drifted + t_seg.
        r_seg = rots_c @ rots_d.transpose(0, 2, 1)
        t_seg = trans_c - np.einsum("kij,kj->ki", r_seg, trans_d)
        # Assign each insert epoch to the nearest keyframe by timestamp.
        ep = np.asarray(self._epoch_stamps)
        hi = np.clip(np.searchsorted(kf_stamps, ep), 0, len(kf_stamps) - 1)
        lo = np.clip(hi - 1, 0, len(kf_stamps) - 1)
        seg = np.where(
            np.abs(ep - kf_stamps[lo]) < np.abs(ep - kf_stamps[hi]), lo, hi
        )
        if self.mesh is not None and self.step_cfg.map_sharded:
            # The correction moves points across voxel (and shard-owner)
            # boundaries: the sharded reanchor all-gathers transformed
            # chunks and re-inserts shard-locally so no point is dropped
            # on an ownership change.
            from fastlivo_tpu import parallel as par_mod

            self.map = par_mod.make_sharded_reanchor(self.mesh, self.step_cfg)(
                self.map,
                self._replicate(jnp.asarray(seg, jnp.int32)),
                self._replicate(jnp.asarray(r_seg, self.dtype)),
                self._replicate(jnp.asarray(t_seg, self.dtype)),
            )
        else:
            self.map = jax.jit(
                vm.reanchor, static_argnames=("cfg", "chunk"), donate_argnums=(0,)
            )(
                self.map,
                self.step_cfg.map_cfg,
                jnp.asarray(seg, jnp.int32),
                jnp.asarray(r_seg, self.dtype),
                jnp.asarray(t_seg, self.dtype),
            )
        # The rebuild re-inserts in chunks, advancing the arena epoch by
        # n_chunks; keep the epoch -> stamp mapping aligned by attributing
        # the re-anchored content to the newest keyframe (it is consistent
        # with the corrected trajectory as of this correction), so a SECOND
        # loop correction attributes segments correctly.
        new_epoch = int(np.asarray(self.map.epoch))
        if new_epoch > len(self._epoch_stamps):
            self._epoch_stamps.extend(
                [float(kf_stamps[-1])] * (new_epoch - len(self._epoch_stamps))
            )
        return True

    def finish(self, out_dir: Optional[str] = None):
        """End-of-run outputs (reference: LaserMapping::Finish,
        laser_mapping.cpp:286-327): TUM trajectory, loop-corrected TUM,
        map PCD. Returns the corrected keyframe trajectory if a loop
        backend ran."""
        self.flush_scans()
        corrected = None
        if self.loop_backend is not None:
            self.loop_backend.finish()
            corrected = self.loop_backend.corrected_trajectory()
        if out_dir is not None:
            import os

            from fastlivo_tpu.io import export
            from fastlivo_tpu.ops import so3 as so3_ops

            os.makedirs(out_dir, exist_ok=True)
            export.write_tum(os.path.join(out_dir, "tum.txt"), self.trajectory)
            if corrected is not None:
                rots, trans = corrected
                stamps = self.loop_backend.graph.stamps
                traj = [
                    (
                        stamps[i] if i < len(stamps) else float(i),
                        trans[i],
                        np.asarray(so3_ops.rot_to_quat(jnp.asarray(rots[i], jnp.float32))),
                    )
                    for i in range(len(trans))
                ]
                export.write_tum(os.path.join(out_dir, "loop_tum.txt"), traj)
            cloud = export.map_to_cloud(self.map)
            export.write_pcd(os.path.join(out_dir, "map.pcd"), cloud)
        return corrected

    def process_image(self, scan: ScanInput, img, t_abs: float):
        """Feed one image-bounded measurement group (VIO update at the image
        timestamp). Returns VioInfo or None before initialization."""
        if not self.initializer.done:
            # Image-bounded groups carry roughly half of each scan's IMU
            # window; without feeding them the static init needs twice the
            # rest time and can run into motion, tilting the gravity
            # estimate (reference feeds every IMU sample to IMU_init
            # regardless of measurement type, IMU_Processing.cpp:381-420).
            ok = self.initializer.push(
                np.asarray(scan.imu.gyr)[np.asarray(scan.imu.mask)],
                np.asarray(scan.imu.acc)[np.asarray(scan.imu.mask)],
            )
            if ok:
                self.state = self._replicate(
                    self.initializer.initial_state(self.dtype)
                )
            return None
        if self.step_cfg.cam is None or self.first_scan:
            self._advance(scan)
            return None
        self._last_vio_img = np.asarray(img, dtype=np.float32)
        img = self._replicate(jnp.asarray(self._last_vio_img, self.dtype))
        self.state, self.visual_map, info, summary = self._vio_step(
            self.state,
            self.visual_map,
            scan,
            img,
            self.world_cloud,
            self.world_mask,
            self.rot_ci,
            self.t_ci,
            self.step_cfg,
        )
        if self.cfg.runtime.img_save_en:
            self._dump_annotated_frame(img)
        if self._batch_eligible:
            # Chained dispatch; defer the trajectory fetch to flush_scans.
            self._sum_buf, self._sum_idx = self._append_sum(
                self._sum_buf, self._sum_idx, summary
            )
            self._pending_scans.append(("img", t_abs))
            if (
                self.scan_batch > 0
                and len(self._pending_scans) >= 8 * self.scan_batch + 8
            ) or len(self._pending_scans) >= self._sum_cap:
                # Backstop for image-heavy streams (flush cadence is
                # normally driven by the scan count).
                self.flush_scans()
            return None
        self._record(t_abs)
        return info

    def _record(self, t_abs: float):
        from fastlivo_tpu.ops import so3

        q = np.asarray(so3.rot_to_quat(self.state.rot))
        self.trajectory.append((t_abs, np.asarray(self.state.pos), q))

    def _dump_annotated_frame(self, img):
        """Keypatch-annotated frame to <out_dir>/img/ (the reference's
        /rgb_img stream, lidar_selection.cpp:982-1002). Debug path: the
        overlay is a separate jitted program and the PNG write fetches to
        host — enable runtime.img_save_en only on CPU/debug runs."""
        from fastlivo_tpu.io import annotate as annotate_mod
        from fastlivo_tpu.models import vio as vio_mod

        if not hasattr(self, "_overlay_fn"):
            self._overlay_fn = jax.jit(
                vio_mod.candidate_overlay,
                static_argnames=("cam", "vm_cfg", "cfg"),
            )
            self._img_frame_idx = 0
        uv, valid, inlier = self._overlay_fn(
            self.state,
            self.visual_map,
            img,
            self.world_cloud,
            self.world_mask,
            self.step_cfg.cam,
            self.rot_ci,
            self.t_ci,
            self.step_cfg.vm_cfg,
            self.step_cfg.vio_cfg,
        )
        annotate_mod.save_annotated(
            self.cfg.runtime.out_dir,
            self._img_frame_idx,
            self._last_vio_img,
            np.asarray(uv),
            np.asarray(valid),
            np.asarray(inlier),
        )
        self._img_frame_idx += 1

    @property
    def acc_scale(self) -> float:
        return self.initializer.acc_scale if self.initializer.done else 1.0
