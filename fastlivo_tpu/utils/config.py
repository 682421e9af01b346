"""Runtime configuration tree.

Replaces the reference's two-tier config (per-dataset YAML -> ROS param server,
reference: src/laser_mapping.cpp:945-1116 `readParameters`, plus compile-time
CMake flags, CMakeLists.txt:12-17) with one runtime dataclass tree. Field names
mirror the reference YAML keys (config/avia_resize.yaml etc.) so reference
configs load directly.

Everything that was a #define in the reference (USE_IMG, USE_ikdtree map
backend, MINI sensor quirks, SAVE_PLY/SAVE_IMG) is a runtime field here.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


@dataclass
class LidarParams:
    """reference: preprocess/* namespace + laser_mapping.cpp:957-975."""

    lidar_type: int = 1  # 1 Avia, 2 Velodyne16, 3 Ouster64, 4 XT32
    scan_line: int = 6
    blind: float = 0.1  # min range (m)
    max_range: float = 100.0
    point_filter_num: int = 2  # keep every Nth point
    feature_extract_en: bool = False
    normal_extract_en: bool = False  # reference NORMAL flag (preprocess.cpp:5)


@dataclass
class ImuParams:
    """reference: IMU init + noise covs (IMU_Processing.cpp:183-195)."""

    cov_gyr: float = 0.01
    cov_acc: float = 0.01
    cov_bias_gyr: float = 1e-4
    cov_bias_acc: float = 1e-4
    init_count: int = 50  # samples for static init (MAX_INI_COUNT)
    zero_velocity_thresh: float = 0.1  # accel std gate for static detection
    imu_int_frame: int = 128  # max IMU samples per measurement window (static shape)
    # Sensor-quirk calibration (the reference's MINI compile flag applies a
    # x200 accel scale + axis remap in imu_cbk, laser_mapping.cpp:870-888;
    # runtime fields here).
    acc_scale_factor: float = 1.0
    axis_remap: Tuple[float, ...] = (1, 0, 0, 0, 1, 0, 0, 0, 1)


@dataclass
class MapParams:
    """Fixed-capacity voxel-hash map (replaces iVox, reference include/ivox3d/)."""

    resolution: float = 0.5  # voxel side (m); iVox default
    capacity: int = 1 << 19  # number of voxel slots (open addressing)
    max_points_per_voxel: int = 32
    nearby_type: int = 18  # 0 | 6 | 18 | 26 neighbor voxels for kNN
    num_match_points: int = 5  # kNN for plane fit (NUM_MATCH_POINTS)
    probe_depth: int = 8  # linear-probe window for the hash
    # Surfel-moment dynamics (see maps/voxel_map.VoxelMapConfig): decay
    # forgets history (robustness to transient pose error); freeze anchors
    # mature surfels to early geometry (counters map-feedback drift). When
    # freeze_n > 0 use decay = 1.0 (decay erodes frozen voxels' counts).
    surfel_decay: float = 0.9
    surfel_freeze_n: float = 0.0
    # Unique-voxel dedup cap for surfel lookups (see
    # maps/voxel_map.VoxelMapConfig.lookup_unique_cap); 0 disables.
    lookup_unique_cap: int = 16384


@dataclass
class LioParams:
    """reference: mapping/* + IESKF loop params (laser_mapping.cpp:171-242)."""

    max_iteration: int = 10
    filter_size_surf: float = 0.15  # scan downsample leaf (m)
    filter_size_map: float = 0.3  # map insert gate leaf (m)
    laser_point_cov: float = 0.00015
    plane_threshold: float = 0.1  # esti_plane residual gate
    residual_limit: float = 2.0  # |pd2| gate in effective-point selection
    converge_rot_deg: float = 0.01
    converge_trans_cm: float = 0.015
    max_points: int = 16384  # static per-scan downsampled point budget
    cube_len: float = 2000.0
    # "point_to_plane" | "vgicp" | "surfel" (see models/lio.py LioConfig)
    measurement_model: str = "point_to_plane"
    # vgicp source-covariance model: "neighborhood" (per-point GICP
    # plane-regularized covs from scan self-kNN, reference
    # caculate_covariance) or "isotropic".
    vgicp_source_cov: float = 0.01
    vgicp_source_mode: str = "neighborhood"
    vgicp_source_k: int = 8
    # surfel measurement-model knobs (models/lio.py LioConfig)
    surfel_min_points: float = 6.0
    surfel_planarity_max: float = 0.01
    surfel_conf_weight: bool = True
    # EKF warm-up: skip filter updates (but keep inserting scans at the
    # propagated pose) for this long after the first scan — the reference's
    # INIT_TIME / flg_EKF_inited gate (laser_mapping.h:58,
    # laser_mapping.cpp:170). Critical for the surfel model, whose voxel
    # moments need a few scans before planes become valid.
    init_time: float = 0.5
    # Update health gate (on-device; see models/lio.py LioConfig): reject a
    # measurement correction larger than this (m). Raise for aggressive
    # platforms where a single update may legitimately correct more.
    max_jump_m: float = 1.0
    # Below this many effective constraints, count the scan as
    # low-constraint in pipeline health diagnostics.
    min_effective: int = 50
    # Queue this many scan-end groups per device dispatch (lax.scan batch).
    # >1 amortizes the host<->device round trip (dominant on remote TPUs)
    # at the cost of batch-latency; only takes effect with VIO and GNSS
    # disabled (they need host-side work between scans). 1 = off.
    scan_batch: int = 1


@dataclass
class VioParams:
    """reference: camera/* + lidar_selection params (lidar_selection.h:20-154)."""

    img_enable: bool = True
    lidar_enable: bool = True
    grid_size: int = 40  # px per grid cell
    patch_size: int = 8
    outlier_threshold: float = 300.0
    ncc_en: bool = False
    ncc_thre: float = 0.0
    img_point_cov: float = 100.0
    pyr_levels: int = 3  # coarse-to-fine: level 2 -> 0
    max_iterations: int = 10
    max_visual_points: int = 40960  # visual map point capacity
    max_obs_per_point: int = 8  # observation slots per map point
    exp_time: float = 0.0
    # Affine brightness compensation I' = a*I + b per frame in the
    # photometric update (the working version of the reference's unused
    # exp_time plumbing); see models/vio.py VioConfig.exposure_en.
    exposure_en: bool = True
    delta_time: float = 0.0  # camera-IMU time offset
    max_grid_points: int = 1024  # residual budget per frame (grid cells)
    depth_continuous_thresh: float = 1.5


@dataclass
class CameraParams:
    """Pinhole model (replaces vikit camera loader, config/camera_*.yaml)."""

    width: int = 640
    height: int = 512
    fx: float = 431.8
    fy: float = 431.7
    cx: float = 319.5
    cy: float = 255.5
    d0: float = 0.0  # radial-tangential distortion (k1, k2, p1, p2, k3)
    d1: float = 0.0
    d2: float = 0.0
    d3: float = 0.0
    d4: float = 0.0
    # camera-LiDAR extrinsics (Pcl = Rcl * Pl + tcl), reference Rcl/Pcl params
    rcl: Tuple[float, ...] = (1, 0, 0, 0, 1, 0, 0, 0, 1)
    pcl: Tuple[float, ...] = (0.0, 0.0, 0.0)


@dataclass
class GnssParams:
    """reference: gnss/* namespace (laser_mapping.cpp:1044-1070)."""

    gnss_en: bool = False
    rtk_file: str = ""
    antenna_lever: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    outlier_gate_m: float = 2.0
    init_window: int = 20


@dataclass
class LoopParams:
    """reference: std/* + lightglue/* (STDesc.cpp:54, laser_mapping.cpp:1071-1095)."""

    loop_en: bool = False
    sub_frame_num: int = 10
    ds_size: float = 0.25
    plane_detection_thre: float = 0.01
    plane_merge_normal_thre: float = 0.1
    voxel_size: float = 2.0
    voxel_init_num: int = 10
    proj_image_resolution: float = 0.5
    proj_dis_min: float = 0.0
    proj_dis_max: float = 2.0
    corner_thre: float = 10.0
    descriptor_near_num: int = 10
    descriptor_min_len: float = 2.0
    descriptor_max_len: float = 50.0
    non_max_suppression_radius: float = 2.0
    std_side_resolution: float = 0.2
    skip_near_num: int = 50
    candidate_num: int = 50
    rough_dis_threshold: float = 0.01
    vertex_diff_threshold: float = 0.5
    icp_threshold: float = 0.5
    normal_threshold: float = 0.2
    dis_threshold: float = 0.5
    visual_verify_en: bool = False  # LightGlue/SuperPoint gate
    match_ratio_thresh: float = 0.2
    # Run STD detection on a worker thread so it stays off the scan
    # critical path (the reference's loop thread, laser_mapping.cpp:1223).
    # Sync mode (False) is for tests/determinism.
    background: bool = True
    # Reject a loop whose STD/ICP pose disagrees with the image-derived
    # essential-matrix rotation by more than this (radians); 0 disables
    # (reference feeds recoverPose into the factor, laser_mapping.cpp:1326).
    pose_check_max_rot: float = 0.35


@dataclass
class KeyframeParams:
    """Pose graph keyframe gating (reference: laser_mapping.cpp:1118-1131)."""

    trans_thresh_m: float = 1.0
    rot_thresh_rad: float = 0.2


@dataclass
class ExtrinsicParams:
    """LiDAR-IMU extrinsics (reference: mapping/extrinsic_T, extrinsic_R)."""

    extrinsic_t: Tuple[float, float, float] = (0.04165, 0.02326, -0.0284)
    extrinsic_r: Tuple[float, ...] = (1, 0, 0, 0, 1, 0, 0, 0, 1)


@dataclass
class RuntimeParams:
    """Observability / output / parallelism knobs."""

    dense_map_en: bool = False
    pcd_save_en: bool = False
    # Per-frame keypatch-annotated image dump to <out_dir>/img/ (the
    # reference's /rgb_img debug stream, lidar_selection.cpp:982-1002).
    # Host-fetch heavy: intended for CPU/debug runs.
    img_save_en: bool = False
    out_dir: str = "Log"
    profile: bool = False
    num_devices: int = 1  # point-sharding mesh size
    dtype: str = "float32"


@dataclass
class ParallelParams:
    """Multi-device SPMD execution (no reference counterpart: the reference
    is a single C++ process whose parallelism is OpenMP over scan points,
    src/laser_mapping.cpp:499-502; here the production pipeline itself runs
    over a jax.sharding.Mesh — see `fastlivo_tpu.parallel`)."""

    # Mesh size. 1 = single device (the default single-chip path).
    n_devices: int = 1
    # False -> map replicated, scan points sharded, innovations psummed
    #          (scales residual compute).
    # True  -> map arena hash-partitioned across devices (map.capacity is
    #          the PER-DEVICE capacity; global capacity grows with the
    #          mesh). Scan replicated after downsample; lookups merge over
    #          the mesh, inserts are shard-local.
    map_sharded: bool = False
    # > 1 builds a 2-D (hosts x chips) mesh: the map shards over the fast
    # inner axis (ICI), queries/innovations over the outer axis (DCN).
    # Requires map_sharded=True. n_devices must be divisible by n_hosts.
    n_hosts: int = 1


@dataclass
class FastLivoConfig:
    preprocess: LidarParams = field(default_factory=LidarParams)
    imu: ImuParams = field(default_factory=ImuParams)
    map: MapParams = field(default_factory=MapParams)
    lio: LioParams = field(default_factory=LioParams)
    vio: VioParams = field(default_factory=VioParams)
    camera: CameraParams = field(default_factory=CameraParams)
    gnss: GnssParams = field(default_factory=GnssParams)
    loop: LoopParams = field(default_factory=LoopParams)
    keyframe: KeyframeParams = field(default_factory=KeyframeParams)
    extrinsics: ExtrinsicParams = field(default_factory=ExtrinsicParams)
    runtime: RuntimeParams = field(default_factory=RuntimeParams)
    parallel: ParallelParams = field(default_factory=ParallelParams)


# Mapping from reference YAML keys (flat / namespaced) to config fields.
_REFERENCE_KEY_MAP = {
    "point_filter_num": ("preprocess", "point_filter_num"),
    "max_iteration": ("lio", "max_iteration"),
    "filter_size_surf": ("lio", "filter_size_surf"),
    "filter_size_map": ("lio", "filter_size_map"),
    "grid_size": ("vio", "grid_size"),
    "patch_size": ("vio", "patch_size"),
    "img_enable": ("vio", "img_enable"),
    "lidar_enable": ("vio", "lidar_enable"),
    "outlier_threshold": ("vio", "outlier_threshold"),
    "ncc_en": ("vio", "ncc_en"),
    "ncc_thre": ("vio", "ncc_thre"),
    "img_point_cov": ("vio", "img_point_cov"),
    "delta_time": ("vio", "delta_time"),
    "cube_side_length": ("lio", "cube_len"),
    "laser_point_cov": ("lio", "laser_point_cov"),
    "dense_map_enable": ("runtime", "dense_map_en"),
    "pcd_save_enable": ("runtime", "pcd_save_en"),
}

_NAMESPACE_MAP = {
    "preprocess": "preprocess",
    "mapping": None,  # handled specially below
    "camera": "camera",
    "gnss": "gnss",
    "std": "loop",
    "lightglue": "loop",
    "pcd_save": "runtime",
    # Not a reference namespace (the reference hardcodes the MINI IMU
    # quirks behind a compile flag, laser_mapping.cpp:870-888); here they
    # are runtime fields.
    "imu": "imu",
}


def _coerce(value: Any, target_type: Any) -> Any:
    if target_type is bool and isinstance(value, (int, float)):
        return bool(value)
    if target_type is float and isinstance(value, (int, float)):
        return float(value)
    if target_type is int and isinstance(value, (int, float)):
        return int(value)
    if isinstance(value, list):
        return tuple(value)
    return value


def _set_field(cfg: Any, name: str, value: Any) -> bool:
    for f in dataclasses.fields(cfg):
        if f.name == name:
            setattr(cfg, name, _coerce(value, f.type if isinstance(f.type, type) else type(getattr(cfg, name))))
            return True
    return False


def apply_reference_yaml(cfg: FastLivoConfig, tree: Dict[str, Any]) -> FastLivoConfig:
    """Overlay a reference-format YAML dict (config/*.yaml keys) onto cfg."""
    for key, value in tree.items():
        if isinstance(value, dict):
            # namespaced: preprocess/, mapping/, camera/, gnss/, std/, ...
            if key == "mapping":
                for k2, v2 in value.items():
                    if k2 == "extrinsic_T":
                        cfg.extrinsics.extrinsic_t = tuple(v2)
                    elif k2 == "extrinsic_R":
                        cfg.extrinsics.extrinsic_r = tuple(v2)
                    else:
                        for sub in (cfg.lio, cfg.map, cfg.imu):
                            if _set_field(sub, k2, v2):
                                break
                continue
            ns = _NAMESPACE_MAP.get(key)
            if ns is None:
                continue
            sub = getattr(cfg, ns)
            for k2, v2 in value.items():
                if key == "camera" and k2 in ("Rcl", "Pcl"):
                    _set_field(sub, k2.lower(), v2)
                else:
                    _set_field(sub, k2.lower() if key == "camera" else k2, v2)
        else:
            dest = _REFERENCE_KEY_MAP.get(key)
            if dest is not None:
                _set_field(getattr(cfg, dest[0]), dest[1], value)
    return cfg


def load_config(path: Optional[str] = None, overrides: Optional[Dict[str, Any]] = None) -> FastLivoConfig:
    """Build a config, optionally overlaying a reference-format YAML file and
    a flat `section.field` override dict."""
    cfg = FastLivoConfig()
    if path is not None:
        import yaml

        with open(path) as f:
            tree = yaml.safe_load(f)
        apply_reference_yaml(cfg, tree)
    if overrides:
        for dotted, value in overrides.items():
            section, name = dotted.split(".", 1)
            _set_field(getattr(cfg, section), name, value)
    return cfg
