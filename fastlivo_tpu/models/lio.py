"""LIO: point-to-plane iterated error-state Kalman update.

Capability parity with the reference's LIO path
(reference: src/laser_mapping.cpp — IESKF loop :171-242, h_share_model
:485-644, map_incremental :329-389), re-designed TPU-first:

- the per-point work (world transform -> kNN -> plane fit -> residual gate
  -> 1x6 Jacobian) is one fused batched computation over the whole scan
  (the reference parallelizes this loop with OpenMP; here it is a single
  vmapped/einsum program whose Gram products run on the MXU);
- the innovation accumulation H^T R^-1 H / H^T R^-1 z is a pair of
  einsums — and is sum-decomposable over points, which is exactly what the
  multi-device sharding in `fastlivo_tpu.parallel` psums;
- the iterate/re-match/converge outer structure
  (laser_mapping.cpp:209-237: re-search kNN on convergence, stop after two
  re-match rounds or max iterations) is a `lax.while_loop` with the kNN
  under a `lax.cond` — zero host round-trips per scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

from functools import partial

import jax
import jax.numpy as jnp

from fastlivo_tpu.maps import voxel_map as vm
from fastlivo_tpu.models import ieskf
from fastlivo_tpu.ops import linalg, plane, so3
from fastlivo_tpu.state import DIM_STATE, NavState, boxminus, boxplus

_R2D = 57.29577951308232


@dataclass(frozen=True)
class LioConfig:
    """Static LIO parameters (hashable; a static jit argument)."""

    max_iteration: int = 10
    num_match_points: int = 5
    laser_point_cov: float = 0.00015
    plane_threshold: float = 0.1
    residual_limit: float = 2.0
    converge_rot_deg: float = 0.01
    converge_trans_cm: float = 0.015
    filter_size_map: float = 0.3
    max_search_dist2: float = 25.0
    # "point_to_plane" (default), "vgicp" (the reference's USE_VGICP
    # compile-flag alternative, laser_mapping.cpp:391-481), or "surfel"
    # (running per-voxel plane moments — no kNN in the hot loop; the
    # Surfel-LIO-style fast path, PAPERS.md).
    measurement_model: str = "point_to_plane"
    vgicp_source_cov: float = 0.01  # source-point cov scale (m^2)
    # "neighborhood": per-point source covariances from scan self-kNN with
    # GICP plane regularization cov = s*(I - (1-eps) n n^T), rotated into
    # the world each iteration — the reference's caculate_covariance
    # capability (laser_mapping.cpp:418-481). "isotropic": s*I (cheaper,
    # ignores scan anisotropy).
    vgicp_source_mode: str = "neighborhood"
    vgicp_source_k: int = 8
    vgicp_source_eps: float = 1e-3
    surfel_min_points: float = 6.0
    surfel_planarity_max: float = 0.01  # plane-thickness variance gate (m^2)
    # Per-surfel confidence weighting (ROADMAP item 0): inflate the
    # measurement variance by the surfel's own uncertainty,
    #   R_i = laser_point_cov + min_eig * (1 + 3/n)
    # (plane-thickness variance + mean-estimate variance), so young or
    # thick surfels are downweighted smoothly instead of trusted at full
    # strength — the fix for surfel+VIO interleaving instability.
    surfel_conf_weight: bool = True
    # Update health gate (stronger than the reference's disabled degeneracy
    # guard, laser_mapping.cpp:196-202): an update whose measurement
    # correction |pos_posterior - pos_propagated| exceeds max_jump_m, or
    # that produced non-finite state, is REJECTED on-device — the filter
    # falls back to the propagated prior and the map insert is skipped so
    # a bad posterior never pollutes the arena.
    max_jump_m: float = 1.0
    min_effective: int = 50  # diagnostics threshold (low-constraint counter)


class LioInfo(NamedTuple):
    """Per-update diagnostics (parity with the reference's printed
    effective-feature count and residual mean)."""

    n_effective: jnp.ndarray  # () int32
    res_mean: jnp.ndarray  # () f32
    iterations: jnp.ndarray  # () int32
    converged: jnp.ndarray  # () bool


def transform_to_world(
    pts_body: jnp.ndarray,
    rot: jnp.ndarray,
    pos: jnp.ndarray,
    rot_il: jnp.ndarray,
    t_il: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LiDAR frame -> (IMU frame, world frame). Mirrors pointBodyToWorld
    (laser_mapping.cpp:662-671)."""
    p_imu = pts_body @ rot_il.T + t_il
    p_w = p_imu @ rot.T + pos
    return p_imu, p_w


def _innovation(
    rot: jnp.ndarray,
    pos: jnp.ndarray,
    pts_body: jnp.ndarray,
    pts_mask: jnp.ndarray,
    neighbors: jnp.ndarray,
    neighbor_valid: jnp.ndarray,
    rot_il: jnp.ndarray,
    t_il: jnp.ndarray,
    cfg: LioConfig,
    axis_name: str | None = None,
):
    """Assemble H^T R^-1 H (6x6) and H^T R^-1 (-r) (6,) over the scan.

    Exact parity with h_share_model (laser_mapping.cpp:485-644):
    plane refit from the cached neighbors every iteration, residual
    pd2 = n.p_w + d, gate s = 1 - 0.9|pd2|/sqrt(|p_body|) > 0.9 and
    |pd2| <= 2, Jacobian row [ ([p_i]x R^T n)^T , n^T ].
    """
    p_imu, p_w = transform_to_world(pts_body, rot, pos, rot_il, t_il)

    normal, d, plane_ok = plane.esti_plane(
        neighbors, neighbor_valid, cfg.plane_threshold
    )

    pd2 = jnp.sum(normal * p_w, axis=-1) + d
    body_norm = jnp.linalg.norm(pts_body, axis=-1)
    s = 1.0 - 0.9 * jnp.abs(pd2) / jnp.sqrt(jnp.maximum(body_norm, 1e-6))
    valid = (
        pts_mask
        & plane_ok
        & (s > 0.9)
        & (jnp.abs(pd2) <= cfg.residual_limit)
    )

    # A = ([p_imu]x R^T n)^T = -n^T R [p_imu]x  (d residual / d theta).
    rn = normal @ rot  # (N, 3) = R^T n per point
    a = jnp.cross(p_imu, rn)  # [p]x (R^T n)
    h = jnp.concatenate([a, normal], axis=-1)  # (N, 6)

    # Hard-zero invalid rows (not just zero weights): any NaN/inf in a masked
    # row would still poison the einsum accumulation.
    h = jnp.where(valid[:, None], h, 0.0)
    pd2_c = jnp.where(valid, pd2, 0.0)
    w = valid.astype(pts_body.dtype) / cfg.laser_point_cov
    hth = jnp.einsum("ni,nj->ij", h * w[:, None], h)
    hty = jnp.einsum("ni,n->i", h, w * (-pd2_c))

    n_eff = jnp.sum(valid.astype(jnp.int32))
    res_sum = jnp.sum(jnp.where(valid, jnp.abs(pd2), 0.0))

    # Multi-device: the innovation is sum-decomposable over points
    # (SURVEY.md section 2 "Distributed communication backend") — one psum
    # over the point-sharding axis makes every device hold the global
    # innovation, after which the 18x18 solve is replicated.
    if axis_name is not None:
        hth = jax.lax.psum(hth, axis_name)
        hty = jax.lax.psum(hty, axis_name)
        n_eff = jax.lax.psum(n_eff, axis_name)
        res_sum = jax.lax.psum(res_sum, axis_name)
    return hth, hty, n_eff, res_sum


def scan_source_covariances(
    pts_body: jnp.ndarray,
    pts_mask: jnp.ndarray,
    cfg: LioConfig,
    ds_leaf: float = 0.5,
) -> jnp.ndarray:
    """Per-point GICP source covariances from scan self-neighborhoods
    (the reference's caculate_covariance over scan 15-NN,
    laser_mapping.cpp:418-440, with the standard plane regularization
    U diag(1,1,eps) U^T = I - (1-eps) n n^T — which needs only the
    smallest eigenvector, so the analytic eigh3 fast path applies).

    Builds a scratch voxel arena over the scan itself and kNNs into it —
    the same machinery as the map, no O(N^2) pass. Returns (N, 3, 3)."""
    dtype = pts_body.dtype
    n = pts_body.shape[0]
    scratch_cfg = vm.VoxelMapConfig(
        resolution=ds_leaf * 4.0,
        capacity=1 << 14,
        max_points=16,
        probe_depth=8,
        nearby_type=6,
    )
    scratch = vm.make_map(scratch_cfg, dtype)
    scratch = vm.insert(scratch, pts_body, pts_mask, scratch_cfg)
    nbr, _, nv = vm.knn(
        scratch, pts_body, scratch_cfg, k=cfg.vgicp_source_k, max_dist2=4.0
    )
    w = nv.astype(dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.sum(nbr * w[..., None], axis=1) / cnt[:, None]
    d = (nbr - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", d, d) / cnt[:, None, None]
    cov = cov + jnp.eye(3, dtype=dtype) * 1e-9
    _, normal = linalg.eigh3_smallest(cov)
    eye = jnp.eye(3, dtype=dtype)
    reg = eye - (1.0 - cfg.vgicp_source_eps) * (
        normal[:, :, None] * normal[:, None, :]
    )
    # Points with too few neighbors fall back to isotropic.
    enough = jnp.sum(nv, axis=1) >= 4
    return jnp.where(
        enough[:, None, None], reg, jnp.broadcast_to(eye, reg.shape)
    ) * cfg.vgicp_source_cov


def _innovation_vgicp(
    rot: jnp.ndarray,
    pos: jnp.ndarray,
    pts_body: jnp.ndarray,
    pts_mask: jnp.ndarray,
    neighbors: jnp.ndarray,
    neighbor_valid: jnp.ndarray,
    rot_il: jnp.ndarray,
    t_il: jnp.ndarray,
    cfg: LioConfig,
    axis_name: str | None = None,
    src_cov: jnp.ndarray | None = None,
):
    """VGICP-style distribution-to-point innovation (capability port of the
    reference's USE_VGICP h_share_model, laser_mapping.cpp:418-481):

      error_i = mean(neighbors_i) - p_w_i
      M_i = (cov(neighbors_i) + R C_src_i R^T)^-1     (Mahalanobis)
      H_i = [R [p_imu]x , -I]  ->  accumulate H^T M H, H^T M error

    src_cov: per-point source covariances in the body frame (from
    scan_source_covariances); None falls back to isotropic
    vgicp_source_cov * I.
    """
    dtype = pts_body.dtype
    p_imu, p_w = transform_to_world(pts_body, rot, pos, rot_il, t_il)

    k = neighbors.shape[1]
    w_nb = neighbor_valid.astype(dtype)
    cnt = jnp.maximum(jnp.sum(w_nb, axis=1), 1.0)
    mean_b = jnp.sum(neighbors * w_nb[..., None], axis=1) / cnt[:, None]
    d = (neighbors - mean_b[:, None, :]) * w_nb[..., None]
    cov_b = jnp.einsum("nki,nkj->nij", d, d) / cnt[:, None, None]
    if src_cov is None:
        rcr = cov_b + jnp.eye(3, dtype=dtype) * cfg.vgicp_source_cov
    else:
        # Rotate the body-frame source covariance into the world at the
        # CURRENT iterate (the reference recomputes R C R^T per iteration).
        rw = rot @ rot_il
        rcr = cov_b + jnp.einsum("ij,njk,lk->nil", rw, src_cov, rw)
        rcr = rcr + jnp.eye(3, dtype=dtype) * 1e-6

    err = mean_b - p_w
    valid = (
        pts_mask
        & jnp.all(neighbor_valid, axis=-1)
        & (jnp.linalg.norm(err, axis=-1) <= cfg.residual_limit)
    )

    # H = d h(x)/dx with h(x) = p_w (so that hty = H^T M (z - h) points the
    # Gauss-Newton step toward the measurement): d p_w/d dtheta =
    # -R [p_imu]x (right perturbation), d p_w/dp = I.
    h_rot = -jnp.einsum("ij,njk->nik", rot, so3.hat(p_imu))
    h = jnp.concatenate(
        [h_rot, jnp.broadcast_to(jnp.eye(3, dtype=dtype), h_rot.shape)], axis=-1
    )  # (N, 3, 6)

    inv = jnp.linalg.inv(rcr)  # batched 3x3 Mahalanobis weights
    w = valid.astype(dtype) * jnp.sqrt(cnt)
    inv = inv * w[:, None, None]

    h = jnp.where(valid[:, None, None], h, 0.0)
    err_c = jnp.where(valid[:, None], err, 0.0)
    mh = jnp.einsum("nij,njk->nik", inv, h)  # (N, 3, 6)
    hth = jnp.einsum("nia,nib->ab", h, mh)
    hty = jnp.einsum("nia,ni->a", mh, err_c)

    n_eff = jnp.sum(valid.astype(jnp.int32))
    res_sum = jnp.sum(jnp.where(valid, jnp.linalg.norm(err, axis=-1), 0.0))
    if axis_name is not None:
        hth = jax.lax.psum(hth, axis_name)
        hty = jax.lax.psum(hty, axis_name)
        n_eff = jax.lax.psum(n_eff, axis_name)
        res_sum = jax.lax.psum(res_sum, axis_name)
    return hth, hty, n_eff, res_sum


def surfel_match(
    rot: jnp.ndarray,
    pos: jnp.ndarray,
    pts_body: jnp.ndarray,
    lidar_map: vm.VoxelHashMap,
    rot_il: jnp.ndarray,
    t_il: jnp.ndarray,
    map_cfg: vm.VoxelMapConfig,
    cfg: LioConfig,
    map_axis: str | None = None,
) -> vm.SurfelResult:
    """Associate each point with a map surfel at the CURRENT pose estimate.

    The resulting plane (normal, d, confidence) is pose-INDEPENDENT — it
    comes from the voxel's running moments only — so the iterated update
    caches it and re-matches on the re-match schedule, exactly like the
    p2pl path's neighbor cache (reference nearest_search_en,
    laser_mapping.cpp:218-231). Re-running the lookup every iteration
    (round <=2 behavior) redid the arena's gather-heavy probe 4x per scan
    for identical planes.
    """
    _, p_w = transform_to_world(pts_body, rot, pos, rot_il, t_il)
    if map_axis is not None:
        return vm.sharded_surfel_lookup(
            lidar_map, p_w, map_cfg, map_axis,
            cfg.surfel_min_points, cfg.surfel_planarity_max,
        )
    return vm.surfel_lookup(
        lidar_map, p_w, map_cfg,
        cfg.surfel_min_points, cfg.surfel_planarity_max,
    )


def _innovation_surfel(
    rot: jnp.ndarray,
    pos: jnp.ndarray,
    pts_body: jnp.ndarray,
    pts_mask: jnp.ndarray,
    surf: vm.SurfelResult,
    rot_il: jnp.ndarray,
    t_il: jnp.ndarray,
    cfg: LioConfig,
    axis_name: str | None = None,
):
    """Point-to-surfel innovation: identical residual/Jacobian structure to
    point-to-plane, but the plane comes from a CACHED surfel match
    (`surfel_match`) — this function is gather-free and runs every ESKF
    iteration."""
    p_imu, p_w = transform_to_world(pts_body, rot, pos, rot_il, t_il)
    normal, d, surf_ok = surf.normal, surf.d, surf.valid

    pd2 = jnp.sum(normal * p_w, axis=-1) + d
    body_norm = jnp.linalg.norm(pts_body, axis=-1)
    s = 1.0 - 0.9 * jnp.abs(pd2) / jnp.sqrt(jnp.maximum(body_norm, 1e-6))
    valid = (
        pts_mask & surf_ok & (s > 0.9) & (jnp.abs(pd2) <= cfg.residual_limit)
    )

    rn = normal @ rot
    a = jnp.cross(p_imu, rn)
    h = jnp.concatenate([a, normal], axis=-1)
    h = jnp.where(valid[:, None], h, 0.0)
    pd2_c = jnp.where(valid, pd2, 0.0)
    if cfg.surfel_conf_weight:
        # R_i = sensor cov + surfel plane-thickness variance + mean-estimate
        # variance: immature/thick surfels contribute weak constraints.
        min_eig = jnp.where(jnp.isfinite(surf.min_eig), surf.min_eig, 0.0)
        r_i = cfg.laser_point_cov + min_eig * (
            1.0 + 3.0 / jnp.maximum(surf.n_pts, 1.0)
        )
    else:
        r_i = jnp.asarray(cfg.laser_point_cov, pts_body.dtype)
    w = valid.astype(pts_body.dtype) / r_i
    hth = jnp.einsum("ni,nj->ij", h * w[:, None], h)
    hty = jnp.einsum("ni,n->i", h, w * (-pd2_c))

    n_eff = jnp.sum(valid.astype(jnp.int32))
    res_sum = jnp.sum(jnp.where(valid, jnp.abs(pd2), 0.0))
    if axis_name is not None:
        hth = jax.lax.psum(hth, axis_name)
        hty = jax.lax.psum(hty, axis_name)
        n_eff = jax.lax.psum(n_eff, axis_name)
        res_sum = jax.lax.psum(res_sum, axis_name)
    return hth, hty, n_eff, res_sum


def _embed18(hth6: jnp.ndarray, hty6: jnp.ndarray, dtype):
    hth = jnp.zeros((DIM_STATE, DIM_STATE), dtype=dtype)
    hth = hth.at[0:6, 0:6].set(hth6)
    hty = jnp.zeros((DIM_STATE,), dtype=dtype)
    hty = hty.at[0:6].set(hty6)
    return hth, hty


def lio_update(
    state_prop: NavState,
    lidar_map: vm.VoxelHashMap,
    pts_body: jnp.ndarray,
    pts_mask: jnp.ndarray,
    rot_il: jnp.ndarray,
    t_il: jnp.ndarray,
    map_cfg: vm.VoxelMapConfig,
    cfg: LioConfig,
    extra_hth: jnp.ndarray | None = None,
    extra_hty: jnp.ndarray | None = None,
    axis_name: str | None = None,
    map_axis: str | None = None,
) -> Tuple[NavState, LioInfo, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One full iterated point-to-plane ESKF update.

    Args:
      state_prop: IMU-propagated prior state (the reference's
        `state_propagat`).
      pts_body: (N, 3) downsampled, undistorted scan in the LiDAR frame.
      extra_hth/extra_hty: optional additional 18x18 / 18 innovation blocks
        (GNSS observation, reference laser_mapping.cpp:616-621).
      axis_name: mesh axis over which pts_body is SHARDED; innovations are
        psummed over it (replicated map, or the "hosts" axis of a 2-D
        hosts x chips mesh).
      map_axis: mesh axis over which lidar_map is SHARDED (hash-partitioned
        voxel ownership); pts_body must then be REPLICATED across this
        axis — lookups run against the local shard and merge over it.
        With BOTH axes set (2-D mesh): each axis_name-group holds its
        query slice (replicated across map_axis within the group), lookups
        merge over map_axis (ICI), and the small innovation psums over
        axis_name (DCN) — the only cross-host traffic.

    Returns (posterior state, diagnostics, (neighbors, neighbor_valid))
    where the neighbor cache is reused by the map-insert gate.
    """
    dtype = pts_body.dtype
    n = pts_body.shape[0]
    k = cfg.num_match_points

    p_inv = linalg.psd_inverse(state_prop.cov)

    surfel_mode = cfg.measurement_model == "surfel"
    src_cov = None
    if (
        cfg.measurement_model == "vgicp"
        and cfg.vgicp_source_mode == "neighborhood"
    ):
        # Per-point anisotropic source covariances, once per scan (the
        # reference recomputes only the R C R^T rotation per iteration).
        src_cov = scan_source_covariances(pts_body, pts_mask, cfg)

    def search(rot, pos):
        if surfel_mode:
            # The "neighbor cache" is the matched surfel plane, packed into
            # the nbr/nbr_valid carry: nbr[:, 0] = normal, nbr[:, 1] =
            # (d, min_eig, n_pts); nbr_valid[:, 0] = plane validity.
            surf = surfel_match(
                rot, pos, pts_body, lidar_map, rot_il, t_il, map_cfg, cfg,
                map_axis,
            )
            eig = jnp.where(jnp.isfinite(surf.min_eig), surf.min_eig, 0.0)
            nbr = jnp.stack(
                [surf.normal, jnp.stack([surf.d, eig, surf.n_pts], axis=-1)],
                axis=1,
            )  # (n, 2, 3)
            return nbr, surf.valid[:, None]
        _, p_w = transform_to_world(pts_body, rot, pos, rot_il, t_il)
        if map_axis is not None:
            nbr, _, nbr_valid = vm.sharded_knn(
                lidar_map, p_w, map_cfg, map_axis, k=k,
                max_dist2=cfg.max_search_dist2,
            )
        else:
            nbr, _, nbr_valid = vm.knn(
                lidar_map, p_w, map_cfg, k=k, max_dist2=cfg.max_search_dist2
            )
        return nbr, nbr_valid & pts_mask[:, None]

    nbr0, nv0 = search(state_prop.rot, state_prop.pos)

    class Carry(NamedTuple):
        rot: jnp.ndarray
        pos: jnp.ndarray
        vel: jnp.ndarray
        bg: jnp.ndarray
        ba: jnp.ndarray
        grav: jnp.ndarray
        nbr: jnp.ndarray
        nbr_valid: jnp.ndarray
        g_mat: jnp.ndarray  # K_1 @ HTH for the final covariance update
        iter_count: jnp.ndarray
        rematch_num: jnp.ndarray
        search_en: jnp.ndarray
        converged: jnp.ndarray
        done: jnp.ndarray
        n_eff: jnp.ndarray
        res_sum: jnp.ndarray

    def cond_fn(c: Carry):
        return ~c.done

    def body_fn(c: Carry):
        nbr, nbr_valid = jax.lax.cond(
            c.search_en,
            lambda: search(c.rot, c.pos),
            lambda: (c.nbr, c.nbr_valid),
        )

        if surfel_mode:
            surf = vm.SurfelResult(
                normal=nbr[:, 0, :],
                d=nbr[:, 1, 0],
                valid=nbr_valid[:, 0],
                min_eig=nbr[:, 1, 1],
                n_pts=nbr[:, 1, 2],
            )
            hth6, hty6, n_eff, res_sum = _innovation_surfel(
                c.rot, c.pos, pts_body, pts_mask, surf, rot_il, t_il,
                cfg, axis_name,
            )
        else:
            if cfg.measurement_model == "vgicp":
                innov = partial(_innovation_vgicp, src_cov=src_cov)
            else:
                innov = _innovation
            hth6, hty6, n_eff, res_sum = innov(
                c.rot, c.pos, pts_body, pts_mask, nbr, nbr_valid, rot_il, t_il,
                cfg, axis_name,
            )
        hth, hty = _embed18(hth6, hty6, dtype)
        if extra_hth is not None:
            hth = hth + extra_hth
            hty = hty + extra_hty

        # MAP iterated update with prior pull (laser_mapping.cpp:188-204):
        #   S = HTH + P^-1,  vec = state_prop (-) state
        #   dx = vec + S^-1 (HTy - HTH vec)      (== K_1 HTy + vec - K_1 HTH vec)
        cur = NavState(c.rot, c.pos, c.vel, c.bg, c.ba, c.grav, state_prop.cov)
        vec = boxminus(state_prop, cur)
        dx, g_mat = ieskf.map_step(p_inv, hth, hty, vec)

        new = boxplus(cur, dx)
        rot_add = jnp.linalg.norm(dx[0:3])
        t_add = jnp.linalg.norm(dx[3:6])
        converged = (rot_add * _R2D < cfg.converge_rot_deg) & (
            t_add * 100.0 < cfg.converge_trans_cm
        )

        # Re-match schedule (laser_mapping.cpp:218-231).
        want_rematch = converged | (
            (c.rematch_num == 0) & (c.iter_count == cfg.max_iteration - 2)
        )
        rematch_num = c.rematch_num + want_rematch.astype(jnp.int32)
        done = (rematch_num >= 2) | (c.iter_count == cfg.max_iteration - 1)

        return Carry(
            rot=new.rot,
            pos=new.pos,
            vel=new.vel,
            bg=new.bg,
            ba=new.ba,
            grav=new.grav,
            nbr=nbr,
            nbr_valid=nbr_valid,
            g_mat=g_mat,
            iter_count=c.iter_count + 1,
            rematch_num=rematch_num,
            search_en=want_rematch,
            converged=converged,
            done=done,
            n_eff=n_eff,
            res_sum=res_sum,
        )

    init = Carry(
        rot=state_prop.rot,
        pos=state_prop.pos,
        vel=state_prop.vel,
        bg=state_prop.bg,
        ba=state_prop.ba,
        grav=state_prop.grav,
        nbr=nbr0,
        nbr_valid=nv0,
        g_mat=jnp.zeros((DIM_STATE, DIM_STATE), dtype=dtype),
        iter_count=jnp.zeros((), jnp.int32),
        rematch_num=jnp.zeros((), jnp.int32),
        search_en=jnp.zeros((), bool),
        converged=jnp.zeros((), bool),
        done=jnp.zeros((), bool),
        n_eff=jnp.zeros((), jnp.int32),
        res_sum=jnp.zeros((), dtype),
    )

    c = jax.lax.while_loop(cond_fn, body_fn, init)

    # Posterior covariance P <- (I - G) P (laser_mapping.cpp:228-231).
    cov = ieskf.posterior_cov(state_prop.cov, c.g_mat)

    posterior = NavState(c.rot, c.pos, c.vel, c.bg, c.ba, c.grav, cov)
    info = LioInfo(
        n_effective=c.n_eff,
        res_mean=c.res_sum / jnp.maximum(c.n_eff.astype(dtype), 1.0),
        iterations=c.iter_count,
        converged=c.converged,
    )
    return posterior, info, (c.nbr, c.nbr_valid)


def map_insert_gate(
    pts_world: jnp.ndarray,
    pts_mask: jnp.ndarray,
    neighbors: jnp.ndarray,
    neighbor_valid: jnp.ndarray,
    filter_size_map: float,
) -> jnp.ndarray:
    """Decide which scan points enter the map.

    Exact parity with map_incremental (laser_mapping.cpp:344-380): a point
    is added if (a) it has no valid neighbors, (b) its nearest neighbor lies
    outside the point's map-voxel (far from center in every axis), or
    (c) none of the K neighbors is closer to the voxel center than the
    point itself.
    """
    center = (
        jnp.floor(pts_world / filter_size_map) + 0.5
    ) * filter_size_map

    has_nbr = neighbor_valid[:, 0]
    d_nn = jnp.abs(neighbors[:, 0, :] - center)
    outside = jnp.all(d_nn > 0.5 * filter_size_map, axis=-1)

    dist_self = jnp.sum((pts_world - center) ** 2, axis=-1)
    dist_nbrs = jnp.sum((neighbors - center[:, None, :]) ** 2, axis=-1)
    nbr_closer = jnp.any(
        neighbor_valid & (dist_nbrs < dist_self[:, None] + 1e-6), axis=-1
    )
    all_valid = jnp.all(neighbor_valid, axis=-1)
    need_add = ~(all_valid & nbr_closer)

    return pts_mask & (~has_nbr | outside | need_add)
