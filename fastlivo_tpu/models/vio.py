"""VIO: direct sparse photometric iterated error-state Kalman update.

Capability parity with the reference's `LidarSelector`
(reference: src/lidar_selection.cpp — candidate selection `addFromSparseMap`
:332, new map points `addSparseMap` :140, the coarse-to-fine iterated EKF
`ComputeJ`/`UpdateState` :964/:748, observation maintenance
`addObservation` :905), re-designed TPU-first as three batched phases:

A. **select** — project the whole visual point table (no voxel-set walk),
   gate by frame border, scan-depth continuity (the depth image doubles as
   the reference's sub_feat_map visibility test), per-40px-cell nearest
   point (scatter-min), closest-view reference observation, affine warp of
   the stored reference patch, and the photometric outlier gate. Output:
   fixed-size candidate arrays (one slot per grid cell).
B. **update** — for pyramid level 2 -> 0, a `lax.while_loop` iterated EKF
   over (candidate x 8x8 pixel) residuals: fused intensity+gradient
   gather, chain-rule 1x6 Jacobians, einsum innovation, MAP step with
   prior pull, error-decrease acceptance with rollback (exact reference
   semantics).
C. **maintain** — Shi-Tomasi-scored new points per empty-ish cell and
   ring-buffered observation appends, all scatters.

Documented deviations from the reference (each improves boundedness or
batching without changing capability):
- visibility gating via the scan depth image instead of the feat_map voxel
  intersection;
- affine warp samples the per-observation stored patch pyramid instead of
  retained full reference images (bounded memory);
- the outlier gate compares at the candidate's search-level stride (the
  reference compares a warped stride-2^s patch against a stride-1 patch);
- observation rings replace furthest-view eviction.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fastlivo_tpu.maps import visual_map as vmap_mod
from fastlivo_tpu.ops import image as img_ops
from fastlivo_tpu.models import ieskf
from fastlivo_tpu.ops import linalg, so3
from fastlivo_tpu.ops import scatter as scatter_ops
from fastlivo_tpu.ops.camera import Pinhole
from fastlivo_tpu.state import DIM_STATE, NavState, boxminus, boxplus

_R2D = 57.29577951308232
# Padding for window-based patch sampling. Windows are sized for the
# WIDEST lattice (stride 4) but each candidate's origin is anchored with
# its OWN stride, so the worst right/bottom overhang past the center is
# win - 1 - min_stride*(half+grad) = (8+2*1-1)*4 + 1 - 1*(4+1) = 32 texels
# (see ops/image.strided_patch_sample's pad rule). Pad below that silently
# clamps stride-1/2 candidates near the border and shifts their patches
# (ADVICE r2: ~48 intensity-unit patch error at level 2 with pad=24).
_SAMPLE_PAD = 32


def _pyramid_padded(img: jnp.ndarray, levels: int):
    """Zero-padded 2x2-average pyramid (the reference's img_pyr_ built by
    vk::halfSample, frame.cpp) for window-based patch sampling."""
    return [
        img_ops.pad_image(p, _SAMPLE_PAD)
        for p in img_ops.build_pyramid(img, levels)
    ]


def stored_patch_pyramid(
    img: jnp.ndarray, px: jnp.ndarray, vm_cfg: vmap_mod.VisualMapConfig
) -> jnp.ndarray:
    """Stored observation patches: the central stored_patch^2 texels of
    each pyramid level at the observation pixel (the reference stores
    stride-2^l patches of the full-res image, lidar_selection.cpp:117-139;
    sampling the averaged pyramid instead is antialiased and lets every
    later read be a contiguous window slice). Returns
    (N, levels, stored_patch, stored_patch)."""
    pyr = _pyramid_padded(img, vm_cfg.levels)
    n = px.shape[0]
    ones = jnp.ones(n, jnp.int32)
    out = []
    for lvl in range(vm_cfg.levels):
        c = px / (1 << lvl)
        out.append(
            img_ops.strided_patch_sample(
                pyr[lvl], c, ones, vm_cfg.stored_patch, _SAMPLE_PAD,
                stride_set=(1,),
            )
        )
    return jnp.stack(out, axis=1).reshape(
        n, vm_cfg.levels, vm_cfg.stored_patch, vm_cfg.stored_patch
    )


@dataclass(frozen=True)
class VioConfig:
    grid_size: int = 40
    patch_size: int = 8
    max_iterations: int = 10
    outlier_threshold: float = 300.0
    img_point_cov: float = 100.0
    depth_continuous_thresh: float = 1.5
    converge_rot_deg: float = 0.001
    converge_trans_cm: float = 0.001
    ncc_en: bool = False
    ncc_thre: float = 0.0
    levels: int = 3  # coarse-to-fine pyramid levels (2 -> 0)
    border_px: int = 40  # (patch_size_half + 1) * 8 as in the reference
    # Affine brightness compensation I' = a*I + b, estimated in closed form
    # over all valid patch pixels each iteration (the DSO-style counterpart
    # of the reference's exp_time plumbing, which its default configs leave
    # unused). Absorbs global exposure/illumination change between the
    # reference patches and the current frame; a is clamped to [0.5, 2].
    exposure_en: bool = True

    def grid_dims(self, cam: Pinhole) -> Tuple[int, int]:
        return (
            (cam.width + self.grid_size - 1) // self.grid_size,
            (cam.height + self.grid_size - 1) // self.grid_size,
        )


class VioInfo(NamedTuple):
    n_selected: jnp.ndarray  # () candidates entering the update
    error_before: jnp.ndarray
    error_after: jnp.ndarray
    n_new_points: jnp.ndarray
    n_new_obs: jnp.ndarray


class Selection(NamedTuple):
    """Phase-A output: one candidate slot per grid cell."""

    valid: jnp.ndarray  # (G,)
    pt_idx: jnp.ndarray  # (G,) index into the visual map table
    pt_pos: jnp.ndarray  # (G, 3)
    ref_patch: jnp.ndarray  # (G, L, 64) per update level
    search_level: jnp.ndarray  # (G,) int32 in [0, 2]
    scale: jnp.ndarray  # (G,) float 2^search_level
    cell_score: jnp.ndarray  # (n_cells,) max map-point score per cell


def camera_pose(state_rot, state_pos, rot_ci, t_ci):
    """World->camera from the IMU state: p_c = Rcw p_w + Pcw
    (reference: updateFrameState, lidar_selection.cpp:896-903)."""
    rcw = rot_ci @ state_rot.T
    pcw = -rcw @ state_pos + t_ci
    return rcw, pcw


def build_depth_image(
    cam: Pinhole,
    rcw: jnp.ndarray,
    pcw: jnp.ndarray,
    pts_world: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Scatter-min depth buffer from the scan cloud (reference builds it
    with last-write, lidar_selection.cpp:367-401; min is strictly better
    for occlusion)."""
    p_c = pts_world @ rcw.T + pcw
    z = p_c[..., 2]
    uv = cam.project(p_c)
    ok = mask & (z > 0) & cam.in_frame(uv, border=1)
    col = jnp.clip(uv[..., 0].astype(jnp.int32), 0, cam.width - 1)
    row = jnp.clip(uv[..., 1].astype(jnp.int32), 0, cam.height - 1)
    flat = jnp.where(ok, row * cam.width + col, cam.width * cam.height)
    # f32 scatter-min is a slow path on TPU; route through the int32
    # encoding (ops/scatter.py). NaN-safe: masked lanes carry +inf.
    depth = scatter_ops.scatter_min_f32(
        cam.height * cam.width, flat, jnp.where(ok, z, jnp.inf)
    )
    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
    return depth.reshape(cam.height, cam.width)


def _pool2d(img: jnp.ndarray, half: int, op, init) -> jnp.ndarray:
    """Separable (2*half+1)^2 window reduction with SAME padding (two 1-D
    reduce_window passes: regular memory traffic, no scattered reads)."""
    k = 2 * half + 1
    out = jax.lax.reduce_window(img, init, op, (1, k), (1, 1), "SAME")
    return jax.lax.reduce_window(out, init, op, (k, 1), (1, 1), "SAME")


def _depth_window_gate(
    depth_img: jnp.ndarray,
    uv: jnp.ndarray,
    z: jnp.ndarray,
    thresh: float,
    half: int = 4,
) -> jnp.ndarray:
    """Visibility gate over the (2*half+1)^2 depth-image window around each
    candidate: at least one scan return there, and none conflicting
    (|z - d| > thresh). Reference checks the same two conditions tap by tap
    (lidar_selection.cpp:476-503); here the window min/max over positive
    depths are dense pooled maps + one gather per candidate — the pooled
    form is exact because "all positive d within [z-t, z+t] and one exists"
    depends only on (min, max, existence). The tap-wise form cost ~4 ms per
    frame on TPU v5e (4096 cands x 81 taps x 2 scattered reads); this is
    ~0.3 ms."""
    h, w = depth_img.shape
    pos = depth_img > 0
    big = jnp.asarray(jnp.finfo(depth_img.dtype).max, depth_img.dtype)
    dmax = _pool2d(jnp.where(pos, depth_img, -big), half, jax.lax.max, -big)
    dmin = _pool2d(jnp.where(pos, depth_img, big), half, jax.lax.min, big)
    cols = jnp.clip(uv[:, 0].astype(jnp.int32), 0, w - 1)
    rows = jnp.clip(uv[:, 1].astype(jnp.int32), 0, h - 1)
    mx = dmax[rows, cols]
    mn = dmin[rows, cols]
    return (mx > 0) & (mx <= z + thresh) & (mn >= z - thresh)


def _cell_argmin(values: jnp.ndarray, cells: jnp.ndarray, n_cells: int):
    """Per-cell argmin via two scatter passes. Returns (winner_idx (C,),
    has_winner (C,)). `cells` must be n_cells for masked-out entries."""
    big = jnp.finfo(values.dtype).max
    cmin = scatter_ops.scatter_min_f32(n_cells + 1, cells, values, fill=big)
    is_min = values <= cmin[cells]
    n = values.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    winner = jnp.full((n_cells + 1,), n, jnp.int32).at[
        jnp.where(is_min, cells, n_cells)
    ].min(idx, mode="drop")
    has = winner[:n_cells] < n
    return jnp.clip(winner[:n_cells], 0, n - 1), has


def select(
    state: NavState,
    vmap: vmap_mod.VisualMap,
    img: jnp.ndarray,
    scan_world: jnp.ndarray,
    scan_mask: jnp.ndarray,
    cam: Pinhole,
    rot_ci: jnp.ndarray,
    t_ci: jnp.ndarray,
    vm_cfg: vmap_mod.VisualMapConfig,
    cfg: VioConfig,
) -> Tuple[Selection, jnp.ndarray]:
    """Phase A. Returns (Selection, depth_img)."""
    dtype = img.dtype
    gw, gh = cfg.grid_dims(cam)
    n_cells = gw * gh
    rcw, pcw = camera_pose(state.rot, state.pos, rot_ci, t_ci)
    cam_pos = -rcw.T @ pcw

    depth_img = build_depth_image(cam, rcw, pcw, scan_world, scan_mask)

    # --- candidate gating over the whole point table.
    p_c = vmap.pos @ rcw.T + pcw
    z = p_c[..., 2]
    uv = cam.project(p_c)
    in_frame = cam.in_frame(uv, border=cfg.border_px)
    cand = vmap.active & (z > 0) & in_frame

    # Visibility: the scan must actually return depth near this point
    # (subsumes the reference's sub_feat_map voxel test) and with no
    # conflicting closer/farther surface in the patch footprint.
    cand = cand & _depth_window_gate(
        depth_img, uv, z, cfg.depth_continuous_thresh
    )

    cells = (
        (uv[..., 0] / cfg.grid_size).astype(jnp.int32) * gh
        + (uv[..., 1] / cfg.grid_size).astype(jnp.int32)
    )
    cells = jnp.clip(cells, 0, n_cells - 1)
    cell_of = jnp.where(cand, cells, n_cells)

    # Per-cell max score over in-frame points (map_value in the reference,
    # used to admit new points in phase C).
    score_src = jnp.where(vmap.active & (z > 0) & in_frame, vmap.score, -1.0)
    cell_score = jnp.full((n_cells + 1,), 0.0, dtype).at[
        jnp.where(vmap.active & (z > 0) & in_frame, cells, n_cells)
    ].max(score_src, mode="drop")[:n_cells]

    dist = jnp.linalg.norm(vmap.pos - cam_pos, axis=-1)
    dist = jnp.where(cand, dist, jnp.finfo(dtype).max)
    winner, has = _cell_argmin(dist, cell_of, n_cells)

    pt_idx = winner  # (G,)
    pt_pos = vmap.pos[pt_idx]
    sel_uv = uv[pt_idx]

    # --- reference observation by viewing angle.
    obs_k, view_ok = vmap_mod.closest_view_obs(vmap, pt_idx, cam_pos)
    valid = has & view_ok

    g = pt_idx.shape[0]
    gi = jnp.arange(g)
    ref_px = vmap.obs_px[pt_idx, obs_k]  # (G, 2)
    ref_rcw = vmap.obs_rcw[pt_idx, obs_k]
    ref_pcw = vmap.obs_pcw[pt_idx, obs_k]
    ref_cam_pos = vmap_mod.obs_cam_pos(ref_rcw, ref_pcw)
    s_st = vm_cfg.stored_patch
    ref_patches = vmap.obs_patch[pt_idx, obs_k].reshape(
        -1, vm_cfg.levels, s_st, s_st
    )  # (G, L, S, S)

    # --- affine warp A_cur_ref (reference: getWarpMatrixAffine,
    # lidar_selection.cpp:224-246).
    half = cfg.patch_size // 2
    depth_ref = jnp.linalg.norm(ref_cam_pos - pt_pos, axis=-1)
    f_ref = cam.unproject(ref_px)
    xyz_ref = f_ref * depth_ref[:, None]
    du_px = ref_px + jnp.asarray([half, 0.0], dtype)
    dv_px = ref_px + jnp.asarray([0.0, half], dtype)
    xyz_du = cam.unproject(du_px)
    xyz_dv = cam.unproject(dv_px)
    xyz_du = xyz_du * (xyz_ref[:, 2:3] / jnp.maximum(xyz_du[:, 2:3], 1e-9))
    xyz_dv = xyz_dv * (xyz_ref[:, 2:3] / jnp.maximum(xyz_dv[:, 2:3], 1e-9))

    r_cr = jnp.einsum("ij,njk->nik", rcw, jnp.swapaxes(ref_rcw, -1, -2))
    t_cr = pcw[None, :] - jnp.einsum("nij,nj->ni", r_cr, ref_pcw)

    def to_cur_px(xyz):
        return cam.project(jnp.einsum("nij,nj->ni", r_cr, xyz) + t_cr)

    px_cur = to_cur_px(xyz_ref)
    a_cur_ref = jnp.stack(
        [(to_cur_px(xyz_du) - px_cur) / half, (to_cur_px(xyz_dv) - px_cur) / half],
        axis=-1,
    )  # (G, 2, 2)

    det = (
        a_cur_ref[:, 0, 0] * a_cur_ref[:, 1, 1]
        - a_cur_ref[:, 0, 1] * a_cur_ref[:, 1, 0]
    )
    # getBestSearchLevel (lidar_selection.cpp:304-318): D>3 -> next level.
    search_level = (
        (det > 3.0).astype(jnp.int32) + (det > 12.0).astype(jnp.int32)
    )
    scale = jnp.exp2(search_level.astype(dtype))
    valid = valid & (jnp.abs(det) > 1e-6)

    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-6, det, 1.0)
    a_ref_cur = (
        jnp.stack(
            [
                jnp.stack([a_cur_ref[:, 1, 1], -a_cur_ref[:, 0, 1]], axis=-1),
                jnp.stack([-a_cur_ref[:, 1, 0], a_cur_ref[:, 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        * inv_det[:, None, None]
    )

    # --- warp the stored reference patch to the current view (reference:
    # warpAffine, lidar_selection.cpp:248-283; here sampling the stored
    # patch pyramid at the search level instead of the retained image).
    grid = img_ops.patch_grid(cfg.patch_size, dtype)  # (64, 2)
    px_patch = grid[None, :, :] * scale[:, None, None]  # cur-frame px units
    ref_off = jnp.einsum("nij,nkj->nki", a_ref_cur, px_patch)  # ref px units
    center = vm_cfg.stored_patch // 2
    lvl_patches = ref_patches[gi, jnp.clip(search_level, 0, vm_cfg.levels - 1)]
    coords = ref_off / scale[:, None, None] + center
    warped = img_ops.sample_patch_grid(lvl_patches, coords)  # (G, 64)

    # Unwarped refs for update levels 1..L-1: central 8x8 texels.
    r8 = jnp.arange(cfg.patch_size) - half + center
    refs = [warped]
    for lvl in range(1, cfg.levels):
        refs.append(
            ref_patches[:, lvl][:, r8[:, None], r8[None, :]].reshape(g, -1)
        )
    ref_patch = jnp.stack(refs, axis=1)  # (G, L, 64)

    # --- photometric outlier gate at the search-level stride
    # (window-sampled; numerically identical to the old scattered
    # extract_patches on interior points).
    img_pad = img_ops.pad_image(img, _SAMPLE_PAD)
    cur_patch = img_ops.strided_patch_sample(
        img_pad, sel_uv, jnp.round(scale).astype(jnp.int32),
        cfg.patch_size, _SAMPLE_PAD,
    )
    if cfg.exposure_en:
        # Same global affine brightness fit as the update phase, so a
        # uniformly brighter/darker frame doesn't reject every candidate.
        wsel = valid.astype(img.dtype)[:, None] * jnp.ones_like(cur_patch)
        n_w = jnp.maximum(jnp.sum(wsel), 1.0)
        mv = jnp.sum(cur_patch * wsel) / n_w
        mr = jnp.sum(warped * wsel) / n_w
        cov_vr = jnp.sum((cur_patch - mv) * (warped - mr) * wsel) / n_w
        var_v = jnp.sum((cur_patch - mv) ** 2 * wsel) / n_w
        a_exp = jnp.clip(cov_vr / jnp.maximum(var_v, 1e-6), 0.5, 2.0)
        cur_patch = a_exp * cur_patch + (mr - a_exp * mv)
    err = jnp.sum((warped - cur_patch) ** 2, axis=-1)
    valid = valid & (err <= cfg.outlier_threshold * cfg.patch_size**2)
    if cfg.ncc_en:
        wm = warped - warped.mean(axis=-1, keepdims=True)
        cm = cur_patch - cur_patch.mean(axis=-1, keepdims=True)
        ncc = jnp.sum(wm * cm, axis=-1) / jnp.sqrt(
            jnp.sum(wm * wm, -1) * jnp.sum(cm * cm, -1) + 1e-10
        )
        valid = valid & (ncc >= cfg.ncc_thre)

    sel = Selection(
        valid=valid,
        pt_idx=pt_idx,
        pt_pos=pt_pos,
        ref_patch=jnp.where(valid[:, None, None], ref_patch, 0.0),
        search_level=search_level,
        scale=scale,
        cell_score=cell_score,
    )
    return sel, depth_img


def photometric_update(
    state_prop: NavState,
    sel: Selection,
    img: jnp.ndarray,
    cam: Pinhole,
    rot_ci: jnp.ndarray,
    t_ci: jnp.ndarray,
    cfg: VioConfig,
) -> Tuple[NavState, jnp.ndarray, jnp.ndarray]:
    """Phase B: coarse-to-fine iterated EKF (reference ComputeJ/UpdateState).

    Returns (posterior state, error_before, error_after)."""
    dtype = img.dtype
    p_inv = linalg.psd_inverse(state_prop.cov / cfg.img_point_cov)
    psz2 = cfg.patch_size**2
    # Pyramid built once per frame; each level's residuals sample the
    # averaged level image at the candidate's search stride via contiguous
    # window slices (the scattered full-res strided gathers this replaces
    # measured ~3.5 ms per filter iteration on TPU v5e; windows ~0.1 ms).
    pyr = _pyramid_padded(img, cfg.levels)
    strides_i = jnp.round(sel.scale).astype(jnp.int32)

    def residuals_and_h(rot, pos, level):
        rcw, pcw = camera_pose(rot, pos, rot_ci, t_ci)
        p_i = (sel.pt_pos - pos) @ rot  # IMU-frame point (N, 3)
        p_c = sel.pt_pos @ rcw.T + pcw
        z_ok = p_c[..., 2] > 1e-3
        uv = cam.project(p_c)
        in_ok = cam.in_frame(uv, border=cfg.border_px // 2)
        valid = sel.valid & z_ok & in_ok

        val, du, dv = img_ops.strided_patch_sample(
            pyr[level], uv / (1 << level), strides_i, cfg.patch_size,
            _SAMPLE_PAD, grad_units=sel.scale * (2.0**level),
        )
        ref = sel.ref_patch[:, level, :]
        if cfg.exposure_en:
            # Closed-form affine brightness fit min_{a,b} sum w(a*val+b-ref)^2
            # over valid pixels; residual and image gradients scale by a.
            w = valid.astype(dtype)[:, None] * jnp.ones_like(val)
            n_w = jnp.maximum(jnp.sum(w), 1.0)
            mv = jnp.sum(val * w) / n_w
            mr = jnp.sum(ref * w) / n_w
            cov_vr = jnp.sum((val - mv) * (ref - mr) * w) / n_w
            var_v = jnp.sum((val - mv) ** 2 * w) / n_w
            a_exp = jnp.clip(cov_vr / jnp.maximum(var_v, 1e-6), 0.5, 2.0)
            b_exp = mr - a_exp * mv
            val = a_exp * val + b_exp
            du = a_exp * du
            dv = a_exp * dv
        res = val - ref  # (N, 64)

        jdpi = cam.dpi(p_c)  # (N, 2, 3)
        # d p_c / d theta = Rci [p_i]x ; d p_c / d pos = -Rci R^T
        dpc_dth = jnp.einsum("ij,njk->nik", rot_ci, so3.hat(p_i))
        dpc_dp = -(rot_ci @ rot.T)
        jimg = jnp.stack([du, dv], axis=-1)  # (N, 64, 2)
        juv = jnp.einsum("nkx,nxb->nkb", jimg, jdpi)  # (N, 64, 3)
        jth = jnp.einsum("nkb,nbc->nkc", juv, dpc_dth)
        jp = jnp.einsum("nkb,bc->nkc", juv, dpc_dp)
        h = jnp.concatenate([jth, jp], axis=-1)  # (N, 64, 6)

        h = jnp.where(valid[:, None, None], h, 0.0)
        res = jnp.where(valid[:, None], res, 0.0)
        n_meas = jnp.sum(valid.astype(jnp.int32)) * psz2
        err = jnp.sum(res * res) / jnp.maximum(n_meas.astype(dtype), 1.0)
        return h.reshape(-1, 6), res.reshape(-1), err

    class Carry(NamedTuple):
        rot: jnp.ndarray
        pos: jnp.ndarray
        vel: jnp.ndarray
        bg: jnp.ndarray
        ba: jnp.ndarray
        grav: jnp.ndarray
        best: tuple  # rollback snapshot (rot, pos, vel, bg, ba, grav)
        g_mat: jnp.ndarray
        last_error: jnp.ndarray
        it: jnp.ndarray
        done: jnp.ndarray

    def run_level(state_in, g_mat_in, level):
        nav0 = (state_in.rot, state_in.pos, state_in.vel, state_in.bg,
                state_in.ba, state_in.grav)

        def body(c: Carry):
            h, res, err = residuals_and_h(c.rot, c.pos, level)
            improved = err <= c.last_error

            hth6 = h.T @ h
            hty6 = -(h.T @ res)
            hth = jnp.zeros((DIM_STATE, DIM_STATE), dtype).at[0:6, 0:6].set(hth6)
            hty = jnp.zeros((DIM_STATE,), dtype).at[0:6].set(hty6)
            cur = NavState(c.rot, c.pos, c.vel, c.bg, c.ba, c.grav, state_prop.cov)
            vec = boxminus(state_prop, cur)
            dx, g_new = ieskf.map_step(p_inv, hth, hty, vec)
            new = boxplus(cur, dx)

            converged = (jnp.linalg.norm(dx[0:3]) * _R2D < cfg.converge_rot_deg) & (
                jnp.linalg.norm(dx[3:6]) * 100.0 < cfg.converge_trans_cm
            )

            # Accept: step from cur; snapshot cur as rollback point.
            # Reject: restore snapshot and stop (reference :858-884).
            def pick(a, b):
                return jax.tree.map(
                    lambda x, y: jnp.where(improved, x, y), a, b
                )

            nav_new = pick(
                (new.rot, new.pos, new.vel, new.bg, new.ba, new.grav), c.best
            )
            best_new = pick((c.rot, c.pos, c.vel, c.bg, c.ba, c.grav), c.best)
            g_out = jnp.where(improved, g_new, c.g_mat)
            return Carry(
                rot=nav_new[0], pos=nav_new[1], vel=nav_new[2],
                bg=nav_new[3], ba=nav_new[4], grav=nav_new[5],
                best=best_new,
                g_mat=g_out,
                last_error=jnp.where(improved, err, c.last_error),
                it=c.it + 1,
                done=(~improved) | converged | (c.it + 1 >= cfg.max_iterations),
            )

        init = Carry(
            rot=nav0[0], pos=nav0[1], vel=nav0[2], bg=nav0[3], ba=nav0[4],
            grav=nav0[5], best=nav0, g_mat=g_mat_in,
            last_error=jnp.asarray(jnp.inf, dtype),
            it=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool),
        )
        c = jax.lax.while_loop(lambda c: ~c.done, body, init)
        return (
            NavState(c.rot, c.pos, c.vel, c.bg, c.ba, c.grav, state_prop.cov),
            c.g_mat,
            c.last_error,
        )

    state = state_prop
    g_mat = jnp.zeros((DIM_STATE, DIM_STATE), dtype)
    err_first = None
    err_last = jnp.asarray(0.0, dtype)
    for level in range(cfg.levels - 1, -1, -1):
        state, g_mat, err_last = run_level(state, g_mat, level)
        if err_first is None:
            err_first = err_last

    # Covariance shrink when the update improved the fit (reference
    # ComputeJ: state->cov -= G * state->cov).
    improved = err_last <= err_first
    cov = jnp.where(
        improved,
        state_prop.cov - g_mat @ state_prop.cov,
        state_prop.cov,
    )
    cov = 0.5 * (cov + cov.T)
    return state._replace(cov=cov), err_first, err_last


def candidate_overlay(
    state: NavState,
    vmap: vmap_mod.VisualMap,
    img: jnp.ndarray,
    scan_world: jnp.ndarray,
    scan_mask: jnp.ndarray,
    cam: Pinhole,
    rot_ci: jnp.ndarray,
    t_ci: jnp.ndarray,
    vm_cfg: vmap_mod.VisualMapConfig,
    cfg: VioConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Debug overlay data for the annotated image stream (the reference's
    display_keypatch + /rgb_img publisher, lidar_selection.cpp:982-1002):
    re-runs candidate selection at the POSTERIOR pose and classifies each
    tracked candidate by its level-0 photometric error against the stored
    reference patch (the same gate the update uses).

    Returns (uv (G, 2) pixel coords, valid (G,), inlier (G,)). Runs only
    when runtime.img_save_en is on — this is a separate jitted program, so
    the hot path pays nothing when disabled.
    """
    sel, _ = select(
        state, vmap, img, scan_world, scan_mask, cam, rot_ci, t_ci, vm_cfg, cfg
    )
    rcw, pcw = camera_pose(state.rot, state.pos, rot_ci, t_ci)
    p_c = sel.pt_pos @ rcw.T + pcw
    uv = cam.project(p_c)
    valid = (
        sel.valid
        & (p_c[..., 2] > 1e-3)
        & cam.in_frame(uv, border=cfg.border_px // 2)
    )
    strides_i = jnp.round(sel.scale).astype(jnp.int32)
    img_pad = img_ops.pad_image(img, _SAMPLE_PAD)
    val = img_ops.strided_patch_sample(
        img_pad, uv, strides_i, cfg.patch_size, _SAMPLE_PAD
    )
    res = val - sel.ref_patch[:, 0, :]
    err = jnp.sum(res * res, axis=-1)
    inlier = valid & (err <= cfg.outlier_threshold * cfg.patch_size**2)
    return uv, valid, inlier


def maintain(
    state: NavState,
    vmap: vmap_mod.VisualMap,
    sel: Selection,
    img: jnp.ndarray,
    scan_world: jnp.ndarray,
    scan_mask: jnp.ndarray,
    cam: Pinhole,
    rot_ci: jnp.ndarray,
    t_ci: jnp.ndarray,
    vm_cfg: vmap_mod.VisualMapConfig,
    cfg: VioConfig,
) -> Tuple[vmap_mod.VisualMap, jnp.ndarray, jnp.ndarray]:
    """Phase C: new map points (addSparseMap) + observation appends
    (addObservation), at the posterior pose. Returns (vmap, n_new, n_obs)."""
    dtype = img.dtype
    gw, gh = cfg.grid_dims(cam)
    n_cells = gw * gh
    rcw, pcw = camera_pose(state.rot, state.pos, rot_ci, t_ci)

    # --- new points: best Shi-Tomasi scan point per cell, beating the
    # existing map points' best score in that cell.
    p_c = scan_world @ rcw.T + pcw
    z = p_c[..., 2]
    uv = cam.project(p_c)
    ok = scan_mask & (z > 0) & cam.in_frame(uv, border=cfg.border_px)
    # Dense score map + image-space cell reduction. Scoring the full scan
    # with per-point gathers measured 0.7 s/frame on TPU (65k x box^2 x 8
    # random reads); per-point score gathers + scatter-argmin into cells
    # still cost ~2.3 ms/frame. Since the score is a pixel property, the
    # per-cell winner is found densely instead: one scatter of the point
    # indices into the pixel grid, then regular blocked max/argmin passes
    # over the score image (a point's score == its pixel's score, so the
    # best-scoring hit pixel of a cell is the best-scoring point).
    score_map = img_ops.shi_tomasi_dense(img)
    h_img, w_img = img.shape
    ui = jnp.clip(jnp.floor(uv[:, 0]).astype(jnp.int32), 0, w_img - 1)
    vi = jnp.clip(jnp.floor(uv[:, 1]).astype(jnp.int32), 0, h_img - 1)
    n_pts = scan_world.shape[0]
    flat_px = jnp.where(ok, vi * w_img + ui, h_img * w_img)
    pt_at_px = (
        jnp.full((h_img * w_img,), n_pts, jnp.int32)
        .at[flat_px]
        .min(jnp.arange(n_pts, dtype=jnp.int32), mode="drop")
    )
    hit = pt_at_px < n_pts
    score_hit = jnp.where(hit, score_map.reshape(-1), -1.0)
    # Pad to whole cells; cell c = (u // g) * gh + (v // g).
    g = cfg.grid_size
    ph, pw = gh * g - h_img, gw * g - w_img
    blocks = lambda a, fill: jnp.pad(
        a.reshape(h_img, w_img), ((0, ph), (0, pw)), constant_values=fill
    ).reshape(gh, g, gw, g)
    sb = blocks(score_hit, -1.0)  # (gh, g, gw, g)
    cell_max = sb.max(axis=(1, 3))  # (gh, gw)
    at_max = sb >= cell_max[:, None, :, None]  # non-hit lanes are -1 < max
    big_i = jnp.int32(h_img * w_img)
    pb = blocks(
        jnp.arange(h_img * w_img, dtype=jnp.int32), h_img * w_img
    )  # pixel ids stay int32: an f32 encoding rounds above 2^24 px
    win_px = jnp.where(at_max, pb, big_i).min(
        axis=(1, 3)
    )  # (gh, gw) first pixel achieving the cell max
    has2d = cell_max > 0.0
    winner2d = pt_at_px[jnp.clip(win_px, 0, h_img * w_img - 1)]
    winner2d = jnp.clip(winner2d, 0, n_pts - 1)
    # cell order is column-block-major: transpose (gh, gw) -> (gw, gh).
    winner = winner2d.T.reshape(-1)
    w_score = cell_max.T.reshape(-1)
    has = has2d.T.reshape(-1)
    new_ok = has & (w_score > sel.cell_score) & (w_score > 0.0)

    new_px = uv[winner]
    patches = stored_patch_pyramid(img, new_px, vm_cfg)

    vmap = vmap_mod.add_points(
        vmap, vm_cfg, scan_world[winner], w_score, patches, new_px, rcw, pcw, new_ok
    )

    # --- observation appends for the tracked candidates.
    sel_pc = sel.pt_pos @ rcw.T + pcw
    sel_uv = cam.project(sel_pc)
    obs_ok = sel.valid & (sel_pc[..., 2] > 0) & cam.in_frame(sel_uv, cfg.border_px)

    last_k = (vmap.obs_cursor[sel.pt_idx] - 1) % vm_cfg.max_obs
    last_px = vmap.obs_px[sel.pt_idx, last_k]
    last_rcw = vmap.obs_rcw[sel.pt_idx, last_k]
    last_pcw = vmap.obs_pcw[sel.pt_idx, last_k]
    last_cam = vmap_mod.obs_cam_pos(last_rcw, last_pcw)
    cam_pos = -rcw.T @ pcw
    delta_p = jnp.linalg.norm(cam_pos - last_cam, axis=-1)
    px_dist = jnp.linalg.norm(sel_uv - last_px, axis=-1)
    # reference: delta_p > 0.5 || delta_theta > 10 (rad; never fires) ||
    # pixel_dist > 40 (lidar_selection.cpp:917-927).
    add_flag = obs_ok & ((delta_p > 0.5) | (px_dist > 40.0))

    su = jnp.clip(jnp.floor(sel_uv[:, 0]).astype(jnp.int32), 0, w_img - 1)
    sv = jnp.clip(jnp.floor(sel_uv[:, 1]).astype(jnp.int32), 0, h_img - 1)
    sel_score = score_map[sv, su]
    sel_patches = stored_patch_pyramid(img, sel_uv, vm_cfg)

    vmap = vmap_mod.add_observations(
        vmap, vm_cfg, sel.pt_idx, sel_score, sel_patches, sel_uv, rcw, pcw, add_flag
    )
    return vmap, jnp.sum(new_ok.astype(jnp.int32)), jnp.sum(add_flag.astype(jnp.int32))


def vio_update(
    state_prop: NavState,
    vmap: vmap_mod.VisualMap,
    img: jnp.ndarray,
    scan_world: jnp.ndarray,
    scan_mask: jnp.ndarray,
    cam: Pinhole,
    rot_ci: jnp.ndarray,
    t_ci: jnp.ndarray,
    vm_cfg: vmap_mod.VisualMapConfig,
    cfg: VioConfig,
) -> Tuple[NavState, vmap_mod.VisualMap, VioInfo]:
    """Full per-frame VIO (reference: LidarSelector::detect,
    lidar_selection.cpp:1024-1123): select -> update -> maintain."""
    sel, _ = select(
        state_prop, vmap, img, scan_world, scan_mask, cam, rot_ci, t_ci, vm_cfg, cfg
    )
    posterior, err0, err1 = photometric_update(
        state_prop, sel, img, cam, rot_ci, t_ci, cfg
    )
    vmap, n_new, n_obs = maintain(
        posterior, vmap, sel, img, scan_world, scan_mask, cam, rot_ci, t_ci,
        vm_cfg, cfg,
    )
    info = VioInfo(
        n_selected=jnp.sum(sel.valid.astype(jnp.int32)),
        error_before=err0,
        error_after=err1,
        n_new_points=n_new,
        n_new_obs=n_obs,
    )
    return posterior, vmap, info
