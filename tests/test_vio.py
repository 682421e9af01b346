"""VIO: image-op references, autodiff Jacobian verification, and full
photometric pose recovery on rendered synthetic views."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from fastlivo_tpu.maps import visual_map as vmap_mod
from fastlivo_tpu.models import vio
from fastlivo_tpu.ops import image as img_ops
from fastlivo_tpu.ops import so3
from fastlivo_tpu.ops.camera import Pinhole
from fastlivo_tpu.io import render
from fastlivo_tpu.state import NavState

CAM = Pinhole(width=320, height=256, fx=200.0, fy=200.0, cx=160.0, cy=128.0)
VM_CFG = vmap_mod.VisualMapConfig(capacity=2048, max_obs=4)
VIO_CFG = vio.VioConfig()  # default outlier_threshold=300 rejects bad warps

I3 = jnp.eye(3, dtype=jnp.float32)
Z3 = jnp.zeros(3, jnp.float32)

jrender = jax.jit(render.render_room, static_argnames="cam")


def pose_to_rcw_pcw(rot_wc_imu, pos):
    """State (R_wi, p) with identity camera-IMU extrinsics."""
    rcw = rot_wc_imu.T
    pcw = -rcw @ pos
    return rcw, pcw


# ---------- image ops ----------


def test_bilinear_matches_scipy(rng):
    from scipy.ndimage import map_coordinates

    img = rng.uniform(0, 255, (64, 80)).astype(np.float32)
    uv = np.stack(
        [rng.uniform(1, 78, 200), rng.uniform(1, 62, 200)], axis=-1
    ).astype(np.float32)
    ours = np.asarray(jax.jit(img_ops.bilinear)(jnp.asarray(img), jnp.asarray(uv)))
    ref = map_coordinates(img, [uv[:, 1], uv[:, 0]], order=1)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_extract_patches_center_value(rng):
    img = jnp.asarray(rng.uniform(0, 255, (64, 64)).astype(np.float32))
    centers = jnp.asarray([[32.0, 32.0]])
    patch = img_ops.extract_patches(img, centers, 8, 1)
    # center texel (offset 0,0) is element at grid position (4, 4)
    assert abs(float(patch[0, 4 * 8 + 4]) - float(img[32, 32])) < 1e-3


def test_sample_patch_grid_identity(rng):
    patches = jnp.asarray(rng.uniform(0, 255, (3, 12, 12)).astype(np.float32))
    yy, xx = np.meshgrid(np.arange(12, dtype=np.float32), np.arange(12, dtype=np.float32), indexing="ij")
    coords = jnp.asarray(np.stack([xx.reshape(-1), yy.reshape(-1)], -1)[None].repeat(3, 0))
    out = img_ops.sample_patch_grid(patches, coords)
    np.testing.assert_allclose(
        np.asarray(out).reshape(3, 12, 12), np.asarray(patches), atol=1e-4
    )


def test_shi_tomasi_prefers_texture():
    # flat region vs corner-rich region
    img = np.zeros((64, 64), np.float32)
    img[30:, 30:] = 200.0  # a corner at (30, 30)
    scores = img_ops.shi_tomasi(
        jnp.asarray(img), jnp.asarray([[10.0, 10.0], [30.0, 30.0]])
    )
    assert float(scores[1]) > float(scores[0]) + 10.0


# ---------- Jacobian vs autodiff ----------


def test_projection_jacobian_matches_autodiff(rng):
    """The geometric chain (Jdpi . dp_c/dstate) must match autodiff of the
    projected pixel wrt the state perturbation exactly. (The image-gradient
    factor is excluded: central differences and autodiff's piecewise-linear
    bilinear derivative legitimately differ on textured images.)"""
    # Camera +z along world +y (looking at the far floor/wall), slightly
    # perturbed so no axis is exactly aligned.
    base = Rotation.from_euler("x", -90, degrees=True)
    rot0 = jnp.asarray(
        (base * Rotation.from_rotvec([0.05, -0.1, 0.08])).as_matrix().astype(np.float32)
    )
    pos0 = jnp.asarray([0.3, -0.2, 0.4], jnp.float32)
    rcw0, pcw0 = pose_to_rcw_pcw(rot0, pos0)
    img = jrender(CAM, rcw0, pcw0)

    pts_w = jnp.asarray(rng.uniform(-1, 1, (8, 3)).astype(np.float32))
    pts_w = pts_w.at[:, 2].set(-1.5)  # on the floor plane
    pts_w = pts_w.at[:, 1].multiply(0.5)
    pts_w = pts_w.at[:, 1].add(4.0)
    # keep only points projecting inside the frame
    rot_ci = I3
    t_ci = Z3

    def project(dx6):
        rot = rot0 @ so3.exp(dx6[0:3])
        pos = pos0 + dx6[3:6]
        rcw, pcw = vio.camera_pose(rot, pos, rot_ci, t_ci)
        p_c = pts_w @ rcw.T + pcw
        return CAM.project(p_c)  # (N, 2)

    j_auto = jax.jacobian(project)(jnp.zeros(6, jnp.float32))  # (N, 2, 6)

    # hand chain at dx = 0
    rcw, pcw = vio.camera_pose(rot0, pos0, rot_ci, t_ci)
    p_c = pts_w @ rcw.T + pcw
    uv = CAM.project(p_c)
    jdpi = CAM.dpi(p_c)  # (N, 2, 3)
    p_i = (pts_w - pos0) @ rot0
    dpc_dth = jnp.einsum("ij,njk->nik", rot_ci, so3.hat(p_i))
    dpc_dp = -(rot_ci @ rot0.T)
    jth = jnp.einsum("nxb,nbc->nxc", jdpi, dpc_dth)
    jp = jnp.einsum("nxb,bc->nxc", jdpi, dpc_dp)
    j_hand = jnp.concatenate([jth, jp], axis=-1)  # (N, 2, 6)

    keep = np.asarray(CAM.in_frame(uv, border=4))
    assert keep.sum() >= 3
    np.testing.assert_allclose(
        np.asarray(j_hand)[keep], np.asarray(j_auto)[keep], rtol=1e-3, atol=1e-2
    )


# ---------- full VIO ----------


def make_vmap_from_frame(rcw, pcw, rng, n=400):
    """Populate a visual map by 'observing' floor/wall points in a frame."""
    img = jrender(CAM, rcw, pcw)
    pts = []
    # floor points in front of the camera
    # Half floor (grazing incidence), half far wall (fronto-parallel).
    nf = n // 2
    g = rng.uniform(-4, 4, (nf, 2))
    floor = np.stack([g[:, 0], g[:, 1] + 4.0, np.full(nf, -1.5)], 1)
    gw_ = rng.uniform(-4, 4, (n - nf, 2))
    wall = np.stack([gw_[:, 0], np.full(n - nf, 10.0), gw_[:, 1] + 1.0], 1)
    pts = np.concatenate([floor, wall]).astype(np.float32)
    pts_j = jnp.asarray(pts)
    p_c = pts_j @ rcw.T + pcw
    uv = CAM.project(p_c)
    ok = (p_c[:, 2] > 0.5) & CAM.in_frame(uv, border=48)
    score = img_ops.shi_tomasi(img, uv)
    patches = vio.stored_patch_pyramid(img, uv, VM_CFG)
    m = vmap_mod.make_visual_map(VM_CFG)
    m = vmap_mod.add_points(m, VM_CFG, pts_j, score, patches, uv, rcw, pcw, ok)
    return m, img


def test_vio_recovers_pose(rng):
    # Frame 1 (reference observations) at identity-ish pose.
    rot1 = jnp.asarray(
        Rotation.from_euler("x", -90, degrees=True).as_matrix().astype(np.float32)
    )  # camera looking along +y, z up-ish: rows->world
    pos1 = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    rcw1, pcw1 = pose_to_rcw_pcw(rot1, pos1)
    vmap, _ = make_vmap_from_frame(rcw1, pcw1, rng)
    assert int(vmap_mod.num_active(vmap)) > 100

    # Frame 2: true pose moved; prior slightly off.
    rot2 = rot1 @ jnp.asarray(
        Rotation.from_rotvec([0.0, 0.02, 0.03]).as_matrix().astype(np.float32)
    )
    pos2 = pos1 + jnp.asarray([0.1, 0.05, 0.02], jnp.float32)
    rcw2, pcw2 = pose_to_rcw_pcw(rot2, pos2)
    img2 = jrender(CAM, rcw2, pcw2)

    rot_p = rot2 @ jnp.asarray(
        Rotation.from_rotvec([0.004, -0.006, 0.005]).as_matrix().astype(np.float32)
    )
    pos_p = pos2 + jnp.asarray([0.02, -0.015, 0.01], jnp.float32)
    prior = NavState.identity()._replace(
        rot=rot_p, pos=pos_p, cov=jnp.eye(18, dtype=jnp.float32) * 1e-2
    )

    # scan cloud: floor points (world) visible in frame 2.
    g = rng.uniform(-4, 4, (1000, 2))
    floor_s = np.stack([g[:, 0], g[:, 1] + 4.0, np.full(1000, -1.5)], 1)
    gw2 = rng.uniform(-4, 4, (1000, 2))
    wall_s = np.stack([gw2[:, 0], np.full(1000, 10.0), gw2[:, 1] + 1.0], 1)
    scan = jnp.asarray(np.concatenate([floor_s, wall_s]).astype(np.float32))
    scan_n = 2000

    jupdate = jax.jit(
        vio.vio_update, static_argnames=("cam", "vm_cfg", "cfg")
    )
    post, vmap2, info = jupdate(
        prior, vmap, img2, scan, jnp.ones(scan_n, bool), CAM, I3, Z3, VM_CFG, VIO_CFG
    )

    assert int(info.n_selected) >= 8, f"selected {int(info.n_selected)}"
    rot_err_prior = Rotation.from_matrix(
        np.asarray(rot_p, np.float64) @ np.asarray(rot2, np.float64).T
    ).magnitude()
    rot_err_post = Rotation.from_matrix(
        np.asarray(post.rot, np.float64) @ np.asarray(rot2, np.float64).T
    ).magnitude()
    pos_err_prior = float(jnp.linalg.norm(pos_p - pos2))
    pos_err_post = float(jnp.linalg.norm(post.pos - pos2))
    assert rot_err_post < 0.5 * rot_err_prior, (rot_err_prior, rot_err_post)
    assert pos_err_post < 0.5 * pos_err_prior, (pos_err_prior, pos_err_post)
    # maintenance ran
    assert int(info.error_after) <= int(info.error_before) + 1


def test_vio_empty_map_is_safe(rng):
    vmap = vmap_mod.make_visual_map(VM_CFG)
    prior = NavState.identity()._replace(cov=jnp.eye(18) * 1e-2)
    img = jrender(CAM, I3, jnp.zeros(3, jnp.float32))
    scan = jnp.asarray(rng.uniform(-3, 3, (128, 3)).astype(np.float32))
    jupdate = jax.jit(vio.vio_update, static_argnames=("cam", "vm_cfg", "cfg"))
    post, vmap2, info = jupdate(
        prior, vmap, img, scan, jnp.ones(128, bool), CAM, I3, Z3, VM_CFG, VIO_CFG
    )
    assert int(info.n_selected) == 0
    assert bool(jnp.all(jnp.isfinite(post.pos)))
    np.testing.assert_allclose(np.asarray(post.pos), np.asarray(prior.pos), atol=1e-5)


def test_depth_window_gate_matches_tapwise(rng):
    """Pooled min/max depth gate == the tap-wise definition: at least one
    positive return in the 9x9 window and none with |z - d| > thresh."""
    from fastlivo_tpu.models.vio import _depth_window_gate

    h, w, half, thresh = 40, 56, 4, 0.5
    depth = rng.uniform(0, 8, (h, w)).astype(np.float32)
    depth[rng.uniform(size=(h, w)) < 0.6] = 0.0  # sparse returns
    n = 300
    uv = rng.uniform(0, [w - 1, h - 1], (n, 2)).astype(np.float32)
    z = rng.uniform(0, 8, n).astype(np.float32)

    got = np.asarray(
        _depth_window_gate(
            jnp.asarray(depth), jnp.asarray(uv), jnp.asarray(z), thresh, half
        )
    )
    want = np.zeros(n, bool)
    for i in range(n):
        c, r = int(uv[i, 0]), int(uv[i, 1])
        taps = depth[
            max(r - half, 0) : r + half + 1, max(c - half, 0) : c + half + 1
        ]
        d = taps[taps > 0]
        want[i] = d.size > 0 and np.all(np.abs(z[i] - d) <= thresh)
    np.testing.assert_array_equal(got, want)
