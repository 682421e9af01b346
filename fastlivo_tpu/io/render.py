"""Analytic textured-room renderer for VIO tests and benchmarks.

The reference is validated only against recorded camera rosbags; this
framework instead ships a ray-cast renderer of the same synthetic room the
LiDAR simulator samples (io/synthetic.py): every pixel's ray is intersected
with the room planes and shaded by a smooth multi-frequency procedural
texture of the world hit point — photometrically consistent across
viewpoints by construction, which is exactly the property the direct
photometric update needs.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from fastlivo_tpu.ops.camera import Pinhole


def texture(p: jnp.ndarray) -> jnp.ndarray:
    """Smooth multi-scale intensity field over world points (..., 3),
    in [~30, ~225] with rich gradients at several scales."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    v = (
        0.45 * jnp.sin(2.1 * x + 0.7) * jnp.cos(1.7 * y - 0.3)
        + 0.30 * jnp.sin(5.3 * y + 1.1 * z)
        + 0.25 * jnp.cos(8.9 * x - 4.1 * z + 0.5)
        + 0.20 * jnp.sin(17.0 * (x + y) * 0.5)
        + 0.15 * jnp.cos(29.0 * (y - z) * 0.5 + 1.3)
    )
    return 128.0 + 95.0 * v / 1.35


def render_room_hits(
    cam: Pinhole,
    rcw: jnp.ndarray,
    pcw: jnp.ndarray,
    half: float = 10.0,
    floor_z: float = -1.5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Render from a world->camera pose, also returning the per-pixel world
    hit points — exact dense correspondence supervision for training the
    learned matcher (the room is convex and viewed from inside, so there is
    no occlusion: any hit point is visible from every interior pose).

    Returns (img (H, W) f32, hits (H, W, 3) world points, valid (H, W))."""
    uu, vv = jnp.meshgrid(
        jnp.arange(cam.width, dtype=jnp.float32) + 0.5,
        jnp.arange(cam.height, dtype=jnp.float32) + 0.5,
        indexing="xy",
    )
    uv = jnp.stack([uu, vv], axis=-1).reshape(-1, 2)
    f = cam.unproject(uv)  # camera-frame bearings
    d = f @ rcw  # world direction = rcw^T f
    o = -rcw.T @ pcw  # camera center in world

    big = jnp.float32(1e9)

    def plane_hit(axis: int, value: float):
        dn = d[:, axis]
        t = (value - o[axis]) / jnp.where(jnp.abs(dn) > 1e-9, dn, 1e-9)
        p = o[None, :] + t[:, None] * d
        others = [i for i in range(3) if i != axis]
        inside = (
            (jnp.abs(p[:, others[0]]) <= half + 1e-3)
            & (p[:, 2] >= floor_z - 1e-3)
            & (p[:, 2] <= 12.0)
        )
        if axis != 2:
            inside = inside & (jnp.abs(p[:, others[1] if others[1] != 2 else others[0]]) <= half + 1e-3)
        ok = (t > 1e-3) & inside
        return jnp.where(ok, t, big), p

    ts, ps = [], []
    for axis, value in ((2, floor_z), (0, -half), (0, half), (1, -half), (1, half)):
        t, p = plane_hit(axis, value)
        ts.append(t)
        ps.append(p)
    tstack = jnp.stack(ts, axis=0)  # (5, Npix)
    pstack = jnp.stack(ps, axis=0)  # (5, Npix, 3)
    best = jnp.argmin(tstack, axis=0)
    hit = jnp.take_along_axis(
        pstack, best[None, :, None].repeat(3, axis=2), axis=0
    )[0]
    tmin = jnp.min(tstack, axis=0)
    ok = tmin < big
    img = jnp.where(ok, texture(hit), 0.0)
    h, w = cam.height, cam.width
    return (
        img.reshape(h, w).astype(jnp.float32),
        hit.reshape(h, w, 3).astype(jnp.float32),
        ok.reshape(h, w),
    )


def render_room(
    cam: Pinhole,
    rcw: jnp.ndarray,
    pcw: jnp.ndarray,
    half: float = 10.0,
    floor_z: float = -1.5,
) -> jnp.ndarray:
    """Render an (H, W) float32 image of the room from a world->camera pose."""
    img, _, _ = render_room_hits(cam, rcw, pcw, half, floor_z)
    return img


def render_street(
    cam: Pinhole,
    rcw: jnp.ndarray,
    pcw: jnp.ndarray,
    boxes: jnp.ndarray,  # (B, 5) rows (cx, cy, w, d, h) from synthetic.street_boxes
    floor_z: float = -1.5,
    ground_x: Tuple[float, float] = (-10.0, 50.0),
    ground_y: Tuple[float, float] = (-12.0, 16.0),
) -> jnp.ndarray:
    """Render an (H, W) f32 frame of the street world (ground plane +
    building AABBs, io/synthetic.street_surfaces): slab-method ray-AABB
    over all boxes, nearest-hit occlusion, shaded by the same procedural
    texture as the room renderer — photometrically consistent with the
    street LiDAR samples for the full-stack LIVO + loop-closure drive.
    Sky (no hit) renders as 0."""
    uu, vv = jnp.meshgrid(
        jnp.arange(cam.width, dtype=jnp.float32) + 0.5,
        jnp.arange(cam.height, dtype=jnp.float32) + 0.5,
        indexing="xy",
    )
    uv = jnp.stack([uu, vv], axis=-1).reshape(-1, 2)
    f = cam.unproject(uv)
    d = f @ rcw  # (P, 3) world directions
    o = -rcw.T @ pcw
    big = jnp.float32(1e9)
    safe_d = jnp.where(jnp.abs(d) > 1e-9, d, 1e-9)

    # Ground plane.
    t_g = (floor_z - o[2]) / safe_d[:, 2]
    pg = o[None, :] + t_g[:, None] * d
    ok_g = (
        (t_g > 1e-3)
        & (pg[:, 0] >= ground_x[0]) & (pg[:, 0] <= ground_x[1])
        & (pg[:, 1] >= ground_y[0]) & (pg[:, 1] <= ground_y[1])
    )
    t_ground = jnp.where(ok_g, t_g, big)

    # Boxes (slab method).
    c = boxes.astype(jnp.float32)
    bmin = jnp.stack(
        [c[:, 0] - c[:, 2] / 2, c[:, 1] - c[:, 3] / 2,
         jnp.full_like(c[:, 0], floor_z)], axis=-1,
    )  # (B, 3)
    bmax = jnp.stack(
        [c[:, 0] + c[:, 2] / 2, c[:, 1] + c[:, 3] / 2,
         floor_z + c[:, 4]], axis=-1,
    )
    inv = 1.0 / safe_d  # (P, 3)
    t1 = (bmin[None, :, :] - o[None, None, :]) * inv[:, None, :]  # (P, B, 3)
    t2 = (bmax[None, :, :] - o[None, None, :]) * inv[:, None, :]
    t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)  # (P, B)
    t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (t_near <= t_far) & (t_far > 1e-3) & (t_near > 1e-3)
    t_box = jnp.min(jnp.where(hit, t_near, big), axis=-1)  # (P,)

    t = jnp.minimum(t_ground, t_box)
    ok = t < big
    p_hit = o[None, :] + t[:, None] * d
    img = jnp.where(ok, texture(p_hit), 0.0)
    return img.reshape(cam.height, cam.width).astype(jnp.float32)
