"""Frustum culling + RGB cloud colorization."""

import numpy as np
import jax
import jax.numpy as jnp

from fastlivo_tpu.ops import frustum
from fastlivo_tpu.io import export, render
from fastlivo_tpu.ops.camera import Pinhole


def test_points_in_fov():
    pts = jnp.asarray(
        [[5.0, 0, 0], [5.0, 0.5, 0], [5.0, 8.0, 0], [-5.0, 0, 0], [50.0, 0, 0]]
    )
    mask = frustum.points_in_fov(
        pts, jnp.zeros(3), jnp.asarray([1.0, 0, 0]), half_angle=0.3, max_dist=20.0
    )
    assert mask.tolist() == [True, True, False, False, False]


def test_boxes_intersect_fov():
    bmin = jnp.asarray([[4.0, -1, -1], [4.0, 30, -1], [-0.5, -0.5, -0.5]])
    bmax = jnp.asarray([[6.0, 1, 1], [6.0, 32, 1], [0.5, 0.5, 0.5]])
    mask = frustum.boxes_intersect_fov(
        bmin, bmax, jnp.zeros(3), jnp.asarray([1.0, 0, 0]), 0.3, 20.0
    )
    assert bool(mask[0])  # in front, on-axis
    assert not bool(mask[1])  # way off-axis
    assert bool(mask[2])  # contains the apex


def test_colorize_cloud():
    cam = Pinhole(width=160, height=128, fx=100.0, fy=100.0, cx=80.0, cy=64.0)
    rcw = np.asarray(
        [[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]]
    )  # camera +z along world +y
    pcw = -rcw @ np.zeros(3)
    img = np.asarray(
        jax.jit(render.render_room, static_argnames="cam")(
            cam, jnp.asarray(rcw, jnp.float32), jnp.asarray(pcw, jnp.float32)
        )
    )
    pts = np.array([[0.0, 5.0, 0.0], [0.5, 5.0, 0.2], [0.0, -5.0, 0.0]], np.float32)
    vals, vis = export.colorize_cloud(pts, img, rcw, pcw, cam)
    assert vis.tolist() == [True, True, False]
    assert vals[0] > 0  # textured value sampled
