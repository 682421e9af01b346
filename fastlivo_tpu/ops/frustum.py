"""Frustum / FOV culling utilities.

Capability parity with the reference's FOV_Checker
(reference: include/FOV_Checker/FOV_Checker.{h,cpp} — cone-vs-box tests
used for ikd-Tree map cropping in the legacy node,
origin_laserMapping.cpp:370-424). The hash-arena map does not need FOV
cropping for correctness (LRU bounds memory), but cone culling remains
useful for visualization extracts and bounded republishing, so the
geometric tests are provided as batched array ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def points_in_fov(
    pts: jnp.ndarray,
    origin: jnp.ndarray,
    axis: jnp.ndarray,
    half_angle: float,
    max_dist: float,
) -> jnp.ndarray:
    """Mask of points inside a view cone (apex `origin`, direction `axis`,
    aperture 2*half_angle, range max_dist). Parity with check_fov."""
    d = pts - origin
    dist = jnp.linalg.norm(d, axis=-1)
    cosang = jnp.sum(d * axis, axis=-1) / jnp.maximum(dist, 1e-9)
    return (dist <= max_dist) & (cosang >= jnp.cos(half_angle))


def boxes_intersect_fov(
    box_min: jnp.ndarray,
    box_max: jnp.ndarray,
    origin: jnp.ndarray,
    axis: jnp.ndarray,
    half_angle: float,
    max_dist: float,
) -> jnp.ndarray:
    """Conservative cone-vs-AABB test for (..., 3) box corners (parity with
    check_box): a box intersects the cone if its center lies inside the
    cone expanded by the box's bounding-sphere radius."""
    center = 0.5 * (box_min + box_max)
    radius = 0.5 * jnp.linalg.norm(box_max - box_min, axis=-1)
    d = center - origin
    dist = jnp.linalg.norm(d, axis=-1)
    # expanded range test
    in_range = dist <= max_dist + radius
    # angular test with the aperture widened by asin(r/dist)
    cosang = jnp.sum(d * axis, axis=-1) / jnp.maximum(dist, 1e-9)
    widen = jnp.arcsin(jnp.clip(radius / jnp.maximum(dist, 1e-9), 0.0, 1.0))
    ok_angle = jnp.arccos(jnp.clip(cosang, -1.0, 1.0)) <= half_angle + widen
    # boxes containing the apex always intersect
    contains = jnp.all((origin >= box_min) & (origin <= box_max), axis=-1)
    return contains | (in_range & ok_angle)
