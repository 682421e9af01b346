"""Voxel-grid downsampling with fixed-shape output.

Replaces the reference's PCL `VoxelGrid` scan downsample
(reference: src/laser_mapping.cpp:129-130 `downSizeFilterSurf`) with a
sort + segment-reduce pass: exact per-voxel centroids, static shapes,
jit/shard-safe. Used both for the per-scan downsample (leaf =
filter_size_surf) and the map-insert gate (leaf = filter_size_map,
reference map_incremental laser_mapping.cpp:329-389).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_SENTINEL = jnp.iinfo(jnp.int32).max


def voxel_downsample(
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    leaf: float,
    out_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Centroid voxel-grid filter.

    Args:
      pts: (N, 3) points (padded).
      mask: (N,) validity.
      leaf: voxel side length.
      out_size: static output capacity (first `out_size` voxels in
        lexicographic voxel order are kept; excess voxels are dropped).

    Returns (out_pts (out_size, 3), out_mask (out_size,)).
    """
    n = pts.shape[0]
    vox = jnp.floor(pts / leaf).astype(jnp.int32)
    vox = jnp.where(mask[:, None], vox, _SENTINEL)

    order = jnp.lexsort((vox[:, 2], vox[:, 1], vox[:, 0]))
    vox_s = vox[order]
    pts_s = pts[order]
    mask_s = mask[order]

    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(vox_s[1:] != vox_s[:-1], axis=-1)]
    )
    is_start = is_start & mask_s
    seg_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    seg_id = jnp.where(mask_s & (seg_id >= 0), seg_id, out_size)

    sums = jax.ops.segment_sum(
        jnp.where(mask_s[:, None], pts_s, 0.0), seg_id, num_segments=out_size + 1
    )[:out_size]
    cnts = jax.ops.segment_sum(
        mask_s.astype(pts.dtype), seg_id, num_segments=out_size + 1
    )[:out_size]

    out_mask = cnts > 0
    out_pts = sums / jnp.maximum(cnts, 1.0)[:, None]
    return jnp.where(out_mask[:, None], out_pts, 0.0), out_mask
