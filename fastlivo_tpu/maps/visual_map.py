"""Fixed-capacity visual point map — the TPU-native sparse visual map.

Replaces the reference's SVO-lineage pointer graph (reference:
include/{point,feature,frame,map}.h + the `feat_map` voxel hash of
VOXEL_POINTS in include/lidar_selection.h:108) with a tensor arena:

- a ring-allocated point table (pos, Shi-Tomasi score, active flag) —
  bounded memory where the reference's feat_map grows without limit;
- per-point observation rings (<= K obs): pixel, bearing, observing-frame
  pose, and a 3-level 10x10 patch pyramid sampled at creation time.
  The reference instead keeps every past *image* alive (imgs_ keyed by
  frame id, lidar_selection.h) and re-samples it during affine warping —
  unbounded memory and gather-hostile; storing bordered patch pyramids per
  observation bounds memory and turns the warp into a small local gather.

No voxel index is kept: candidate selection projects the whole table
(~20k points) every frame — trivial on TPU — and gates visibility against
the scan depth image (see models/vio.py), which subsumes the reference's
sub_feat_map voxel intersection.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VisualMapConfig:
    capacity: int = 20480  # point slots (ring allocation)
    max_obs: int = 6  # observation slots per point (ring)
    patch_size: int = 8  # residual patch (matches reference patch_size)
    stored_patch: int = 12  # stored bordered patch per level (8 + 4 border)
    levels: int = 3  # stored pyramid levels (strides 1, 2, 4)


class VisualMap(NamedTuple):
    pos: jnp.ndarray  # (P, 3) world positions
    score: jnp.ndarray  # (P,) Shi-Tomasi value (reference pt->value)
    active: jnp.ndarray  # (P,) bool
    cursor: jnp.ndarray  # () int32 ring allocation cursor
    # Observation rings:
    # Stored patch pyramids are kept FLAT per (point, obs): a 5-D
    # (P, K, L, S, S) arena makes XLA pick conflicting layouts between
    # the scatter (store) and gather (select) sites and insert two
    # ~0.6 ms transpose copies per frame; flat rows are layout-trivial.
    obs_patch: jnp.ndarray  # (P, K, L*S*S) strided patch pyramid (flat)
    obs_px: jnp.ndarray  # (P, K, 2) pixel in observing frame
    obs_rcw: jnp.ndarray  # (P, K, 3, 3) world->camera rotation
    obs_pcw: jnp.ndarray  # (P, K, 3)  p_c = rcw @ p_w + pcw
    obs_valid: jnp.ndarray  # (P, K) bool
    obs_cursor: jnp.ndarray  # (P,) int32 ring cursor


def make_visual_map(cfg: VisualMapConfig, dtype=jnp.float32) -> VisualMap:
    p, k, l, s = cfg.capacity, cfg.max_obs, cfg.levels, cfg.stored_patch
    return VisualMap(
        pos=jnp.zeros((p, 3), dtype),
        score=jnp.zeros((p,), dtype),
        active=jnp.zeros((p,), bool),
        cursor=jnp.zeros((), jnp.int32),
        obs_patch=jnp.zeros((p, k, l * s * s), dtype),
        obs_px=jnp.zeros((p, k, 2), dtype),
        obs_rcw=jnp.zeros((p, k, 3, 3), dtype),
        obs_pcw=jnp.zeros((p, k, 3), dtype),
        obs_valid=jnp.zeros((p, k), bool),
        obs_cursor=jnp.zeros((p,), jnp.int32),
    )


def obs_cam_pos(rcw: jnp.ndarray, pcw: jnp.ndarray) -> jnp.ndarray:
    """Camera center in world: -R^T t (batched over leading dims)."""
    return -jnp.einsum("...ji,...j->...i", rcw, pcw)


def add_points(
    m: VisualMap,
    cfg: VisualMapConfig,
    pos: jnp.ndarray,  # (N, 3)
    score: jnp.ndarray,  # (N,)
    patches: jnp.ndarray,  # (N, L, 10, 10)
    px: jnp.ndarray,  # (N, 2)
    rcw: jnp.ndarray,  # (3, 3) current frame
    pcw: jnp.ndarray,  # (3,)
    mask: jnp.ndarray,  # (N,)
) -> VisualMap:
    """Allocate new points at the ring cursor (overwriting the oldest —
    bounded-memory counterpart of the reference's unbounded AddPoint,
    lidar_selection.cpp:196-222) with one initial observation each."""
    n = pos.shape[0]
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    slot = (m.cursor + rank) % cfg.capacity
    slot = jnp.where(mask, slot, cfg.capacity)  # OOB -> dropped

    k0 = jnp.zeros((), jnp.int32)
    new = m._replace(
        pos=m.pos.at[slot].set(pos, mode="drop"),
        score=m.score.at[slot].set(score, mode="drop"),
        active=m.active.at[slot].set(True, mode="drop"),
        cursor=(m.cursor + jnp.sum(mask.astype(jnp.int32))) % cfg.capacity,
        obs_patch=m.obs_patch.at[slot, k0].set(
            patches.reshape(n, -1), mode="drop"
        ),
        obs_px=m.obs_px.at[slot, k0].set(px, mode="drop"),
        obs_rcw=m.obs_rcw.at[slot, k0].set(
            jnp.broadcast_to(rcw, (n, 3, 3)), mode="drop"
        ),
        obs_pcw=m.obs_pcw.at[slot, k0].set(
            jnp.broadcast_to(pcw, (n, 3)), mode="drop"
        ),
        obs_valid=m.obs_valid.at[slot].set(
            jnp.zeros((n, cfg.max_obs), bool).at[:, 0].set(True), mode="drop"
        ),
        obs_cursor=m.obs_cursor.at[slot].set(1, mode="drop"),
    )
    return new


def add_observations(
    m: VisualMap,
    cfg: VisualMapConfig,
    idx: jnp.ndarray,  # (N,) point indices
    score: jnp.ndarray,  # (N,)
    patches: jnp.ndarray,  # (N, L, 10, 10)
    px: jnp.ndarray,  # (N, 2)
    rcw: jnp.ndarray,
    pcw: jnp.ndarray,
    mask: jnp.ndarray,  # (N,)
) -> VisualMap:
    """Append an observation to each point's ring (replacing the oldest when
    full — the reference instead evicts the furthest-view obs at >20,
    lidar_selection.cpp:929-935; ring replacement keeps recency, which the
    close-view selection then searches)."""
    n = idx.shape[0]
    i = jnp.where(mask, idx, cfg.capacity)
    k = m.obs_cursor[jnp.clip(idx, 0, cfg.capacity - 1)] % cfg.max_obs
    return m._replace(
        score=m.score.at[i].set(score, mode="drop"),
        obs_patch=m.obs_patch.at[i, k].set(
            patches.reshape(n, -1), mode="drop"
        ),
        obs_px=m.obs_px.at[i, k].set(px, mode="drop"),
        obs_rcw=m.obs_rcw.at[i, k].set(
            jnp.broadcast_to(rcw, (n, 3, 3)), mode="drop"
        ),
        obs_pcw=m.obs_pcw.at[i, k].set(
            jnp.broadcast_to(pcw, (n, 3)), mode="drop"
        ),
        obs_valid=m.obs_valid.at[i, k].set(True, mode="drop"),
        obs_cursor=m.obs_cursor.at[i].add(1, mode="drop"),
    )


def closest_view_obs(
    m: VisualMap, idx: jnp.ndarray, cam_pos: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best observation per point by viewing-angle cosine (parity with
    Point::getCloseViewObs, point.cpp:142: max cos(view dir, obs dir),
    reject below cos > 0.5)."""
    pts = m.pos[idx]  # (N, 3)
    view = cam_pos - pts
    view = view / (jnp.linalg.norm(view, axis=-1, keepdims=True) + 1e-9)
    obs_c = obs_cam_pos(m.obs_rcw[idx], m.obs_pcw[idx])  # (N, K, 3)
    od = obs_c - pts[:, None, :]
    od = od / (jnp.linalg.norm(od, axis=-1, keepdims=True) + 1e-9)
    cos = jnp.sum(od * view[:, None, :], axis=-1)
    cos = jnp.where(m.obs_valid[idx], cos, -2.0)
    best = jnp.argmax(cos, axis=-1)
    best_cos = jnp.take_along_axis(cos, best[:, None], axis=-1)[:, 0]
    return best, best_cos > 0.5


def num_active(m: VisualMap) -> jnp.ndarray:
    return jnp.sum(m.active.astype(jnp.int32))
