"""Checkpoint / resume of the full estimator + map state.

The reference has NO checkpointing (SURVEY.md section 5 — outputs only:
PCD dumps + TUM files at Finish). Here the entire filter state is a pytree
of fixed-shape arrays, so a checkpoint is a single npz: NavState, the
LiDAR voxel arena, the visual map arena, and host-side bookkeeping
(trajectory, window-builder cursors). Restore reproduces the run exactly
from the checkpointed measurement index.
"""

from __future__ import annotations

import json
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

SCHEMA_VERSION = 6  # v6: surf_s2 stored symmetric-6 (C, 6), was (C, 3, 3)


def _flatten(prefix: str, tree) -> Dict[str, np.ndarray]:
    leaves, treedef = jax.tree.flatten(tree)
    out = {f"{prefix}/{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    return out


def _unflatten(prefix: str, data, template):
    leaves, treedef = jax.tree.flatten(template)
    new_leaves = [
        jnp.asarray(data[f"{prefix}/{i}"], leaves[i].dtype)
        for i in range(len(leaves))
    ]
    return jax.tree.unflatten(treedef, new_leaves)


def save_pipeline(path: str, pipe, meta: Dict[str, Any] | None = None):
    """Checkpoint a LivoPipeline (device arenas + host bookkeeping)."""
    blobs: Dict[str, np.ndarray] = {}
    blobs.update(_flatten("state", pipe.state))
    blobs.update(_flatten("map", pipe.map))
    blobs.update(_flatten("vmap", pipe.visual_map))
    blobs["world_cloud"] = np.asarray(pipe.world_cloud)
    blobs["world_mask"] = np.asarray(pipe.world_mask)
    traj = pipe.trajectory
    blobs["traj_t"] = np.asarray([t for t, _, _ in traj])
    blobs["traj_pos"] = (
        np.stack([p for _, p, _ in traj]) if traj else np.zeros((0, 3))
    )
    blobs["traj_quat"] = (
        np.stack([q for _, _, q in traj]) if traj else np.zeros((0, 4))
    )
    header = {
        # Bump on any change to array SEMANTICS (not just shapes): v2 =
        # surfel moments stored in voxel-local coordinates; v3 = per-point
        # slot_stamps field added to the voxel arena; v4 = non-wrapping
        # window hash (arena slot layout changed); v5 = bucketized
        # packed-row arena (meta/counts/slab/slab_stamps/surf_s2).
        "schema_version": SCHEMA_VERSION,
        "first_scan": pipe.first_scan,
        "init_done": pipe.initializer.done,
        "mean_acc": pipe.initializer.mean_acc.tolist(),
        "mean_gyr": pipe.initializer.mean_gyr.tolist(),
        # Sharded-arena layout: the npz stores the GLOBAL arrays (np.asarray
        # gathers across the mesh); each shard is an independent hash table
        # of capacity_global / n_map_shards slots, so the blob only restores
        # onto a mesh with the SAME shard count.
        "n_map_shards": getattr(pipe, "n_map_shards", 1),
        "meta": meta or {},
    }
    blobs["header"] = np.frombuffer(json.dumps(header).encode(), np.uint8)
    np.savez_compressed(path, **blobs)


def load_pipeline(path: str, pipe):
    """Restore a checkpoint into a freshly-constructed LivoPipeline with the
    same config. Returns the stored meta dict."""
    data = np.load(path, allow_pickle=False)
    header = json.loads(bytes(data["header"]).decode())
    version = header.get("schema_version", 1)
    if version != SCHEMA_VERSION:
        raise ValueError(
            f"checkpoint schema v{version} != expected v{SCHEMA_VERSION} "
            "(array semantics changed between versions; re-run from the log "
            "instead of resuming)"
        )
    saved_shards = int(header.get("n_map_shards", 1))
    if saved_shards != getattr(pipe, "n_map_shards", 1):
        raise ValueError(
            f"checkpoint was written with {saved_shards} map shard(s) but the "
            f"pipeline runs with {pipe.n_map_shards}: each shard is an "
            "independent hash table, so the arena cannot be re-partitioned "
            "— resume with the same parallel config (or re-run from the log)"
        )
    pipe.state = pipe._replicate(_unflatten("state", data, pipe.state))
    pipe.map = pipe.place_map(_unflatten("map", data, pipe.map))
    pipe.visual_map = pipe._replicate(_unflatten("vmap", data, pipe.visual_map))
    pipe.world_cloud = pipe._replicate(jnp.asarray(data["world_cloud"]))
    pipe.world_mask = pipe._replicate(jnp.asarray(data["world_mask"]))
    pipe.trajectory = [
        (float(t), data["traj_pos"][i], data["traj_quat"][i])
        for i, t in enumerate(data["traj_t"])
    ]
    pipe.first_scan = bool(header["first_scan"])
    pipe.initializer.done = bool(header["init_done"])
    pipe.initializer.mean_acc = np.asarray(header["mean_acc"])
    pipe.initializer.mean_gyr = np.asarray(header["mean_gyr"])
    return header["meta"]
