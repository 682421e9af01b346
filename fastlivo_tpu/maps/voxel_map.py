"""Fixed-capacity voxel-hash LiDAR map — the TPU-native incremental map.

Replaces the reference's iVox voxel-hash (reference: include/ivox3d/ivox3d.h
— std::unordered_map + per-voxel point lists + LRU, AddPoints :256,
GetClosestPoint :133, GenerateNearbyGrids :211) and the compile-time
alternative ikd-Tree (include/ikd-Tree/) with a single **tensor arena**:

- open-addressing hash table of `capacity` voxel slots (linear probing,
  bounded window) storing voxel integer coords,
- a fixed slab of `max_points` point slots per voxel,
- LRU epoch stamps per slot; when a probe window is full the oldest slot in
  the window is evicted (bounded-memory streaming, like iVox's LRU cache),
- batched insert as pure scatters (conflict-free via sort + segment ranks,
  multi-round slot claiming with scatter-min arbitration),
- kNN as gathers over the 1/7/19/27-voxel neighborhood + running top-k.

Everything is static-shape and jit/vmap/shard_map-safe; the map state is an
immutable pytree (functional updates), which also makes it checkpointable
and shardable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

INT32_MAX = jnp.iinfo(jnp.int32).max

# Classic 3D spatial-hash primes (same family the reference's iVox uses).
_HP = (98317, 1222827239, 51787565)


@dataclass(frozen=True)
class VoxelMapConfig:
    """Static (hashable) map geometry — passed as a static jit argument."""

    resolution: float = 0.5
    capacity: int = 1 << 19  # voxel slots; must be a power of two
    max_points: int = 32  # point slots per voxel
    probe_depth: int = 8  # linear probe window
    nearby_type: int = 18  # 0 | 6 | 18 | 26 extra neighbor voxels for kNN
    claim_rounds: int = 4  # slot-claim arbitration rounds per insert
    # Static capacity of the per-scan UNIQUE-voxel table used to dedup
    # surfel lookups: a 65k-point scan occupies only ~3-10k distinct map
    # voxels, so probing per unique voxel instead of per point cuts the
    # gather-descriptor count (the TPU lookup cost) ~5-15x. Scans whose
    # distinct-voxel count exceeds the cap lose the surfel constraint for
    # the overflow points on that scan (the filter just sees fewer
    # effective points); 0 disables dedup.
    lookup_unique_cap: int = 16384
    # Exponential forgetting of surfel moments on each touched-voxel insert:
    # bounds the effective history to ~1/(1-decay) scans so planes track
    # recent (better-registered) geometry instead of remembering transient
    # pose error forever. 1.0 = infinite memory.
    surfel_decay: float = 0.9
    # Surfel freezing: moment contributions fade linearly to zero as the
    # voxel's accumulated count approaches this value, anchoring mature
    # surfels to their early (best-registered) geometry instead of letting
    # them track accumulated drift (the map-feedback drift mechanism,
    # ROADMAP item 9). 0 disables freezing.
    surfel_freeze_n: float = 0.0

    def __post_init__(self):
        assert self.capacity & (self.capacity - 1) == 0, "capacity must be 2^k"
        assert self.capacity > 2 * self.probe_depth, "capacity too small"


class VoxelHashMap(NamedTuple):
    """The map arena. All arrays fixed-shape; functional updates only.

    Beyond the slab of raw points (the iVox equivalent), each voxel keeps
    RUNNING SURFEL MOMENTS over every point ever inserted (not just the
    slab-capped ones): count, sum, and outer-product sum. These make the
    per-voxel plane (mean + covariance eigenvector) available without any
    kNN at query time — the Surfel-LIO-style fast path (PAPERS.md).
    """

    keys: jnp.ndarray  # (C, 3) int32 voxel coords
    occupied: jnp.ndarray  # (C,) bool
    counts: jnp.ndarray  # (C,) int32 — valid points in each voxel slab
    points: jnp.ndarray  # (C, S, 3) f32
    stamps: jnp.ndarray  # (C,) int32 — LRU epoch of last touch
    slot_stamps: jnp.ndarray  # (C, S) int32 — insert epoch PER POINT slot
    epoch: jnp.ndarray  # () int32
    surf_n: jnp.ndarray  # (C,) f32 — running point count (uncapped)
    surf_s1: jnp.ndarray  # (C, 3) f32 — running sum of points
    surf_s2: jnp.ndarray  # (C, 3, 3) f32 — running sum of outer products


def make_map(cfg: VoxelMapConfig, dtype=jnp.float32) -> VoxelHashMap:
    c, s = cfg.capacity, cfg.max_points
    return VoxelHashMap(
        keys=jnp.zeros((c, 3), dtype=jnp.int32),
        occupied=jnp.zeros((c,), dtype=bool),
        counts=jnp.zeros((c,), dtype=jnp.int32),
        points=jnp.zeros((c, s, 3), dtype=dtype),
        stamps=jnp.zeros((c,), dtype=jnp.int32),
        slot_stamps=jnp.zeros((c, s), dtype=jnp.int32),
        epoch=jnp.zeros((), dtype=jnp.int32),
        surf_n=jnp.zeros((c,), dtype=dtype),
        surf_s1=jnp.zeros((c, 3), dtype=dtype),
        surf_s2=jnp.zeros((c, 3, 3), dtype=dtype),
    )


def voxel_coord(pts: jnp.ndarray, resolution: float) -> jnp.ndarray:
    """World position -> integer voxel coordinate (floor)."""
    return jnp.floor(pts / resolution).astype(jnp.int32)


def voxel_corner(vox: jnp.ndarray, resolution: float, dtype=jnp.float32) -> jnp.ndarray:
    """Voxel coordinate -> its world-space corner (the local-coordinate
    anchor for surfel moments: writers subtract it, readers add it back —
    keep the two sides paired through THIS helper)."""
    return vox.astype(dtype) * resolution


def _hash(vox: jnp.ndarray, capacity: int, probe_depth: int) -> jnp.ndarray:
    """Spatial hash of (..., 3) int voxel coords into
    [0, capacity - probe_depth): probe windows never wrap, so the whole
    window is `probe_depth` CONSECUTIVE table rows, loadable with one flat
    gather and reduced vectorally over the window axis."""
    h = vox[..., 0] * _HP[0] ^ vox[..., 1] * _HP[1] ^ vox[..., 2] * _HP[2]
    return (h & 0x7FFFFFFF) % (capacity - probe_depth)


# Independent prime set for the shard-ownership hash: must be uncorrelated
# with the slot hash so per-shard occupancy stays uniform.
_HP_OWNER = (73856093, 19349669, 83492791)


def owner_of(vox: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    """Shard owner of each (..., 3) voxel coord, in [0, n_shards).

    Voxel ownership is hash-partitioned across devices: every voxel (its
    slab, LRU stamp, and surfel moments) lives on exactly ONE device, so
    per-device map memory is capacity_local = capacity_global / n_shards
    and moments never split across shards. See `fastlivo_tpu.parallel` for
    the lookup/insert collectives built on this.
    """
    h = (
        vox[..., 0] * _HP_OWNER[0]
        ^ vox[..., 1] * _HP_OWNER[1]
        ^ vox[..., 2] * _HP_OWNER[2]
    )
    # int32 -> non-negative before mod (n_shards need not be a power of 2)
    return (h & 0x7FFFFFFF) % n_shards


def probe(
    m: VoxelHashMap, vox: jnp.ndarray, cfg: VoxelMapConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear-probe lookup for a batch of voxel coords.

    The probe window is `probe_depth` CONSECUTIVE rows (the hash range is
    shrunk so windows never wrap): the whole window loads with one flat
    native gather per arena column, and the found/candidate selection is
    vectorized over the window axis (the original fori_loop issued
    probe_depth SEQUENTIAL gathers).

    Returns (found, cand):
      found: (N,) slot holding exactly this voxel, or -1
      cand:  (N,) insertion candidate — first empty slot in the window, or
             (if the window is full) the oldest-stamped slot (LRU eviction
             target, parity with iVox's LRU cache ivox3d.h:271-274).
    """
    pd = cfg.probe_depth
    h0 = _hash(vox, cfg.capacity, pd)

    # One flat advanced-index gather per arena column. This lowers to
    # XLA's NATIVE gather (~7 ns/row measured on v5e via the profiler);
    # the tempting alternatives do not: lax.gather with
    # slice_sizes=(pd, ...) and vmapped dynamic_slice both get lowered to
    # SERIALIZED while loops of dynamic-slice/dynamic-update-slice on this
    # XLA version (measured 100-300 ms per 65k-query probe).
    idx = h0[:, None] + jnp.arange(pd, dtype=jnp.int32)[None, :]
    keys_w = m.keys[idx]  # (N, pd, 3)
    occ_w = m.occupied[idx]  # (N, pd)
    st_w = m.stamps[idx]  # (N, pd)

    pd_idx = jnp.arange(pd, dtype=jnp.int32)
    match = occ_w & jnp.all(keys_w == vox[:, None, :], axis=-1)
    first_match = jnp.min(jnp.where(match, pd_idx[None, :], pd), axis=1)
    found = jnp.where(first_match < pd, h0 + first_match, -1)
    first_empty = jnp.min(jnp.where(~occ_w, pd_idx[None, :], pd), axis=1)
    # Oldest-stamped window slot (first index wins ties, like the loop).
    oldest_off = jnp.argmin(st_w, axis=1).astype(jnp.int32)
    cand = jnp.where(
        first_empty < pd, h0 + first_empty, h0 + oldest_off
    )
    return found, cand


def _segment_ranks(slots: jnp.ndarray) -> jnp.ndarray:
    """Within-group rank of each element among equal slot ids (order-stable).

    Sort by slot id; rank = position - start-of-segment; invert the sort.
    """
    n = slots.shape[0]
    order = jnp.argsort(slots, stable=True)
    sorted_slots = slots[order]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_slots[1:] != sorted_slots[:-1]]
    )
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, idx, 0))
    ranks_sorted = idx - seg_start
    ranks = jnp.zeros((n,), jnp.int32).at[order].set(ranks_sorted)
    return ranks


def insert(
    m: VoxelHashMap,
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: VoxelMapConfig,
    dedup: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
) -> VoxelHashMap:
    """Batched map insert (replaces IVox::AddPoints, ivox3d.h:256-281).

    Three phases, all static-shape:
      1. claim: unresolved voxels race for hash slots over `claim_rounds`
         rounds; scatter-min arbitrates; losers re-probe (their probe then
         sees the winner's key). New/evicted slots reset. With
         cfg.lookup_unique_cap the claim/probe rounds run per UNIQUE scan
         voxel (5-15x fewer probe rows; pass a precomputed `dedup` triple
         from `unique_voxels` to share the sort with other phases).
      2. rank: points targeting the same voxel get conflict-free slab
         offsets via a stable sort + segment-rank pass.
      3. scatter: one scatter writes all points; one scatter-add updates
         counts; stamps refresh to the current epoch (LRU touch).

    Points that exceed a voxel's slab capacity are dropped (the scan was
    voxel-downsampled first, so slabs hold multi-scan history like iVox).
    Points whose voxel overflowed the unique cap are dropped for that scan
    (same overflow semantics as the lookups).
    """
    n = pts.shape[0]
    vox = voxel_coord(pts, cfg.resolution)
    ids = jnp.arange(n, dtype=jnp.int32)
    cap_u = cfg.lookup_unique_cap
    use_dedup = bool(cap_u) and (cap_u < n or dedup is not None)

    if use_dedup:
        if dedup is None:
            dedup = unique_voxels(vox, mask, cap_u)
        uvox, _, inv = dedup
        u = uvox.shape[0]
        # A shared dedup may have been built with a WIDER mask (the gate's)
        # — only voxels holding at least one point accepted by THIS mask
        # may claim slots (the per-point path claims only masked points).
        uvalid = jnp.zeros((u,), bool).at[
            jnp.where(mask & (inv < u), inv, u)
        ].set(True, mode="drop")
        uids = jnp.arange(u, dtype=jnp.int32)

        def claim_round(_, m):
            found, cand = probe(m, uvox, cfg)
            need = uvalid & (found < 0)
            # Arbitrate: lowest unique-id wins each contested slot.
            claim = jnp.full((cfg.capacity,), INT32_MAX, dtype=jnp.int32)
            claim = claim.at[jnp.where(need, cand, cfg.capacity)].min(
                uids, mode="drop"
            )
            winner = need & (claim[cand] == uids)
            wslot = jnp.where(winner, cand, cfg.capacity)
            keys = m.keys.at[wslot].set(uvox, mode="drop")
            occupied = m.occupied.at[wslot].set(True, mode="drop")
            counts = m.counts.at[wslot].set(0, mode="drop")
            stamps = m.stamps.at[wslot].set(m.epoch, mode="drop")
            surf_n = m.surf_n.at[wslot].set(0.0, mode="drop")
            surf_s1 = m.surf_s1.at[wslot].set(0.0, mode="drop")
            surf_s2 = m.surf_s2.at[wslot].set(0.0, mode="drop")
            return m._replace(
                keys=keys, occupied=occupied, counts=counts, stamps=stamps,
                surf_n=surf_n, surf_s1=surf_s1, surf_s2=surf_s2,
            )

        m = jax.lax.fori_loop(0, cfg.claim_rounds, claim_round, m)
        found_u, _ = probe(m, uvox, cfg)
        inv_c = jnp.minimum(inv, uvox.shape[0] - 1)
        found = jnp.where(inv < uvox.shape[0], found_u[inv_c], -1)
        ok = mask & (found >= 0)
    else:

        def claim_round(_, m):
            found, cand = probe(m, vox, cfg)
            need = mask & (found < 0)
            # Arbitrate: lowest point-id wins each contested candidate slot.
            claim = jnp.full((cfg.capacity,), INT32_MAX, dtype=jnp.int32)
            claim = claim.at[jnp.where(need, cand, cfg.capacity)].min(
                ids, mode="drop"
            )
            winner = need & (claim[cand] == ids)
            wslot = jnp.where(winner, cand, cfg.capacity)
            keys = m.keys.at[wslot].set(vox, mode="drop")
            occupied = m.occupied.at[wslot].set(True, mode="drop")
            counts = m.counts.at[wslot].set(0, mode="drop")  # reset on claim
            stamps = m.stamps.at[wslot].set(m.epoch, mode="drop")
            surf_n = m.surf_n.at[wslot].set(0.0, mode="drop")
            surf_s1 = m.surf_s1.at[wslot].set(0.0, mode="drop")
            surf_s2 = m.surf_s2.at[wslot].set(0.0, mode="drop")
            return m._replace(
                keys=keys, occupied=occupied, counts=counts, stamps=stamps,
                surf_n=surf_n, surf_s1=surf_s1, surf_s2=surf_s2,
            )

        m = jax.lax.fori_loop(0, cfg.claim_rounds, claim_round, m)
        found, _ = probe(m, vox, cfg)
        ok = mask & (found >= 0)
    slot = jnp.where(ok, found, cfg.capacity)  # out-of-range -> dropped

    ranks = _segment_ranks(jnp.where(ok, found, -1 - ids))  # unique ids for invalid
    dest = m.counts[jnp.clip(slot, 0, cfg.capacity - 1)] + ranks
    ok = ok & (dest < cfg.max_points)
    slot = jnp.where(ok, slot, cfg.capacity)

    dest_c = jnp.clip(dest, 0, cfg.max_points - 1)
    points = m.points.at[slot, dest_c].set(pts, mode="drop")
    # Per-point insert epoch: exact segment attribution for reanchor (a
    # revisited voxel's slab holds points registered under DIFFERENT poses;
    # a per-voxel stamp would move the whole slab by the newest segment's
    # correction — measured up to the full drift magnitude of error on the
    # early points).
    slot_stamps = m.slot_stamps.at[slot, dest_c].set(m.epoch, mode="drop")
    added = jnp.zeros((cfg.capacity,), jnp.int32).at[slot].add(
        ok.astype(jnp.int32), mode="drop"
    )
    counts = jnp.minimum(m.counts + added, cfg.max_points)
    stamps = m.stamps.at[slot].set(m.epoch, mode="drop")

    # Surfel moments accumulate EVERY accepted-voxel point (even beyond the
    # slab cap): the per-voxel plane keeps refining with history. Moments
    # are kept in voxel-LOCAL coordinates — with world coordinates the
    # covariance subtraction cancels catastrophically in f32 (|p|^2 ~ 1e2+
    # vs plane-thickness variance ~1e-4).
    surf_slot = jnp.where(mask & (found >= 0), found, cfg.capacity)
    w = (surf_slot < cfg.capacity).astype(pts.dtype)
    if cfg.surfel_freeze_n > 0.0:
        n_cur = m.surf_n[jnp.clip(surf_slot, 0, cfg.capacity - 1)]
        w = w * jnp.clip(1.0 - n_cur / cfg.surfel_freeze_n, 0.0, 1.0)
    pts_l = pts - voxel_corner(vox, cfg.resolution, pts.dtype)
    surf_n, surf_s1, surf_s2 = m.surf_n, m.surf_s1, m.surf_s2
    if cfg.surfel_decay < 1.0:
        touched = jnp.zeros((cfg.capacity,), bool).at[surf_slot].set(
            True, mode="drop"
        )
        g = jnp.where(touched, jnp.asarray(cfg.surfel_decay, pts.dtype), 1.0)
        surf_n = surf_n * g
        surf_s1 = surf_s1 * g[:, None]
        surf_s2 = surf_s2 * g[:, None, None]
    surf_n = surf_n.at[surf_slot].add(w, mode="drop")
    surf_s1 = surf_s1.at[surf_slot].add(pts_l * w[:, None], mode="drop")
    surf_s2 = surf_s2.at[surf_slot].add(
        pts_l[:, :, None] * pts_l[:, None, :] * w[:, None, None], mode="drop"
    )
    return m._replace(
        points=points, counts=counts, stamps=stamps, slot_stamps=slot_stamps,
        epoch=m.epoch + 1,
        surf_n=surf_n, surf_s1=surf_s1, surf_s2=surf_s2,
    )


def nearby_offsets(nearby_type: int) -> Tuple[Tuple[int, int, int], ...]:
    """Neighbor-voxel stencils (parity with IVox::GenerateNearbyGrids,
    ivox3d.h:211-254): center + 6 faces (+12 edges) (+8 corners)."""
    center = [(0, 0, 0)]
    faces = [
        (-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1)
    ]
    edges = [
        (1, 1, 0), (-1, 1, 0), (1, -1, 0), (-1, -1, 0),
        (1, 0, 1), (-1, 0, 1), (1, 0, -1), (-1, 0, -1),
        (0, 1, 1), (0, -1, 1), (0, 1, -1), (0, -1, -1),
    ]
    corners = [
        (1, 1, 1), (-1, 1, 1), (1, -1, 1), (1, 1, -1),
        (-1, -1, 1), (-1, 1, -1), (1, -1, -1), (-1, -1, -1),
    ]
    if nearby_type == 0:
        return tuple(center)
    if nearby_type == 6:
        return tuple(center + faces)
    if nearby_type == 18:
        return tuple(center + faces + edges)
    if nearby_type == 26:
        return tuple(center + faces + edges + corners)
    raise ValueError(f"nearby_type must be 0/6/18/26, got {nearby_type}")


def knn(
    m: VoxelHashMap,
    queries: jnp.ndarray,
    cfg: VoxelMapConfig,
    k: int = 5,
    max_dist2: float = 25.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """k nearest map points for each query (replaces IVox::GetClosestPoint,
    ivox3d.h:133-209).

    Scans the neighbor-voxel stencil one voxel-offset at a time, keeping a
    running top-k (bounds peak memory at N x (k + max_points) candidates
    instead of N x stencil x max_points).

    Returns (neighbors (N,k,3), d2 (N,k), valid (N,k)).
    """
    n = queries.shape[0]
    s = cfg.max_points
    vox_q = voxel_coord(queries, cfg.resolution)
    dtype = queries.dtype

    best_d2 = jnp.full((n, k), jnp.inf, dtype=dtype)
    best_pts = jnp.zeros((n, k, 3), dtype=dtype)

    # One batched probe for the whole stencil (fewer, larger gathers).
    offs = jnp.asarray(nearby_offsets(cfg.nearby_type), jnp.int32)
    n_off = offs.shape[0]
    vox_all = (vox_q[None, :, :] + offs[:, None, None, :]).reshape(-1, 3)
    found_all, _ = probe(m, vox_all, cfg)
    found_all = found_all.reshape(n_off, n)

    slot_arange = jnp.arange(s, dtype=jnp.int32)
    for j in range(n_off):
        found = found_all[j]
        has = found >= 0
        slot = jnp.clip(found, 0, cfg.capacity - 1)
        cnt = jnp.where(has, m.counts[slot], 0)  # (N,)
        cand = m.points[slot]  # (N, S, 3)
        cand_valid = slot_arange[None, :] < cnt[:, None]  # (N, S)
        d2 = jnp.sum((cand - queries[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(cand_valid, d2, jnp.inf)
        # Merge with running best-k.
        all_d2 = jnp.concatenate([best_d2, d2], axis=1)
        all_pts = jnp.concatenate([best_pts, cand], axis=1)
        neg_top, top_idx = jax.lax.top_k(-all_d2, k)
        best_d2 = -neg_top
        best_pts = jnp.take_along_axis(all_pts, top_idx[:, :, None], axis=1)

    valid = best_d2 <= max_dist2
    return best_pts, best_d2, valid


def unique_voxels(
    vox: jnp.ndarray, mask: jnp.ndarray, cap: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deduplicate (N, 3) voxel coords into a static-size unique table.

    Returns (uvox (cap, 3), uvalid (cap,), inv (N,)): uvox[inv[i]] is
    point i's voxel; inv == cap for masked-out points and for points whose
    voxel fell beyond the cap (callers treat those as lookup misses).
    Sort-based (one lexsort + segment scan), same machinery as
    ops.voxelize.voxel_downsample.
    """
    n = vox.shape[0]
    vox_m = jnp.where(mask[:, None], vox, jnp.iinfo(jnp.int32).max)
    order = jnp.lexsort((vox_m[:, 2], vox_m[:, 1], vox_m[:, 0]))
    vox_s = vox_m[order]
    mask_s = mask[order]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(vox_s[1:] != vox_s[:-1], axis=-1)]
    ) & mask_s
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    seg = jnp.where(mask_s & (seg >= 0) & (seg < cap), seg, cap)
    uvox = jnp.zeros((cap, 3), jnp.int32).at[seg].set(vox_s, mode="drop")
    uvalid = jnp.zeros((cap,), bool).at[seg].set(True, mode="drop")
    inv = jnp.full((n,), cap, jnp.int32).at[order].set(seg)
    return uvox, uvalid, inv


def slab_insert_gate(
    m: VoxelHashMap,
    pts_world: jnp.ndarray,
    pts_mask: jnp.ndarray,
    cfg: VoxelMapConfig,
    filter_size_map: float,
    k_full: int = 5,
    dedup: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Map-insert gate from the point's OWN voxel slab (no kNN).

    Same three conditions as the reference's map_incremental
    (laser_mapping.cpp:344-380) — no neighbors / nearest neighbor outside
    the point's filter-voxel / no stored point closer to the filter-voxel
    center — but the neighbor set is the point's map-voxel slab instead of
    a 19-voxel kNN: ONE probe + ONE sliced slab gather for the whole scan.
    Near map-voxel boundaries a closer neighbor in the adjacent voxel is
    missed (resolution >> filter_size_map, so this is rare) and the point
    is inserted anyway — a few extra near-duplicates, bounded by the slab
    cap; the kNN gate cost ~20 probe+slab passes per scan for the same
    decision. Used by the surfel pipeline (the p2pl path reuses the
    iterated update's own kNN cache at zero extra cost)."""
    n = pts_world.shape[0]
    vox = voxel_coord(pts_world, cfg.resolution)
    cap_u = cfg.lookup_unique_cap
    if cap_u and (cap_u < n or dedup is not None):
        # Probe once per unique voxel (pass `dedup` to share the sort with
        # the insert that follows).
        if dedup is None:
            dedup = unique_voxels(vox, pts_mask, cap_u)
        uvox, _, inv = dedup
        found_u, _ = probe(m, uvox, cfg)
        inv_c = jnp.minimum(inv, uvox.shape[0] - 1)
        found = jnp.where(inv < uvox.shape[0], found_u[inv_c], -1)
    else:
        found, _ = probe(m, vox, cfg)
    has = found >= 0
    slot = jnp.clip(found, 0, cfg.capacity - 1)
    cnt = jnp.where(has, m.counts[slot], 0)
    slab = m.points[slot]  # (N, S, 3)
    valid = jnp.arange(cfg.max_points, dtype=jnp.int32)[None, :] < cnt[:, None]

    center = (
        jnp.floor(pts_world / filter_size_map) + 0.5
    ) * filter_size_map
    d2 = jnp.sum((slab - pts_world[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    j = jnp.argmin(d2, axis=1)
    nn = jnp.take_along_axis(slab, j[:, None, None], axis=1)[:, 0, :]
    has_nbr = jnp.any(valid, axis=1)
    outside = jnp.all(
        jnp.abs(nn - center) > 0.5 * filter_size_map, axis=-1
    )
    dist_self = jnp.sum((pts_world - center) ** 2, axis=-1)
    dist_nbrs = jnp.where(
        valid, jnp.sum((slab - center[:, None, :]) ** 2, axis=-1), jnp.inf
    )
    nbr_closer = jnp.any(dist_nbrs < dist_self[:, None] + 1e-6, axis=1)
    full_k = cnt >= k_full
    need_add = ~(full_k & nbr_closer)
    return pts_mask & (~has_nbr | outside | need_add)


class SurfelResult(NamedTuple):
    """Per-query surfel plane + confidence info.

    min_eig (plane-thickness variance) and n_pts (accumulated moment count)
    feed the measurement-noise inflation in the surfel innovation: young /
    thick surfels get downweighted instead of hard-gated (ROADMAP item 0).
    """

    normal: jnp.ndarray  # (N, 3) unit plane normal (0 when invalid)
    d: jnp.ndarray  # (N,) plane offset: n.x + d = 0
    valid: jnp.ndarray  # (N,) bool
    min_eig: jnp.ndarray  # (N,) smallest covariance eigenvalue
    n_pts: jnp.ndarray  # (N,) accumulated moment count of the voxel


def surfel_candidate(
    m: VoxelHashMap,
    queries: jnp.ndarray,
    cfg: VoxelMapConfig,
    min_points: float = 6.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pick, among the query voxel and its 6 face neighbors, the populated
    voxel (>= min_points moments) whose mean is nearest the query.

    Returns (best_d2, best_slot, has). Probes only THIS arena — under map
    sharding each device calls this on its local shard and the results are
    merged across devices by min best_d2 (parallel.sharded_surfel_lookup).
    """
    n = queries.shape[0]
    dtype = queries.dtype
    vox_q = voxel_coord(queries, cfg.resolution)

    cap = cfg.lookup_unique_cap
    if cap and cap < n:
        # Dedup path: a 65k-point scan occupies only ~3-10k distinct map
        # voxels, and every point in a voxel would probe the SAME stencil
        # — probe once per unique voxel and map results back with one row
        # gather. The winner among the stencil's candidates is chosen by
        # distance from the VOXEL CENTER (per-voxel) instead of from each
        # query point (per-point); candidates' means are >= one resolution
        # apart, so the choice only differs for points near voxel borders
        # (agreement-tested; overall ATE unchanged on the e2e suites).
        uvox, uvalid, inv = unique_voxels(vox_q, jnp.ones((n,), bool), cap)
        ucenter = voxel_corner(uvox, cfg.resolution, dtype) + 0.5 * cfg.resolution
        ud2, uslot, uhas = _stencil_candidate(
            m, uvox, ucenter, uvalid, cfg, min_points, dtype
        )
        inv_c = jnp.minimum(inv, cap - 1)
        ok = inv < cap
        has = ok & uhas[inv_c]
        best_slot = jnp.where(has, uslot[inv_c], 0)
        best_d2 = jnp.where(has, ud2[inv_c], jnp.inf)
        return best_d2, best_slot, has

    return _stencil_candidate(
        m, vox_q, queries, jnp.ones((n,), bool), cfg, min_points, dtype
    )


def _stencil_candidate(
    m: VoxelHashMap,
    vox_q: jnp.ndarray,
    ref_pts: jnp.ndarray,
    valid_q: jnp.ndarray,
    cfg: VoxelMapConfig,
    min_points: float,
    dtype,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-query stencil probe + nearest-valid-mean winner (one batched
    probe + one batched moment gather for the whole stencil)."""
    n = vox_q.shape[0]
    offs = jnp.asarray(nearby_offsets(6), jnp.int32)  # (7, 3)
    vox_all = (vox_q[None, :, :] + offs[:, None, None, :]).reshape(-1, 3)
    found, _ = probe(m, vox_all, cfg)  # (7N,)
    slot = jnp.clip(found, 0, cfg.capacity - 1)
    cnt = jnp.where(found >= 0, m.surf_n[slot], 0.0)
    ok = (cnt >= min_points) & jnp.tile(valid_q, offs.shape[0])
    # moments are voxel-local; reconstruct the world mean
    mean = (
        m.surf_s1[slot] / jnp.maximum(cnt, 1.0)[:, None]
        + voxel_corner(m.keys[slot], cfg.resolution, dtype)
    )
    d2 = jnp.sum((mean.reshape(-1, n, 3) - ref_pts[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(ok.reshape(-1, n), d2, jnp.inf)  # (7, N)
    # Winner = nearest valid mean; first offset wins ties (same order as
    # the sequential-scan formulation: strict < keeps the earlier offset).
    best_off = jnp.argmin(d2, axis=0)  # (N,)
    best_d2 = jnp.take_along_axis(d2, best_off[None, :], axis=0)[0]
    best_slot = jnp.take_along_axis(
        slot.reshape(-1, n), best_off[None, :], axis=0
    )[0]
    has = jnp.isfinite(best_d2)
    best_slot = jnp.where(has, best_slot, 0)
    return best_d2, best_slot, has


def surfel_plane(
    m: VoxelHashMap,
    slot: jnp.ndarray,
    has: jnp.ndarray,
    cfg: VoxelMapConfig,
    planarity_max: float = 0.01,
) -> SurfelResult:
    """Plane parameters from a voxel slot's running moments: mean +
    smallest-eigenvector normal of the moment covariance."""
    dtype = m.points.dtype
    cnt = jnp.maximum(m.surf_n[slot], 1.0)
    mean_l = m.surf_s1[slot] / cnt[:, None]
    mean = mean_l + voxel_corner(m.keys[slot], cfg.resolution, dtype)
    cov = (
        m.surf_s2[slot] / cnt[:, None, None]
        - mean_l[:, :, None] * mean_l[:, None, :]
    )
    cov = cov + jnp.eye(3, dtype=dtype) * 1e-9
    # Analytic 3x3 eigendecomposition (ops.linalg.eigh3_smallest):
    # jnp.linalg.eigh is iterative and ~1000x slower on TPU at this batch.
    from fastlivo_tpu.ops import linalg as _linalg

    min_eig, normal = _linalg.eigh3_smallest(cov)
    d = -jnp.sum(normal * mean, axis=-1)
    valid = has & (min_eig <= planarity_max)
    normal = jnp.where(valid[:, None], normal, 0.0)
    d = jnp.where(valid, d, 0.0)
    return SurfelResult(
        normal=normal, d=d, valid=valid,
        min_eig=jnp.where(has, min_eig, jnp.inf),
        n_pts=m.surf_n[slot] * has.astype(dtype),
    )


def surfel_lookup(
    m: VoxelHashMap,
    queries: jnp.ndarray,
    cfg: VoxelMapConfig,
    min_points: float = 6.0,
    planarity_max: float = 0.01,
) -> SurfelResult:
    """Per-query surfel plane from the running voxel moments — the
    Surfel-LIO-style fast path: NO kNN, NO per-scan plane fits; one probe
    per stencil voxel + a batched 3x3 eigendecomposition. With
    cfg.lookup_unique_cap the whole chain (probe, winner, moments, eigh)
    runs once per UNIQUE scan voxel and fans back out with one row gather.
    """
    n = queries.shape[0]
    cap = cfg.lookup_unique_cap
    if cap and cap < n:
        dtype = queries.dtype
        vox_q = voxel_coord(queries, cfg.resolution)
        uvox, uvalid, inv = unique_voxels(vox_q, jnp.ones((n,), bool), cap)
        ucenter = (
            voxel_corner(uvox, cfg.resolution, dtype) + 0.5 * cfg.resolution
        )
        _, uslot, uhas = _stencil_candidate(
            m, uvox, ucenter, uvalid, cfg, min_points, dtype
        )
        ures = surfel_plane(m, uslot, uhas, cfg, planarity_max)
        inv_c = jnp.minimum(inv, cap - 1)
        ok = inv < cap
        return SurfelResult(
            normal=jnp.where(ok[:, None], ures.normal[inv_c], 0.0),
            d=jnp.where(ok, ures.d[inv_c], 0.0),
            valid=ok & ures.valid[inv_c],
            min_eig=jnp.where(ok, ures.min_eig[inv_c], jnp.inf),
            n_pts=jnp.where(ok, ures.n_pts[inv_c], 0.0),
        )
    _, best_slot, has = surfel_candidate(m, queries, cfg, min_points)
    return surfel_plane(m, best_slot, has, cfg, planarity_max)


# ---------------------------------------------------------------------------
# Sharded-arena collectives (map partitioned across a mesh axis)
#
# Voxel ownership is hash-partitioned (`owner_of`): each device's local
# arena stores ONLY the voxels it owns, so per-device map memory is
# capacity_global / n_devices and grows with the mesh — the reference's
# central scaling structure (include/ivox3d/ivox3d.h:37-105) lifted to a
# device mesh. Queries are replicated (the scan is ~100s of KB); each
# device resolves lookups against its shard (non-owned voxels are simply
# absent from its table) and results are merged with collectives:
#   surfel:   min-reduction on candidate distance (2 pmins + 1 psum)
#   kNN:      all_gather of per-shard top-k + local re-top-k
# Inserts are shard-local: each device scatters only the points whose
# voxel it owns. This is the "halo exchange" of the BASELINE north star in
# its TPU-native form: instead of exchanging boundary voxels (meaningless
# under hash partitioning), the small query set is replicated and the
# per-shard partial results ride one fused all-reduce over ICI.
# ---------------------------------------------------------------------------


def owned_mask(
    pts: jnp.ndarray, resolution: float, axis_name: str
) -> jnp.ndarray:
    """True for points whose voxel this device owns."""
    vox = voxel_coord(pts, resolution)
    ndev = jax.lax.axis_size(axis_name)
    return owner_of(vox, ndev) == jax.lax.axis_index(axis_name)


def sharded_insert(
    m: VoxelHashMap,
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: VoxelMapConfig,
    axis_name: str,
    dedup: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
) -> VoxelHashMap:
    """Shard-local insert: every device sees the FULL gated scan (pts/mask
    replicated) and scatters only its owned voxels into its local arena.
    `insert` re-derives per-voxel validity from the narrowed mask, so a
    shared (replicated) dedup triple is safe to pass through."""
    return insert(
        m, pts, mask & owned_mask(pts, cfg.resolution, axis_name), cfg,
        dedup=dedup,
    )


def sharded_surfel_lookup(
    m: VoxelHashMap,
    queries: jnp.ndarray,
    cfg: VoxelMapConfig,
    axis_name: str,
    min_points: float = 6.0,
    planarity_max: float = 0.01,
) -> SurfelResult:
    """Surfel lookup over a sharded arena. `queries` must be REPLICATED
    across the axis; the result is replicated too.

    Each device finds its best local candidate voxel and computes its plane
    locally (only the owner has the voxel's moments); the global winner per
    query is the candidate with minimal mean-distance, merged with two
    pmins (value + owner tie-break) and one psum of the winner's payload.
    """
    n = queries.shape[0]
    dtype = queries.dtype
    best_d2, best_slot, has = surfel_candidate(m, queries, cfg, min_points)
    res = surfel_plane(m, best_slot, has, cfg, planarity_max)

    d2m = jnp.where(has, best_d2, jnp.inf)
    gmin = jax.lax.pmin(d2m, axis_name)
    ndev = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    # Tie-break equal distances deterministically by lowest device index
    # (two shards can't own the same voxel, but two distinct voxels can tie).
    contender = jnp.where((d2m == gmin) & has, my, ndev)
    gidx = jax.lax.pmin(contender, axis_name)
    win = (contender == gidx) & (gidx < ndev)

    payload = jnp.concatenate(
        [
            res.normal,
            res.d[:, None],
            res.valid.astype(dtype)[:, None],
            jnp.where(jnp.isfinite(res.min_eig), res.min_eig, 0.0)[:, None],
            res.n_pts[:, None],
        ],
        axis=1,
    )
    payload = jnp.where(win[:, None], payload, 0.0)
    merged = jax.lax.psum(payload, axis_name)
    any_win = jax.lax.psum(win.astype(jnp.int32), axis_name) > 0
    return SurfelResult(
        normal=merged[:, 0:3],
        d=merged[:, 3],
        valid=(merged[:, 4] > 0.5) & any_win,
        min_eig=jnp.where(any_win, merged[:, 5], jnp.inf),
        n_pts=merged[:, 6],
    )


def sharded_knn(
    m: VoxelHashMap,
    queries: jnp.ndarray,
    cfg: VoxelMapConfig,
    axis_name: str,
    k: int = 5,
    max_dist2: float = 25.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """kNN over a sharded arena. `queries` replicated across the axis;
    result replicated. Per-shard top-k then an all_gather + re-top-k merge
    (k*ndev candidates/query ride the interconnect, not raw slabs)."""
    pts_l, d2_l, _ = knn(m, queries, cfg, k=k, max_dist2=max_dist2)
    # (ndev, N, k...) -> (N, ndev*k...)
    d2_all = jnp.moveaxis(jax.lax.all_gather(d2_l, axis_name), 0, 1)
    pts_all = jnp.moveaxis(jax.lax.all_gather(pts_l, axis_name), 0, 1)
    n = queries.shape[0]
    d2_all = d2_all.reshape(n, -1)
    pts_all = pts_all.reshape(n, -1, 3)
    neg_top, idx = jax.lax.top_k(-d2_all, k)
    best_d2 = -neg_top
    best_pts = jnp.take_along_axis(pts_all, idx[:, :, None], axis=1)
    return best_pts, best_d2, best_d2 <= max_dist2


def reanchor(
    m: VoxelHashMap,
    cfg: VoxelMapConfig,
    seg_of_epoch: jnp.ndarray,
    rots: jnp.ndarray,
    trans: jnp.ndarray,
    chunk: int = 65536,
    axis_name: str | None = None,
) -> VoxelHashMap:
    """Rigidly re-anchor the live arena after a loop correction.

    The reference (like upstream FAST-LIVO) only corrects the EXPORTED
    trajectory — its live map keeps the drift (laser_mapping.cpp:1181-1215).
    This goes further: every stored point is moved by its insertion
    segment's correction p' = R_seg p + t_seg and the arena is rebuilt
    (points change voxels under the correction, so a full re-hash insert is
    required). Attribution is EXACT PER POINT: the arena records each point
    slot's insert epoch (slot_stamps), so a voxel revisited across segments
    (the common loop-closure case — same geometry seen before and after
    drift accumulated) has each of its points moved by the segment it was
    actually registered under. (An earlier design attributed whole voxels
    by their last LRU touch, which mis-corrects every earlier point in a
    revisited slab by up to the full drift magnitude —
    tests/test_reanchor.py::test_reanchor_revisited_voxel_exact covers the
    regression.) Surfel moments are rebuilt from the re-inserted slab
    points (moment history beyond the slab cap is reset; it re-matures in
    a few scans).

    Args:
      seg_of_epoch: (E,) int32 mapping insert-epoch -> correction segment
        (E > max stored stamp; typically one segment per keyframe span).
      rots/trans: (K, 3, 3), (K, 3) rigid corrections per segment
        (corrected = R @ drifted + t).
      axis_name: under shard_map with a hash-partitioned arena, the mesh
        axis the map shards over. The correction moves points ACROSS voxel
        boundaries, so a point's corrected voxel may belong to a different
        owner — each transformed chunk is all-gathered over the axis and
        re-inserted shard-locally (owned voxels only), so no point is
        dropped on an ownership change. Epochs advance identically on
        every shard (same n_chunks), keeping the shards' LRU clocks in
        lockstep.
    """
    c, s = cfg.capacity, cfg.max_points
    chunk = min(chunk, c * s)
    slot_valid = (
        jnp.arange(s, dtype=jnp.int32)[None, :] < m.counts[:, None]
    ) & m.occupied[:, None]

    n_chunks = -(-(c * s) // chunk)
    pad = n_chunks * chunk - c * s
    flat_pts = jnp.pad(m.points.reshape(c * s, 3), ((0, pad), (0, 0)))
    flat_ok = jnp.pad(slot_valid.reshape(c * s), (0, pad))
    flat_ep = jnp.pad(m.slot_stamps.reshape(c * s), (0, pad))

    fresh = make_map(cfg, m.points.dtype)._replace(epoch=m.epoch)

    def body(i, fresh):
        p_chunk = jax.lax.dynamic_slice_in_dim(flat_pts, i * chunk, chunk)
        ok_chunk = jax.lax.dynamic_slice_in_dim(flat_ok, i * chunk, chunk)
        ep_chunk = jax.lax.dynamic_slice_in_dim(flat_ep, i * chunk, chunk)
        # Per-point rigid correction (transform INSIDE the chunk loop: a
        # materialized (C, S, 3, 3) rotation gather would be ~3x the arena).
        seg = seg_of_epoch[jnp.clip(ep_chunk, 0, seg_of_epoch.shape[0] - 1)]
        p_chunk = (
            jnp.einsum("nij,nj->ni", rots[seg], p_chunk) + trans[seg]
        )
        if axis_name is not None:
            p_chunk = jax.lax.all_gather(p_chunk, axis_name, tiled=True)
            ok_chunk = jax.lax.all_gather(ok_chunk, axis_name, tiled=True)
            return sharded_insert(fresh, p_chunk, ok_chunk, cfg, axis_name)
        return insert(fresh, p_chunk, ok_chunk, cfg)

    return jax.lax.fori_loop(0, n_chunks, body, fresh)


def num_occupied(m: VoxelHashMap) -> jnp.ndarray:
    return jnp.sum(m.occupied.astype(jnp.int32))


def num_points(m: VoxelHashMap) -> jnp.ndarray:
    return jnp.sum(m.counts)
