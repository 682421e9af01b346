"""Degenerate-input probes for the fused estimation core.

The failure modes a streaming production system actually hits: a dropout
frame (fully masked scan), garbage in the fixed-shape padding lanes (NaN
poisoning through 0 * NaN), an update before the map has any structure,
and unbounded growth under repeated insert. The reference crashes or
relies on PCL to filter these (preprocess.cpp blind/range gates); here
every one must leave the filter finite and the arenas bounded.
"""

import numpy as np
import jax
import jax.numpy as jnp

from fastlivo_tpu.maps import voxel_map as vm
from fastlivo_tpu.models import lio
from fastlivo_tpu.state import NavState

MAP_CFG = vm.VoxelMapConfig(
    resolution=0.5, capacity=1 << 14, max_points=16, nearby_type=6
)
LIO_CFG = lio.LioConfig(max_iteration=4)
I3 = jnp.eye(3, dtype=jnp.float32)
Z3 = jnp.zeros(3, jnp.float32)

jinsert = jax.jit(vm.insert, static_argnames="cfg")
jupdate = jax.jit(lio.lio_update, static_argnames=("map_cfg", "cfg"))


def _room(rng, n=3000):
    pts = []
    per = n // 5
    u = rng.uniform(-5, 5, size=(per, 2))
    pts.append(np.stack([u[:, 0], u[:, 1], np.full(per, -1.3)], axis=1))
    for axis, val in ((0, -5), (0, 5), (1, -5), (1, 5)):
        u = rng.uniform(-5, 5, size=(per, 2))
        w = np.zeros((per, 3))
        w[:, axis] = val
        w[:, (axis + 1) % 2] = u[:, 0]
        w[:, 2] = u[:, 1] + 5
        pts.append(w)
    return np.concatenate(pts).astype(np.float32)


def _finite_state(st):
    for leaf in (st.rot, st.pos, st.vel, st.bg, st.ba, st.grav, st.cov):
        assert bool(jnp.isfinite(leaf).all()), "non-finite state leaf"


def test_fully_masked_scan_is_noop(rng):
    m = jinsert(vm.make_map(MAP_CFG), jnp.asarray(_room(rng)),
                jnp.ones(3000, bool), MAP_CFG)
    prior = NavState.identity()._replace(pos=jnp.asarray([0.1, 0.2, 1.0]))
    scan = jnp.asarray(rng.uniform(-4, 4, (512, 3)).astype(np.float32))
    post, info, _ = jupdate(
        prior, m, scan, jnp.zeros(512, bool), I3, Z3, MAP_CFG, LIO_CFG
    )
    assert int(info.n_effective) == 0
    _finite_state(post)
    np.testing.assert_allclose(np.asarray(post.pos), np.asarray(prior.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(post.rot), np.asarray(prior.rot), atol=1e-5)


def test_nan_in_masked_padding_does_not_poison(rng):
    """Padding lanes carry NaN (as real decoders can produce): the update
    and the map insert must mask them out BEFORE any accumulation
    (0 * NaN = NaN otherwise poisons the einsum reductions)."""
    world = _room(rng)
    m = jinsert(vm.make_map(MAP_CFG), jnp.asarray(world),
                jnp.ones(len(world), bool), MAP_CFG)
    scan_world = _room(np.random.default_rng(5), n=1024)
    pos_t = np.array([0.2, -0.1, 1.1], np.float32)
    scan_body = scan_world - pos_t
    n = len(scan_body)
    pad = np.full((256, 3), np.nan, np.float32)
    pts = jnp.asarray(np.concatenate([scan_body, pad]))
    mask = jnp.asarray(np.r_[np.ones(n, bool), np.zeros(256, bool)])
    prior = NavState.identity()._replace(pos=jnp.asarray(pos_t + 0.03))

    post, info, _ = jupdate(prior, m, pts, mask, I3, Z3, MAP_CFG, LIO_CFG)
    assert int(info.n_effective) > 300
    _finite_state(post)
    assert np.linalg.norm(np.asarray(post.pos) - pos_t) < 0.05

    # Insert with NaN padding: the arena must stay finite.
    m2 = jinsert(m, pts, mask, MAP_CFG)
    occ = np.asarray(m2.counts > 0)
    slabs = np.asarray(m2.points)[occ]
    counts = np.asarray(m2.counts)[occ]
    for slab, c in zip(slabs, counts):
        assert np.isfinite(slab[: int(c)]).all(), "NaN leaked into the arena"
    assert np.isfinite(np.asarray(m2.surf_s1)).all(), "NaN in surfel moments"
    assert np.isfinite(np.asarray(m2.surf_s2)).all(), "NaN in surfel moments"


def test_update_against_empty_map_keeps_prior(rng):
    m = vm.make_map(MAP_CFG)
    prior = NavState.identity()._replace(pos=jnp.asarray([0.0, 0.0, 1.0]))
    scan = jnp.asarray(rng.uniform(-4, 4, (512, 3)).astype(np.float32))
    post, info, _ = jupdate(
        prior, m, scan, jnp.ones(512, bool), I3, Z3, MAP_CFG, LIO_CFG
    )
    assert int(info.n_effective) == 0
    _finite_state(post)
    np.testing.assert_allclose(np.asarray(post.pos), np.asarray(prior.pos), atol=1e-5)


def test_repeated_insert_bounded(rng):
    """Re-inserting the same scan many times must not grow slabs past
    max_points or corrupt counts (the LRU/cap behavior the reference gets
    from iVox's per-voxel list cap, ivox3d_node.hpp:39-62)."""
    m = vm.make_map(MAP_CFG)
    pts = jnp.asarray(_room(rng, n=2000))
    mask = jnp.ones(2000, bool)
    for _ in range(6):
        m = jinsert(m, pts, mask, MAP_CFG)
    counts = np.asarray(m.counts)
    assert (counts <= MAP_CFG.max_points).all()
    assert (counts >= 0).all()
    occ = counts > 0
    slabs = np.asarray(m.points)[occ]
    for slab, c in zip(slabs, counts[occ]):
        assert np.isfinite(slab[: int(c)]).all()
