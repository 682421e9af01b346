"""Voxel-hash map: insert + kNN property tests vs brute force."""

import numpy as np
import jax
import jax.numpy as jnp

from fastlivo_tpu.maps import voxel_map as vm

CFG = vm.VoxelMapConfig(resolution=0.5, capacity=1 << 14, max_points=32, nearby_type=26)

# Eager op-by-op dispatch is pathologically slow on the forced-8-device CPU
# backend; always go through jit in tests.
jinsert = jax.jit(vm.insert, static_argnames="cfg")
jknn = jax.jit(vm.knn, static_argnames=("cfg", "k"))


def brute_knn(map_pts, queries, k):
    d2 = ((queries[:, None, :] - map_pts[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    return np.take_along_axis(d2, idx, axis=1)


def test_insert_and_count(rng):
    pts = rng.uniform(-5, 5, size=(1000, 3)).astype(np.float32)
    m = vm.make_map(CFG)
    m = jinsert(m, jnp.asarray(pts), jnp.ones(1000, bool), CFG)
    assert int(vm.num_points(m)) == 1000
    assert int(vm.num_occupied(m)) > 0


def test_insert_respects_mask(rng):
    pts = rng.uniform(-5, 5, size=(100, 3)).astype(np.float32)
    mask = np.zeros(100, bool)
    mask[:37] = True
    m = vm.make_map(CFG)
    m = jinsert(m, jnp.asarray(pts), jnp.asarray(mask), CFG)
    assert int(vm.num_points(m)) == 37


def test_knn_matches_brute_force(rng):
    # Dense cluster so all true neighbors lie within the 26-voxel stencil.
    pts = rng.uniform(-2, 2, size=(2000, 3)).astype(np.float32)
    m = vm.make_map(CFG)
    m = jinsert(m, jnp.asarray(pts), jnp.ones(2000, bool), CFG)

    queries = rng.uniform(-1.5, 1.5, size=(50, 3)).astype(np.float32)
    nbr, d2, valid = jknn(m, jnp.asarray(queries), CFG, k=5)
    assert bool(jnp.all(valid))

    ref_d2 = brute_knn(pts, queries, 5)
    np.testing.assert_allclose(np.sort(np.asarray(d2), axis=1), ref_d2, rtol=1e-4, atol=1e-5)


def test_knn_empty_map():
    m = vm.make_map(CFG)
    q = jnp.zeros((4, 3), jnp.float32)
    _, _, valid = jknn(m, q, CFG, k=5)
    assert not bool(jnp.any(valid))


def test_incremental_insert_accumulates(rng):
    m = vm.make_map(CFG)
    a = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    m = jinsert(m, jnp.asarray(a), jnp.ones(200, bool), CFG)
    m = jinsert(m, jnp.asarray(b), jnp.ones(200, bool), CFG)
    assert int(vm.num_points(m)) == 400

    all_pts = np.concatenate([a, b])
    q = rng.uniform(-0.5, 0.5, size=(20, 3)).astype(np.float32)
    _, d2, valid = jknn(m, jnp.asarray(q), CFG, k=5)
    ref = brute_knn(all_pts, q, 5)
    np.testing.assert_allclose(np.sort(np.asarray(d2), axis=1), ref, rtol=1e-4, atol=1e-5)


def test_voxel_slab_cap(rng):
    # More points in one voxel than max_points: the slab caps, no corruption.
    pts = (rng.uniform(0, 0.4, size=(100, 3))).astype(np.float32)
    m = vm.make_map(CFG)
    m = jinsert(m, jnp.asarray(pts), jnp.ones(100, bool), CFG)
    assert int(vm.num_points(m)) == CFG.max_points
    assert int(vm.num_occupied(m)) == 1


def test_lru_eviction_bounded():
    # Fill far beyond a tiny map's capacity; it must stay bounded and usable.
    small = vm.VoxelMapConfig(resolution=0.5, capacity=256, max_points=4, probe_depth=4)
    m = vm.make_map(small)
    rng = np.random.default_rng(0)
    for _ in range(5):
        pts = rng.uniform(-100, 100, size=(512, 3)).astype(np.float32)
        m = jinsert(m, jnp.asarray(pts), jnp.ones(512, bool), small)
    assert int(vm.num_occupied(m)) <= 256
    # Recent points should be findable.
    _, _, valid = jknn(m, jnp.asarray(pts[:10]), small, k=1)
    assert bool(jnp.any(valid))


def test_surfel_freeze_stops_moment_growth():
    """surfel_freeze_n: moment contributions fade to zero as a voxel's
    count approaches the freeze threshold (drift-anchoring knob)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastlivo_tpu.maps import voxel_map as vm

    cfg = vm.VoxelMapConfig(
        resolution=0.5, capacity=1 << 8, max_points=8,
        surfel_decay=1.0, surfel_freeze_n=20.0,
    )
    ins = jax.jit(vm.insert, static_argnames="cfg")
    rng = np.random.default_rng(0)
    # 10 points in one voxel per insert
    def batch(off):
        return jnp.asarray(
            (rng.uniform(0.1, 0.4, (10, 3)) + off).astype(np.float32)
        )

    m = vm.make_map(cfg)
    m = ins(m, batch(0.0), jnp.ones(10, bool), cfg)
    n1 = float(m.surf_n.max())
    assert 5.0 <= n1 <= 10.0  # first insert contributes ~fully
    for _ in range(10):
        m = ins(m, batch(0.0), jnp.ones(10, bool), cfg)
    n_mid = float(m.surf_n.max())
    assert n_mid <= cfg.surfel_freeze_n + 1e-3  # saturates at freeze_n
    m2 = ins(m, batch(0.0), jnp.ones(10, bool), cfg)
    assert float(m2.surf_n.max()) - n_mid < 0.5  # frozen: ~no growth

    # Disabled (freeze_n=0): count grows without bound.
    cfg0 = dataclasses.replace(cfg, surfel_freeze_n=0.0)
    m0 = vm.make_map(cfg0)
    for _ in range(12):
        m0 = ins(m0, batch(0.0), jnp.ones(10, bool), cfg0)
    assert float(m0.surf_n.max()) > 100.0
