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


def test_surfel_lookup_dedup_agrees_with_per_point(rng):
    """The unique-voxel dedup path (lookup_unique_cap < N) must agree with
    the per-point path on everything except border points whose stencil
    winner legitimately differs (the dedup winner is chosen from the voxel
    CENTER): planes valid for the same >=97% of points, identical plane
    params wherever both picked the same slot."""
    import dataclasses

    cfg0 = vm.VoxelMapConfig(
        resolution=0.5, capacity=1 << 15, max_points=16, lookup_unique_cap=0
    )
    cfgd = dataclasses.replace(cfg0, lookup_unique_cap=2048)
    m = vm.make_map(cfg0)
    ins = jax.jit(vm.insert, static_argnames="cfg")
    # dense floor patch -> mature surfels. The plane sits MID-voxel
    # (z=0.25): a plane on a voxel boundary splits the z-noise Gaussian
    # into two half-truncated surfels with ~±0.8 sigma biased means, which
    # measures scene pathology, not the dedup approximation.
    for _ in range(4):
        pts = np.stack(
            [rng.uniform(-6, 6, 20000), rng.uniform(-6, 6, 20000),
             0.25 + 0.02 * rng.standard_normal(20000)], 1
        ).astype(np.float32)
        m = ins(m, jnp.asarray(pts), jnp.ones(len(pts), bool), cfg0)

    q = np.stack(
        [rng.uniform(-5, 5, 8192), rng.uniform(-5, 5, 8192),
         0.25 + 0.05 * rng.standard_normal(8192)], 1
    ).astype(np.float32)
    look0 = jax.jit(
        lambda mm, qq: vm.surfel_lookup(mm, qq, cfg0), static_argnames=()
    )
    lookd = jax.jit(lambda mm, qq: vm.surfel_lookup(mm, qq, cfgd))
    r0 = look0(m, jnp.asarray(q))
    rd = lookd(m, jnp.asarray(q))
    v0 = np.asarray(r0.valid)
    vd = np.asarray(rd.valid)
    assert v0.sum() > 6000
    agree = (v0 == vd).mean()
    assert agree > 0.97, f"validity agreement {agree:.3f}"
    both = v0 & vd
    # The chosen SLOT may legitimately differ (per-point winners often pick
    # a neighbor voxel whose mean is nearer the off-center point; the
    # dedup winner picks from the voxel center) — but on locally planar
    # geometry the resulting PLANES are interchangeable: the point-to-
    # plane residuals must agree to millimeters.
    r_pp0 = np.einsum("nc,nc->n", np.asarray(r0.normal), q) + np.asarray(r0.d)
    r_ppd = np.einsum("nc,nc->n", np.asarray(rd.normal), q) + np.asarray(rd.d)
    dres = np.abs(r_pp0 - r_ppd)[both]
    # Where the two paths pick DIFFERENT (coplanar-ish) voxels, the
    # residual difference is the plane-fit noise amplified by the lever
    # arm to the neighbor's center: with sigma_z=2 cm surfels that is
    # ~3-6 mm — real, bounded, and well inside the filter's measurement
    # sigma (the confidence weighting downweights exactly the noisy
    # fits). Gates: 90% of points within 1 cm, mean < 5 mm; the system
    # check is the surfel e2e ATE with dedup forced on (test_livo_e2e).
    frac = (dres < 1e-2).mean()
    assert frac > 0.90, f"same-constraint fraction {frac:.3f}"
    assert dres.mean() < 5e-3, f"mean residual diff {dres.mean():.4f} m"
