"""Loop-corrected map re-anchoring (vm.reanchor + pipeline.reanchor_map):
points inserted under a drifted segment must land exactly where a
drift-free insert would have put them."""

import numpy as np
import jax
import jax.numpy as jnp

from fastlivo_tpu.maps import voxel_map as vm

CFG = vm.VoxelMapConfig(resolution=0.25, capacity=1 << 14, max_points=16)


def _keyset(m):
    k = np.asarray(m.keys)[np.asarray(m.occupied)]
    return set(map(tuple, k.tolist()))


def _cloud(rng, n, lo=-3.0, hi=3.0):
    return rng.uniform(lo, hi, (n, 3)).astype(np.float32)


def test_reanchor_moves_drifted_segment_home(rng):
    ins = jax.jit(vm.insert, static_argnames="cfg")

    # Disjoint segment regions (the easy case; the revisited-voxel case is
    # covered by test_reanchor_revisited_voxel_exact below).
    a = _cloud(rng, 2000, -3.0, 0.5)
    b_true = _cloud(rng, 2000, 1.5, 6.0)
    # Segment 1 drifted: the filter registered b at a pose offset by
    # (R_drift, t_drift); correction = inverse of the drift.
    th = 0.05
    r_drift = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
        np.float32,
    )
    t_drift = np.array([0.8, -0.4, 0.1], np.float32)
    b_drifted = b_true @ r_drift.T + t_drift

    m = vm.make_map(CFG)
    m = ins(m, jnp.asarray(a), jnp.ones(len(a), bool), CFG)  # epoch 0
    m = ins(m, jnp.asarray(b_drifted), jnp.ones(len(b_true), bool), CFG)  # 1

    # Correction: segment 0 identity, segment 1 undoes the drift.
    r_corr = np.stack([np.eye(3, dtype=np.float32), r_drift.T])
    t_corr = np.stack(
        [np.zeros(3, np.float32), -r_drift.T @ t_drift]
    )
    seg_of_epoch = jnp.asarray([0, 1], jnp.int32)
    m2 = jax.jit(vm.reanchor, static_argnames=("cfg", "chunk"))(
        m, CFG, seg_of_epoch, jnp.asarray(r_corr), jnp.asarray(t_corr)
    )

    # Reference: the map that a drift-free run would have built.
    m_ref = vm.make_map(CFG)
    m_ref = ins(m_ref, jnp.asarray(a), jnp.ones(len(a), bool), CFG)
    m_ref = ins(m_ref, jnp.asarray(b_true), jnp.ones(len(b_true), bool), CFG)

    k2, kref = _keyset(m2), _keyset(m_ref)
    assert len(k2 & kref) >= 0.995 * len(k2 | kref)
    p2, pref = int(vm.num_points(m2)), int(vm.num_points(m_ref))
    assert abs(p2 - pref) <= max(4, pref // 200)

    # And the stored coordinates themselves moved home: every re-anchored
    # point must be (near-)exactly in the drift-free cloud.
    pts2 = np.asarray(m2.points).reshape(-1, 3)
    cnt_mask = (
        np.arange(CFG.max_points)[None, :] < np.asarray(m2.counts)[:, None]
    ).reshape(-1)
    pts2 = pts2[cnt_mask]
    full = np.concatenate([a, b_true])
    from scipy.spatial import cKDTree

    d, _ = cKDTree(full).query(pts2, k=1)
    assert np.quantile(d, 0.99) < 1e-3


def test_reanchor_revisited_voxel_exact(rng):
    """The loop-closure stress case: the SAME region is observed both
    before drift accumulated (segment 0, registered correctly) and after
    (segment 1, registered under a drifted pose) — so individual voxel
    slabs hold points from BOTH segments. Per-point slot_stamps attribute
    each point to its own insert epoch, so the correction is exact; the
    earlier per-voxel last-touch attribution moved segment-0 points in
    revisited slabs by the full segment-1 correction (~0.9 m here),
    which this test would catch (p99 would sit at the drift magnitude,
    not 1e-3)."""
    # Own arena config: 40k points over ~22k distinct voxels needs slack
    # (the module-level CFG's 16384 slots would sit at >100% load and the
    # bounded-probe table would legitimately evict — not what is under
    # test here).
    cfg = vm.VoxelMapConfig(resolution=0.25, capacity=1 << 16, max_points=16)
    ins = jax.jit(vm.insert, static_argnames="cfg")

    # Both segments observe the SAME cube of space, densely enough that
    # most voxels hold points from BOTH segments (20k points over ~14k
    # voxels; 3k-point clouds are 1-point-per-voxel sparse and barely mix).
    a = _cloud(rng, 20000, -3.0, 3.0)  # segment 0: drift-free
    b_true = _cloud(rng, 20000, -3.0, 3.0)  # segment 1: same region
    th = 0.05
    r_drift = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
        np.float32,
    )
    t_drift = np.array([0.8, -0.4, 0.1], np.float32)
    b_drifted = b_true @ r_drift.T + t_drift

    m = vm.make_map(cfg)
    m = ins(m, jnp.asarray(a), jnp.ones(len(a), bool), cfg)  # epoch 0
    m = ins(m, jnp.asarray(b_drifted), jnp.ones(len(b_true), bool), cfg)  # 1

    # Most occupied voxels must actually hold points from both segments
    # (otherwise this test degenerates to the disjoint case).
    ss = np.asarray(m.slot_stamps)
    cnts = np.asarray(m.counts)
    valid = np.arange(cfg.max_points)[None, :] < cnts[:, None]
    has0 = ((ss == 0) & valid).any(axis=1)
    has1 = ((ss == 1) & valid).any(axis=1)
    assert (has0 & has1).sum() > 0.3 * max(has0.sum(), 1)

    r_corr = np.stack([np.eye(3, dtype=np.float32), r_drift.T])
    t_corr = np.stack([np.zeros(3, np.float32), -r_drift.T @ t_drift])
    m2 = jax.jit(vm.reanchor, static_argnames=("cfg", "chunk"))(
        m, cfg, jnp.asarray([0, 1], jnp.int32),
        jnp.asarray(r_corr), jnp.asarray(t_corr),
    )

    pts2 = np.asarray(m2.points).reshape(-1, 3)
    cnt_mask = (
        np.arange(cfg.max_points)[None, :] < np.asarray(m2.counts)[:, None]
    ).reshape(-1)
    pts2 = pts2[cnt_mask]
    full = np.concatenate([a, b_true])
    from scipy.spatial import cKDTree

    d, _ = cKDTree(full).query(pts2, k=1)
    assert np.quantile(d, 0.99) < 1e-3, (
        f"p99 reanchor error {np.quantile(d, 0.99):.3f} m"
    )
    # Essentially no points dropped by the rebuild.
    assert int(vm.num_points(m2)) >= 0.98 * int(vm.num_points(m))


def test_pipeline_reanchor_smoke():
    """Out-and-back street drive with the loop backend: reanchor_map runs,
    keeps the arena finite/populated, and only fires when loops exist."""
    import jax.numpy as jnp

    from fastlivo_tpu.io import synthetic
    from fastlivo_tpu.models.pipeline import LivoPipeline
    from fastlivo_tpu.utils.config import FastLivoConfig
    from tests.test_pipeline_e2e import run_pipeline

    seq = synthetic.generate_street(duration=6.0, seed=4)
    cfg = FastLivoConfig()
    cfg.lio.max_points = 4096
    cfg.map.capacity = 1 << 14
    cfg.imu.imu_int_frame = 32
    cfg.loop.loop_en = True
    cfg.loop.sub_frame_num = 5
    pipe, est = run_pipeline(seq, cfg)

    occ_before = int(vm.num_occupied(pipe.map))
    fired = pipe.reanchor_map()
    if not pipe.loop_backend.loops:
        assert not fired
        return
    assert fired
    occ_after = int(vm.num_occupied(pipe.map))
    assert occ_after > 0.5 * occ_before
    assert bool(jnp.all(jnp.isfinite(pipe.map.points)))
