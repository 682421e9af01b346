"""lio_scan_multi (K scans per dispatch) must reproduce K sequential
lio_scan_step calls exactly — same trajectory, same map."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fastlivo_tpu.maps import voxel_map as vm
from fastlivo_tpu.models import pipeline as pl_mod
from fastlivo_tpu.state import NavState
from tests.test_sharded import _room_scan, _scan_input

I3 = jnp.eye(3, dtype=jnp.float32)
Z3 = jnp.zeros(3, jnp.float32)

CFG = pl_mod.StepConfig(
    map_cfg=vm.VoxelMapConfig(
        resolution=0.5, capacity=1 << 13, max_points=16, nearby_type=18
    ),
    ds_capacity=2048,
    imu_window=8,
    ds_leaf=0.2,
)


def test_scan_batch_equals_sequential(rng):
    k_batch = 4
    scans = [
        _scan_input(_room_scan(rng, 4096, pose=(0.05 * k, 0.0, 0.0)), rng)
        for k in range(k_batch + 1)
    ]
    state0 = NavState.identity()._replace(cov=jnp.eye(18) * 1e-4)
    m0 = vm.make_map(CFG.map_cfg)
    m0 = jax.jit(pl_mod.bootstrap_map, static_argnames=("cfg", "axis_name"))(
        m0, scans[0], state0, I3, Z3, CFG
    )

    # Sequential reference.
    step = jax.jit(pl_mod.lio_scan_step, static_argnames=("cfg", "axis_name"))
    st, m = state0, m0
    seq_summaries = []
    for sc in scans[1:]:
        st, m, info, (p_w, msk), summary = step(st, m, sc, I3, Z3, CFG)
        seq_summaries.append(np.asarray(summary))

    # One batched dispatch.
    multi = jax.jit(
        pl_mod.lio_scan_multi, static_argnames=("cfg", "axis_name")
    )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans[1:])
    st_b, m_b, summaries, (clouds, masks) = multi(state0, m0, stacked, I3, Z3, CFG)

    np.testing.assert_array_equal(np.asarray(st_b.pos), np.asarray(st.pos))
    np.testing.assert_array_equal(np.asarray(st_b.rot), np.asarray(st.rot))
    np.testing.assert_array_equal(np.asarray(st_b.cov), np.asarray(st.cov))
    np.testing.assert_array_equal(
        np.asarray(summaries), np.stack(seq_summaries)
    )
    np.testing.assert_array_equal(np.asarray(m_b.points), np.asarray(m.points))
    np.testing.assert_array_equal(np.asarray(m_b.counts), np.asarray(m.counts))
    np.testing.assert_array_equal(np.asarray(clouds[-1]), np.asarray(p_w))
    np.testing.assert_array_equal(np.asarray(masks[-1]), np.asarray(msk))


def test_pipeline_scan_batch_matches_unbatched():
    """End-to-end: LivoPipeline with lio.scan_batch=4 produces the same
    trajectory as scan_batch=1 on the same synthetic sequence."""
    from fastlivo_tpu.io import synthetic
    from fastlivo_tpu.utils.config import FastLivoConfig
    from tests.test_pipeline_e2e import run_pipeline

    seq = synthetic.generate(
        duration=3.0, imu_rate=100.0, scan_rate=10.0, pts_per_scan=3000, seed=3
    )

    def drive(batch):
        cfg = FastLivoConfig()
        cfg.lio.max_points = 4096
        cfg.map.capacity = 1 << 14
        cfg.imu.imu_int_frame = 32
        cfg.lio.scan_batch = batch
        pipe, _ = run_pipeline(seq, cfg)
        pipe.flush_scans()
        return np.asarray([p for _, p, _ in pipe.trajectory])

    t1 = drive(1)
    t4 = drive(4)
    t0 = drive(0)  # fetch-free mode: flush only at finish()
    assert len(t1) == len(t4) and len(t1) >= 20
    np.testing.assert_allclose(t4, t1, atol=1e-6)
    assert len(t0) == len(t1)
    np.testing.assert_allclose(t0, t1, atol=1e-6)


def test_pipeline_livo_batch_matches_unbatched():
    """LIVO (interleaved scan-end + image-bounded updates) with
    lio.scan_batch=4 must reproduce the unbatched trajectory: VIO
    dispatches chain into the pending queue (vio_scan_step's packed
    summary) and drain at flush — no host fetch between measurements."""
    from fastlivo_tpu.io import synthetic
    from tests.test_livo_e2e import CAM, drive_livo, make_cfg

    seq = synthetic.generate(
        duration=2.0,
        imu_rate=100.0,
        scan_rate=10.0,
        pts_per_scan=4000,
        seed=5,
        n_boxes=0,
        camera=CAM,
        cam_rate=10.0,
        cam_offset=0.055,
    )

    def drive(batch):
        cfg = make_cfg()
        cfg.lio.max_points = 4096
        cfg.map.capacity = 1 << 14
        cfg.lio.scan_batch = batch
        pipe, _, _, _ = drive_livo(seq, cfg)
        pipe.flush_scans()
        ts = np.asarray([t for t, _, _ in pipe.trajectory])
        ps = np.asarray([p for _, p, _ in pipe.trajectory])
        return ts, ps

    ts1, p1 = drive(1)
    ts4, p4 = drive(4)
    ts0, p0 = drive(0)  # fetch-free mode (clouds not retained)
    # Both scan-end AND image-bounded entries, in the same order.
    assert len(ts1) == len(ts4) and len(ts1) >= 30
    np.testing.assert_allclose(ts4, ts1)
    np.testing.assert_allclose(p4, p1, atol=1e-6)
    np.testing.assert_allclose(ts0, ts1)
    np.testing.assert_allclose(p0, p1, atol=1e-6)
