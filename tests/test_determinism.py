"""Bitwise run-to-run determinism: the same measurement log must produce the
identical trajectory (the reference is nondeterministic by construction —
OpenMP accumulation order, SURVEY.md §7 'numerical parity')."""

import numpy as np
import jax.numpy as jnp

from fastlivo_tpu.io import synthetic
from fastlivo_tpu.io.sync import MeasurementSynchronizer, WindowBuilder
from fastlivo_tpu.models.pipeline import LivoPipeline
from fastlivo_tpu.utils.config import FastLivoConfig


def run_once(seq):
    cfg = FastLivoConfig()
    cfg.lio.max_points = 4096
    cfg.map.capacity = 1 << 14
    cfg.imu.imu_int_frame = 32
    pipe = LivoPipeline(cfg)
    pipe.initializer.done = True
    pipe.initializer.mean_acc = np.array([0.0, 0.0, 9.81])
    pipe.initializer.mean_gyr = np.zeros(3)
    pipe.state = pipe.initializer.initial_state()
    sync = MeasurementSynchronizer()
    builder = WindowBuilder(n_pts=8192, imu_window=32)
    it = iter(seq.imu)
    pending = next(it)
    out = []
    for scan in seq.scans:
        sync.push_lidar(scan)
        while pending is not None and pending.stamp < scan.end_time + 0.05:
            sync.push_imu(pending)
            pending = next(it, None)
        g = sync.next_group()
        if g is None:
            continue
        si, t = builder.build(g)
        si = si._replace(acc_scale=np.float32(1.0))
        if pipe.process_scan(si, t) is not None:
            out.append(np.asarray(pipe.state.pos).copy())
    return np.asarray(out)


def test_bitwise_deterministic():
    seq = synthetic.generate(
        duration=2.0, imu_rate=100.0, scan_rate=10.0, pts_per_scan=4000, seed=9
    )
    a = run_once(seq)
    b = run_once(seq)
    assert a.shape == b.shape and a.shape[0] >= 10
    np.testing.assert_array_equal(a, b)
