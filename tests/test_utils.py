"""Timing, checkpoint/resume, and config loading."""

import numpy as np
import jax.numpy as jnp

from fastlivo_tpu.utils import checkpoint, timing
from fastlivo_tpu.utils.config import FastLivoConfig, apply_reference_yaml


def test_stage_timer(tmp_path):
    t = timing.StageTimer()
    for i in range(3):
        with t.stage("propagate"):
            pass
        with t.stage("update"):
            pass
        t.tick(float(i))
    s = t.summary()
    assert s["propagate"]["n"] == 3
    p = tmp_path / "times.csv"
    t.write_csv(str(p))
    lines = p.read_text().splitlines()
    assert len(lines) == 4
    assert "propagate" in lines[0]
    assert "update" in t.report()


def test_checkpoint_roundtrip(tmp_path):
    from fastlivo_tpu.models.pipeline import LivoPipeline

    cfg = FastLivoConfig()
    cfg.lio.max_points = 512
    cfg.map.capacity = 1 << 10
    cfg.vio.max_visual_points = 256
    cfg.imu.imu_int_frame = 8

    pipe = LivoPipeline(cfg)
    pipe.initializer.done = True
    pipe.state = pipe.state._replace(pos=jnp.asarray([1.0, 2.0, 3.0]))
    pipe.map = pipe.map._replace(counts=pipe.map.counts.at[7].set(5))
    pipe.trajectory = [(0.1, np.zeros(3), np.array([1.0, 0, 0, 0]))]
    pipe.first_scan = False

    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_pipeline(path, pipe, meta={"scan_index": 42})

    pipe2 = LivoPipeline(cfg)
    meta = checkpoint.load_pipeline(path, pipe2)
    assert meta["scan_index"] == 42
    np.testing.assert_allclose(np.asarray(pipe2.state.pos), [1.0, 2.0, 3.0])
    assert int(pipe2.map.counts[7]) == 5
    assert not pipe2.first_scan
    assert pipe2.initializer.done
    assert len(pipe2.trajectory) == 1


def test_reference_yaml_mapping():
    cfg = FastLivoConfig()
    tree = {
        "point_filter_num": 2,
        "max_iteration": 7,
        "filter_size_surf": 0.25,
        "img_enable": 0,
        "grid_size": 32,
        "preprocess": {"lidar_type": 3, "blind": 0.8},
        "mapping": {
            "extrinsic_T": [0.1, 0.2, 0.3],
            "extrinsic_R": [1, 0, 0, 0, 1, 0, 0, 0, 1],
        },
        "camera": {"fx": 123.0, "Rcl": [0, 1, 0, -1, 0, 0, 0, 0, 1]},
        "gnss": {"gnss_en": True, "outlier_gate_m": 3.0},
    }
    apply_reference_yaml(cfg, tree)
    assert cfg.preprocess.point_filter_num == 2
    assert cfg.lio.max_iteration == 7
    assert cfg.lio.filter_size_surf == 0.25
    assert cfg.vio.img_enable is False
    assert cfg.vio.grid_size == 32
    assert cfg.preprocess.lidar_type == 3
    assert cfg.preprocess.blind == 0.8
    assert cfg.extrinsics.extrinsic_t == (0.1, 0.2, 0.3)
    assert cfg.camera.fx == 123.0
    assert cfg.camera.rcl == (0, 1, 0, -1, 0, 0, 0, 0, 1)
    assert cfg.gnss.gnss_en is True


def test_health_gate_rejects_divergence(rng):
    """A pathological update (empty map -> then absurd innovation via a
    corrupted scan) must not produce a >1 m jump; the health gate falls
    back to propagation."""
    import jax.numpy as jnp
    from fastlivo_tpu.models.pipeline import LivoPipeline, ScanInput
    from fastlivo_tpu.models.imu import ImuWindow

    cfg = FastLivoConfig()
    cfg.lio.max_points = 512
    cfg.map.capacity = 1 << 10
    cfg.imu.imu_int_frame = 8
    pipe = LivoPipeline(cfg)
    pipe.initializer.done = True
    pipe.state = pipe.initializer.initial_state()

    def make_scan(pts):
        n = len(pts)
        return ScanInput(
            pts=jnp.asarray(pts, jnp.float32),
            t_offs=jnp.asarray(np.linspace(0, 0.09, n), jnp.float32),
            mask=jnp.ones(n, bool),
            imu=ImuWindow(
                stamps=jnp.asarray(np.linspace(0, 0.1, 8), jnp.float32),
                gyr=jnp.zeros((8, 3), jnp.float32),
                acc=jnp.tile(jnp.asarray([0, 0, 9.81], jnp.float32), (8, 1)),
                mask=jnp.ones(8, bool),
            ),
            t_end=jnp.float32(0.1),
            acc_scale=jnp.float32(1.0),
        )

    room = rng.uniform(-4, 4, (512, 3)).astype(np.float32)
    room[:, 2] = -1.2
    pipe.process_scan(make_scan(room), 0.1)  # bootstrap
    pipe.process_scan(make_scan(room), 0.2)  # normal update
    p_before = np.asarray(pipe.state.pos).copy()
    map_pts_before = int(np.asarray(pipe.map.counts).sum())
    cloud_before = np.asarray(pipe.world_cloud).copy()
    # corrupted scan: all points shifted 5 m -> would yield a huge jump
    pipe.process_scan(make_scan(room + np.float32([5.0, 0, 0])), 0.3)
    jump = np.linalg.norm(np.asarray(pipe.state.pos) - p_before)
    assert jump < 1.5, jump
    assert pipe.health["rejected"] >= 1 or jump < 1.0
    if pipe.health["rejected"] >= 1:
        # A rejected update must leave the map arena and the world cloud
        # untouched (ADVICE r1): no misregistered points may persist.
        assert int(np.asarray(pipe.map.counts).sum()) == map_pts_before
        np.testing.assert_array_equal(np.asarray(pipe.world_cloud), cloud_before)
