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
