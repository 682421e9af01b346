"""Measurement-log codec: write/read roundtrip, native vs Python parser
equivalence, decode-time filtering, and the native voxel mask."""

import numpy as np
import pytest

from fastlivo_tpu import native
from fastlivo_tpu.io import logio, synthetic
from fastlivo_tpu.io.sensors import ImageFrame, ImuSample, LidarScan


@pytest.fixture(scope="module")
def log_path(tmp_path_factory):
    seq = synthetic.generate(
        duration=1.0, imu_rate=100.0, scan_rate=10.0, pts_per_scan=2000, seed=4
    )
    path = str(tmp_path_factory.mktemp("logs") / "seq.flvo")
    logio.write_sequence(path, seq)
    return path, seq


def test_roundtrip(log_path):
    path, seq = log_path
    records = list(logio.read_log(path))
    imus = [r for r in records if isinstance(r, ImuSample)]
    scans = [r for r in records if isinstance(r, LidarScan)]
    assert len(imus) == len(seq.imu)
    assert len(scans) == len(seq.scans)
    np.testing.assert_allclose(imus[3].gyr, seq.imu[3].gyr, atol=1e-12)
    np.testing.assert_allclose(imus[3].acc, seq.imu[3].acc, atol=1e-12)
    # scans are re-sorted by time; compare as sets via sorted original
    orig = seq.scans[2].sort_by_time()
    got = next(s for s in scans if abs(s.stamp - orig.stamp) < 1e-9)
    np.testing.assert_allclose(got.pts, orig.pts, atol=1e-6)
    np.testing.assert_allclose(got.t_offs_ms, orig.t_offs_ms, atol=1e-4)


def test_native_matches_python(log_path):
    path, _ = log_path
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    with open(path, "rb") as f:
        buf = f.read()
    nat = list(logio._read_native(buf, lib, 0.5, 80.0, 2))
    py = list(logio._read_python(buf, 0.5, 80.0, 2))
    assert len(nat) == len(py)
    for a, b in zip(nat, py):
        assert type(a) is type(b)
        if isinstance(a, LidarScan):
            assert len(a.pts) == len(b.pts)
            np.testing.assert_allclose(a.pts, b.pts, atol=1e-6)
        elif isinstance(a, ImuSample):
            np.testing.assert_allclose(a.acc, b.acc)


def test_decode_filtering(log_path):
    path, _ = log_path
    full = [r for r in logio.read_log(path) if isinstance(r, LidarScan)]
    dec = [
        r
        for r in logio.read_log(path, point_filter_num=4)
        if isinstance(r, LidarScan)
    ]
    assert 0 < len(dec[0].pts) < len(full[0].pts)
    assert abs(len(dec[0].pts) - len(full[0].pts) / 4) < len(full[0].pts) * 0.1


def test_image_roundtrip(tmp_path):
    img = (np.random.default_rng(0).uniform(0, 255, (48, 64))).astype(np.float32)
    path = str(tmp_path / "img.flvo")
    with logio.LogWriter(path) as w:
        w.write_image(ImageFrame(stamp=1.5, img=img))
    rec = list(logio.read_log(path))
    assert len(rec) == 1
    np.testing.assert_allclose(rec[0].img, np.floor(img + 0.0).astype(np.uint8), atol=1.0)


def test_voxel_mask_native_vs_numpy(rng):
    pts = rng.uniform(-5, 5, (5000, 3)).astype(np.float32)
    m = native.voxel_mask(pts, 0.3)
    # exactly one selected point per occupied voxel
    key = np.floor(pts / 0.3).astype(np.int64)
    n_vox = len(np.unique(key, axis=0))
    assert m.sum() == n_vox
    sel_keys = key[m]
    assert len(np.unique(sel_keys, axis=0)) == m.sum()


def test_malformed_log_raises(tmp_path):
    p = tmp_path / "bad.flvo"
    p.write_bytes(b"NOPE" + b"\x00" * 100)
    with pytest.raises(ValueError):
        list(logio.read_log(str(p)))
