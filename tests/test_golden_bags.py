"""Wire-format fidelity on GOLDEN bag fixtures the repo's reader did not
write: hand-assembled byte-exact rosbag V2.0 containers + ROS1 message
payloads (tests/fixtures/make_golden_bags.py builds them directly from the
container/serialization specs; the .bag binaries are committed). Covers a
bz2-compressed multi-connection chunk, a livox CustomMsg with non-zero
timebase (incl. the zero-header-stamp driver quirk), and a big-endian
PointCloud2 — plus end-to-end decode through preprocess (the reference's
velodyne handler stores MICROSECOND time fields, preprocess.cpp:588)."""

import os

import numpy as np
import pytest

from fastlivo_tpu.io import rosbag as RB
from fastlivo_tpu.io import preprocess as PP
from fastlivo_tpu.utils.config import LidarParams

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _load(name):
    return np.load(os.path.join(FIX, name))


def test_bz2_multiconnection_chunk_roundtrip():
    exp = _load("velodyne_bz2_expected.npz")
    msgs = list(RB.read_bag(os.path.join(FIX, "velodyne_bz2.bag")))
    assert [m[0] for m in msgs] == [
        "/imu/data", "/velodyne_points", "/imu/data"
    ]
    assert msgs[1][1] == "sensor_msgs/PointCloud2"

    t, gyr, acc = RB.parse_imu(msgs[0][3])
    np.testing.assert_allclose(t, exp["stamp_imu1"], atol=1e-9)
    np.testing.assert_allclose(gyr, exp["gyr1"])
    np.testing.assert_allclose(acc, exp["acc1"])
    _, gyr2, _ = RB.parse_imu(msgs[2][3])
    np.testing.assert_allclose(gyr2, exp["gyr2"])

    t, fields = RB.parse_pointcloud2(msgs[1][3])
    np.testing.assert_allclose(t, exp["stamp_cloud"], atol=1e-9)
    for k in ("x", "y", "z", "intensity"):
        np.testing.assert_array_equal(fields[k], exp[k])
    np.testing.assert_array_equal(fields["ring"], exp["ring"])
    np.testing.assert_array_equal(fields["time"], exp["time_us"])

    # Bag-record times (u64 = secs | nsecs<<32) must match header stamps.
    np.testing.assert_allclose(msgs[1][2], exp["stamp_cloud"], atol=1e-9)


def test_velodyne_us_time_decodes_to_ms_offsets():
    """End-to-end: golden cloud -> decode_velodyne. The time field is in
    MICROSECONDS (the unit the reference's curvature = time*1e-3 assumes);
    the decoder must auto-detect and produce ms offsets."""
    exp = _load("velodyne_bz2_expected.npz")
    _, _, _, raw = list(RB.read_bag(os.path.join(FIX, "velodyne_bz2.bag")))[1]
    t, fields = RB.parse_pointcloud2(raw)
    params = LidarParams(blind=0.1, max_range=100.0, point_filter_num=1)
    scan = PP.decode_velodyne(t, fields, params)
    want_ms = np.sort(exp["time_us"].astype(np.float64) * 1e-3)
    np.testing.assert_allclose(scan.t_offs_ms, want_ms, rtol=1e-6)
    assert len(scan.pts) == len(exp["x"])


def test_livox_custommsg_timebase():
    exp = _load("livox_timebase_expected.npz")
    msgs = list(RB.read_bag(os.path.join(FIX, "livox_timebase.bag")))
    assert len(msgs) == 2 and msgs[0][1].endswith("CustomMsg")

    t1, f1 = RB.parse_livox_custommsg(msgs[0][3])
    np.testing.assert_allclose(t1, exp["stamp1"], atol=1e-6)
    np.testing.assert_array_equal(
        np.stack([f1["x"], f1["y"], f1["z"]], 1), exp["pts"]
    )
    np.testing.assert_array_equal(f1["offset_time"], exp["offset_ns"])
    np.testing.assert_array_equal(f1["tag"], exp["tag"])
    np.testing.assert_array_equal(f1["line"], exp["line"])

    # Zero header stamp -> the non-zero timebase is the scan time.
    t2, _ = RB.parse_livox_custommsg(msgs[1][3])
    np.testing.assert_allclose(t2, float(exp["timebase2"]) * 1e-9, rtol=0,
                               atol=1e-6)

    # End-to-end avia decode: blind gate drops the 5 cm return, the tag
    # gate drops tag=0x20 (reference preprocess.cpp:306-316).
    params = LidarParams(blind=0.5, max_range=100.0, point_filter_num=1)
    scan = PP.decode_avia(t1, f1, params)
    assert len(scan.pts) == 3
    np.testing.assert_allclose(
        scan.t_offs_ms, np.array([0.0, 25.0, 50.0]), atol=1e-6
    )


def test_bigendian_pointcloud2():
    exp = _load("bigendian_expected.npz")
    (_, _, _, raw), = list(RB.read_bag(os.path.join(FIX, "bigendian_cloud.bag")))
    t, fields = RB.parse_pointcloud2(raw)
    assert t == 7.0
    for k in ("x", "y", "z", "intensity"):
        np.testing.assert_array_equal(fields[k], exp[k])
    np.testing.assert_array_equal(fields["ring"], exp["ring"])
    np.testing.assert_array_equal(fields["time"], exp["time_s"])
    # decode: seconds-unit time field auto-detects.
    params = LidarParams(blind=0.1, max_range=100.0, point_filter_num=1)
    scan = PP.decode_velodyne(t, fields, params)
    keep = exp["ring"] < 16
    np.testing.assert_allclose(
        scan.t_offs_ms,
        np.sort(exp["time_s"][keep].astype(np.float64) * 1e3),
        rtol=1e-6,
    )


def test_golden_bags_regenerate_deterministically(tmp_path):
    """The committed binaries are exactly what the (independent) generator
    produces — anyone can audit/regenerate them."""
    import importlib.util
    import shutil

    spec = importlib.util.spec_from_file_location(
        "make_golden_bags", os.path.join(FIX, "make_golden_bags.py")
    )
    mod = importlib.util.module_from_spec(spec)
    # Run the generator into a scratch dir by patching its HERE.
    spec.loader.exec_module(mod)
    mod.HERE = str(tmp_path)
    mod.main()
    for name in ("velodyne_bz2.bag", "livox_timebase.bag",
                 "bigendian_cloud.bag"):
        with open(os.path.join(FIX, name), "rb") as a, open(
            tmp_path / name, "rb"
        ) as b:
            assert a.read() == b.read(), name
