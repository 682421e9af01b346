"""rosbag1 reader + bag->FLVO converter, round-tripped against a
synthetic bag written from first principles (no ROS).

Covers the container (chunked none/bz2 compression, connection records)
and the hand-written deserializers for Imu / PointCloud2 /
livox CustomMsg / Image against independently-serialized messages.
"""

import struct

import numpy as np
import pytest

from fastlivo_tpu.io import rosbag

_U32 = struct.Struct("<I")
_U64 = struct.Struct("<Q")


# --------------------------------------------------------------------------
# Minimal bag writer (the test's independent implementation of the format)
# --------------------------------------------------------------------------


def _hdr(fields: dict) -> bytes:
    out = b""
    for k, v in fields.items():
        item = k + b"=" + v
        out += _U32.pack(len(item)) + item
    return out


def _record(fields: dict, data: bytes) -> bytes:
    h = _hdr(fields)
    return _U32.pack(len(h)) + h + _U32.pack(len(data)) + data


def _ros_time(t: float) -> bytes:
    secs = int(t)
    nsecs = int(round((t - secs) * 1e9))
    return _U64.pack((nsecs << 32) | secs)


def _ros_header_msg(t: float, frame: bytes = b"f") -> bytes:
    secs = int(t)
    nsecs = int(round((t - secs) * 1e9))
    return (
        _U32.pack(7)  # seq
        + _U32.pack(secs)
        + _U32.pack(nsecs)
        + _U32.pack(len(frame))
        + frame
    )


def ser_imu(t: float, gyr, acc) -> bytes:
    out = _ros_header_msg(t)
    out += struct.pack("<4d", 0, 0, 0, 1) + struct.pack("<9d", *([0] * 9))
    out += struct.pack("<3d", *gyr) + struct.pack("<9d", *([0] * 9))
    out += struct.pack("<3d", *acc) + struct.pack("<9d", *([0] * 9))
    return out


def ser_pointcloud2(t: float, pts, intensity, ring, times) -> bytes:
    n = len(pts)
    fields = [
        (b"x", 0, 7, 1), (b"y", 4, 7, 1), (b"z", 8, 7, 1),
        (b"intensity", 12, 7, 1), (b"ring", 16, 4, 1), (b"time", 18, 7, 1),
    ]
    point_step = 22
    out = _ros_header_msg(t)
    out += _U32.pack(1) + _U32.pack(n)  # height, width
    out += _U32.pack(len(fields))
    for name, off, dt, cnt in fields:
        out += _U32.pack(len(name)) + name
        out += _U32.pack(off) + bytes([dt]) + _U32.pack(cnt)
    out += b"\x00"  # little endian
    out += _U32.pack(point_step) + _U32.pack(point_step * n)
    buf = np.zeros((n, point_step), np.uint8)
    buf[:, 0:12] = pts.astype("<f4").view(np.uint8).reshape(n, 12)
    buf[:, 12:16] = intensity.astype("<f4").view(np.uint8).reshape(n, 4)
    buf[:, 16:18] = ring.astype("<u2").view(np.uint8).reshape(n, 2)
    buf[:, 18:22] = times.astype("<f4").view(np.uint8).reshape(n, 4)
    out += _U32.pack(buf.size) + buf.tobytes()
    out += b"\x01"  # is_dense
    return out


def ser_custommsg(t: float, pts, offs_ns, refl, tag, line) -> bytes:
    n = len(pts)
    out = _ros_header_msg(t)
    out += _U64.pack(int(t * 1e9))  # timebase
    out += _U32.pack(n)
    out += bytes([0, 0, 0, 0])  # lidar_id + rsvd
    out += _U32.pack(n)
    rec = np.zeros(
        n,
        dtype=[
            ("offset_time", "<u4"), ("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
            ("reflectivity", "u1"), ("tag", "u1"), ("line", "u1"),
        ],
    )
    rec["offset_time"] = offs_ns
    rec["x"], rec["y"], rec["z"] = pts[:, 0], pts[:, 1], pts[:, 2]
    rec["reflectivity"], rec["tag"], rec["line"] = refl, tag, line
    out += rec.tobytes()
    return out


def ser_image(t: float, img: np.ndarray) -> bytes:
    h, w = img.shape
    enc = b"mono8"
    out = _ros_header_msg(t)
    out += _U32.pack(h) + _U32.pack(w)
    out += _U32.pack(len(enc)) + enc
    out += b"\x00" + _U32.pack(w)
    out += _U32.pack(h * w) + img.astype(np.uint8).tobytes()
    return out


def write_bag(path, messages, compression=b"none"):
    """messages: list of (topic, msg_type, t, raw)."""
    import bz2 as _bz2

    topics = {}
    chunk = b""
    for topic, msg_type, t, raw in messages:
        if topic not in topics:
            cid = len(topics)
            topics[topic] = cid
            conn_hdr = _hdr(
                {
                    b"type": msg_type.encode(),
                    b"md5sum": b"0" * 32,
                    b"message_definition": b"",
                }
            )
            chunk += _record(
                {b"op": b"\x07", b"conn": _U32.pack(cid),
                 b"topic": topic.encode()},
                conn_hdr,
            )
        chunk += _record(
            {b"op": b"\x02", b"conn": _U32.pack(topics[topic]),
             b"time": _ros_time(t)},
            raw,
        )
    if compression == b"bz2":
        data = _bz2.compress(chunk)
    elif compression == b"lz4":
        from fastlivo_tpu.io import lz4f

        data = lz4f.compress(chunk)
    else:
        data = chunk
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record({b"op": b"\x03", b"index_pos": _U64.pack(0),
                         b"conn_count": _U32.pack(len(topics)),
                         b"chunk_count": _U32.pack(1)}, b""))
        f.write(
            _record(
                {b"op": b"\x05", b"compression": compression,
                 b"size": _U32.pack(len(chunk))},
                data,
            )
        )


# --------------------------------------------------------------------------


def _make_messages(rng, use_custommsg):
    msgs = []
    t0 = 100.0
    for k in range(40):
        t = t0 + 0.005 * k
        msgs.append(
            ("/imu", "sensor_msgs/Imu", t,
             ser_imu(t, [0.01, 0.02, 0.03 + 0.001 * k], [0.1, 0.2, 9.81]))
        )
    for k in range(2):
        t = t0 + 0.1 * k
        n = 500
        pts = rng.uniform(1.0, 8.0, (n, 3)).astype(np.float32)
        if use_custommsg:
            raw = ser_custommsg(
                t, pts,
                offs_ns=np.linspace(0, 99e6, n).astype(np.uint32),
                refl=rng.integers(0, 255, n).astype(np.uint8),
                tag=np.zeros(n, np.uint8),
                line=rng.integers(0, 6, n).astype(np.uint8),
            )
            msgs.append(("/livox/lidar", "livox_ros_driver/CustomMsg", t, raw))
        else:
            raw = ser_pointcloud2(
                t, pts,
                intensity=rng.uniform(0, 255, n).astype(np.float32),
                ring=rng.integers(0, 16, n).astype(np.uint16),
                times=np.linspace(0, 0.099, n).astype(np.float32),
            )
            msgs.append(("/velodyne_points", "sensor_msgs/PointCloud2", t, raw))
    img = (rng.uniform(0, 255, (24, 32))).astype(np.uint8)
    msgs.append(("/camera/image", "sensor_msgs/Image", t0 + 0.05,
                 ser_image(t0 + 0.05, img)))
    msgs.sort(key=lambda m: m[2])
    return msgs, img


def test_lz4_frame_codec_roundtrip(rng):
    """The vendored pure-python LZ4 frame codec (io/lz4f.py): round-trips
    compressible, incompressible, overlapping-match and empty payloads,
    and rejects corruption via the content checksum."""
    from fastlivo_tpu.io import lz4f

    cases = [
        b"",
        b"a",
        b"abcabcabcabcabcabcabcabcabcabcabc",  # overlap (offset < matchlen)
        bytes(rng.integers(0, 256, 100000, dtype=np.uint8)),  # incompressible
        np.zeros(70000, np.uint8).tobytes(),  # long runs
        (b"lidar-imu-visual-odometry " * 4000),
        np.arange(30000, dtype=np.float32).tobytes(),
    ]
    for payload in cases:
        frame = lz4f.compress(payload)
        assert lz4f.decompress(frame) == payload
    # incompressible data must take the stored-block path, compressible
    # data must actually shrink
    assert len(lz4f.compress(cases[3])) >= len(cases[3])
    assert len(lz4f.compress(cases[5])) < len(cases[5]) // 4
    # corruption is caught (content checksum)
    frame = bytearray(lz4f.compress(cases[5]))
    frame[20] ^= 0xFF
    with pytest.raises(ValueError):
        lz4f.decompress(bytes(frame))


@pytest.mark.parametrize("compression", [b"none", b"bz2", b"lz4"])
def test_bag_reader_roundtrip(tmp_path, compression):
    rng = np.random.default_rng(0)
    msgs, _ = _make_messages(rng, use_custommsg=True)
    path = str(tmp_path / "t.bag")
    write_bag(path, msgs, compression)

    got = list(rosbag.read_bag(path))
    assert len(got) == len(msgs)
    for (topic, typ, t, raw), (gt_topic, gt_typ, gt_t, gt_raw) in zip(got, msgs):
        assert topic == gt_topic and typ == gt_typ
        assert abs(t - gt_t) < 1e-6
        assert raw == gt_raw


def test_parse_imu_and_custommsg():
    rng = np.random.default_rng(1)
    raw = ser_imu(123.456, [0.1, -0.2, 0.3], [1.0, 2.0, 9.0])
    t, gyr, acc = rosbag.parse_imu(raw)
    assert abs(t - 123.456) < 1e-6
    np.testing.assert_allclose(gyr, [0.1, -0.2, 0.3])
    np.testing.assert_allclose(acc, [1.0, 2.0, 9.0])

    pts = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    offs = np.arange(100, dtype=np.uint32) * 1000
    raw = ser_custommsg(7.0, pts, offs, np.ones(100, np.uint8),
                        np.zeros(100, np.uint8), np.zeros(100, np.uint8))
    t, fields = rosbag.parse_livox_custommsg(raw)
    assert abs(t - 7.0) < 1e-6
    np.testing.assert_allclose(fields["x"], pts[:, 0])
    np.testing.assert_array_equal(fields["offset_time"], offs)


def test_parse_pointcloud2_and_image():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-5, 5, (64, 3)).astype(np.float32)
    inten = rng.uniform(0, 100, 64).astype(np.float32)
    ring = rng.integers(0, 16, 64).astype(np.uint16)
    times = np.linspace(0, 0.09, 64).astype(np.float32)
    raw = ser_pointcloud2(3.5, pts, inten, ring, times)
    t, fields = rosbag.parse_pointcloud2(raw)
    assert abs(t - 3.5) < 1e-6
    np.testing.assert_allclose(fields["x"], pts[:, 0])
    np.testing.assert_allclose(fields["intensity"], inten)
    np.testing.assert_array_equal(fields["ring"], ring)
    np.testing.assert_allclose(fields["time"], times)

    img = rng.integers(0, 255, (16, 20)).astype(np.uint8)
    t, decoded = rosbag.parse_image(ser_image(2.0, img))
    np.testing.assert_allclose(decoded, img.astype(np.float32))


@pytest.mark.parametrize("use_custommsg,lidar_topic,lidar_type", [
    (True, "/livox/lidar", 1),
    (False, "/velodyne_points", 2),
])
def test_bag_to_flvo_roundtrip(tmp_path, use_custommsg, lidar_topic, lidar_type):
    from fastlivo_tpu.io import logio
    from fastlivo_tpu.io.sensors import ImageFrame, ImuSample, LidarScan

    rng = np.random.default_rng(3)
    msgs, img = _make_messages(rng, use_custommsg)
    bag = str(tmp_path / "t.bag")
    flvo = str(tmp_path / "t.flvo")
    write_bag(bag, msgs, b"bz2")

    counts = rosbag.bag_to_flvo(
        bag, flvo, lidar_topic=lidar_topic, imu_topic="/imu",
        img_topic="/camera/image", lidar_type=lidar_type,
    )
    assert counts == {"imu": 40, "scans": 2, "images": 1}

    n_imu = n_scan = n_img = 0
    for rec in logio.read_log(flvo):
        if isinstance(rec, ImuSample):
            n_imu += 1
            assert abs(rec.acc[2] - 9.81) < 1e-5
        elif isinstance(rec, LidarScan):
            n_scan += 1
            # default LidarParams decimate by point_filter_num=2
            assert len(rec.pts) > 200
            assert (np.diff(rec.t_offs_ms) >= 0).all()
        elif isinstance(rec, ImageFrame):
            n_img += 1
    assert (n_imu, n_scan, n_img) == (40, 2, 1)


def test_bag_to_pipeline_end_to_end(tmp_path):
    """The full real-data ingestion chain: a synthetic sequence serialized
    as a rosbag (livox CustomMsg + Imu), converted to FLVO, driven through
    the complete pipeline — must track ground truth. This is the bag-replay
    integration path the reference verifies manually (SURVEY.md section 4)."""
    from fastlivo_tpu.io import synthetic
    from fastlivo_tpu.run import run_log
    from fastlivo_tpu.utils.config import FastLivoConfig
    from fastlivo_tpu.utils.metrics import ate_rmse

    seq = synthetic.generate(
        duration=3.0, imu_rate=100.0, scan_rate=10.0, pts_per_scan=4000, seed=9
    )

    # Serialize as a bag: IMU messages + one CustomMsg per sweep.
    msgs = []
    for s in seq.imu:
        msgs.append(("/livox/imu", "sensor_msgs/Imu",
                     s.stamp, ser_imu(s.stamp, s.gyr, s.acc)))
    for scan in seq.scans:
        n = len(scan.pts)
        raw = ser_custommsg(
            scan.stamp, scan.pts,
            offs_ns=(scan.t_offs_ms.astype(np.float64) * 1e6).astype(np.uint32),
            refl=np.full(n, 100, np.uint8),
            tag=np.zeros(n, np.uint8),
            line=np.zeros(n, np.uint8),
        )
        msgs.append(("/livox/lidar", "livox_ros_driver/CustomMsg", scan.stamp, raw))
    msgs.sort(key=lambda m: m[2])
    bag = str(tmp_path / "seq.bag")
    write_bag(bag, msgs, b"bz2")

    flvo = str(tmp_path / "seq.flvo")
    from fastlivo_tpu.utils.config import LidarParams

    counts = rosbag.bag_to_flvo(
        bag, flvo, lidar_topic="/livox/lidar", imu_topic="/livox/imu",
        lidar_type=1, params=LidarParams(point_filter_num=1, blind=0.1),
    )
    assert counts["scans"] == len(seq.scans)

    cfg = FastLivoConfig()
    cfg.vio.img_enable = False
    cfg.lio.max_points = 8192
    cfg.map.capacity = 1 << 16
    cfg.imu.imu_int_frame = 32
    cfg.imu.init_count = 5
    cfg.lio.init_time = 0.3
    cfg.preprocess.point_filter_num = 1
    pipe = run_log(flvo, cfg, progress=False)
    est = np.asarray([p for _, p, _ in pipe.trajectory])
    stamps = np.asarray([t for t, _, _ in pipe.trajectory])
    assert len(est) > 15
    gt = np.stack(
        [seq.gt_pos[np.argmin(np.abs(seq.gt_stamps - t))] for t in stamps]
    )
    err = ate_rmse(est, gt)
    assert err < 0.10, f"bag->FLVO->pipeline ATE {err * 100:.1f} cm"
