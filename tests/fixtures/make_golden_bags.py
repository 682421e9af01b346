"""Generate the golden rosbag fixtures byte-by-byte from the rosbag V2.0
container spec and the ROS1 message serialization rules — INDEPENDENT of
fastlivo_tpu.io.rosbag (no imports from the package): these bags exercise
the reader against wire layouts it did not write itself.

Layouts follow http://wiki.ros.org/Bags/Format/2.0 as produced by the C++
rosbag writer: magic line, BagHeader record (padded), one or more Chunk
records (connection + message records inside, optionally bz2), IndexData
per connection, trailing Connection re-statements, ChunkInfo records.

Fixtures (deterministic, seeded):
- velodyne_bz2.bag    bz2-compressed chunk, TWO connections (Imu +
                      PointCloud2 with a `time` field in MICROSECONDS —
                      the unit the reference's curvature=time*1e-3 assumes,
                      preprocess.cpp:588), interleaved messages.
- livox_timebase.bag  livox_ros_driver/CustomMsg with NON-ZERO timebase;
                      one message also has a zero header stamp (some livox
                      drivers leave it unset — the timebase is then the
                      scan time).
- bigendian_cloud.bag PointCloud2 with is_bigendian=1.

Run: python tests/fixtures/make_golden_bags.py  (writes .bag + .npz here)
"""

import bz2
import os
import struct

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def fld(name: str, value: bytes) -> bytes:
    item = name.encode() + b"=" + value
    return struct.pack("<I", len(item)) + item


def u32(v):
    return struct.pack("<I", v)


def u64(v):
    return struct.pack("<Q", v)


def rostime(sec: int, nsec: int) -> bytes:
    """Bag record `time` field: u32 secs then u32 nsecs (low/high of u64)."""
    return struct.pack("<II", sec, nsec)


def record(header_fields: bytes, data: bytes) -> bytes:
    return u32(len(header_fields)) + header_fields + u32(len(data)) + data


def bag_header_record(index_pos: int, conn_count: int, chunk_count: int) -> bytes:
    h = (
        fld("op", b"\x03")
        + fld("index_pos", u64(index_pos))
        + fld("conn_count", u32(conn_count))
        + fld("chunk_count", u32(chunk_count))
    )
    # The C++ writer pads the bag header record to 4096 bytes with ' '.
    pad = 4096 - 4 - len(h) - 4
    return record(h, b" " * pad)


def connection_record(conn: int, topic: str, msg_type: str, md5: str) -> bytes:
    h = fld("op", b"\x07") + fld("conn", u32(conn)) + fld("topic", topic.encode())
    data = (
        fld("topic", topic.encode())
        + fld("type", msg_type.encode())
        + fld("md5sum", md5.encode())
        + fld("message_definition", b"# truncated for fixture\n")
        + fld("callerid", b"/fixture_writer")
    )
    return record(h, data)


def message_record(conn: int, sec: int, nsec: int, payload: bytes) -> bytes:
    h = (
        fld("op", b"\x02")
        + fld("conn", u32(conn))
        + fld("time", rostime(sec, nsec))
    )
    return record(h, payload)


def chunk_record(inner: bytes, compression: str) -> bytes:
    blob = bz2.compress(inner) if compression == "bz2" else inner
    h = (
        fld("op", b"\x05")
        + fld("compression", compression.encode())
        + fld("size", u32(len(inner)))
    )
    return record(h, blob)


def index_record(conn: int, entries) -> bytes:
    h = (
        fld("op", b"\x04")
        + fld("ver", u32(1))
        + fld("conn", u32(conn))
        + fld("count", u32(len(entries)))
    )
    data = b"".join(rostime(s, ns) + u32(off) for s, ns, off in entries)
    return record(h, data)


def chunk_info_record(chunk_pos: int, t0, t1, counts) -> bytes:
    h = (
        fld("op", b"\x06")
        + fld("ver", u32(1))
        + fld("chunk_pos", u64(chunk_pos))
        + fld("start_time", rostime(*t0))
        + fld("end_time", rostime(*t1))
        + fld("count", u32(len(counts)))
    )
    data = b"".join(u32(c) + u32(n) for c, n in counts)
    return record(h, data)


def write_bag(path: str, connections, messages, compression="none"):
    """connections: [(conn_id, topic, type, md5)]; messages:
    [(conn_id, sec, nsec, payload_bytes)] in order.

    The bag header record has a value-independent length (fixed-width
    fields, space-padded to 4096 total), so index_pos is computed up front
    and the file written in one pass."""
    magic = b"#ROSBAG V2.0\n"
    inner = b"".join(connection_record(*c) for c in connections)
    inner += b"".join(message_record(*m) for m in messages)
    chunk = chunk_record(inner, compression)
    idx_records = b"".join(
        index_record(
            cid, [(s, ns, 0) for c2, s, ns, _ in messages if c2 == cid]
        )
        for cid, _, _, _ in connections
    )
    hdr_len = len(bag_header_record(0, len(connections), 1))
    chunk_pos = len(magic) + hdr_len
    idx_pos = chunk_pos + len(chunk) + len(idx_records)
    counts = [
        (cid, sum(1 for m in messages if m[0] == cid))
        for cid, _, _, _ in connections
    ]
    t_all = [(s, ns) for _, s, ns, _ in messages]
    with open(path, "wb") as f:
        f.write(magic)
        f.write(bag_header_record(idx_pos, len(connections), 1))
        f.write(chunk)
        f.write(idx_records)
        for c in connections:
            f.write(connection_record(*c))
        f.write(chunk_info_record(chunk_pos, min(t_all), max(t_all), counts))


# --- ROS1 message payload serializers (spec: little-endian, 4-byte
# length-prefixed strings/arrays; Header = seq u32, stamp 2xu32, frame_id).


def ros_string(s: str) -> bytes:
    b = s.encode()
    return u32(len(b)) + b


def ros_header(seq: int, sec: int, nsec: int, frame: str) -> bytes:
    return u32(seq) + struct.pack("<II", sec, nsec) + ros_string(frame)


def imu_msg(sec, nsec, gyr, acc) -> bytes:
    out = ros_header(0, sec, nsec, "imu")
    out += struct.pack("<4d", 0.0, 0.0, 0.0, 1.0)  # orientation
    out += struct.pack("<9d", *([0.0] * 9))
    out += struct.pack("<3d", *gyr)
    out += struct.pack("<9d", *([0.0] * 9))
    out += struct.pack("<3d", *acc)
    out += struct.pack("<9d", *([0.0] * 9))
    return out


PF_F32, PF_U16, PF_U8 = 7, 4, 2


def pointcloud2_msg(sec, nsec, cols, bigendian=False) -> bytes:
    """cols: list of (name, datatype, np column). Row-packed, no padding."""
    n = len(cols[0][2])
    order = ">" if bigendian else "<"
    offsets, off = [], 0
    for name, dt, col in cols:
        offsets.append(off)
        off += np.dtype({7: "f4", 4: "u2", 2: "u1", 8: "f8", 6: "u4"}[dt]).itemsize
    step = off
    rows = bytearray(n * step)
    for (name, dt, col), o in zip(cols, offsets):
        base = np.dtype({7: "f4", 4: "u2", 2: "u1", 8: "f8", 6: "u4"}[dt])
        enc = col.astype(base.newbyteorder(order))
        w = base.itemsize
        buf = enc.tobytes()
        for i in range(n):
            rows[i * step + o : i * step + o + w] = buf[i * w : (i + 1) * w]
    out = ros_header(0, sec, nsec, "lidar")
    out += u32(1) + u32(n)  # height, width
    out += u32(len(cols))
    for (name, dt, col), o in zip(cols, offsets):
        out += ros_string(name) + u32(o) + bytes([dt]) + u32(1)
    out += bytes([1 if bigendian else 0])
    out += u32(step) + u32(step * n)
    out += u32(len(rows)) + bytes(rows)
    out += bytes([1])  # is_dense
    return out


def livox_custommsg(sec, nsec, timebase_ns, pts) -> bytes:
    """pts: structured rows (offset_time_ns, x, y, z, refl, tag, line)."""
    out = ros_header(0, sec, nsec, "livox_frame")
    out += u64(timebase_ns)
    out += u32(len(pts))
    out += bytes([0, 0, 0, 0])  # lidar_id + rsvd[3]
    out += u32(len(pts))
    for ot, x, y, z, r, tag, line in pts:
        out += struct.pack("<Ifff3B", ot, x, y, z, r, tag, line)
    return out


def main():
    rng = np.random.default_rng(20260819)

    # --- velodyne_bz2.bag: 2 connections, bz2 chunk, time field in us.
    n = 96
    az = np.linspace(0, 350, n)
    r = rng.uniform(2, 20, n)
    x = (r * np.cos(np.radians(az))).astype(np.float32)
    y = (r * np.sin(np.radians(az))).astype(np.float32)
    z = rng.uniform(-1, 2, n).astype(np.float32)
    inten = rng.uniform(0, 255, n).astype(np.float32)
    ring = (np.arange(n) % 16).astype(np.uint16)
    t_us = np.sort(rng.uniform(0, 100_000, n)).astype(np.float32)  # us!
    t_us[0] = 10.0
    cloud = pointcloud2_msg(
        100, 500_000_000,
        [("x", PF_F32, x), ("y", PF_F32, y), ("z", PF_F32, z),
         ("intensity", PF_F32, inten), ("ring", PF_U16, ring),
         ("time", PF_F32, t_us)],
    )
    gyr = np.array([0.01, -0.02, 0.3])
    acc = np.array([0.1, 0.2, 9.7])
    imu1 = imu_msg(100, 450_000_000, gyr, acc)
    imu2 = imu_msg(100, 460_000_000, gyr * 2, acc)
    write_bag(
        os.path.join(HERE, "velodyne_bz2.bag"),
        [(0, "/imu/data", "sensor_msgs/Imu", "6a62c6daae103f4ff57a132d6f95cec2"),
         (1, "/velodyne_points", "sensor_msgs/PointCloud2",
          "1158d486dd51d683ce2f1be655c3c181")],
        [(0, 100, 450_000_000, imu1),
         (1, 100, 500_000_000, cloud),
         (0, 100, 460_000_000, imu2)],
        compression="bz2",
    )
    np.savez(
        os.path.join(HERE, "velodyne_bz2_expected.npz"),
        x=x, y=y, z=z, intensity=inten, ring=ring, time_us=t_us,
        gyr1=gyr, acc1=acc, gyr2=gyr * 2,
        stamp_cloud=100 + 0.5, stamp_imu1=100 + 0.45,
    )

    # --- livox_timebase.bag: CustomMsg, non-zero timebase; msg 2 has a
    # zero header stamp (timebase is then the scan time).
    tb1 = 1_700_000_123_000_000_000
    pts1 = [
        (0, 1.0, 0.5, -0.2, 100, 0x10, 0),
        (25_000_000, 2.0, -0.5, 0.2, 90, 0x00, 1),
        (50_000_000, 3.0, 1.5, 0.4, 80, 0x10, 2),
        (75_000_000, 0.05, 0.01, 0.0, 70, 0x10, 3),  # blind-gated
        (99_000_000, 4.0, 2.5, 0.6, 60, 0x20, 4),  # tag-gated (0x20)
    ]
    m1 = livox_custommsg(1_700_000_123, 0, tb1, pts1)
    tb2 = tb1 + 100_000_000
    m2 = livox_custommsg(0, 0, tb2, pts1)  # zero header stamp
    write_bag(
        os.path.join(HERE, "livox_timebase.bag"),
        [(0, "/livox/lidar", "livox_ros_driver/CustomMsg",
          "e4d6829bdfe657cb6c21a746c86b21a6")],
        [(0, 1_700_000_123, 0, m1), (0, 1_700_000_123, 100_000_000, m2)],
        compression="none",
    )
    np.savez(
        os.path.join(HERE, "livox_timebase_expected.npz"),
        pts=np.asarray([(p[1], p[2], p[3]) for p in pts1], np.float32),
        offset_ns=np.asarray([p[0] for p in pts1], np.int64),
        refl=np.asarray([p[4] for p in pts1], np.float32),
        tag=np.asarray([p[5] for p in pts1], np.uint8),
        line=np.asarray([p[6] for p in pts1], np.uint8),
        timebase1=tb1, timebase2=tb2, stamp1=float(1_700_000_123),
    )

    # --- bigendian_cloud.bag: same cloud fields, big-endian storage.
    nb = 48
    xb = rng.uniform(-10, 10, nb).astype(np.float32)
    yb = rng.uniform(-10, 10, nb).astype(np.float32)
    zb = rng.uniform(-2, 4, nb).astype(np.float32)
    ib = rng.uniform(0, 100, nb).astype(np.float32)
    rb = (np.arange(nb) % 32).astype(np.uint16)
    tb = np.sort(rng.uniform(0, 0.1, nb)).astype(np.float32)  # seconds
    tb[0] = 1e-4
    cloud_be = pointcloud2_msg(
        7, 0,
        [("x", PF_F32, xb), ("y", PF_F32, yb), ("z", PF_F32, zb),
         ("intensity", PF_F32, ib), ("ring", PF_U16, rb),
         ("time", PF_F32, tb)],
        bigendian=True,
    )
    write_bag(
        os.path.join(HERE, "bigendian_cloud.bag"),
        [(0, "/ouster/points", "sensor_msgs/PointCloud2",
          "1158d486dd51d683ce2f1be655c3c181")],
        [(0, 7, 0, cloud_be)],
        compression="none",
    )
    np.savez(
        os.path.join(HERE, "bigendian_expected.npz"),
        x=xb, y=yb, z=zb, intensity=ib, ring=rb, time_s=tb,
    )
    print("wrote golden bags to", HERE)


if __name__ == "__main__":
    main()
