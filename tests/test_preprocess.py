"""Vendor decoder checks, focused on Velodyne per-ring time reconstruction
(reference: src/preprocess.cpp:459-640). The vectorized implementation must
match a direct sequential transcription of the reference's per-layer
yaw_fp / time_last loop on an interleaved multi-ring stream with wraps."""

import numpy as np

from fastlivo_tpu.io import preprocess as PP
from fastlivo_tpu.utils.config import LidarParams


def _reference_ring_times(x, y, ring, n_scans=16):
    """Sequential transcription of preprocess.cpp:578-616 (non-feature
    branch, given_offset_time=false): per-layer first-yaw anchors, +360
    when yaw passed the anchor, monotonic unwrap vs time_last; first point
    of each layer is skipped (`continue`)."""
    omega_l = 0.361 * 10.0
    is_first = [True] * n_scans
    yaw_fp = [0.0] * n_scans
    time_last = [0.0] * n_scans
    t_ms = np.zeros(len(x))
    kept = np.ones(len(x), bool)
    for i in range(len(x)):
        layer = int(ring[i])
        yaw = np.degrees(np.arctan2(y[i], x[i]))
        if is_first[layer]:
            yaw_fp[layer] = yaw
            is_first[layer] = False
            time_last[layer] = 0.0
            kept[i] = False
            continue
        if yaw <= yaw_fp[layer]:
            cur = (yaw_fp[layer] - yaw) / omega_l
        else:
            cur = (yaw_fp[layer] - yaw + 360.0) / omega_l
        if cur < time_last[layer]:
            cur += 360.0 / omega_l
        time_last[layer] = cur
        t_ms[i] = cur
    return t_ms, kept


def _interleaved_sweep(rng, n_rings=4, n_per_ring=300, revs=1.6):
    """A VLP-style stream: firings interleave rings; each ring sweeps
    clockwise through `revs` revolutions starting at its own yaw."""
    az0 = rng.uniform(0, 360, n_rings)
    pts = []
    for k in range(n_per_ring):
        for r in range(n_rings):
            az = az0[r] - revs * 360.0 * k / n_per_ring  # clockwise
            rad = np.radians(az)
            rr = 5.0 + 0.1 * r
            pts.append(
                (rr * np.cos(rad), rr * np.sin(rad), 0.1 * r, r)
            )
    a = np.asarray(pts)
    return a[:, 0], a[:, 1], a[:, 2], a[:, 3].astype(np.int64)


def test_velodyne_ring_times_match_reference_loop(rng):
    x, y, _, ring = _interleaved_sweep(rng)
    t_vec, keep_vec = PP._velodyne_ring_times(x, y, ring)
    t_ref, keep_ref = _reference_ring_times(x, y, ring)
    np.testing.assert_array_equal(keep_vec, keep_ref)
    np.testing.assert_allclose(t_vec[keep_vec], t_ref[keep_ref], atol=1e-9)
    # The sweep really wrapped (unwrap path exercised) and times are
    # monotone per ring.
    assert t_ref.max() > 110.0
    for r in range(4):
        m = keep_ref & (ring == r)
        assert (np.diff(t_vec[m]) >= -1e-12).all()


def test_velodyne_global_sweep_would_mistime(rng):
    """Regression rationale: a single global sweep (round 2) is wrong on
    interleaved multi-ring streams — each ring wraps at a different array
    position."""
    x, y, _, ring = _interleaved_sweep(rng)
    az = np.degrees(np.arctan2(y, x))
    rel = (az[0] - az) % 360.0
    t_global = rel / 360.0 * 100.0
    t_ref, keep = _reference_ring_times(x, y, ring)
    assert np.abs(t_global[keep] - t_ref[keep]).max() > 30.0  # ms


def _decode(fields, **kw):
    params = LidarParams(blind=0.1, max_range=100.0, point_filter_num=1)
    return PP.decode_velodyne(0.0, fields, params)


def test_velodyne_time_field_unit_autodetect(rng):
    n = 64
    x = rng.uniform(1, 5, n)
    y = rng.uniform(1, 5, n)
    z = rng.uniform(-1, 1, n)
    t_s = np.sort(rng.uniform(0.0, 0.1, n))
    t_s[0] = 0.001
    # seconds (standard velodyne_pointcloud driver)
    scan = _decode({"x": x, "y": y, "z": z, "time": t_s})
    np.testing.assert_allclose(np.sort(t_s * 1e3), scan.t_offs_ms, rtol=1e-6)
    # microseconds (the reference's curvature = time * 1e-3 convention,
    # preprocess.cpp:588)
    scan_us = _decode({"x": x, "y": y, "z": z, "time": t_s * 1e6})
    np.testing.assert_allclose(np.sort(t_s * 1e3), scan_us.t_offs_ms, rtol=1e-5)


def test_velodyne_zero_time_field_falls_back_to_rings(rng):
    """The reference gates on points.back().time > 0 (preprocess.cpp:478):
    an all-zero time field means reconstruct."""
    x, y, z, ring = _interleaved_sweep(rng, n_rings=2, n_per_ring=50, revs=0.8)
    t_ref, keep = _reference_ring_times(x, y, ring)
    scan = _decode(
        {"x": x, "y": y, "z": z, "ring": ring, "time": np.zeros(len(x))}
    )
    assert len(scan.pts) == int(keep.sum())
    np.testing.assert_allclose(
        np.sort(t_ref[keep]), scan.t_offs_ms, atol=1e-6
    )
