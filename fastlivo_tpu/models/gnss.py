"""GNSS fusion: RTK ingestion, trajectory alignment, ESKF position updates.

Capability parity with the reference's `GNSSProcessing`
(reference: src/GNSS_Processing.cpp — RTK result parsing :21-83, IMU-pose
time matching :84-147, yaw+antenna-lever initialization via Ceres :148-203,
per-update observation H blocks :204-237). TPU-first redesign:

- the per-scan observation is a pure function producing an (18,18)/(18,)
  innovation block that plugs into `lio_update`'s extra_hth/extra_hty —
  exactly how the reference injects it into h_share_model
  (laser_mapping.cpp:616-621);
- the initialization (align GNSS ENU track to odometry, solving the ENU->
  world rotation + antenna lever) is a small JAX Gauss-Newton with Huber
  weights replacing Ceres;
- ECEF/ENU conversion happens at ingestion (ops/earth.py), so the filter
  only ever sees local metric coordinates.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastlivo_tpu.ops import earth, so3
from fastlivo_tpu.state import DIM_STATE


@dataclass
class GnssSample:
    time: float  # unix seconds
    ecef: np.ndarray  # (3,)
    std_enu: np.ndarray  # (3,)


def parse_rtk_file(path: str) -> List[GnssSample]:
    """Parse the reference's RTK result format (header until END_HEAD, then
    named columns; only ambiguity-fixed rows AR >= 3 are kept).
    Parity with readrtkresult (GNSS_Processing.cpp:21-83)."""
    samples: List[GnssSample] = []
    with open(path) as f:
        lines = f.readlines()
    i = 0
    while i < len(lines) and "END_HEAD" not in lines[i]:
        i += 1
    if i + 2 >= len(lines):
        return samples
    header = lines[i + 2].split()
    offsets = {"Week": 1, "GPSTime": 1, "X-ECEF": 1, "Y-ECEF": 1, "Z-ECEF": 1,
               "SD-E": 5, "SD-N": 5, "SD-U": 5, "AR": 5}
    cols = {}
    for c, name in enumerate(header):
        if name in offsets:
            cols[name] = c + offsets[name]
    required = ["Week", "GPSTime", "X-ECEF", "Y-ECEF", "Z-ECEF", "SD-E", "SD-N", "SD-U", "AR"]
    if any(k not in cols for k in required):
        return samples
    for line in lines[i + 4:]:
        v = line.split()
        if len(v) <= max(cols.values()):
            continue
        try:
            ar = int(float(v[cols["AR"]]))
            if ar < 3:
                continue
            samples.append(
                GnssSample(
                    time=earth.gps2unix(int(v[cols["Week"]]), float(v[cols["GPSTime"]])),
                    ecef=np.array([float(v[cols[k]]) for k in ("X-ECEF", "Y-ECEF", "Z-ECEF")]),
                    std_enu=np.array([float(v[cols[k]]) for k in ("SD-E", "SD-N", "SD-U")]),
                )
            )
        except ValueError:
            continue
    return samples


def observation_block(
    rot: jnp.ndarray,
    pos: jnp.ndarray,
    gnss_pos_world: jnp.ndarray,
    std_enu: jnp.ndarray,
    antlever: jnp.ndarray,
    outlier_gate_m: float = 2.0,
    up_weight: float = 100.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3-dof position observation -> (extra_hth (18,18), extra_hty (18,)).

    Measurement model: z_gnss = p + R * lever (antenna position in world).
    Innovation err = z - p - R*lever; H = dh/dx = [ -R [lever]x , I, 0.. ];
    accumulate H^T W err / H^T W H (functional parity with computeH,
    GNSS_Processing.cpp:204-237 — note the reference's published H block
    uses [R[l]x, -I] against err = z - p + R*lever, which is internally
    sign-inconsistent; the form here is verified by a pull-direction test).
    W = diag(1/sd_e, 1/sd_n, up_weight/sd_u), zeroed when |err| > gate.
    """
    dtype = pos.dtype
    err = gnss_pos_world - pos - rot @ antlever
    ok = jnp.linalg.norm(err) <= outlier_gate_m

    h = jnp.zeros((3, 6), dtype)
    h = h.at[:, 0:3].set(-(rot @ so3.hat(antlever)))
    h = h.at[:, 3:6].set(jnp.eye(3, dtype=dtype))
    w = jnp.where(
        ok,
        jnp.asarray(
            [1.0 / std_enu[0], 1.0 / std_enu[1], up_weight / std_enu[2]], dtype
        ),
        jnp.zeros(3, dtype),
    )
    hth6 = h.T @ (w[:, None] * h)
    hty6 = h.T @ (w * err)
    hth = jnp.zeros((DIM_STATE, DIM_STATE), dtype).at[0:6, 0:6].set(hth6)
    hty = jnp.zeros((DIM_STATE,), dtype).at[0:6].set(hty6)
    return hth, hty


def align_trajectory(
    odo_pos: np.ndarray,
    odo_rot: np.ndarray,
    gnss_enu: np.ndarray,
    std_enu: np.ndarray,
    iters: int = 10,
    huber_delta: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Solve ENU->world rotation + antenna lever by Gauss-Newton with Huber
    weights (replaces the Ceres problem in Initialization,
    GNSS_Processing.cpp:148-203).

    residual_i = R_we @ p_gnss_enu_i - (p_odo_i + R_i @ lever)

    Returns (rot_we (3,3), lever (3,)).
    """
    odo_pos = jnp.asarray(odo_pos, jnp.float32)
    odo_rot = jnp.asarray(odo_rot, jnp.float32)
    gnss = jnp.asarray(gnss_enu, jnp.float32)
    w0 = jnp.asarray(1.0 / np.maximum(std_enu, 1e-3), jnp.float32)

    # Yaw seed from the endpoint displacement directions
    # (GNSS_Processing.cpp:150-157).
    gv = np.asarray(gnss[-1] - gnss[0])
    ov = np.asarray(odo_pos[-1] - odo_pos[0])
    gv2, ov2 = gv[:2], ov[:2]
    yaw = float(
        np.arctan2(ov2[1], ov2[0]) - np.arctan2(gv2[1], gv2[0])
    ) if np.linalg.norm(gv2) > 1e-6 and np.linalg.norm(ov2) > 1e-6 else 0.0
    r0 = so3.exp(jnp.asarray([0.0, 0.0, yaw], jnp.float32))

    def residuals(r_we, lever):
        pred = gnss @ r_we.T  # R_we @ p_enu
        tgt = odo_pos + jnp.einsum("nij,j->ni", odo_rot, lever)
        return (pred - tgt) * w0  # (N, 3)

    @jax.jit
    def gn_step(r_we, lever):
        # Yaw-only rotation freedom: both frames are gravity-aligned, so a
        # full SO(3) alignment is degenerate on weakly-excited (straight)
        # tracks. (The reference optimizes a full quaternion via Ceres and
        # inherits that degeneracy.) dx = [dyaw, lever(3)].
        def res_flat(dx):
            r = r_we @ so3.exp(jnp.asarray([0.0, 0.0, 1.0]) * dx[0])
            return residuals(r, lever + dx[1:4]).reshape(-1)

        r = res_flat(jnp.zeros(4, jnp.float32))
        j = jax.jacobian(res_flat)(jnp.zeros(4, jnp.float32))
        # Huber weights on residual norm per sample.
        rn = jnp.linalg.norm(r.reshape(-1, 3), axis=-1)
        hw = jnp.minimum(1.0, huber_delta / jnp.maximum(rn, 1e-9))
        hw = jnp.repeat(hw, 3)
        jw = j * hw[:, None]
        rw = r * hw
        dx = -jnp.linalg.solve(jw.T @ jw + 1e-6 * jnp.eye(4), jw.T @ rw)
        return r_we @ so3.exp(jnp.asarray([0.0, 0.0, 1.0]) * dx[0]), lever + dx[1:4]

    r_we, lever = r0, jnp.zeros(3, jnp.float32)
    for _ in range(iters):
        r_we, lever = gn_step(r_we, lever)
    return np.asarray(r_we), np.asarray(lever)


class GnssFusion:
    """Host-side GNSS front end: buffering, time matching, anchoring,
    initialization, and per-scan observation production."""

    def __init__(
        self,
        antlever: np.ndarray | None = None,
        outlier_gate_m: float = 2.0,
        init_window: int = 20,
    ):
        self.samples: List[GnssSample] = []
        self.anchor_ecef: Optional[np.ndarray] = None
        self.rot_we = np.eye(3)
        self.antlever = np.zeros(3) if antlever is None else np.asarray(antlever)
        self.outlier_gate_m = outlier_gate_m
        self.init_window = init_window
        self.initialized = False
        self._odo_pos: List[np.ndarray] = []
        self._odo_rot: List[np.ndarray] = []
        self._gnss_enu: List[np.ndarray] = []
        self._gnss_std: List[np.ndarray] = []

    def load_rtk_file(self, path: str):
        self.samples = parse_rtk_file(path)

    def push(self, sample: GnssSample):
        self.samples.append(sample)

    def _enu(self, ecef: np.ndarray) -> np.ndarray:
        if self.anchor_ecef is None:
            self.anchor_ecef = np.asarray(ecef, np.float64)
        return earth.ecef2enu(np.asarray(ecef, np.float64), self.anchor_ecef)

    def match(self, t: float, tol: float = 0.05) -> Optional[GnssSample]:
        """Nearest-in-time sample (parity with addIMUpos's matching,
        GNSS_Processing.cpp:84-147)."""
        best, bd = None, tol
        for s in self.samples:
            d = abs(s.time - t)
            if d < bd:
                best, bd = s, d
        return best

    def observe(self, t: float, rot: np.ndarray, pos: np.ndarray):
        """Called once per scan with the current odometry pose. Returns
        (extra_hth, extra_hty) jnp arrays, or None if no matched sample /
        not yet initialized."""
        s = self.match(t)
        if s is None:
            return None
        enu = self._enu(s.ecef)
        if not self.initialized:
            self._odo_pos.append(np.asarray(pos, np.float64))
            self._odo_rot.append(np.asarray(rot, np.float64))
            self._gnss_enu.append(enu)
            self._gnss_std.append(s.std_enu)
            if len(self._odo_pos) >= self.init_window:
                track_len = np.linalg.norm(self._odo_pos[-1] - self._odo_pos[0])
                if track_len > 1.0:  # need excitation for yaw observability
                    self.rot_we, self.antlever = align_trajectory(
                        np.asarray(self._odo_pos),
                        np.asarray(self._odo_rot),
                        np.asarray(self._gnss_enu),
                        np.mean(self._gnss_std, axis=0),
                    )
                    self.initialized = True
            return None

        gnss_world = self.rot_we @ enu
        return observation_block(
            jnp.asarray(rot, jnp.float32),
            jnp.asarray(pos, jnp.float32),
            jnp.asarray(gnss_world, jnp.float32),
            jnp.asarray(s.std_enu, jnp.float32),
            jnp.asarray(self.antlever, jnp.float32),
            self.outlier_gate_m,
        )
