"""IMU forward propagation, covariance propagation and point undistortion.

Capability parity with the reference's `ImuProcess`
(reference: src/IMU_Processing.cpp — static init :92-198, forward
propagation + 18x18 F_x / cov_w :246-343, backward per-point undistortion
:344-378), re-designed TPU-first:

- forward propagation is a `lax.scan` over a fixed-size IMU window
  (masked samples are zero-dt no-ops), producing the pose at every IMU
  sample in one pass;
- undistortion is a single vmapped gather: each LiDAR point looks up its
  bracketing IMU pose via `searchsorted` and applies the closed-form
  constant-acceleration interpolation — no backward pointer walk;
- static zero-velocity initialization is host-side NumPy (runs once).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastlivo_tpu.ops import so3
from fastlivo_tpu.state import DIM_STATE, GRAVITY_MS2, NavState


class ImuWindow(NamedTuple):
    """Fixed-size IMU measurement window for one propagation step.

    stamps are seconds relative to the window start; index 0 must hold the
    carried-over last sample of the previous window (the reference's
    `v_imu.push_front(last_imu_)`, IMU_Processing.cpp:206).
    """

    stamps: jnp.ndarray  # (M,) f32, relative seconds, nondecreasing
    gyr: jnp.ndarray  # (M, 3) rad/s
    acc: jnp.ndarray  # (M, 3) m/s^2 (raw, scaled by G/|mean_acc| in propagate)
    mask: jnp.ndarray  # (M,) bool — True for real samples


class ImuPoses(NamedTuple):
    """Pose trajectory at IMU sample times, for undistortion.

    Entry i is the state at stamps[i] (entry 0 = window start state).
    """

    stamps: jnp.ndarray  # (M,)
    rot: jnp.ndarray  # (M, 3, 3)
    pos: jnp.ndarray  # (M, 3)
    vel: jnp.ndarray  # (M, 3)
    acc_w: jnp.ndarray  # (M, 3) world-frame specific acceleration (gravity-corrected)
    gyr_b: jnp.ndarray  # (M, 3) bias-corrected body angular rate over [i, i+1]


def propagate(
    state: NavState,
    window: ImuWindow,
    t_end: jnp.ndarray,
    acc_scale: jnp.ndarray,
    cov_gyr: float = 0.01,
    cov_acc: float = 0.01,
    cov_bias_gyr: float = 1e-4,
    cov_bias_acc: float = 1e-4,
) -> Tuple[NavState, ImuPoses]:
    """Propagate nominal state + covariance through the IMU window to t_end.

    Mirrors the reference math exactly (IMU_Processing.cpp:246-343):
    midpoint gyro/accel averaging between consecutive samples, accel norm
    scaling to standard gravity, error-state transition

        F_x[0:3,0:3] = Exp(-w dt)      F_x[0:3,9:12]  = -I dt
        F_x[3:6,6:9] = I dt
        F_x[6:9,0:3] = -R [a]x dt      F_x[6:9,12:15] = -R dt
        F_x[6:9,15:18] = I dt

    and process noise diag(cov_gyr, 0, R cov_acc R^T, cov_bias) * dt^2,
    then constant-rate extrapolation from the last sample to t_end.
    """
    m = window.stamps.shape[0]
    dtype = state.pos.dtype
    eye3 = jnp.eye(3, dtype=dtype)

    # Midpoint samples over intervals [i, i+1), i = 0..M-2.
    gyr_avg = 0.5 * (window.gyr[:-1] + window.gyr[1:]) - state.bg
    acc_avg = 0.5 * (window.acc[:-1] + window.acc[1:]) * acc_scale - state.ba
    dts = (window.stamps[1:] - window.stamps[:-1]) * window.mask[1:].astype(dtype)
    dts = jnp.maximum(dts, 0.0)

    def step(carry, inp):
        rot, pos, vel, cov = carry
        w, a, dt = inp

        exp_w = so3.exp(w * dt)
        a_hat = so3.hat(a)

        fx = jnp.eye(DIM_STATE, dtype=dtype)
        fx = fx.at[0:3, 0:3].set(so3.exp(-w * dt))
        fx = fx.at[0:3, 9:12].set(-eye3 * dt)
        fx = fx.at[3:6, 6:9].set(eye3 * dt)
        fx = fx.at[6:9, 0:3].set(-(rot @ a_hat) * dt)
        fx = fx.at[6:9, 12:15].set(-rot * dt)
        fx = fx.at[6:9, 15:18].set(eye3 * dt)

        dt2 = dt * dt
        qw = jnp.zeros((DIM_STATE, DIM_STATE), dtype=dtype)
        qw = qw.at[0:3, 0:3].set(eye3 * (cov_gyr * dt2))
        qw = qw.at[6:9, 6:9].set(rot @ (eye3 * cov_acc) @ rot.T * dt2)
        qw = qw.at[9:12, 9:12].set(eye3 * (cov_bias_gyr * dt2))
        qw = qw.at[12:15, 12:15].set(eye3 * (cov_bias_acc * dt2))

        cov = fx @ cov @ fx.T + qw
        rot = rot @ exp_w
        acc_w = rot @ a + state.grav
        pos = pos + vel * dt + 0.5 * acc_w * dt2
        vel = vel + acc_w * dt
        return (rot, pos, vel, cov), (rot, pos, vel, acc_w, w)

    init = (state.rot, state.pos, state.vel, state.cov)
    (rot_n, pos_n, vel_n, cov_n), traj = jax.lax.scan(
        step, init, (gyr_avg, acc_avg, dts)
    )
    rots, poss, vels, accs_w, gyrs = traj

    # Pose table: entry 0 = start state, entries 1..M-1 = post-interval states.
    # acc_w/gyr_b at entry i describe motion over [stamps[i], stamps[i+1]).
    acc_w0 = state.rot @ acc_avg[0] + state.grav
    poses = ImuPoses(
        stamps=window.stamps,
        rot=jnp.concatenate([state.rot[None], rots], axis=0),
        pos=jnp.concatenate([state.pos[None], poss], axis=0),
        vel=jnp.concatenate([state.vel[None], vels], axis=0),
        acc_w=jnp.concatenate([jnp.stack([acc_w0]), accs_w], axis=0),
        gyr_b=jnp.concatenate([gyr_avg, gyr_avg[-1:]], axis=0),
    )

    # Extrapolate from the last valid sample to t_end (reference :317-337).
    n_valid = jnp.sum(window.mask.astype(jnp.int32))
    last = jnp.maximum(n_valid - 1, 0)
    t_last = window.stamps[last]
    dt_e = t_end - t_last
    rot_l = poses.rot[last]
    pos_l = poses.pos[last]
    vel_l = poses.vel[last]
    acc_l = poses.acc_w[jnp.maximum(last - 1, 0) + 1]
    gyr_l = gyr_avg[jnp.maximum(last - 1, 0)]

    new_state = NavState(
        rot=rot_l @ so3.exp(gyr_l * dt_e),
        pos=pos_l + vel_l * dt_e + 0.5 * acc_l * dt_e * dt_e,
        vel=vel_l + acc_l * dt_e,
        bg=state.bg,
        ba=state.ba,
        grav=state.grav,
        cov=cov_n,
    )
    return new_state, poses


def undistort(
    points: jnp.ndarray,
    t_offs: jnp.ndarray,
    mask: jnp.ndarray,
    poses: ImuPoses,
    state_end: NavState,
    rot_il: jnp.ndarray,
    t_il: jnp.ndarray,
) -> jnp.ndarray:
    """Motion-compensate LiDAR points to the window-end LiDAR frame.

    Parity with the reference's backward undistortion loop
    (IMU_Processing.cpp:344-378): for a point at time t inside IMU interval i,

        R_t = R_i Exp(w_i dt),  p_t = p_i + v_i dt + 0.5 a_i dt^2
        P_end = R_il^T ( R_end^T ( R_t (R_il P + t_il) + p_t - p_end ) - t_il )

    implemented as one vmapped gather over the pose table.
    """
    idx = jnp.clip(
        jnp.searchsorted(poses.stamps, t_offs, side="right") - 1,
        0,
        poses.stamps.shape[0] - 1,
    )
    dt = (t_offs - poses.stamps[idx])[:, None]

    rot_i = poses.rot[idx] @ so3.exp(poses.gyr_b[idx] * dt)
    pos_i = poses.pos[idx] + poses.vel[idx] * dt + 0.5 * poses.acc_w[idx] * dt * dt

    p_imu = points @ rot_il.T + t_il  # body(lidar) -> IMU frame
    p_w = jnp.einsum("nij,nj->ni", rot_i, p_imu) + pos_i
    p_end_imu = (p_w - state_end.pos) @ state_end.rot  # == R_end^T (p_w - p_end)
    p_end = (p_end_imu - t_il) @ rot_il  # == R_il^T (p_end_imu - t_il)
    return jnp.where(mask[:, None], p_end, points)


class StaticInitializer:
    """Host-side static (zero-velocity) IMU initialization.

    Parity with the reference's IMU_init + detectZeroVelocity
    (IMU_Processing.cpp:92-198): accumulate samples while stationary, set
    gravity from the mean accel direction, gyro bias from the mean rate, and
    report the accel-norm scale factor G / |mean_acc|.
    """

    def __init__(self, init_count: int = 50, zero_velocity_thresh: float = 0.05):
        self.init_count = init_count
        self.zero_velocity_thresh = zero_velocity_thresh
        self._acc = []
        self._gyr = []
        self.done = False
        self.mean_acc = np.array([0.0, 0.0, GRAVITY_MS2])
        self.mean_gyr = np.zeros(3)

    def is_static(self, acc_batch: np.ndarray) -> bool:
        """Zero-velocity detection: low variance of accel norm over the batch
        (reference: detectZeroVelocity, IMU_Processing.cpp:92-145)."""
        norms = np.linalg.norm(acc_batch, axis=-1)
        return bool(np.std(norms) < self.zero_velocity_thresh)

    def push(self, gyr: np.ndarray, acc: np.ndarray) -> bool:
        """Feed one window of samples; returns True once initialized."""
        if self.done:
            return True
        if len(self._acc) > 0 or self.is_static(acc):
            self._acc.append(np.asarray(acc))
            self._gyr.append(np.asarray(gyr))
        total = sum(a.shape[0] for a in self._acc)
        if total >= self.init_count:
            acc_all = np.concatenate(self._acc)
            gyr_all = np.concatenate(self._gyr)
            self.mean_acc = acc_all.mean(axis=0)
            self.mean_gyr = gyr_all.mean(axis=0)
            self.done = True
        return self.done

    @property
    def acc_scale(self) -> float:
        return float(GRAVITY_MS2 / np.linalg.norm(self.mean_acc))

    def initial_state(self, dtype=jnp.float32) -> NavState:
        st = NavState.identity(dtype)
        grav = -self.mean_acc / np.linalg.norm(self.mean_acc) * GRAVITY_MS2
        return st._replace(
            grav=jnp.asarray(grav, dtype=dtype),
            bg=jnp.asarray(self.mean_gyr, dtype=dtype),
        )
