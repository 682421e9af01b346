"""The 18-dim error-state filter state as a JAX pytree.

Capability parity with the reference's `StatesGroup`
(reference: include/common_lib.h:518-603): nominal state
(R, p, v, bg, ba, g) with an 18x18 covariance, and manifold
boxplus/boxminus where the rotation uses a *right* perturbation
R <- R @ Exp(dtheta) exactly as the reference's operator+=.

Error-state ordering (matches the reference's Jacobian block layout):
    [0:3]   dtheta  (rotation, right-perturbation)
    [3:6]   dp      (position, world)
    [6:9]   dv      (velocity, world)
    [9:12]  dbg     (gyro bias)
    [12:15] dba     (accel bias)
    [15:18] dg      (gravity vector)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from fastlivo_tpu.ops import so3

DIM_STATE = 18
INIT_COV = 1e-3  # reference: common_lib.h:36
GRAVITY_MS2 = 9.81  # reference: common_lib.h:31


class NavState(NamedTuple):
    """Nominal navigation state + covariance. All float32 (f64 optional on CPU)."""

    rot: jnp.ndarray  # (3, 3) R_world_imu
    pos: jnp.ndarray  # (3,)   p_world
    vel: jnp.ndarray  # (3,)   v_world
    bg: jnp.ndarray  # (3,)   gyro bias
    ba: jnp.ndarray  # (3,)   accel bias
    grav: jnp.ndarray  # (3,)  gravity vector in world (~ [0,0,-9.81])
    cov: jnp.ndarray  # (18, 18)

    @staticmethod
    def identity(dtype=jnp.float32) -> "NavState":
        return NavState(
            rot=jnp.eye(3, dtype=dtype),
            pos=jnp.zeros(3, dtype=dtype),
            vel=jnp.zeros(3, dtype=dtype),
            bg=jnp.zeros(3, dtype=dtype),
            ba=jnp.zeros(3, dtype=dtype),
            grav=jnp.array([0.0, 0.0, -GRAVITY_MS2], dtype=dtype),
            cov=jnp.eye(DIM_STATE, dtype=dtype) * INIT_COV,
        )


def boxplus(state: NavState, dx: jnp.ndarray) -> NavState:
    """state (+) dx, dx in R^18. Covariance is carried through unchanged
    (parity with StatesGroup::operator+=, common_lib.h:565-574)."""
    return NavState(
        rot=state.rot @ so3.exp(dx[0:3]),
        pos=state.pos + dx[3:6],
        vel=state.vel + dx[6:9],
        bg=state.bg + dx[9:12],
        ba=state.ba + dx[12:15],
        grav=state.grav + dx[15:18],
        cov=state.cov,
    )


def boxminus(a: NavState, b: NavState) -> jnp.ndarray:
    """a (-) b -> R^18 with rotation part Log(R_b^T R_a)
    (parity with StatesGroup::operator-, common_lib.h:576-588)."""
    return jnp.concatenate(
        [
            so3.log(b.rot.T @ a.rot),
            a.pos - b.pos,
            a.vel - b.vel,
            a.bg - b.bg,
            a.ba - b.ba,
            a.grav - b.grav,
        ]
    )


def flatten_nominal(state: NavState) -> jnp.ndarray:
    """Pack the nominal state into a (3+3*5+9,) vector (rot as flattened 3x3)
    for logging/checkpointing."""
    return jnp.concatenate(
        [
            state.rot.reshape(-1),
            state.pos,
            state.vel,
            state.bg,
            state.ba,
            state.grav,
        ]
    )
