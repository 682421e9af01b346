"""Batched SO(3) operations (pure JAX, shape-polymorphic over leading dims).

Capability parity with the reference's header-only SO(3) math
(reference: include/so3_math.h:11-103 — Rodrigues Exp, Log, RotMtoEuler),
re-done as vectorized array ops: every function accepts arbitrary leading
batch dimensions and is safe under jit/vmap/grad (small-angle branches are
implemented with `jnp.where` on Taylor expansions, not data-dependent
control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [v]x of v: (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack(
        [m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1
    )


def exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential map: (..., 3) axis-angle -> (..., 3, 3) rotation.

    Uses Taylor series for small angles so it is exact and differentiable at
    w = 0 (A = sin(t)/t, B = (1-cos(t))/t^2).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-10
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS))
    k = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * (k @ k)


def exp_scaled(w: jnp.ndarray, dt) -> jnp.ndarray:
    """exp(w * dt) — mirrors the reference's Exp(ang_vel, dt) overload."""
    return exp(w * jnp.asarray(dt)[..., None])


def log(rot: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map: (..., 3, 3) rotation -> (..., 3) axis-angle.

    Branchless over the theta ~ 0 and theta ~ pi regimes:
    - generic: theta/(2 sin(theta)) * vee(R - R^T)
    - near pi: fall back to the symmetric-part construction.
    """
    tr = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    sin_t = jnp.sin(theta)

    w_asym = vee(rot - jnp.swapaxes(rot, -1, -2))  # = 2 sin(theta) * axis

    # Generic / small-angle factor: theta / (2 sin theta), Taylor at 0.
    small = theta < 1e-4
    factor = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / (2.0 * jnp.where(small, 1.0, sin_t) + _EPS),
    )
    w_generic = factor[..., None] * w_asym

    # Near pi: axis from diagonal of (R + I)/2 = axis axis^T (1+cos)/... .
    # R + I = 2(axis axis^T)(1) when theta = pi exactly.
    m = rot + jnp.broadcast_to(jnp.eye(3, dtype=rot.dtype), rot.shape)
    diag = jnp.stack([m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(m, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    axis = col / (jnp.linalg.norm(col, axis=-1, keepdims=True) + _EPS)
    # Fix sign using the asymmetric part (zero exactly at pi; any sign is valid there).
    sign = jnp.where(jnp.sum(axis * w_asym, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    w_pi = theta[..., None] * axis * sign

    near_pi = theta > (jnp.pi - 1e-3)
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def rot_to_euler(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> (roll, pitch, yaw), ZYX convention.

    Parity with the reference's RotMtoEuler (so3_math.h:84-103) including the
    gimbal-lock branch at |cos(pitch)| ~ 0.
    """
    sy = jnp.sqrt(rot[..., 0, 0] ** 2 + rot[..., 1, 0] ** 2)
    singular = sy < 1e-6
    roll = jnp.where(
        singular,
        jnp.arctan2(-rot[..., 1, 2], rot[..., 1, 1]),
        jnp.arctan2(rot[..., 2, 1], rot[..., 2, 2]),
    )
    pitch = jnp.arctan2(-rot[..., 2, 0], jnp.where(singular, 1e-12, sy))
    yaw = jnp.where(
        singular,
        jnp.zeros_like(sy),
        jnp.arctan2(rot[..., 1, 0], rot[..., 0, 0]),
    )
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z): (..., 4) -> (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), branchless Shepperd."""
    m = rot
    t0 = 1.0 + m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    t1 = 1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2]
    t2 = 1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2]
    t3 = 1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2]

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    q0 = jnp.stack(
        [
            safe_sqrt(t0),
            (m[..., 2, 1] - m[..., 1, 2]) / safe_sqrt(t0),
            (m[..., 0, 2] - m[..., 2, 0]) / safe_sqrt(t0),
            (m[..., 1, 0] - m[..., 0, 1]) / safe_sqrt(t0),
        ],
        axis=-1,
    )
    q1 = jnp.stack(
        [
            (m[..., 2, 1] - m[..., 1, 2]) / safe_sqrt(t1),
            safe_sqrt(t1),
            (m[..., 0, 1] + m[..., 1, 0]) / safe_sqrt(t1),
            (m[..., 2, 0] + m[..., 0, 2]) / safe_sqrt(t1),
        ],
        axis=-1,
    )
    q2 = jnp.stack(
        [
            (m[..., 0, 2] - m[..., 2, 0]) / safe_sqrt(t2),
            (m[..., 0, 1] + m[..., 1, 0]) / safe_sqrt(t2),
            safe_sqrt(t2),
            (m[..., 1, 2] + m[..., 2, 1]) / safe_sqrt(t2),
        ],
        axis=-1,
    )
    q3 = jnp.stack(
        [
            (m[..., 1, 0] - m[..., 0, 1]) / safe_sqrt(t3),
            (m[..., 2, 0] + m[..., 0, 2]) / safe_sqrt(t3),
            (m[..., 1, 2] + m[..., 2, 1]) / safe_sqrt(t3),
            safe_sqrt(t3),
        ],
        axis=-1,
    )
    ts = jnp.stack([t0, t1, t2, t3], axis=-1)
    best = jnp.argmax(ts, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, best[..., None, None].repeat(4, axis=-1), axis=-2)[
        ..., 0, :
    ]
    q = q * 0.5
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
