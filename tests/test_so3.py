"""SO(3) ops vs scipy/NumPy references."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

import jax
from fastlivo_tpu.ops import so3

jexp = jax.jit(so3.exp)
jlog = jax.jit(so3.log)
jhat = jax.jit(so3.hat)
jvee = jax.jit(so3.vee)
jeuler = jax.jit(so3.rot_to_euler)
jq2r = jax.jit(so3.quat_to_rot)
jr2q = jax.jit(so3.rot_to_quat)


def test_exp_matches_scipy(rng):
    w = rng.normal(size=(64, 3)).astype(np.float32)
    ours = np.asarray(jexp(jnp.asarray(w)))
    ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_exp_small_angle(rng):
    w = (rng.normal(size=(16, 3)) * 1e-8).astype(np.float32)
    r = np.asarray(jexp(jnp.asarray(w)))
    np.testing.assert_allclose(r, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-6)


def test_log_roundtrip(rng):
    w = rng.normal(size=(64, 3)).astype(np.float32)
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(
        0.01, 3.0, size=(64, 1)
    ).astype(np.float32)
    r = jexp(jnp.asarray(w))
    w2 = np.asarray(jlog(r))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_log_near_pi(rng):
    axis = rng.normal(size=(8, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    w = (axis * (np.pi - 1e-5)).astype(np.float32)
    r = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    w2 = np.asarray(jlog(jnp.asarray(r)))
    r2 = Rotation.from_rotvec(np.asarray(w2)).as_matrix()
    np.testing.assert_allclose(r2, r, atol=1e-3)


def test_hat_vee(rng):
    v = rng.normal(size=(10, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(jvee(jhat(jnp.asarray(v)))), v)


def test_euler_matches_scipy(rng):
    w = rng.normal(size=(32, 3)).astype(np.float32)
    r = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    rpy = np.asarray(jeuler(jnp.asarray(r)))
    ref = Rotation.from_matrix(r).as_euler("ZYX")[:, ::-1]
    np.testing.assert_allclose(rpy, ref, atol=1e-5)


def test_quat_roundtrip(rng):
    w = rng.normal(size=(32, 3)).astype(np.float32)
    r = jexp(jnp.asarray(w))
    q = jr2q(r)
    r2 = jq2r(q)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r), atol=1e-5)
