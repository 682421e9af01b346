"""State manifold boxplus/boxminus properties."""

import numpy as np
import jax.numpy as jnp

import jax
from fastlivo_tpu import state as st

jplus = jax.jit(st.boxplus)
jminus = jax.jit(st.boxminus)


def test_boxplus_boxminus_inverse(rng):
    a = st.NavState.identity()
    dx = jnp.asarray(rng.normal(size=18).astype(np.float32) * 0.1)
    b = jplus(a, dx)
    dx2 = jminus(b, a)
    np.testing.assert_allclose(np.asarray(dx2), np.asarray(dx), atol=1e-5)


def test_boxminus_zero():
    a = st.NavState.identity()
    np.testing.assert_allclose(np.asarray(jminus(a, a)), np.zeros(18), atol=1e-7)


def test_boxplus_rotation_right_perturbation(rng):
    from fastlivo_tpu.ops import so3

    a = st.NavState.identity()._replace(rot=so3.exp(jnp.asarray([0.3, -0.2, 0.5])))
    dx = jnp.zeros(18).at[0:3].set(jnp.asarray([0.01, 0.02, -0.03]))
    b = jplus(a, dx)
    expected = np.asarray(a.rot) @ np.asarray(so3.exp(dx[0:3]))
    np.testing.assert_allclose(np.asarray(b.rot), expected, atol=1e-6)
