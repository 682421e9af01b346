"""Small dense linear algebra helpers for the filter core.

The reference does its 18x18 solves in float64 Eigen
(reference: src/laser_mapping.cpp:188-204 `(H_T_H + P^-1)^-1`). TPUs are
float32-native, and the innovation matrix spans ~8 orders of magnitude
(H^T R^-1 H ~ N/sigma vs P^-1), so we Jacobi-precondition every solve:
solve (D A D) y = D b with D = diag(A)^-1/2, which drops the condition
number to near that of the correlation matrix and makes f32 Cholesky
accurate enough for the filter (validated against f64 in tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psd_solve(a: jnp.ndarray, b: jnp.ndarray, jitter: float = 1e-9) -> jnp.ndarray:
    """Solve a x = b for symmetric positive-definite a with Jacobi
    preconditioning + Cholesky. b may be a vector or matrix."""
    d = jax.lax.rsqrt(jnp.clip(jnp.diagonal(a), 1e-30, None))
    a_s = a * d[:, None] * d[None, :]
    a_s = a_s + jnp.eye(a.shape[0], dtype=a.dtype) * jitter
    chol = jnp.linalg.cholesky(a_s)
    if b.ndim == 1:
        y = jax.scipy.linalg.cho_solve((chol, True), d * b)
        return d * y
    y = jax.scipy.linalg.cho_solve((chol, True), d[:, None] * b)
    return d[:, None] * y


def psd_inverse(a: jnp.ndarray, jitter: float = 1e-9) -> jnp.ndarray:
    """Inverse of a symmetric positive-definite matrix (preconditioned)."""
    return psd_solve(a, jnp.eye(a.shape[0], dtype=a.dtype), jitter)
