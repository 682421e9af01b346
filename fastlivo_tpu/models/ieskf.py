"""The shared iterated error-state Kalman MAP step.

This is the single place the filter algebra lives — the TPU-native
equivalent of the reference's IKFoM `esekf` template machinery
(reference: include/IKFoM_toolkit/esekfom/esekfom.hpp:106 — generic
manifold IESKF with `update_iterated_dyn_share_modified` :1619 — and the
hand-rolled copies of the same math in laser_mapping.cpp:188-204 and
lidar_selection.cpp:858-884). Both the LIO and VIO measurement models call
this one function; the manifold structure lives in `state.boxplus/boxminus`.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from fastlivo_tpu.ops import linalg


def map_step(
    p_inv: jnp.ndarray,
    hth: jnp.ndarray,
    hty: jnp.ndarray,
    vec: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One MAP Gauss-Newton step with prior pull.

    Args:
      p_inv: (18,18) inverse prior covariance (R-scaled if the measurement
        noise was folded into it, as the reference does for VIO).
      hth / hty: accumulated H^T R^-1 H and H^T R^-1 (z - h).
      vec: state_propagated (-) state_current (the prior pull).

    Returns (dx (18,), g_mat (18,18)) where
      dx = vec + S^-1 (hty - hth vec),  S = hth + p_inv
      g_mat = S^-1 hth                  (for P <- (I - G) P)

    Algebraically identical to the reference's
      K_1 = (H^T H + P^-1)^-1; solution = K_1 HTL + vec - K_1 HTH vec.
    """
    s_mat = hth + p_inv
    dx = vec + linalg.psd_solve(s_mat, hty - hth @ vec)
    g_mat = linalg.psd_solve(s_mat, hth)
    return dx, g_mat


def posterior_cov(p: jnp.ndarray, g_mat: jnp.ndarray) -> jnp.ndarray:
    """P <- (I - G) P, symmetrized."""
    cov = (jnp.eye(p.shape[0], dtype=p.dtype) - g_mat) @ p
    return 0.5 * (cov + cov.T)
