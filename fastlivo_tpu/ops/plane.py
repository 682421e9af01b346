"""Batched plane estimation from k nearest neighbors.

Capability parity with the reference's `esti_plane`
(reference: include/common_lib.h:671-702): fit plane n.p + d = 0 through k
points by solving A x = -1 in least squares (x = n/d), normalize, and gate
on the max point-to-plane residual. The reference solves the 5x3 system
with a column-pivoted QR per point; here the normal equations (3x3, solved
in closed form via the adjugate) are batched over all points at once — the
k x 3 Gram products map onto the MXU via einsum.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

_EPS = 1e-20


def _solve3(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched 3x3 solve via adjugate; returns (x, det)."""
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02

    adj = jnp.stack(
        [
            jnp.stack(
                [
                    c00,
                    a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2],
                    a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    c01,
                    a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0],
                    a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    c02,
                    a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1],
                    a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0],
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )
    x = jnp.einsum("...ij,...j->...i", adj, b) / (det[..., None] + _EPS)
    return x, det


def esti_plane(
    neighbors: jnp.ndarray,
    neighbor_valid: jnp.ndarray,
    threshold: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fit planes through neighbor sets.

    Args:
      neighbors: (N, K, 3) the K nearest map points per query.
      neighbor_valid: (N, K) bool; a plane requires ALL K valid (parity with
        the reference requiring NUM_MATCH_POINTS neighbors,
        laser_mapping.cpp:526).
      threshold: max |n.p + d| over the K points for the fit to count
        (reference esti_plane threshold 0.1).

    Returns:
      normal: (N, 3) unit plane normals.
      d: (N,) plane offsets (n.p + d = 0).
      valid: (N,) fit accepted.
    """
    # Normal equations for A x = -1  (A = neighbors, x = n/d).
    g = jnp.einsum("nki,nkj->nij", neighbors, neighbors)  # (N, 3, 3)
    rhs = -jnp.sum(neighbors, axis=1)  # A^T b with b = -1
    x, det = _solve3(g, rhs)

    # Degenerate neighbor sets (near-singular Gram) produce inf/NaN here;
    # they must not leak into downstream einsums (0 * NaN = NaN would poison
    # the innovation accumulation), so sanitize and invalidate.
    finite = jnp.all(jnp.isfinite(x), axis=-1)
    x = jnp.where(finite[..., None], x, 0.0)
    norm = jnp.linalg.norm(x, axis=-1)
    normal = x / (norm[..., None] + _EPS)
    d = 1.0 / (norm + _EPS)

    resid = jnp.abs(
        jnp.einsum("nki,ni->nk", neighbors, normal) + d[:, None]
    )
    all_valid = jnp.all(neighbor_valid, axis=-1)
    fit_ok = jnp.all(resid <= threshold, axis=-1)
    nondegenerate = finite & (jnp.abs(det) > 1e-12) & (norm > _EPS)
    valid = all_valid & fit_ok & nondegenerate
    normal = jnp.where(valid[..., None], normal, 0.0)
    d = jnp.where(valid, d, 0.0)
    return normal, d, valid
