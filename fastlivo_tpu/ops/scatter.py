"""Fast f32 min-scatters for TPU via a monotonic int32 bit encoding.

XLA lowers float32 scatter-min to a slow serialized path on TPU v5e
(measured ~1.3-1.9 ms for 65k updates into a 327k target) while int32
scatter-min and f32 scatter-add run at the dispatch floor (~0.03 ms).
The float order embeds exactly into int32 order with the classic radix
trick (flip all bits of negatives, keep the sign-cleared bits of
positives), so every f32 min-reduction here is: encode -> int32
scatter-min -> decode. Exact (bit-identical winners), not approximate.

Used by the VIO depth buffer and per-cell argmin
(reference builds the same depth image serially,
src/lidar_selection.cpp:367-401).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SIGN = jnp.uint32(0x80000000)
_IMAX = jnp.int32(0x7FFFFFFF)


def f32_sort_key(x: jnp.ndarray) -> jnp.ndarray:
    """Monotonic f32 -> int32: a < b  <=>  key(a) < key(b).

    +0.0 and -0.0 map to the same key. NaN keys are MEANINGLESS, not
    large: a positive-payload NaN fails `x >= 0` (all NaN comparisons are
    false), takes the negative-branch bit flip, and lands on a SMALL
    positive key (e.g. 0x7FC00000 -> 0x003FFFFF) that would WIN a min
    reduction. Callers must replace NaNs before encoding
    (scatter_min_f32 does this itself).
    """
    x = x + 0.0  # canonicalize -0.0 -> +0.0
    b = jax.lax.bitcast_convert_type(x, jnp.uint32)
    flip = jnp.where(x >= 0, jnp.uint32(0), jnp.uint32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(b ^ flip, jnp.int32)


def f32_from_key(k: jnp.ndarray) -> jnp.ndarray:
    """Inverse of f32_sort_key."""
    b = jax.lax.bitcast_convert_type(k, jnp.uint32)
    flip = jnp.where(k >= 0, jnp.uint32(0), jnp.uint32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(b ^ flip, jnp.float32)


def scatter_min_f32(
    size: int, idx: jnp.ndarray, vals: jnp.ndarray, fill=jnp.inf
) -> jnp.ndarray:
    """out[j] = min over {vals[i] : idx[i] == j}, `fill` where empty.

    idx entries outside [0, size) are dropped. NaN vals are treated as
    `fill` (they never win) — see f32_sort_key's NaN caveat.
    """
    vals = jnp.where(jnp.isnan(vals), jnp.float32(fill), vals)
    init = jnp.full((size,), f32_sort_key(jnp.float32(fill)), jnp.int32)
    keys = init.at[idx].min(f32_sort_key(vals), mode="drop")
    return f32_from_key(keys)
