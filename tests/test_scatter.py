"""ops/scatter.py: f32 min-scatter via the int32 sort-key encoding."""

import numpy as np
import jax.numpy as jnp

from fastlivo_tpu.ops import scatter as S


def test_sort_key_monotonic(rng):
    x = np.concatenate(
        [
            rng.uniform(-1e30, 1e30, 500).astype(np.float32),
            rng.uniform(-1e-30, 1e-30, 500).astype(np.float32),
            np.asarray([0.0, -0.0, 1e-38, -1e-38, np.inf, -np.inf], np.float32),
        ]
    )
    order = np.argsort(x, kind="stable")
    keys = np.asarray(S.f32_sort_key(jnp.asarray(x)))
    assert (np.diff(keys[order]) >= 0).all()
    # roundtrip (excluding +-0.0 and subnormals: XLA flushes subnormals to
    # zero in the canonicalizing add, same as TPU hardware arithmetic)
    normal = np.abs(x) >= np.finfo(np.float32).tiny
    back = np.asarray(S.f32_from_key(jnp.asarray(keys)))
    np.testing.assert_array_equal(back[normal], x[normal])


def test_scatter_min_matches_numpy(rng):
    n, size = 4096, 257
    idx = rng.integers(0, size + 20, n).astype(np.int32)  # some dropped
    vals = rng.uniform(-100, 100, n).astype(np.float32)
    out = np.asarray(S.scatter_min_f32(size, jnp.asarray(idx), jnp.asarray(vals)))
    ref = np.full(size, np.inf, np.float32)
    for i, v in zip(idx, vals):
        if 0 <= i < size:
            ref[i] = min(ref[i], v)
    np.testing.assert_array_equal(out, ref)


def test_scatter_min_masked_inf_lanes():
    idx = jnp.asarray([0, 1, 1, 5], jnp.int32)
    vals = jnp.asarray([2.0, jnp.inf, 3.0, jnp.inf], jnp.float32)
    out = np.asarray(S.scatter_min_f32(4, idx, vals))
    np.testing.assert_array_equal(out, [2.0, 3.0, np.inf, np.inf])
