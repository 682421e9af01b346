"""ops/image.py window-based samplers vs the scattered-gather reference.

`strided_patch_sample` must reproduce `extract_patches` /
`patch_residual_grad` exactly on interior points (same lattice
c + m*stride with one shared bilinear fraction per candidate,
reference getpatch anchoring: src/lidar_selection.cpp:117-139).
"""

import numpy as np
import jax.numpy as jnp

from fastlivo_tpu.ops import image as I

PAD = 24


def _img(rng, h=96, w=128):
    return jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))


def _interior_centers(rng, n, h, w, margin):
    c = rng.uniform(margin, [w - margin, h - margin], (n, 2))
    return jnp.asarray(c.astype(np.float32))


def test_strided_sample_matches_extract_patches(rng):
    img = _img(rng)
    img_pad = I.pad_image(img, PAD)
    n, p = 64, 8
    centers = _interior_centers(rng, n, 96, 128, margin=24)
    strides = jnp.asarray(rng.choice([1, 2, 4], n).astype(np.int32))
    got = I.strided_patch_sample(img_pad, centers, strides, p, PAD)
    for s in (1, 2, 4):
        m = np.asarray(strides) == s
        want = I.extract_patches(img, centers[m], p, s)
        np.testing.assert_allclose(
            np.asarray(got)[m], np.asarray(want), rtol=0, atol=3e-3
        )


def test_strided_sample_gradients_match(rng):
    img = _img(rng)
    img_pad = I.pad_image(img, PAD)
    n, p = 48, 8
    centers = _interior_centers(rng, n, 96, 128, margin=28)
    strides = jnp.asarray(rng.choice([1, 2], n).astype(np.int32))
    gu = strides.astype(jnp.float32)  # level 0: units = stride
    val, du, dv = I.strided_patch_sample(
        img_pad, centers, strides, p, PAD, grad_units=gu
    )
    for s in (1, 2):
        m = np.asarray(strides) == s
        wv, wdu, wdv = I.patch_residual_grad(img, centers[m], p, s)
        np.testing.assert_allclose(np.asarray(val)[m], np.asarray(wv), atol=3e-3)
        np.testing.assert_allclose(np.asarray(du)[m], np.asarray(wdu), atol=3e-3)
        np.testing.assert_allclose(np.asarray(dv)[m], np.asarray(wdv), atol=3e-3)


def test_strided_sample_zero_padding_outside(rng):
    """A center whose patch hangs off the frame reads zeros there, matching
    bilinear()'s zero-outside convention."""
    img = _img(rng, 64, 64)
    img_pad = I.pad_image(img, PAD)
    centers = jnp.asarray([[1.3, 2.7], [62.2, 61.1]], jnp.float32)
    strides = jnp.asarray([2, 2], jnp.int32)
    got = I.strided_patch_sample(img_pad, centers, strides, 8, PAD)
    want = I.extract_patches(img, centers, 8, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-3)


def test_extract_windows_exact_block(rng):
    img = _img(rng, 32, 40)
    img_pad = I.pad_image(img, 8)
    origins = jnp.asarray([[3, 5], [-2, -4], [35, 27]], jnp.int32)
    out = np.asarray(I.extract_windows(img_pad, origins, 6, 8))
    padded = np.asarray(img_pad)
    for k, (u, v) in enumerate(np.asarray(origins)):
        np.testing.assert_array_equal(
            out[k], padded[v + 8 : v + 14, u + 8 : u + 14]
        )
