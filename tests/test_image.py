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


def test_strided_sample_border_adjacent_no_clamp(rng):
    """Stride-1/2 candidates near the right/bottom edge. Windows are
    sized for max stride 4 but anchored with each candidate's own stride,
    so a stride-1 window overhangs its center by
    win - 1 - 1*(half+grad) = 32 texels; pad below that silently clamps
    the window in extract_windows and shifts the sampled patch (ADVICE
    r2: ~48 intensity-unit error at pad=24). vio's _SAMPLE_PAD must
    satisfy the rule."""
    from fastlivo_tpu.models.vio import _SAMPLE_PAD

    assert _SAMPLE_PAD >= 32
    img = _img(rng, 96, 128)
    img_pad = I.pad_image(img, _SAMPLE_PAD)
    centers = jnp.asarray(
        [[123.4, 91.2], [122.1, 4.3], [4.6, 90.7], [123.9, 45.5]], jnp.float32
    )
    strides = jnp.asarray([1, 1, 2, 2], jnp.int32)
    gu = strides.astype(jnp.float32)
    val, du, dv = I.strided_patch_sample(
        img_pad, centers, strides, 8, _SAMPLE_PAD, grad_units=gu
    )
    for s in (1, 2):
        m = np.asarray(strides) == s
        wv, wdu, wdv = I.patch_residual_grad(img, centers[m], 8, s)
        np.testing.assert_allclose(np.asarray(val)[m], np.asarray(wv), atol=3e-3)
        np.testing.assert_allclose(np.asarray(du)[m], np.asarray(wdu), atol=3e-3)
        np.testing.assert_allclose(np.asarray(dv)[m], np.asarray(wdv), atol=3e-3)


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


def test_pallas_window_kernel_interpret(rng):
    """The pallas TPU window kernel (interpret mode) == the XLA gather
    formulation used on other platforms."""
    import functools
    import jax
    from jax.experimental import pallas as pl
    from fastlivo_tpu.ops import pallas_windows as PW

    img = _img(rng, 48, 64)
    img_pad = np.asarray(I.pad_image(img, 8))
    win, pad = 11, 8
    origins = rng.integers(-8, 50, (17, 2)).astype(np.int32)
    ou = np.clip(origins[:, 0] + pad, 0, img_pad.shape[1] - win)
    ov = np.clip(origins[:, 1] + pad, 0, img_pad.shape[0] - win)
    starts = jnp.asarray(np.stack([ou, ov], -1))

    bh, bw = PW._block_dims(win)
    hp, wp = img_pad.shape
    hp2 = PW._round_up(hp - win + bh, PW._SUB)
    wp2 = PW._round_up(wp - win + bw, PW._LANE)
    img_big = np.pad(img_pad, ((0, max(hp2 - hp, 0)), (0, max(wp2 - wp, 0))))
    out = pl.pallas_call(
        functools.partial(PW._window_kernel, win=win, n=17),
        out_shape=jax.ShapeDtypeStruct((17, win, win), jnp.float32),
        interpret=True,
    )(starts, jnp.asarray(img_big))
    want = I.extract_windows(jnp.asarray(img_pad), jnp.asarray(origins), win, pad)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
