"""Image operations for the photometric VIO path (pure JAX, batched).

Replaces the reference's OpenCV/vikit raster loops
(reference: src/lidar_selection.cpp — getpatch :117, bilinear gradient
stencils inside UpdateState :824-846, vk::shiTomasiScore, pyramid halfSample)
with gather-based batched kernels:

- `bilinear`: vectorized subpixel sampling with zero padding,
- `extract_patches`: the getpatch equivalent — one gather for all
  (point, pixel) pairs at a pyramid scale,
- `patch_residual_grad`: samples intensity AND the +-1-texel central
  difference gradient in one fused computation (the inner loop of
  UpdateState),
- `build_pyramid`: 2x2 average-pool pyramid,
- `shi_tomasi`: batched corner scores at candidate pixels.

Convention: images are (H, W) float32; pixel coords are (u, v) = (col,
row) like the reference; all samplers take flat (..., 2) pixel arrays.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from fastlivo_tpu.ops import pallas_windows


def bilinear(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img (H, W) at uv (..., 2); zero outside."""
    h, w = img.shape
    u = uv[..., 0]
    v = uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    def tap(du, dv):
        ui = u0i + du
        vi = v0i + dv
        ok = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
        val = img[jnp.clip(vi, 0, h - 1), jnp.clip(ui, 0, w - 1)]
        return jnp.where(ok, val, 0.0)

    return (
        tap(0, 0) * (1 - fu) * (1 - fv)
        + tap(1, 0) * fu * (1 - fv)
        + tap(0, 1) * (1 - fu) * fv
        + tap(1, 1) * fu * fv
    )


def patch_grid(patch_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """(patch_size^2, 2) offsets centered at the patch middle:
    (-half .. half-1) in both axes, row-major (x = row, y = col like the
    reference's x/y loops)."""
    half = patch_size // 2
    r = jnp.arange(patch_size, dtype=dtype) - half
    vv, uu = jnp.meshgrid(r, r, indexing="ij")  # element k = row*P + col
    return jnp.stack([uu.reshape(-1), vv.reshape(-1)], axis=-1)  # (u=col, v=row)


def _patch_uv(img, centers, patch_size, scale):
    """Shared anchoring: scale may be a python int or a per-point (N,)
    array (different pyramid strides per point)."""
    s = jnp.broadcast_to(
        jnp.asarray(scale, img.dtype), centers.shape[:-1]
    )[..., None]  # (N, 1)
    base = jnp.floor(centers / s) * s
    sub = (centers - base) / s
    grid = patch_grid(patch_size, img.dtype)  # (K, 2)
    uv = base[:, None, :] + (grid[None, :, :] + sub[:, None, :]) * s[:, None, :]
    return uv, s


def extract_patches(
    img: jnp.ndarray, centers: jnp.ndarray, patch_size: int, scale
) -> jnp.ndarray:
    """getpatch equivalent: (N, 2) centers -> (N, patch_size^2) intensities.

    Mirrors the reference's anchoring (lidar_selection.cpp:117-139): the
    patch grid is anchored at floor(center/scale)*scale and stepped by
    `scale`, with the subpixel fraction applied uniformly to every texel.
    """
    uv, _ = _patch_uv(img, centers, patch_size, scale)
    return bilinear(img, uv)


def patch_residual_grad(
    img: jnp.ndarray,
    centers: jnp.ndarray,
    patch_size: int,
    scale,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused intensity + central-difference gradient sampling.

    Returns (intensity (N, K), du (N, K), dv (N, K)) where K = patch_size^2
    and gradients are in *full-resolution pixel* units (the reference
    multiplies Jimg by 1/scale; here the division is already applied).
    """
    uv, s = _patch_uv(img, centers, patch_size, scale)
    val = bilinear(img, uv)
    zero = jnp.zeros_like(s)
    off_u = jnp.concatenate([s, zero], axis=-1)[:, None, :]
    off_v = jnp.concatenate([zero, s], axis=-1)[:, None, :]
    du = 0.5 * (bilinear(img, uv + off_u) - bilinear(img, uv - off_u)) / s
    dv = 0.5 * (bilinear(img, uv + off_v) - bilinear(img, uv - off_v)) / s
    return val, du, dv


def pad_image(img: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Zero-pad an image on all sides (OOB patch texels read 0, matching
    the reference's warpAffine border behavior, lidar_selection.cpp:276)."""
    return jnp.pad(img, ((pad, pad), (pad, pad)))


def extract_windows(
    img_pad: jnp.ndarray, origins: jnp.ndarray, win: int, pad: int
) -> jnp.ndarray:
    """One contiguous (win, win) block per candidate from a padded image.

    origins: (N, 2) int32 (u, v) top-left corners in UNPADDED pixel
    coordinates. Windows whose origin lies within [-pad, dim + pad - win]
    are exact; origins outside are clamped (callers gate such candidates).

    This is THE fast path for per-candidate patch work on TPU: a block
    slice is a gather of contiguous rows, ~10x cheaper than the equivalent
    scattered per-texel gathers (see strided_patch_sample).
    """
    hp, wp = img_pad.shape
    ou = jnp.clip(origins[:, 0] + pad, 0, wp - win)
    ov = jnp.clip(origins[:, 1] + pad, 0, hp - win)

    def tpu_path(ou, ov):
        # In-VMEM window copies (see ops/pallas_windows.py). XLA's
        # lowering of any batched-block-gather phrasing is a sequential
        # while-of-DUS (~0.85 us/candidate/call) or the arbitrary-gather
        # slow path; the kernel does the same loop entirely in VMEM.
        starts = jnp.stack([ou, ov], axis=-1).astype(jnp.int32)
        return pallas_windows.extract_windows_tpu(img_pad, starts, win)

    def xla_path(ou, ov):
        # Batched dynamic-slice via lax.gather with 2-D slice_sizes (one
        # gather of N contiguous blocks).
        starts = jnp.stack([ov, ou], axis=-1)  # (N, 2)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1)
        )
        return jax.lax.gather(
            img_pad, starts, dnums, slice_sizes=(win, win),
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    if not pallas_windows.vmem_ok(img_pad):
        return xla_path(ou, ov)
    # platform_dependent picks per LOWERING platform (a program traced
    # while the default backend is the TPU may still be lowered for a CPU
    # mesh, e.g. the multichip dryrun).
    return jax.lax.platform_dependent(ou, ov, tpu=tpu_path, default=xla_path)


def strided_patch_sample(
    img_pad: jnp.ndarray,
    centers: jnp.ndarray,
    strides: jnp.ndarray,
    patch_size: int,
    pad: int,
    stride_set: Tuple[int, ...] = (1, 2, 4),
    grad_units=None,
):
    """Patch (+ optional gradient) bilinear sampling on a stride lattice,
    window-based.

    Samples img at `centers[n] + strides[n] * m` for m on the centered
    patch_size x patch_size integer grid — the same lattice as
    `extract_patches` (= the reference's getpatch anchoring,
    lidar_selection.cpp:117-139: every texel of a patch shares one
    subpixel fraction). Because the fraction is shared, the whole patch
    (and its central-difference gradients) is four STATIC strided slices
    of one contiguous window per candidate, instead of per-texel scattered
    gathers. Measured on TPU v5e at 208 candidates x 64 px: scattered
    bilinear ~3.5 ms per iteration; this form ~0.1 ms.

    Args:
      img_pad: (H + 2 pad, W + 2 pad) zero-padded image (see pad_image).
      centers: (N, 2) float pixel centers in UNPADDED coordinates.
      strides: (N,) int32 per-candidate lattice stride; every value must
        be in `stride_set` (each static stride is computed and the result
        selected per candidate).
      patch_size: texels per side.
      pad: the padding img_pad was built with. Windows are sized for
        max_stride but anchored with each candidate's own stride, so
        in-frame centers never clamp only when
          pad >= max(max_stride * (half + g),
                     (patch_size + 2g - 1) * max_stride + 1
                       - min_stride * (half + g))
        with half = patch_size // 2 and g = 1 if grad_units else 0
        (the second term dominates: a small-stride candidate's window
        overhangs its center by win - 1 - stride*(half+g) texels).
      grad_units: None -> returns val (N, patch_size^2) only. Otherwise a
        (N,) array of pixel units per lattice step (e.g. stride * 2^level
        when sampling pyramid level `level` of a full-resolution frame);
        returns (val, du, dv) with gradients per *unit* (full-res px).

    Returns val or (val, du, dv), each (N, patch_size^2), row-major
    (v slow, u fast) like patch_grid/extract_patches.
    """
    dtype = img_pad.dtype
    half = patch_size // 2
    g = 0 if grad_units is None else 1
    n_lat = patch_size + 2 * g  # lattice points per axis (m = -half-g .. )
    max_s = max(stride_set)
    win = (n_lat - 1) * max_s + 2

    i0 = jnp.floor(centers)
    frac = (centers - i0).astype(dtype)  # shared bilinear weight per cand
    i0 = i0.astype(jnp.int32)
    origins = i0 - strides[:, None] * (half + g)
    windows = extract_windows(img_pad, origins, win, pad)

    fu = frac[:, 0][:, None, None]
    fv = frac[:, 1][:, None, None]

    def lattice(s: int) -> jnp.ndarray:
        span = (n_lat - 1) * s + 1

        def corner(dv, du):
            return jax.lax.slice(
                windows, (0, dv, du), (windows.shape[0], dv + span, du + span),
                (1, s, s),
            )

        return (
            corner(0, 0) * (1 - fu) * (1 - fv)
            + corner(0, 1) * fu * (1 - fv)
            + corner(1, 0) * (1 - fu) * fv
            + corner(1, 1) * fu * fv
        )  # (N, n_lat, n_lat) bilinear values at lattice points

    lat = lattice(stride_set[0])
    for s in stride_set[1:]:
        lat = jnp.where((strides == s)[:, None, None], lattice(s), lat)

    n = centers.shape[0]
    val = lat[:, g : g + patch_size, g : g + patch_size].reshape(n, -1)
    if grad_units is None:
        return val
    inv = (1.0 / jnp.maximum(grad_units, 1e-9)).astype(dtype)[:, None]
    du = 0.5 * (
        lat[:, g : g + patch_size, 2 : 2 + patch_size]
        - lat[:, g : g + patch_size, 0:patch_size]
    ).reshape(n, -1) * inv
    dv = 0.5 * (
        lat[:, 2 : 2 + patch_size, g : g + patch_size]
        - lat[:, 0:patch_size, g : g + patch_size]
    ).reshape(n, -1) * inv
    return val, du, dv


def sample_patch_grid(
    patches: jnp.ndarray, coords: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear sampling inside small stored patches.

    patches: (N, S, S) per-point texel grids; coords: (N, K, 2) in texel
    units with (0, 0) at the grid's top-left (u = col, v = row). Samples
    outside clamp to the border (the affine warp's extent is bounded by
    design; clamping only grazes corner texels).
    """
    n, s, _ = patches.shape
    u = jnp.clip(coords[..., 0], 0.0, s - 1.0)
    v = jnp.clip(coords[..., 1], 0.0, s - 1.0)
    u0 = jnp.clip(jnp.floor(u), 0, s - 2).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(v), 0, s - 2).astype(jnp.int32)
    fu = (u - u0).astype(patches.dtype)
    fv = (v - v0).astype(patches.dtype)

    # Bilinear sampling from tiny per-candidate patches as a one-hot
    # batched matvec: 4 arbitrary gathers over (N, K, s*s) cost ~560 us
    # per frame on TPU v5e; the equivalent one-hot weight build + einsum
    # is regular VPU/MXU work (~tens of us). The weight row has exactly
    # the 4 bilinear taps of each sample.
    k = s * s
    texel = jnp.arange(k, dtype=jnp.int32)  # (k,)
    idx = v0 * s + u0  # (N, K)

    def oh(off, w):
        return (idx[..., None] + off == texel) * w[..., None]

    w_mat = (
        oh(0, (1 - fu) * (1 - fv))
        + oh(1, fu * (1 - fv))
        + oh(s, (1 - fu) * fv)
        + oh(s + 1, fu * fv)
    )  # (N, K, k)
    return jnp.einsum("nok,nk->no", w_mat, patches.reshape(n, k))


def build_pyramid(img: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """2x2 average-pool pyramid, level 0 = full resolution."""
    pyr = [img]
    cur = img
    for _ in range(levels - 1):
        h, w = cur.shape
        # reduce_window, not reshape+mean: the (h/2, 2, w/2, 2) reshape
        # forces a physical relayout on TPU (~110 us at 512x640).
        cur = (
            jax.lax.reduce_window(
                cur[: h - h % 2, : w - w % 2],
                0.0,
                jax.lax.add,
                (2, 2),
                (2, 2),
                "VALID",
            )
            * 0.25
        )
        pyr.append(cur)
    return pyr


def shi_tomasi_dense(img: jnp.ndarray, halfbox: int = 4) -> jnp.ndarray:
    """Dense Shi-Tomasi score map: score[y, x] equals
    `shi_tomasi(img, [[x, y]])` for interior integer pixels, computed with
    REGULAR ops (shifts + one reduce_window) instead of per-point gathers.

    Rationale: scoring N scattered points costs N x box^2 x 8 random image
    gathers (measured 0.7 s for 65k points on TPU v5e in `maintain`);
    the dense map is ~3 elementwise passes + one windowed sum over the
    image and the per-point score becomes ONE gather.
    """
    dtype = img.dtype
    dx = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    dy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))
    k = 2 * halfbox
    pad = ((halfbox, k - 1 - halfbox), (halfbox, k - 1 - halfbox))

    def box(a):
        # out[i, j] = sum over window [-halfbox, halfbox) — the same
        # offsets the per-point version uses (arange(2h) - h).
        return jax.lax.reduce_window(a, jnp.asarray(0, dtype), jax.lax.add,
                                     (k, k), (1, 1), pad)

    dxx = box(dx * dx)
    dyy = box(dy * dy)
    dxy = box(dx * dy)
    area = k * k
    return (
        0.5 * (dxx + dyy - jnp.sqrt((dxx - dyy) ** 2 + 4.0 * dxy**2)) / area
    )


def shi_tomasi_at(
    img: jnp.ndarray, centers: jnp.ndarray, halfbox: int = 4
) -> jnp.ndarray:
    """Shi-Tomasi scores at scattered centers via the dense map + one
    gather per point (fast path for large center batches)."""
    dense = shi_tomasi_dense(img, halfbox)
    h, w = img.shape
    u = jnp.clip(jnp.floor(centers[:, 0]).astype(jnp.int32), 0, w - 1)
    v = jnp.clip(jnp.floor(centers[:, 1]).astype(jnp.int32), 0, h - 1)
    return dense[v, u]


def shi_tomasi(img: jnp.ndarray, centers: jnp.ndarray, halfbox: int = 4) -> jnp.ndarray:
    """Batched Shi-Tomasi (min eigenvalue of the gradient Gram) at centers.

    Parity with vk::shiTomasiScore (used by addSparseMap,
    lidar_selection.cpp:157): gradients over a (2*halfbox)^2 box, score =
    smaller eigenvalue of [[dXX, dXY], [dXY, dYY]] / (2 * area).
    """
    box = 2 * halfbox
    r = jnp.arange(box, dtype=img.dtype) - halfbox
    yy, xx = jnp.meshgrid(r, r, indexing="ij")
    grid = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)  # (B, 2)
    uv = jnp.floor(centers)[:, None, :] + grid[None, :, :]

    off_u = jnp.asarray([1.0, 0.0], img.dtype)
    off_v = jnp.asarray([0.0, 1.0], img.dtype)
    dx = 0.5 * (bilinear(img, uv + off_u) - bilinear(img, uv - off_u))
    dy = 0.5 * (bilinear(img, uv + off_v) - bilinear(img, uv - off_v))

    dxx = jnp.sum(dx * dx, axis=-1)
    dyy = jnp.sum(dy * dy, axis=-1)
    dxy = jnp.sum(dx * dy, axis=-1)
    area = box * box
    return (
        0.5
        * (dxx + dyy - jnp.sqrt((dxx - dyy) ** 2 + 4.0 * dxy**2))
        / area
    )
