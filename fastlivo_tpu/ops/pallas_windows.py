"""Pallas TPU kernel: batched extraction of per-candidate image windows.

XLA lowers a gather of N contiguous (win, win) blocks (however phrased:
vmap(dynamic_slice), lax.gather with 2-D slice_sizes, flat element gather)
to either a SEQUENTIAL while loop of dynamic-update-slices (~0.85 us per
candidate per call) or the slow arbitrary-index gather path. The VIO hot
path extracts such windows ~10 times per frame (stored patch pyramids,
select gate, every photometric iteration), ~1.7 ms/frame at 208
candidates on TPU v5e.

Mosaic constraints shape the kernel: vector loads need (8, 128)-aligned
dynamic offsets, and DMA slices of tiled memrefs need aligned sizes too.
So each window is fetched as an ALIGNED superset block (rows snapped down
to a multiple of 8, lanes to a multiple of 128), rotated into place with
dynamic sublane/lane rotates (pltpu.roll takes traced shifts), and the
(win, win) corner is written out. The padded image stays resident in VMEM
(camera frames are ~1.5 MB; far under the ~16 MB budget).

Used by ops/image.extract_windows on TPU; other platforms (CPU tests)
keep the XLA formulation, and an interpret-mode test pins equivalence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Images larger than this stay on the XLA path (VMEM budget: image +
# windows + headroom).
_MAX_VMEM_IMAGE_BYTES = 8 * 1024 * 1024
_LANE = 128
_SUB = 8


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _block_dims(win: int):
    bh = _round_up(win + _SUB - 1, _SUB)
    bw = _round_up(win, _LANE) + _LANE
    return bh, bw


def _window_kernel(orig_ref, img_ref, out_ref, *, win: int, n: int):
    bh, bw = _block_dims(win)

    def body(i, _):
        ou = orig_ref[i, 0]
        ov = orig_ref[i, 1]
        ov8 = pl.multiple_of((ov // _SUB) * _SUB, _SUB)
        ou128 = pl.multiple_of((ou // _LANE) * _LANE, _LANE)
        blk = img_ref[pl.ds(ov8, bh), pl.ds(ou128, bw)]
        blk = pltpu.roll(blk, (bh - (ov - ov8)) % bh, axis=0)
        blk = pltpu.roll(blk, (bw - (ou - ou128)) % bw, axis=1)
        out_ref[pl.ds(i, 1)] = blk[:win, :win][None]
        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("win",))
def extract_windows_tpu(
    img_pad: jnp.ndarray, starts: jnp.ndarray, win: int
) -> jnp.ndarray:
    """starts: (N, 2) int32 (ou, ov) top-left corners in PADDED image
    coords, already clipped to [0, dim - win]. Returns (N, win, win)."""
    n = starts.shape[0]
    bh, bw = _block_dims(win)
    hp, wp = img_pad.shape
    # Grow the image so every aligned superset block is in bounds:
    # ov <= hp - win  =>  rows reach (ov // 8) * 8 + bh at most.
    hp2 = _round_up(hp - win + bh, _SUB)
    wp2 = _round_up(wp - win + bw, _LANE)
    img_big = jnp.pad(img_pad, ((0, max(hp2 - hp, 0)), (0, max(wp2 - wp, 0))))
    return pl.pallas_call(
        functools.partial(_window_kernel, win=win, n=n),
        out_shape=jax.ShapeDtypeStruct((n, win, win), img_pad.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(starts, img_big)


def vmem_ok(img_pad: jnp.ndarray) -> bool:
    """True when the image fits the kernel's VMEM budget (platform choice
    is handled by lax.platform_dependent at the call site)."""
    return img_pad.size * img_pad.dtype.itemsize <= _MAX_VMEM_IMAGE_BYTES
