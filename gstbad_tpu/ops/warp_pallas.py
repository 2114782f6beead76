"""Pallas warp kernel — tile-windowed gather for the geometric warps.

XLA lowers the remap gather to ~1 G-row/s on v5e; this kernel exploits the
STATIC inverse map: for every 8x128 output tile the source bounding window
is known at build time, so the kernel DMAs that window into VMEM (scalar-
prefetched offsets) and resolves per-pixel sources with the one dynamic
addressing primitive the VPU does have — a 128-lane `take_along_axis`
shuffle — plus row/column-block mask-selects.  Pixels are u32-packed
(4xu8), so one gather moves a whole pixel.

Maps whose tiles exceed the window caps (strong magnification, wrap modes)
fall back to the XLA gather — decided per map on the host (plan()).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128


class WarpPlan(NamedTuple):
    offsets: np.ndarray   # [n_tiles, 2] int32 (r0, c0)
    lr: np.ndarray        # [H, W] int32 local source row
    lc: np.ndarray        # [H, W] int32 local source col
    sr: int               # window rows (static)
    sc: int               # window cols (static, multiple of 128)
    n_th: int
    n_tw: int


def plan(mp: np.ndarray, width: int, height: int, off_edge: str,
         sr_cap: int = 128, sc_cap: int = 512) -> Optional[WarpPlan]:
    """Build the per-tile window plan from an inverse map, or None when the
    map exceeds the window caps (caller uses the XLA gather)."""
    from gstbad_tpu.ops.remap import fix_map
    if height % TILE_H or width % TILE_W:
        return None
    flat, valid = fix_map(mp, width, height, off_edge)
    ty = (flat // width).reshape(height, width).astype(np.int64)
    tx = (flat % width).reshape(height, width).astype(np.int64)
    v2d = valid.reshape(height, width)
    n_th, n_tw = height // TILE_H, width // TILE_W

    def tiles(a):
        return a.reshape(n_th, TILE_H, n_tw, TILE_W).transpose(0, 2, 1, 3)

    ty_t, tx_t, v_t = tiles(ty), tiles(tx), tiles(v2d)
    # off-edge pixels are overwritten by the background after the kernel;
    # exclude them from the window spans (they'd otherwise drag every edge
    # tile's window to (0,0))
    big, small = np.where(v_t, ty_t, 1 << 30), np.where(v_t, ty_t, -1)
    rmin = np.where(v_t.any((2, 3)), big.min(axis=(2, 3)), 0)
    rmax = np.where(v_t.any((2, 3)), small.max(axis=(2, 3)), 0)
    bigc, smallc = np.where(v_t, tx_t, 1 << 30), np.where(v_t, tx_t, -1)
    cmin = np.where(v_t.any((2, 3)), bigc.min(axis=(2, 3)), 0)
    cmax = np.where(v_t.any((2, 3)), smallc.max(axis=(2, 3)), 0)
    # invalid pixels gather from the window origin (harmless, in-bounds)
    ty = np.where(v2d, ty, np.repeat(np.repeat(rmin, TILE_H, 0), TILE_W, 1))
    tx = np.where(v2d, tx, np.repeat(np.repeat(cmin, TILE_H, 0), TILE_W, 1))
    sr = int((rmax - rmin).max()) + 1
    sc = int((cmax - cmin).max()) + 1
    if sr > sr_cap or sc > sc_cap:
        return None
    # DMA slice origins must align to the (8, 128) HBM tile grid; widen the
    # window by one alignment step to absorb the round-down (capped at the
    # frame itself, which is already tile-aligned)
    sr = min(max(8, -(-(sr + 7) // 8) * 8), height)
    sc = min(max(TILE_W, -(-(sc + TILE_W - 1) // TILE_W) * TILE_W), width)
    if height % 8 or width % TILE_W:
        return None
    r0 = (np.clip(rmin, 0, height - sr) // 8) * 8
    c0 = (np.clip(cmin, 0, width - sc) // TILE_W) * TILE_W
    lr = (ty - np.repeat(np.repeat(r0, TILE_H, 0), TILE_W, 1)
          ).astype(np.int32)
    lc = (tx - np.repeat(np.repeat(c0, TILE_H, 0), TILE_W, 1)
          ).astype(np.int32)
    # per-tile actual row/column-block counts so the kernel loops only over
    # the rows a tile really touches (the static worst case is ~40x larger)
    nrows = np.maximum(rmax - r0 + 1, 1).astype(np.int32)
    nblk = ((np.maximum(cmax - c0 + 1, 1) + TILE_W - 1)
            // TILE_W).astype(np.int32)
    offsets = np.stack([r0.reshape(-1), c0.reshape(-1), nrows.reshape(-1),
                        nblk.reshape(-1)], -1).astype(np.int32)
    return WarpPlan(offsets, lr, lc, sr, sc, n_th, n_tw)


def _kernel(offsets_ref, img_ref, lr_ref, lc_ref, out_ref, win, sem,
            *, sr: int, sc: int, n_tw: int):
    bi = pl.program_id(0)
    tid = pl.program_id(1) * n_tw + pl.program_id(2)
    r0 = pl.multiple_of(offsets_ref[tid, 0], 8)
    c0 = pl.multiple_of(offsets_ref[tid, 1], TILE_W)
    n_rows = offsets_ref[tid, 2]
    n_blk = offsets_ref[tid, 3]
    cp = pltpu.make_async_copy(
        img_ref.at[bi, pl.ds(r0, sr), pl.ds(c0, sc)], win, sem)
    cp.start()
    cp.wait()

    lr = lr_ref[:]
    lc = lc_ref[:]
    rem = lc & (TILE_W - 1)
    blk = lc >> 7
    acc = jnp.zeros((TILE_H, TILE_W), jnp.int32)

    # take_along_axis promotes indices to int64 under the global x64 config;
    # issue the batched lane-gather (the one Mosaic lowers to a VPU shuffle)
    # directly with int32 indices
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))

    def blk_body(b, carry):
        s, acc = carry
        b = jnp.int32(b)
        off = pl.multiple_of(b * TILE_W, TILE_W)
        seg = pltpu.repeat(win[pl.ds(s, 1), pl.ds(off, TILE_W)],
                           TILE_H, axis=0)
        vals = lax.gather(seg, rem[..., None], dnums,
                          slice_sizes=(1, 1),
                          mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        acc = jnp.where((lr == s) & (blk == b), vals, acc)
        return s, acc

    def row_body(s, acc):
        s = jnp.int32(s)  # keep the kernel 32-bit under global x64
        _, acc = lax.fori_loop(jnp.int32(0), n_blk, blk_body, (s, acc))
        return acc

    acc = lax.fori_loop(jnp.int32(0), n_rows, row_body, acc)
    out_ref[0] = acc


def warp_u32(img_u32: jnp.ndarray, plan_: WarpPlan,
             interpret: bool = False) -> jnp.ndarray:
    """[B, H, W] int32 (u32-packed pixels) -> warped [B, H, W] int32."""
    b, h, w = img_u32.shape
    grid = (b, plan_.n_th, plan_.n_tw)
    kernel = functools.partial(_kernel, sr=plan_.sr, sc=plan_.sc,
                               n_tw=plan_.n_tw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # img stays in HBM
            pl.BlockSpec((TILE_H, TILE_W), lambda bi, i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda bi, i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_H, TILE_W),
                               lambda bi, i, j, *_: (bi, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((plan_.sr, plan_.sc), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(plan_.offsets), img_u32, jnp.asarray(plan_.lr),
      jnp.asarray(plan_.lc))


def warp_batch(img: jnp.ndarray, plan_: WarpPlan, valid: jnp.ndarray,
               background: jnp.ndarray, interpret: bool = False
               ) -> jnp.ndarray:
    """[B, H, W, 4] uint8 -> warped, with the off-edge background applied."""
    b, h, w, c = img.shape
    packed = lax.bitcast_convert_type(img, jnp.int32).reshape(b, h, w)
    warped = warp_u32(packed, plan_, interpret=interpret)
    out = lax.bitcast_convert_type(warped[..., None], jnp.uint8
                                   ).reshape(b, h, w, c)
    vmask = valid.reshape(h, w)[None, :, :, None]
    return jnp.where(vmask, out, background[None, None, None, :])
