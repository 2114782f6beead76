"""Pallas warp engine — tile-classed windowed gather for the geometric warps.

XLA lowers the remap gather to ~0.1-1 Gelem/s on v5e; this engine exploits
the STATIC inverse map (gstgeometrictransform.c:80-128 precomputes it once
per caps change): for every 8x128 output tile the source bounding window is
known at plan time, so a kernel DMAs that window into VMEM and resolves the
per-pixel sources with the one dynamic addressing primitive the VPU has — a
128-lane `take_along_axis` shuffle — plus fully static row/column-block
selects.  Pixels are u32-packed (4xu8) so one gather moves a whole pixel.

Window sizes vary wildly across tiles (fisheye 1080p: mean 16x78, max
123x308), so a single worst-case static window wastes both DMA and unrolled
compute.  plan() buckets tiles into <=3 (rows, cols) window CLASSES and
emits one fully-static pallas_call per class over just that class's tiles
(scalar-prefetched tile lists drive the BlockSpec index maps); the calls
chain through `input_output_aliases` so each writes only its own tiles.
Tiles whose window exceeds the caps (strong magnification, wrap modes) are
fixed up afterwards with one small XLA gather+scatter over just their
pixels.  Mosaic constraints honored (all verified on v5e): DMA origins
aligned to the (8, 128) i32 tile grid, no dynamic VMEM loads (static unroll
per class), 32-bit everything (the package enables global x64).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
SR_CAP = 128     # max window rows a class may have
SC_CAP = 512     # max window cols
MAX_CLASSES = 5
MAX_FIX_FRAC = 0.25   # beyond this outlier-tile fraction the XLA gather wins


class ClassPlan(NamedTuple):
    sr: int                # window rows (static, multiple of 8)
    sc: int                # window cols (static, multiple of 128)
    offsets: np.ndarray    # [4, T] int32: r0, c0, out_tile_i, out_tile_j
    # (transposed so the SMEM lane padding to 128 hits the size-4 axis,
    # not the tile axis — a [T, 4] table is padded 32x and blows the 1 MiB
    # SMEM budget at 4K tile counts)


class WarpPlan(NamedTuple):
    classes: Tuple[ClassPlan, ...]
    lr: np.ndarray         # [H, W] int32 source row local to own tile window
    lc: np.ndarray         # [H, W] int32 source col local to own tile window
    fix_src: np.ndarray    # [K] int32 flat src index for outlier-tile pixels
    fix_dst: np.ndarray    # [K] int32 flat dst index
    # Rotation-dominant outlier tiles (windows taller than SR_CAP — the
    # twirl center, ROADMAP r2 #1): their source windows fit the caps in
    # the TRANSPOSED frame (a ~90deg local rotation swaps the window's
    # aspect), so they run as a nested plan over the transposed image and
    # a final elementwise select — no XLA gather.
    t_plan: Optional["WarpPlan"] = None
    t_shape: Optional[Tuple[int, int]] = None   # padded (rows, cols) of
    #                                             the transposed problem
    t_mask: Optional[np.ndarray] = None         # [H, W] bool outlier pixels
    # Tiles whose every pixel maps to itself (the region outside a warp's
    # effect radius — most of a twirl/fisheye frame) skip the kernel
    # entirely: one elementwise passthrough select instead of a gather.
    ident_mask: Optional[np.ndarray] = None     # [H, W] bool identity px


def _class_menu(h: int, w: int):
    srs = [s for s in (8, 16, 24, 32, 40, 48, 64, 80, 96, 112, 128)
           if s <= min(h, SR_CAP)]
    scs = [s for s in (128, 256, 384, 512) if s <= min(w, SC_CAP)]
    return srs, scs


def plan(mp: np.ndarray, width: int, height: int, off_edge: str,
         max_classes: int = MAX_CLASSES,
         _allow_transpose: bool = True) -> Optional[WarpPlan]:
    """Build the tile-class plan from an inverse map, or None when the map
    isn't tileable / is gather-bound anyway (caller uses the XLA gather)."""
    from gstbad_tpu.ops.remap import fix_map
    if height % TILE_H or width % TILE_W:
        return None
    srs, scs = _class_menu(height, width)
    if not srs or not scs:
        return None
    flat, valid = fix_map(mp, width, height, off_edge)
    ty = (flat // width).reshape(height, width).astype(np.int64)
    tx = (flat % width).reshape(height, width).astype(np.int64)
    v2d = valid.reshape(height, width)
    n_th, n_tw = height // TILE_H, width // TILE_W

    def tiles(a):
        return a.reshape(n_th, TILE_H, n_tw, TILE_W).transpose(0, 2, 1, 3)

    ty_t, tx_t, v_t = tiles(ty), tiles(tx), tiles(v2d)
    any_v = v_t.any((2, 3))
    # identity tiles: every pixel valid and mapped to itself — skipped
    # entirely (warp_u32 passes the image through elementwise)
    self_y = np.broadcast_to(np.arange(height)[:, None], (height, width))
    self_x = np.broadcast_to(np.arange(width)[None, :], (height, width))
    ident_pix = v2d & (ty == self_y) & (tx == self_x)
    ident = tiles(ident_pix).all((2, 3))
    # fully-invalid tiles (a NaN-masked transposed sub-plan's background)
    # have nothing to compute either
    planned = any_v & ~ident
    # off-edge pixels are overwritten by the background after the kernel;
    # exclude them from the window spans (they'd otherwise drag every edge
    # tile's window to (0,0))
    rmin = np.where(any_v, np.where(v_t, ty_t, 1 << 30).min((2, 3)), 0)
    rmax = np.where(any_v, np.where(v_t, ty_t, -1).max((2, 3)), 0)
    cmin = np.where(any_v, np.where(v_t, tx_t, 1 << 30).min((2, 3)), 0)
    cmax = np.where(any_v, np.where(v_t, tx_t, -1).max((2, 3)), 0)
    # invalid pixels gather from their tile's window origin (in-bounds, the
    # value is masked to the background afterwards)
    r0u = (rmin // 8) * 8
    c0u = (cmin // TILE_W) * TILE_W
    need_r = rmax - r0u + 1            # window rows if origin not clipped
    need_c = cmax - c0u + 1
    ok = (need_r <= srs[-1]) & (need_c <= scs[-1]) | ~planned
    n_fix = int((~ok).sum())

    # rotation-dominant outliers -> nested transposed plan.  Non-outlier
    # pixels are NaN'd in the swapped map so they become invalid and do
    # not drag the transposed tiles' windows (fix_map turns NaN into an
    # out-of-bounds index).
    t_plan = None
    t_shape = None
    t_mask = None
    if n_fix and _allow_transpose:
        pix = np.repeat(np.repeat(~ok, TILE_H, 0), TILE_W, 1)  # [H, W]
        h_t = -(-width // TILE_H) * TILE_H      # transposed rows = x
        w_t = -(-height // TILE_W) * TILE_W     # transposed cols = y
        mp_t = np.full((h_t, w_t, 2), np.nan)
        sel_t = pix.T                            # [W, H]
        mp_t[:width, :height, 0] = np.where(sel_t, mp[..., 1].T, np.nan)
        mp_t[:width, :height, 1] = np.where(sel_t, mp[..., 0].T, np.nan)
        cand = plan(mp_t, width=w_t, height=h_t, off_edge="ignore",
                    max_classes=max_classes, _allow_transpose=False)
        # only worth it if the transposed classes cover most of the
        # outliers (its own residual fixup shrinks accordingly)
        if cand is not None and len(cand.fix_dst) <= 0.25 * pix.sum():
            t_plan, t_shape, t_mask = cand, (h_t, w_t), pix
    if t_plan is None and n_fix > MAX_FIX_FRAC * ok.size:
        return None

    # bucket each coverable tile to the smallest fitting menu entry
    sr_arr = np.array(srs)
    sc_arr = np.array(scs)
    bi_r = np.searchsorted(sr_arr, np.clip(need_r, 1, srs[-1]))
    bi_c = np.searchsorted(sc_arr, np.clip(need_c, 1, scs[-1]))
    buckets = {}
    for (i, j) in zip(*np.nonzero(ok & planned)):
        key = (int(sr_arr[bi_r[i, j]]), int(sc_arr[bi_c[i, j]]))
        buckets.setdefault(key, []).append((int(i), int(j)))
    # greedy merge to <= max_classes: fold the bucket with the least total
    # upgrade cost into its cheapest dominating bucket (the join always
    # exists: (max sr, max sc) of the two)
    while len(buckets) > max_classes:
        best = None
        for k1, t1 in buckets.items():
            for k2 in buckets:
                if k2 == k1:
                    continue
                join = (max(k1[0], k2[0]), max(k1[1], k2[1]))
                # cost of moving k1 (and k2 if the join is new) to `join`
                cost = len(t1) * (join[0] * join[1] - k1[0] * k1[1])
                if join != k2:
                    cost += len(buckets[k2]) * (join[0] * join[1]
                                                - k2[0] * k2[1])
                if best is None or cost < best[0]:
                    best = (cost, k1, k2, join)
        _, k1, k2, join = best
        merged = buckets.pop(k1) + buckets.pop(k2)
        buckets.setdefault(join, []).extend(merged)

    lr = np.zeros((height, width), np.int32)
    lc = np.zeros((height, width), np.int32)
    classes = []
    for (sr, sc), tlist in sorted(buckets.items()):
        offs = np.zeros((len(tlist), 4), np.int32)
        for t, (i, j) in enumerate(tlist):
            r0 = max(0, min(int(r0u[i, j]), height - sr))
            c0 = max(0, min(int(c0u[i, j]), width - sc))
            sl = np.s_[i * TILE_H:(i + 1) * TILE_H,
                       j * TILE_W:(j + 1) * TILE_W]
            lr[sl] = np.where(v2d[sl], ty[sl] - r0, 0)
            lc[sl] = np.where(v2d[sl], tx[sl] - c0, 0)
            offs[t] = (r0, c0, i, j)
        classes.append(ClassPlan(sr, sc, np.ascontiguousarray(offs.T)))

    # residual outlier tiles (not covered by a transposed plan): their
    # pixels go through one flat gather + scatter
    if n_fix and t_plan is None:
        mask = np.zeros((n_th, n_tw), bool)
        mask[~ok] = True
        pix2 = np.repeat(np.repeat(mask, TILE_H, 0), TILE_W, 1)
        fix_dst = np.nonzero(pix2.reshape(-1))[0].astype(np.int32)
        fix_src = flat[fix_dst].astype(np.int32)
    else:
        fix_dst = np.zeros(0, np.int32)
        fix_src = np.zeros(0, np.int32)
    ident_mask = None
    if ident.any():
        ident_mask = np.repeat(np.repeat(ident, TILE_H, 0), TILE_W, 1)
    return WarpPlan(tuple(classes), lr, lc, fix_src, fix_dst,
                    t_plan, t_shape, t_mask, ident_mask)


def _kernel(offsets_ref, img_ref, out_init_ref, lr_ref, lc_ref, out_ref,
            win, sem, *, sr: int, sc: int):
    del out_init_ref  # aliased with out_ref; untouched tiles pass through
    bi, t = pl.program_id(0), pl.program_id(1)
    n_t = pl.num_programs(1)
    # slot parity must follow the GLOBAL step (not t): with odd n_t the
    # cross-batch prefetch lands in the opposite slot from what a per-t
    # parity would read at (bi+1, t=0)
    slot = jax.lax.rem(bi * n_t + t, jnp.int32(2))
    nslot = 1 - slot

    def tile_copy(b_idx, t_idx, s):
        r0 = pl.multiple_of(offsets_ref[0, t_idx], 8)
        c0 = pl.multiple_of(offsets_ref[1, t_idx], TILE_W)
        return pltpu.make_async_copy(
            img_ref.at[b_idx, pl.ds(r0, sr), pl.ds(c0, sc)],
            win.at[s], sem.at[s])

    # double-buffered window DMA: tile t's copy was started by step t-1
    # (cold start only at the very first grid step); step t prefetches
    # t+1 — across the batch boundary too, so only the first window pays
    # the DMA latency
    @pl.when((bi == 0) & (t == 0))
    def _():
        tile_copy(bi, t, slot).start()

    @pl.when(t + 1 < n_t)
    def _():
        tile_copy(bi, t + 1, nslot).start()

    @pl.when((t + 1 >= n_t) & (bi + 1 < pl.num_programs(0)))
    def _():
        tile_copy(bi + 1, 0, nslot).start()

    tile_copy(bi, t, slot).wait()
    n_blk = sc // TILE_W
    lr = lr_ref[:]
    lc = lc_ref[:]
    code = lr * n_blk + (lc >> 7)
    rem = lc & (TILE_W - 1)
    # the batched 128-lane gather Mosaic lowers to a VPU shuffle; issued raw
    # so the indices stay int32 under the global x64 config
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    acc = jnp.zeros((TILE_H, TILE_W), jnp.int32)
    for r in range(sr):
        for b in range(n_blk):
            seg = pltpu.repeat(
                win[slot, r:r + 1, b * TILE_W:(b + 1) * TILE_W],
                TILE_H, axis=0)
            vals = lax.gather(seg, rem[..., None], dnums, slice_sizes=(1, 1),
                              mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            acc = jnp.where(code == r * n_blk + b, vals, acc)
    out_ref[0] = acc


def _class_call(img_u32, out, cls: ClassPlan, lr, lc, interpret: bool):
    b, h, w = img_u32.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, cls.offsets.shape[1]),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # img stays in HBM
            pl.BlockSpec((1, TILE_H, TILE_W),
                         lambda bi, t, offs: (bi, offs[2, t], offs[3, t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W),
                         lambda bi, t, offs: (offs[2, t], offs[3, t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W),
                         lambda bi, t, offs: (offs[2, t], offs[3, t]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_H, TILE_W),
                               lambda bi, t, offs: (bi, offs[2, t],
                                                    offs[3, t]),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, cls.sr, cls.sc), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        functools.partial(_kernel, sr=cls.sr, sc=cls.sc),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={2: 0},   # operand 2 = out (after scalars+img)
        interpret=interpret,
    )(jnp.asarray(cls.offsets), img_u32, out, jnp.asarray(lr),
      jnp.asarray(lc))


def warp_u32(img_u32: jnp.ndarray, plan_: WarpPlan,
             interpret: bool = False) -> jnp.ndarray:
    """[B, H, W] int32 (u32-packed pixels) -> warped [B, H, W] int32."""
    b, h, w = img_u32.shape
    out = jnp.zeros((b, h, w), jnp.int32)
    for cls in plan_.classes:
        out = _class_call(img_u32, out, cls, plan_.lr, plan_.lc, interpret)
    if plan_.ident_mask is not None:
        out = jnp.where(jnp.asarray(plan_.ident_mask)[None], img_u32, out)
    if plan_.t_plan is not None:
        # rotation-dominant tiles: same engine over the transposed image,
        # then one elementwise select — no gather
        h_t, w_t = plan_.t_shape
        img_t = jnp.transpose(img_u32, (0, 2, 1))
        img_t = jnp.pad(img_t, ((0, 0), (0, h_t - w), (0, w_t - h)))
        out_t = warp_u32(img_t, plan_.t_plan, interpret=interpret)
        out_t = jnp.transpose(out_t[:, :w, :h], (0, 2, 1))
        out = jnp.where(jnp.asarray(plan_.t_mask)[None], out_t, out)
    if len(plan_.fix_dst):
        vals = jnp.take(img_u32.reshape(b, h * w),
                        jnp.asarray(plan_.fix_src), axis=1)
        out = (out.reshape(b, h * w)
               .at[:, jnp.asarray(plan_.fix_dst)].set(vals)
               .reshape(b, h, w))
    return out


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
