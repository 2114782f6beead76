"""Separable gaussian blur as ONE Pallas pass over row blocks.

The TPU rebuild of gaussian_smooth (gst/gaudieffects/gstgaussblur.c:260-356):
two border-truncated float passes (x then y) over all 4 AYUV channels.  The
XLA shift-FMA formulation (ops/blur.py) re-reads the f32 window per tap and
materializes both passes — ~6 HBM traversals at 1080p.  This kernel runs the
whole thing in one pass:

  - the source rides as the packed-u32 word plane ([B, H, W] i32, the
    FrameBatch.word twin) — one read, no u8<->i32 relayout;
  - each row block loads with an 8-row halo on both sides (two extra
    BlockSpecs over the SAME array, the ops/chainfuse.py pattern), enough
    for kernel centers <= 8 (|sigma| <= 3.2; larger windows fall back to
    the XLA path);
  - per channel: byte-extract -> f32, the x pass as lane rolls with
    frame-edge zero masks, divide by the per-column border sums
    (gstgaussblur.c:268-290), then the y pass as static sublane slices of
    the x-blurred block(+halo) with global-row zero masks, divide by the
    per-row border sums, +0.5, clamp, truncating u8 cast — and the four
    channel bytes OR back into one output word;
  - out-of-frame taps contribute exactly 0.0 (the zero-padding identity
    the XLA path uses), so halo tiles clamped at the frame edge are
    masked, never read wrong;
  - a broadcast source ([1, H, W] base + batch=B, videotestsrc static
    patterns) flips the grid to (rows, batch) so the source block index is
    constant along the innermost dim — fetched once per row sweep.

Everything is explicitly 32-bit (the package enables global x64; Mosaic
rejects i64).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gstbad_tpu.ops.chainfuse import block_rows

# Off-TPU interpret-mode switch for callers (mirrors ops/chainfuse.INTERPRET)
INTERPRET = False

_HALO = 8  # rows of halo on each side (supports kernel center <= 8)


def _lane_tile(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Tile a [*, 128] block n times along lanes via concatenation."""
    return x if n == 1 else jnp.concatenate([x] * n, axis=1)


def _kernel(src_ref, prv_ref, nxt_ref, csum_ref, rsum_ref, out_ref,
            xb_ref, *, kern, br, w, h, bcast):
    if bcast:
        rb = pl.program_id(0)
    else:
        rb = pl.program_id(1)
    window = kern.shape[0]
    center = window // 2
    rows = br + 2 * _HALO

    src = src_ref[0]
    prv = prv_ref[0]
    nxt = nxt_ref[0]

    col = lax.broadcasted_iota(jnp.int32, (rows, w), 1)
    # global row of each MAIN block row (halo rows are rb*br-8 .. -1 and
    # rb*br+br .. +br+7; y-pass masks handle frame edges)
    grow = rb * br + lax.broadcasted_iota(jnp.int32, (br, w), 0)
    csum = pltpu.repeat(csum_ref[:], rows // 8, axis=0)   # [rows, w]
    rsum = _lane_tile(rsum_ref[:], w // 128)              # [br, w]

    outw = jnp.zeros((br, w), jnp.int32)
    for c in range(4):
        plane = jnp.concatenate(
            [(prv >> (8 * c)) & 255, (src >> (8 * c)) & 255,
             (nxt >> (8 * c)) & 255], axis=0).astype(jnp.float32)
        # x pass: lane rolls + frame-edge zero masks, then the per-column
        # border-sum division (blur_row_x, gstgaussblur.c:260-295)
        accx = jnp.zeros((rows, w), jnp.float32)
        for k in range(window):
            off = k - center
            if off == 0:
                sh = plane
            else:
                # rotate left by `off` == roll right by w-off (i32 shift)
                sh = pltpu.roll(plane, jnp.int32((w - off) % w), 1)
            valid = ((col + off) >= 0) & ((col + off) < w)
            accx = accx + np.float32(kern[k]) * jnp.where(valid, sh, 0.0)
        xb_ref[:] = accx / csum
        # y pass: static sublane slices of the x-blurred halo block +
        # global-row masks, per-row border-sum division, round, clamp,
        # truncating cast (gaussian_smooth, gstgaussblur.c:297-356)
        accy = jnp.zeros((br, w), jnp.float32)
        for k in range(window):
            off = k - center
            sl = xb_ref[_HALO + off:_HALO + off + br, :]
            gvalid = ((grow + off) >= 0) & ((grow + off) < h)
            accy = accy + np.float32(kern[k]) * jnp.where(gvalid, sl, 0.0)
        byte = jnp.clip(accy / rsum + 0.5, 0.0, 255.0).astype(jnp.int32)
        outw = outw | (byte << (8 * c))
    out_ref[0] = outw


def gaussian_blur_words(src_word: jnp.ndarray, kern: np.ndarray,
                        row_sums: np.ndarray, col_sums: np.ndarray,
                        batch: int | None = None,
                        interpret: bool = False) -> jnp.ndarray:
    """[B, H, W] i32 packed words -> blurred words, one kernel.

    kern/row_sums/col_sums: host numpy f32 (make_blur_tables).  src_word
    may be a [1, H, W] broadcast base with batch=B (see module doc).
    """
    sb, h, w = src_word.shape
    b = sb if batch is None else batch
    bcast = sb == 1 and b > 1
    kern = np.asarray(kern, np.float32)
    assert kern.shape[0] // 2 <= _HALO and h % 8 == 0 and w % 128 == 0
    br = block_rows(h, cap=64)
    assert br
    sub = br // 8
    nsub = h // 8
    zero = np.int32(0)
    csum = jnp.asarray(np.broadcast_to(
        np.asarray(col_sums, np.float32), (8, w)))
    rsum = jnp.asarray(np.repeat(
        np.asarray(row_sums, np.float32)[:, None], 128, axis=1))

    def spec_maps(order):
        # order maps grid ids -> (bi, r); bcast puts rows outermost so the
        # source block index is constant along the innermost (batch) dim
        def src_index(*ids):
            bi, r = order(*ids)
            return (zero if bcast else bi, r, zero)

        def prv_index(*ids):
            bi, r = order(*ids)
            return (zero if bcast else bi,
                    jnp.maximum(r * sub - 1, 0), zero)

        def nxt_index(*ids):
            bi, r = order(*ids)
            return (zero if bcast else bi,
                    jnp.minimum((r + 1) * sub, nsub - 1), zero)

        def rsum_index(*ids):
            _, r = order(*ids)
            return (r, zero)

        def out_index(*ids):
            bi, r = order(*ids)
            return (bi, r, zero)

        return src_index, prv_index, nxt_index, rsum_index, out_index

    if bcast:
        grid = (h // br, b)
        maps = spec_maps(lambda r, bi: (bi, r))
    else:
        grid = (b, h // br)
        maps = spec_maps(lambda bi, r: (bi, r))
    src_index, prv_index, nxt_index, rsum_index, out_index = maps

    return pl.pallas_call(
        functools.partial(_kernel, kern=kern, br=br, w=w, h=h, bcast=bcast),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, br, w), src_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, w), prv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, w), nxt_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, w), lambda *ids: (zero, zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 128), rsum_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, br, w), out_index,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((br + 2 * _HALO, w), jnp.float32)],
        interpret=interpret,
    )(src_word, src_word, src_word, csum, rsum)
