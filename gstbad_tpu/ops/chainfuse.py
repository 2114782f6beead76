"""Fused chain kernel — the whole headline tail in ONE Pallas pass.

The table-fusion pass (core/tablefuse.py) reduces a chain like
sepia!solarize!...!exclusion!dilate!chromahold!videoconvert!zebrastripe
to: idx = luma(src); idx' = dilate3(idx, rank[idx]); out =
word_table[idx'] with a positional stripe select.  As separate XLA/Pallas
stages that costs ~6 HBM traversals plus two kernel-launch grids; this
kernel runs the entire tail in one pass over row blocks:

  - the source word block comes in as one block input; luma, both
    256-entry lookups (rank + final word), the dilate3 neighbor walk, and
    the zebra stripe select all happen on the block in VMEM,
  - the dilate down-neighbor crosses the block boundary: instead of a
    full one-row-shifted COPY of the frame (a wasted write+read of the
    whole window, ~264 MB at 1080p w16), a second BlockSpec over the SAME
    source array delivers just the next block's first 8-row subtile; the
    in-block down rows are a static sublane shift of the already-loaded
    planes (which also replaces the second full-block rank gather the
    shifted-copy formulation needed),
  - 256-entry tables ride as two 128-lane vregs each; table[idx] is the
    VPU's batched 128-lane shuffle (the ops/warp_pallas.py primitive) —
    two gathers + a select per [8, 128] tile,
  - right/left dilate neighbors are lane rolls with frame-edge
    replication; the frame's LAST row replicates itself as its own down
    neighbor (the reference's dead `up` pointer means no up halo is
    needed, gstdilate.c:291-300).

Everything is int32 (the package enables global x64; Mosaic rejects i64).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gstbad_tpu.ops.lut import _dnums

_ZEBRA_KEEP = np.int32(np.uint32(0xFFFF00FF))  # clear the AYUV Y byte

# When True, dilate_zebra_fused callers (zebrastripe's table_tail) take the
# fused-kernel path even off-TPU, running the kernel in Pallas interpret
# mode — the multichip dryrun uses this to certify the REAL fused program
# on a CPU mesh.
INTERPRET = False

# Trace-time counter: how many times dilate_zebra_fused was actually
# traced.  Tests and the multichip dryrun assert on it to prove the fused
# fast path really ran (instead of silently falling back to XLA).
TRACES = 0


def _gather256(table_ref, x, scratch):
    """table[x] for a [2, 128] split 256-entry table over a [BR, W] block,
    assembled per [8, 128] tile into `scratch`."""
    t_lo = pltpu.repeat(table_ref[0:1, :], 8, axis=0)
    t_hi = pltpu.repeat(table_ref[1:2, :], 8, axis=0)
    br, w = x.shape
    for r0 in range(0, br, 8):
        for c0 in range(0, w, 128):
            blk = x[r0:r0 + 8, c0:c0 + 128]
            lo = blk & 127
            va = lax.gather(t_lo, lo[..., None], _dnums(),
                            slice_sizes=(1, 1),
                            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            vb = lax.gather(t_hi, lo[..., None], _dnums(),
                            slice_sizes=(1, 1),
                            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            scratch[r0:r0 + 8, c0:c0 + 128] = jnp.where(blk < 128, va, vb)
    return scratch[:]


def _kernel(scal_ref, src_ref, nxt_ref, rkt_ref, wdt_ref, out_ref,
            s_rank, s_nxt, *, br, w, h, index_fn, bcast):
    if bcast:
        # broadcast-source grid order (rows outer, batch inner): the src
        # block index is then CONSTANT along the innermost dim, so the
        # pipeline fetches each source block ONCE per row sweep instead of
        # once per frame
        rb = pl.program_id(0)
        bi = pl.program_id(1)
    else:
        bi = pl.program_id(0)
        rb = pl.program_id(1)
    erode = scal_ref[0, bi]
    thr = scal_ref[1, bi]
    phase = scal_ref[2, bi]
    src = src_ref[0]
    idx = index_fn(src).astype(jnp.int32)
    rank = _gather256(rkt_ref, idx, s_rank)

    # down neighbors: rows 1..br-1 of this block via a static sublane
    # shift; the bottom row comes from the next block's first row (nxt is
    # an 8-row subtile of the SAME source array, clamped at the frame end)
    nxt = nxt_ref[0]
    idx_nx = index_fn(nxt).astype(jnp.int32)
    rank_nx = _gather256(rkt_ref, idx_nx, s_nxt)
    idx_dn = jnp.concatenate([idx[1:], idx_nx[0:1]], axis=0)
    rank_dn = jnp.concatenate([rank[1:], rank_nx[0:1]], axis=0)
    row = rb * br + lax.broadcasted_iota(jnp.int32, (br, w), 0)
    last_row = row == (h - 1)  # the frame's last row is its own neighbor
    idx_dn = jnp.where(last_row, idx, idx_dn)
    rank_dn = jnp.where(last_row, rank, rank_dn)

    col = lax.broadcasted_iota(jnp.int32, (br, w), 1)
    # shifts must be i32 scalars (tpu.dynamic_rotate rejects the i64 a
    # bare Python int traces to under the global x64)
    left1 = jnp.int32(w - 1)   # rotate by w-1 == shift left by 1
    idx_r = pltpu.roll(idx, left1, 1)
    rank_r = pltpu.roll(rank, left1, 1)
    idx_l = pltpu.roll(idx, jnp.int32(1), 1)
    rank_l = pltpu.roll(rank, jnp.int32(1), 1)
    last = col == (w - 1)
    first = col == 0
    idx_r = jnp.where(last, idx, idx_r)
    rank_r = jnp.where(last, rank, rank_r)
    idx_l = jnp.where(first, idx, idx_l)
    rank_l = jnp.where(first, rank, rank_l)

    # the reference's sequential down/right/left walk (gstdilate.c:273-350);
    # the erode flip is boolean arithmetic — Mosaic cannot legalize an
    # arith.select with a scalar condition over vector operands
    er = erode != 0
    out_i, out_k = idx, rank
    for n_i, n_k in ((idx_dn, rank_dn), (idx_r, rank_r), (idx_l, rank_l)):
        take = ((n_k < out_k) & er) | ((n_k > out_k) & (~er))
        out_i = jnp.where(take, n_i, out_i)
        out_k = jnp.where(take, n_k, out_k)

    word = _gather256(wdt_ref, out_i, s_rank)  # rank scratch is free now
    y = (word >> 8) & 255
    stripe = ((col + row + phase) & 4) != 0
    zebra = (word & _ZEBRA_KEEP) | jnp.int32(16 << 8)
    out_ref[0] = jnp.where(stripe & (y >= thr), zebra, word)


def block_rows(h: int, cap: int = 128) -> int:
    """Largest multiple-of-8 divisor of h that is <= cap (VMEM budget)."""
    best = 0
    for k in range(8, cap + 1, 8):
        if h % k == 0:
            best = k
    return best


def dilate_zebra_fused(src_word: jnp.ndarray, rank_table: jnp.ndarray,
                       word_table: jnp.ndarray, index_fn, erode, thr,
                       phase, interpret: bool = False,
                       batch: int | None = None) -> jnp.ndarray:
    """[B, H, W] i32 source words -> final AYUV words, one kernel.

    rank_table/word_table: [256] int32.  erode/thr/phase: per-frame [B]
    int32.  index_fn: pure word -> index-in-[0,256) function traced into
    the kernel body.

    src_word may be a BROADCAST twin of shape [1, H, W] with batch=B (the
    videotestsrc static-pattern path): the kernel then reads the single
    source frame and writes B output frames.  The grid is reordered (rows
    outer, batch inner) so the source block index is constant along the
    innermost grid dim — the Mosaic pipeline fetches each source block
    once per row sweep, cutting per-frame HBM reads to ~1/B.
    """
    global TRACES
    TRACES += 1
    sb, h, w = src_word.shape
    b = sb if batch is None else batch
    bcast = sb == 1 and b > 1
    br = block_rows(h)
    assert br and w % 128 == 0
    sub = br // 8       # 8-row subtiles per block
    nsub = h // 8       # 8-row subtiles per frame
    scalars = jnp.stack([
        jnp.broadcast_to(jnp.asarray(erode).astype(jnp.int32), (b,)),
        jnp.broadcast_to(jnp.asarray(thr).astype(jnp.int32), (b,)),
        jnp.broadcast_to(jnp.asarray(phase).astype(jnp.int32), (b,)),
    ])
    zero = np.int32(0)

    if bcast:
        grid = (h // br, b)

        def src_index(r, bi, s):
            return (zero, r, zero)

        def nxt_index(r, bi, s):
            return (zero, jnp.minimum((r + 1) * sub, nsub - 1), zero)

        def tbl_index(r, bi, s):
            return (zero, zero)

        def out_index(r, bi, s):
            return (bi, r, zero)
    else:
        grid = (b, h // br)

        def src_index(bi, r, s):
            return (bi, r, zero)

        def nxt_index(bi, r, s):
            # first 8-row subtile of the NEXT block, clamped to the frame
            # end (the clamped tile's first row is then masked in-kernel)
            return (bi, jnp.minimum((r + 1) * sub, nsub - 1), zero)

        def tbl_index(bi, r, s):
            return (zero, zero)

        def out_index(bi, r, s):
            return (bi, r, zero)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, br, w), src_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, w), nxt_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), tbl_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), tbl_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, br, w), out_index,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((br, w), jnp.int32),
                        pltpu.VMEM((8, w), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel, br=br, w=w, h=h, index_fn=index_fn,
                          bcast=bcast),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, src_word, src_word,
      rank_table.astype(jnp.int32).reshape(2, 128),
      word_table.astype(jnp.int32).reshape(2, 128))
