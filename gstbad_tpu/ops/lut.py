"""Gather-free byte LUTs — the TPU replacement for per-pixel table lookups.

XLA's gather on TPU runs ~0.1 Gelem/s (measured on v5e), three orders below
HBM speed, so the reference's LUT loops (coloreffects tables, chromium's
cosine table, solarize's ramp) cannot be ported as gathers.  Instead a
256-entry u8 table packs into 8 bit-planes x 8 u32 words; `table[idx]`
becomes 7 nested selects (word pick by idx>>5) + a variable shift
(idx & 31) per output bit — ~80 VPU ops/pixel, fully fusable, and the
packing is in-graph so tables built from dynamic properties never
recompile.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pack_table(table_u8: jnp.ndarray, nbits: int = 8) -> jnp.ndarray:
    """[..., 256] table with values < 2**nbits -> packed bit planes
    [..., nbits, 8 words] u32.  Leading dims support per-frame tables
    (the controllable-property-curve path).  nbits > 8 packs wider values
    (e.g. the 16-bit dilate luminance keys) at proportional lookup cost."""
    t = table_u8.astype(jnp.uint32)
    lead = t.shape[:-1]
    bits = (t[..., None, :]
            >> jnp.arange(nbits, dtype=jnp.uint32)[:, None]) & 1
    shifts = (jnp.arange(256, dtype=jnp.uint32) % 32)
    words = (bits << shifts).reshape(lead + (nbits, 8, 32)).sum(
        axis=-1, dtype=jnp.uint32)
    return words  # [..., bit, word]


def apply_lut(idx: jnp.ndarray, packed: jnp.ndarray) -> jnp.ndarray:
    """table[idx] for idx int32 in [0, 256); packed from pack_table.

    Flat mask-multiply word select — measured 305 Gelem/s on v5e vs
    0.1 Gelem/s for the XLA gather.  Returns uint8 for <=8-bit tables,
    uint32 for wider ones (pack_table nbits > 8).
    """
    hi = (idx >> 5).astype(jnp.int32)
    lo = (idx & 31).astype(jnp.uint32)
    masks = [(hi == j).astype(jnp.uint32) for j in range(8)]
    lead = packed.shape[:-2]  # () or (B,) for per-frame tables
    nbits = packed.shape[-2]

    def word_of(b, j):
        w = packed[..., b, j]
        if lead:
            w = w.reshape(lead + (1,) * (idx.ndim - len(lead)))
        return w

    out = jnp.zeros(idx.shape, jnp.uint32)
    for b in range(nbits):
        word = masks[0] * word_of(b, 0)
        for j in range(1, 8):
            word = word + masks[j] * word_of(b, j)
        out = out | (((word >> lo) & 1) << b)
    return out.astype(jnp.uint8) if nbits <= 8 else out


def apply_lut3(idx: jnp.ndarray, packed3: jnp.ndarray):
    """Three tables on one index (coloreffects RGB columns).
    packed3: [3, 8, 8] u32 -> tuple of 3 uint8 arrays."""
    return tuple(apply_lut(idx, packed3[c]) for c in range(3))


# ---------------------------------------------------------------------------
# whole-word table lookup — ONE gather for a packed 4-byte pixel
# ---------------------------------------------------------------------------
# The bit-plane select above costs ~11 VPU ops per OUTPUT BIT; a full u32
# word is 32 bits ~ 350 ops/pixel.  The VPU does have one true dynamic
# addressing primitive: a batched 128-lane shuffle (the same one
# ops/warp_pallas.py is built on).  A 256-entry u32 table splits into two
# 128-lane vregs; table[idx] is then 2 shuffles + a select per [8, 128]
# block — ~6 ops/pixel, ~50x the bit-plane route for word-valued tables.

_GATHER_DNUMS = None


def _dnums():
    global _GATHER_DNUMS
    if _GATHER_DNUMS is None:
        from jax import lax
        _GATHER_DNUMS = lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
            operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return _GATHER_DNUMS


def _word_lut_kernel(table_ref, idx_ref, out_ref):
    from jax import lax
    from jax.experimental.pallas import tpu as pltpu
    t_lo = pltpu.repeat(table_ref[0:1, :], 8, axis=0)
    t_hi = pltpu.repeat(table_ref[1:2, :], 8, axis=0)
    w = idx_ref.shape[-1]
    for j in range(w // 128):
        blk = idx_ref[0, :, j * 128:(j + 1) * 128]
        lo = blk & 127
        va = lax.gather(t_lo, lo[..., None], _dnums(), slice_sizes=(1, 1),
                        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        vb = lax.gather(t_hi, lo[..., None], _dnums(), slice_sizes=(1, 1),
                        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        out_ref[0, :, j * 128:(j + 1) * 128] = jnp.where(blk < 128, va, vb)


def _word_lut_pallas(idx: jnp.ndarray, table: jnp.ndarray,
                     interpret: bool) -> jnp.ndarray:
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    b, h, w = idx.shape
    # index maps must return i32 — a literal 0 traces as i64 under the
    # package-global x64 and Mosaic rejects the (i64, i64) func.return;
    # np.int32 (not jnp: index maps may not capture tracers) keeps it i32
    zero = np.int32(0)
    return pl.pallas_call(
        _word_lut_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        grid=(b, h // 8),
        in_specs=[
            pl.BlockSpec((2, 128), lambda bi, r: (zero, zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, w), lambda bi, r: (bi, r, zero),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, w), lambda bi, r: (bi, r, zero),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(table.reshape(2, 128), idx)


def apply_word_table(idx: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """table[idx] for a 256-entry int32-valued table (e.g. a whole packed
    pixel per entry) over an idx plane in [0, 256).

    TPU + tileable [B, H%8==0, W%128==0] planes: the Pallas shuffle kernel.
    Other backends: the XLA gather (fast on CPU).  Misaligned TPU shapes:
    four bit-plane byte lookups."""
    import jax
    table = table.astype(jnp.int32)
    idx = idx.astype(jnp.int32)
    on_tpu = jax.default_backend() == "tpu"
    if (idx.ndim == 3 and idx.shape[-1] % 128 == 0
            and idx.shape[-2] % 8 == 0 and on_tpu):
        return _word_lut_pallas(idx, table, interpret=False)
    if not on_tpu:
        return jnp.take(table, idx, axis=0)
    out = None
    for c in range(4):
        byte = apply_lut(idx, pack_table((table >> (8 * c)) & 255)
                         ).astype(jnp.int32)
        w = byte << (8 * c) if c else byte
        out = w if out is None else out | w
    return out


# ---------------------------------------------------------------------------
# composed per-byte tables for the gaudieffects/coloreffects math.  Each
# builds the full 256-entry output table in-graph from the dynamic params
# (256-element vector math is free), then pack_table makes it gather-free.
# ---------------------------------------------------------------------------


def burn_table(adjustment: jnp.ndarray) -> jnp.ndarray:
    """gaudi_orc_burn as a byte map (ops/pointops.burn semantics)."""
    c = jnp.arange(256, dtype=jnp.int32)
    adj = adjustment.astype(jnp.int32)
    if adj.ndim:
        adj = adj[..., None]  # per-frame curve -> [B, 256] table
    # divluw saturates the quotient to 255 and yields 255 on /0 — verified
    # against the compiled reference backup (gstgaudieffectsorc-dist.c,
    # "/* 10: divluw */"); the divisor is the low byte of the shifted word.
    a = ((c + adj) >> 1) & 0xFF
    t = (255 - c) << 7
    q = jnp.where(a == 0, 255, jnp.minimum(t // jnp.maximum(a, 1), 255))
    return (255 - q).astype(jnp.uint8)


def chromium_table(edge_a: jnp.ndarray, edge_b: jnp.ndarray,
                   cos_table: jnp.ndarray) -> jnp.ndarray:
    """chromium composed to a byte map: only 256 of the 1024 cosine entries
    are reachable for a given (edge-a, edge-b)."""
    c = jnp.arange(256, dtype=jnp.int32)
    ea = edge_a.astype(jnp.int32)
    eb = edge_b.astype(jnp.int32)
    if ea.ndim:
        ea = ea[..., None]
    if eb.ndim:
        eb = eb[..., None]
    i = (c + ea + (c * eb) // 2) & 1023
    return jnp.clip(jnp.abs(cos_table[i]), 0, 255).astype(jnp.uint8)


def dodge_table() -> jnp.ndarray:
    c = jnp.arange(256, dtype=jnp.int32)
    return jnp.clip((256 * c) // (256 - c), 0, 255).astype(jnp.uint8)


def solarize_table(threshold: jnp.ndarray, start: jnp.ndarray,
                   end: jnp.ndarray) -> jnp.ndarray:
    """solarize's ramp as a byte map with exact C int/uint32 semantics
    (int64 math runs on 256 entries, never per pixel)."""
    threshold = threshold.astype(jnp.int32)
    start = start.astype(jnp.int32)
    end = end.astype(jnp.int32)
    if threshold.ndim or start.ndim or end.ndim:
        threshold, start, end = (v[..., None] for v in jnp.broadcast_arrays(
            threshold, start, end))
    period = jnp.where(end != start, end - start, 1).astype(jnp.int64)
    up_length = jnp.where(threshold != start, threshold - start, 1
                          ).astype(jnp.int64)
    down_length = jnp.where(threshold != end, end - threshold, 1
                            ).astype(jnp.int64)
    c = jnp.arange(256, dtype=jnp.int64)
    param = c + 256 - start.astype(jnp.int64)
    param = param - (param / period).astype(jnp.int64) * period
    M = jnp.int64(0xFFFFFFFF)
    up = ((param * 255) & M) // (up_length & M)
    v = (down_length - (param - up_length)) & M
    down = ((v * 255) & M) // (down_length & M)
    col = jnp.where(param < up_length, up, down)
    return jnp.where(col > 255, 255, col).astype(jnp.uint8)
