"""Comb detection — the ivtc/combdetect run-length comb metric
(gst/ivtc/gstivtc.c:634-680, gstcombdetect.c:215-260) vectorized.

The C walks rows carrying `thisline[]`: outlier cells accumulate
thisline[i] += thisline[i-1] + 1 (clamped at 1000), non-outliers reset to 0,
and cells > 100 score.  Within a row that is a SEGMENTED PREFIX SUM of
(prev_row + 1) over outlier runs, so each row is one cumsum + cummax gather;
rows chain sequentially.  The 1000-clamp is applied to the carried row
only — since every clamped value is > 100 either way, the painted cells and
the score are exactly the C's (clamping below 1000 never alters the > 100
test), while the unclamped in-row sums stay well inside int32.

TPU shape: a naive per-row `lax.scan` is ~700 dispatch-bound micro-steps
per frame (tens of microseconds each on the device).  Rows are therefore
processed in BLOCKS of `_BLOCK` rows per scan step — the block body is
unrolled so XLA fuses it into one kernel launch, cutting step count ~32x —
and every function here is batched over arbitrary leading axes so callers
can score many field pairs in one pass (ivtc's prev/next similarity pair,
combdetect's whole window).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 32
_NCHUNK = 32   # max chains per pallas_call (sublane-batched layout)


def _outlier(s1, s2, s3):
    """src2 < min(src1,src3) - 5 or > max + 5 (int math)."""
    a = s1.astype(jnp.int32)
    b = s2.astype(jnp.int32)
    c = s3.astype(jnp.int32)
    return (b < jnp.minimum(a, c) - 5) | (b > jnp.maximum(a, c) + 5)


def _seg_cumsum(v, m):
    """In-run inclusive prefix sum: cumsum of v (v == 0 outside runs)
    minus the running total at the last run boundary.  v >= 0 keeps the
    plain cumsum monotone, so that boundary total is a cummax of the
    masked cumsum — NO gather (XLA gathers run at ~0.1 Gelem/s on TPU and
    dominated the old formulation)."""
    s = jnp.cumsum(v, axis=-1)
    base = lax.cummax(jnp.where(m, 0, s), axis=v.ndim - 1)
    return jnp.where(m, s - base, 0)


def _scan_rows(m):
    """Chain the thisline recurrence over the row axis of m [..., R, W]
    in blocks of _BLOCK unrolled rows per scan step.

    Per row r the C recurrence is t_r = segcumsum(t_{r-1} + 1 over runs)
    = runpos_r + segcumsum(t_{r-1} * m_r), where runpos (the 1-based
    position within each outlier run) has NO cross-row dependency and is
    precomputed for ALL rows in one vectorized pass; only the carried
    t part chains.  Returns the over-100 mask [..., R, W]."""
    r, w = m.shape[-2], m.shape[-1]
    lead = m.shape[:-2]
    nb = -(-r // _BLOCK)
    pad = nb * _BLOCK - r
    if pad:
        # padded rows are non-outliers: they reset the carry and score 0
        m = jnp.concatenate(
            [m, jnp.zeros(lead + (pad, w), bool)], axis=-2)
    runpos = _seg_cumsum(m.astype(jnp.int32), m)            # [..., R', W]
    # scan axis must lead: [nb, ..., BLOCK, W]
    mb = jnp.moveaxis(m.reshape(lead + (nb, _BLOCK, w)), -3, 0)
    rb = jnp.moveaxis(runpos.reshape(lead + (nb, _BLOCK, w)), -3, 0)

    def step(p, inp):
        mblk, rblk = inp
        overs = []
        for i in range(_BLOCK):
            mi = mblk[..., i, :]
            seg = rblk[..., i, :] + _seg_cumsum(jnp.where(mi, p, 0), mi)
            p = jnp.minimum(seg, 1000)
            overs.append(seg > 100)
        return p, jnp.stack(overs, axis=-2)

    _, over = lax.scan(step, jnp.zeros(lead + (w,), jnp.int32), (mb, rb))
    over = jnp.moveaxis(over, 0, -3).reshape(lead + (nb * _BLOCK, w))
    return over[..., :r, :]


def _shift_right(v, d, fill, lane):
    """Static lane shift right by d on [1, W]: pltpu.roll (verified on
    v5e across multi-vreg widths) + iota fill of the wrapped lanes.
    Static concat on the lane axis is NOT the way — Mosaic rejects it
    ("result/input offset mismatch on non-concat dimension")."""
    rolled = pltpu.roll(v, jnp.int32(d), 1)
    return jnp.where(lane < jnp.int32(d), jnp.int32(fill), rolled)


def _comb_chain_kernel(m_ref, out_ref, carry_ref):
    """One block of `rb` rows of the thisline chain for ALL chains at
    once.  Independent chains (batched field pairs) ride the SUBLANE
    dimension so every [8,128] i32 vreg tile is fully used — the old
    layout scanned one [1, W] chain row per step and wasted 7/8 of each
    vreg (measured 5.5x slower at n=8).  The TPU grid runs sequentially
    over row blocks, so the carried row lives in VMEM scratch across
    grid steps; inside the step everything is straight-line register
    code — the whole per-row segmented scan costs nanoseconds instead
    of the ~2 us/op an XLA op sequence pays (measured: a 716-row chain
    was ~35 ms in XLA regardless of formulation)."""
    nsub, w = m_ref.shape[-2], m_ref.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        carry_ref[...] = jnp.zeros(carry_ref.shape, jnp.int32)

    # the package enables global x64: every scalar literal must be a
    # typed i32 or Mosaic recurses lowering the weak-i64 converts
    zero = jnp.int32(0)
    one = jnp.int32(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (nsub, w), 1)
    p = carry_ref[...]
    for j in range(m_ref.shape[0]):
        mi = m_ref[j]                            # [nsub, W] i32 0/1
        # segmented Hillis-Steele scan of (p + 1) over outlier runs;
        # f = 1 marks segment boundaries (non-outlier cells)
        v = jnp.where(mi == one, p + one, zero)
        f = one - mi
        d = 1
        while d < w:
            vs = _shift_right(v, d, 0, lane)
            fs = _shift_right(f, d, 1, lane)
            v = v + jnp.where(f == one, zero, vs)
            f = jnp.maximum(f, fs)
            d *= 2
        seg = jnp.where(mi == one, v, zero)
        out_ref[j] = (seg > jnp.int32(100)).astype(jnp.int32)
        p = jnp.minimum(seg, jnp.int32(1000))
    carry_ref[...] = p


@functools.partial(jax.jit, static_argnames=("interpret",))
def _scan_rows_pallas(m: jnp.ndarray, interpret: bool = False):
    """Pallas path for _scan_rows: m [..., R, W] bool -> over mask.

    Layout: [R, n_pad, W_pad] — rows outer (the sequential grid axis),
    chains in sublanes.  The two moveaxis relayouts are one cheap XLA
    pass each; the chain itself is where the milliseconds were."""
    lead = m.shape[:-2]
    r, w = m.shape[-2], m.shape[-1]
    n = 1
    for s in lead:
        n *= s
    npad = -(-n // 8) * 8
    wp = -(-w // 128) * 128
    # rows per grid step: amortize step overhead, cap the in+out block
    # pair at ~4 MB of double-buffered VMEM
    rb = max(1, min(8, (1 << 19) // (npad * wp)))
    rp = -(-r // rb) * rb
    mi = jnp.zeros((rp, npad, wp), jnp.int32)
    mi = mi.at[:r, :n, :w].set(
        jnp.moveaxis(m.reshape((n, r, w)).astype(jnp.int32), 0, 1))
    out = pl.pallas_call(
        _comb_chain_kernel,
        grid=(rp // rb,),
        # the block indices must be typed i32: a literal 0 is weak-i64
        # under the package's global x64 and Mosaic rejects the index
        # map's func.return
        in_specs=[pl.BlockSpec((rb, npad, wp),
                               lambda i: (i, jnp.int32(0), jnp.int32(0)))],
        out_specs=pl.BlockSpec((rb, npad, wp),
                               lambda i: (i, jnp.int32(0), jnp.int32(0))),
        out_shape=jax.ShapeDtypeStruct((rp, npad, wp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((npad, wp), jnp.int32)],
        interpret=interpret,
    )(mi)
    return (jnp.moveaxis(out[:r, :n, :w], 1, 0)
            > 0).reshape(lead + (r, w))


def comb_mask(luma: jnp.ndarray, j_start: int = 2, j_stop_off: int = 2,
              engine: str = "auto"):
    """Per-pixel over-100 mask + score for rows [j_start, H - j_stop_off).

    luma: [..., H, W] uint8 (woven frames).  Returns (mask [..., H, W]
    bool with False outside the scanned band, score [...] int32).

    engine: "auto" uses the Pallas chain kernel on TPU (XLA elsewhere),
    "pallas" forces it (interpret mode off-TPU), "xla" forces the
    blocked-scan XLA path.
    """
    h = luma.shape[-2]
    s1 = luma[..., j_start - 1:h - j_stop_off - 1, :]
    s2 = luma[..., j_start:h - j_stop_off, :]
    s3 = luma[..., j_start + 1:h - j_stop_off + 1, :]
    m = _outlier(s1, s2, s3)
    on_tpu = jax.default_backend() == "tpu"
    if engine == "pallas" or (engine == "auto" and on_tpu):
        interp = not on_tpu
        lead = m.shape[:-2]
        n = 1
        for s in lead:
            n *= s
        if n > _NCHUNK:
            # large batches stream through the kernel _NCHUNK chains at
            # a time (lax.map): the padded i32 staging arrays are
            # [R, n, W] — an uncapped 512-frame combdetect window would
            # stage 2x ~2 GB and the kernel block would blow the 16 MB
            # VMEM scope (measured on v5e)
            r, w = m.shape[-2], m.shape[-1]
            k = -(-n // _NCHUNK)
            mp = jnp.zeros((k * _NCHUNK, r, w), bool)
            mp = mp.at[:n].set(m.reshape((n, r, w)))
            over = lax.map(
                lambda mm: _scan_rows_pallas(mm, interpret=interp),
                mp.reshape((k, _NCHUNK, r, w)))
            over = over.reshape((k * _NCHUNK, r, w))[:n].reshape(
                lead + (r, w))
        else:
            over = _scan_rows_pallas(m, interpret=interp)
    else:
        over = _scan_rows(m)
    mask = jnp.zeros(luma.shape, bool)
    mask = mask.at[..., j_start:h - j_stop_off, :].set(over)
    score = jnp.sum(over.astype(jnp.int32), axis=(-2, -1))
    return mask, score


def interleave(top: jnp.ndarray, bottom: jnp.ndarray) -> jnp.ndarray:
    """Even rows from `top`, odd rows from `bottom` (GET_LINE_IL)."""
    h = top.shape[-2]
    parity = (jnp.arange(h) % 2)[:, None]
    return jnp.where(parity == 0, top, bottom)


def comb_score(top: jnp.ndarray, bottom: jnp.ndarray) -> jnp.ndarray:
    """get_comb_score (gstivtc.c:634-680) on two field-source luma frames
    (batched over leading axes)."""
    return comb_mask(interleave(top, bottom))[1]


# ---------------------------------------------------------------------------
# Score-only pair kernel (r5 perf)
# ---------------------------------------------------------------------------
# ivtc's dense window scoring only needs the SCALAR comb score of every
# adjacent field pair — not the over-100 mask.  The comb_mask path staged
# the mask as a [R, n, W] i32 array per 32 chains and wrote an equal-sized
# i32 mask back out (~470 MB of traffic per 32 chains at 720p); this
# variant stages the outlier mask as u8 in the kernel's native
# [rows, 32-chain, W] layout and accumulates the over-100 counts
# in-register, emitting one [32, 128] partial-sum block per chain group.

_PAIR_RB = 16  # mask rows per grid step


def _score_kernel(m_ref, out_ref, carry_ref, acc_ref, *, nlast, w):
    i32 = jnp.int32
    zero, one = i32(0), i32(1)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        carry_ref[...] = jnp.zeros(carry_ref.shape, jnp.int32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.int32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (32, w), 1)
    p = carry_ref[...]
    acc = acc_ref[...]
    for j in range(m_ref.shape[0]):
        mi = m_ref[j].astype(jnp.int32)
        v = jnp.where(mi == one, p + one, zero)
        f = one - mi
        d = 1
        while d < w:
            vs = _shift_right(v, d, 0, lane)
            fs = _shift_right(f, d, 1, lane)
            v = v + jnp.where(f == one, zero, vs)
            f = jnp.maximum(f, fs)
            d *= 2
        seg = jnp.where(mi == one, v, zero)
        acc = acc + (seg > i32(100)).astype(jnp.int32)
        p = jnp.minimum(seg, i32(1000))
    carry_ref[...] = p
    acc_ref[...] = acc

    @pl.when(pl.program_id(1) == nlast)
    def _emit():
        a = acc_ref[...]
        folded = jnp.zeros((32, 128), jnp.int32)
        for k in range(w // 128):
            folded = folded + a[:, 128 * k:128 * (k + 1)]
        out_ref[0] = folded


@functools.partial(jax.jit, static_argnames=("interpret",))
def _score_pairs_pallas(m_t: jnp.ndarray, interpret: bool = False):
    """m_t: [Rp, n32, Wp] u8 outlier masks (rows-major, chains in the
    sublane dim, n32 % 32 == 0, Rp % _PAIR_RB == 0, Wp % 128 == 0; pad
    rows/lanes/chains are 0).  Returns [n32] i32 comb scores."""
    rp, n32, wp = m_t.shape
    zero = np.int32(0)
    nrb = rp // _PAIR_RB
    out = pl.pallas_call(
        functools.partial(_score_kernel, nlast=nrb - 1, w=wp),
        grid=(n32 // 32, nrb),
        in_specs=[pl.BlockSpec((_PAIR_RB, 32, wp),
                               lambda g, i: (i, g, zero))],
        out_specs=pl.BlockSpec((1, 32, 128), lambda g, i: (g, zero, zero)),
        out_shape=jax.ShapeDtypeStruct((n32 // 32, 32, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((32, wp), jnp.int32),
                        pltpu.VMEM((32, wp), jnp.int32)],
        interpret=interpret,
    )(m_t)
    return jnp.sum(out, axis=-1, dtype=jnp.int32).reshape(n32)


def comb_score_pairs(pool_y: jnp.ndarray, top_idx: jnp.ndarray,
                     bot_idx: jnp.ndarray, engine: str = "auto",
                     chunk: int = 128) -> jnp.ndarray:
    """get_comb_score for n (top, bottom) frame pairs out of a frame pool.

    pool_y: [P, H, W] u8.  top_idx/bot_idx: [n] i32 — the frame whose
    even/odd rows form the woven candidate (gstivtc.c:634-680).  Streams
    `chunk` pairs at a time: gather the two frame sets, fuse
    interleave+outlier into one u8 mask in the kernel's [rows, chain, W]
    layout, then score with the accumulate-only chain kernel.
    """
    n = top_idx.shape[0]
    h, w = pool_y.shape[-2], pool_y.shape[-1]
    r = h - 4
    on_tpu = jax.default_backend() == "tpu"
    if r <= 0:
        return jnp.zeros(n, jnp.int32)
    if engine == "xla" or (engine == "auto" and not on_tpu):
        top = pool_y[top_idx]
        bot = pool_y[bot_idx]
        return comb_score(top, bot)

    interp = not on_tpu
    rp = -(-r // _PAIR_RB) * _PAIR_RB
    wp = -(-w // 128) * 128
    k = -(-n // chunk)
    npad = k * chunk
    ti = jnp.zeros(npad, jnp.int32).at[:n].set(top_idx.astype(jnp.int32))
    bi = jnp.zeros(npad, jnp.int32).at[:n].set(bot_idx.astype(jnp.int32))
    rows = (jnp.arange(h, dtype=jnp.int32) % 2)[:, None]

    def run(ids):
        t, b = ids
        il = jnp.where(rows == 0, pool_y[t], pool_y[b]).astype(jnp.int32)
        m = _outlier(il[:, 1:h - 3], il[:, 2:h - 2], il[:, 3:h - 1])
        m_t = jnp.zeros((rp, chunk, wp), jnp.uint8)
        m_t = m_t.at[:r, :, :w].set(
            jnp.moveaxis(m, 0, 1).astype(jnp.uint8))
        return _score_pairs_pallas(m_t, interpret=interp)

    scores = lax.map(run, (ti.reshape(k, chunk), bi.reshape(k, chunk)))
    return scores.reshape(npad)[:n]
