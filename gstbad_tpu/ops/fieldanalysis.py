"""fieldanalysis metrics (gst/fieldanalysis/gstfieldanalysisorc.orc and the
block-scored windowed comb) vectorized for TPU.

All metrics follow the ORC semantics: per-sample contributions are kept only
when strictly above the (scaled) noise floor, accumulated in integers per
row and summed in float32.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _field(frame, parity):
    """Field rows of a [H, W] plane: parity 0 = even rows (top)."""
    return jnp.where(parity == 0, frame[0::2], frame[1::2])


def _sum2(d):
    """Exact whole-plane integer sum: per-row i32 partials (every metric's
    row total fits i32: ssd <= W*255^2 = 8.3e7 at 1280), then i64 over the
    tiny row vector.  A direct jnp.sum(dtype=int64) pays TPU's emulated
    64-bit arithmetic on every element (measured ~2x the metric cost)."""
    return jnp.sum(jnp.sum(d, axis=-1, dtype=jnp.int32), dtype=jnp.int64)


def same_parity_sad(f0, p0, f1, p1, noise_floor):
    a = _field(f0, p0).astype(jnp.int32)
    b = _field(f1, p1).astype(jnp.int32)
    d = jnp.abs(a - b)
    d = jnp.where(d > noise_floor, d, 0)
    h, w = f0.shape
    return _sum2(d).astype(jnp.float32) / jnp.float32(0.5 * w * h)


def same_parity_ssd(f0, p0, f1, p1, noise_floor):
    a = _field(f0, p0).astype(jnp.int32)
    b = _field(f1, p1).astype(jnp.int32)
    d = (a - b) * (a - b)
    d = jnp.where(d > noise_floor * noise_floor, d, 0)
    h, w = f0.shape
    return _sum2(d).astype(jnp.float32) / jnp.float32(0.5 * w * h)


def same_parity_3_tap(f0, p0, f1, p1, noise_floor):
    """Horizontal [1,4,1] (gstfieldanalysis.c:898-955; see
    golden.fieldanalysis for the stride-padding caveat)."""
    a = _field(f0, p0).astype(jnp.int32)
    b = _field(f1, p1).astype(jnp.int32)
    nt = noise_floor * 6
    first = jnp.abs((a[:, 0] << 2) + (a[:, 1] << 1)
                    - ((b[:, 0] << 2) + (b[:, 1] << 1)))
    mid = jnp.abs((a[:, :-2] + 4 * a[:, 1:-1] + a[:, 2:])
                  - (b[:, :-2] + 4 * b[:, 1:-1] + b[:, 2:]))
    last = jnp.abs((a[:, -2] << 1) + (a[:, -1] << 2)
                   - ((b[:, -2] << 1) + (b[:, -1] << 2)))
    tot = (_sum2(jnp.where(mid > nt, mid, 0))
           + jnp.sum(jnp.where(first > nt, first, 0), dtype=jnp.int64)
           + jnp.sum(jnp.where(last > nt, last, 0), dtype=jnp.int64))
    h, w = f0.shape
    return tot.astype(jnp.float32) / jnp.float32(3.0 * w * h)


def _interleave_by_parity(f0, p0, f1):
    """Even rows from the parity-selected source (gstfieldanalysis.c:972+)."""
    h = f0.shape[0]
    rows = (jnp.arange(h) % 2)[:, None]
    top_src = jnp.where(p0 == 0, f0, f1)
    bottom_src = jnp.where(p0 == 0, f1, f0)
    return jnp.where(rows == 0, top_src, bottom_src)


def opposite_parity_5_tap(f0, p0, f1, noise_floor):
    """Vertical [1,-3,4,-3,1] around even rows with mirrored boundaries.

    Expressed over the even/odd row planes with slice+concat shifts
    (NO row gathers — XLA gathers run at ~0.1-1 Gelem/s on TPU and
    dominated the batched/vmapped form of the old index-array version).
    For even row c = 2k the taps are E[k-1], O[k-1], E[k], O[k], E[k+1];
    first/last field lines mirror BOTH outer taps (gstfieldanalysis.c:
    1007-1010 first, 1034-1040 last: fjm2,fjm1,fj,fjm1,fjm2)."""
    h, w = f0.shape
    top_src = jnp.where(p0 == 0, f0, f1).astype(jnp.int32)
    bottom_src = jnp.where(p0 == 0, f1, f0).astype(jnp.int32)
    E = top_src[0::2]      # il rows 2k, [h//2, w]
    O = bottom_src[1::2]   # il rows 2k+1
    nt = noise_floor * 6
    # interior k in [1, n-2]: taps E[k-1], O[k-1], E[k], O[k], E[k+1] as
    # pure shifted slices (concat forms materialized 4 full tap arrays)
    v_mid = jnp.abs(E[:-2] - 3 * O[:-2] + 4 * E[1:-1] - 3 * O[1:-1]
                    + E[2:])
    # k=0 mirrors both outer taps to E[1]/O[0]; k=n-1 mirrors the forward
    # taps back to E[n-2]/O[n-2]
    v_first = jnp.abs(2 * E[1] - 6 * O[0] + 4 * E[0])
    v_last = jnp.abs(2 * E[-2] - 6 * O[-2] + 4 * E[-1])
    tot = (_sum2(jnp.where(v_mid > nt, v_mid, 0))
           + jnp.sum(jnp.where(v_first > nt, v_first, 0), dtype=jnp.int64)
           + jnp.sum(jnp.where(v_last > nt, v_last, 0), dtype=jnp.int64))
    return tot.astype(jnp.float32) / jnp.float32(3.0 * w * h)


def _segment_matrix(w_trunc: int, block_width: int) -> np.ndarray:
    """Static 0/1 matrix mapping triple positions to block columns per the
    reference's edge rules (block_score_for_row_*, gstfieldanalysis.c)."""
    n_blocks = w_trunc // block_width
    # triple at i (i in 2..w-1) -> block (i-1)//bw; pair i==1 -> block 0;
    # pair i==w-1 -> block (w-1)//bw (== n_blocks-1)
    m = np.zeros((w_trunc, n_blocks), np.float32)  # indexed by i
    for i in range(2, w_trunc):
        m[i, (i - 1) // block_width] = 1.0
    return m


def windowed_comb(f0, p0, f1, spatial_thresh, block_width, block_height,
                  block_thresh, ignored_lines, interlaced_input: bool):
    """opposite_parity_windowed_comb (gstfieldanalysis.c:1337-1400) with the
    5-tap block scorer; returns 0.0 / 1.0 / 2.0 like the reference."""
    il = _interleave_by_parity(f0, p0, f1).astype(jnp.int32)
    h, w_full = il.shape
    w = w_full - (w_full % block_width)
    il = il[:, :w]
    n_bands = max(0, (h - ignored_lines - block_height) // block_height + 1)
    if n_bands == 0:
        return jnp.float32(0.0)

    # absolute rows for every (band, row-in-band)
    c = (ignored_lines + np.arange(n_bands)[:, None] * block_height
         + np.arange(block_height)[None, :]).reshape(-1)
    rm2 = np.clip(c - 2, 0, h - 1)
    rm1 = np.clip(c - 1, 0, h - 1)
    rp1 = np.where(c + 1 <= h - 1, c + 1, c - 1)
    rp2 = np.where(c + 2 <= h - 1, c + 2, c - 2)
    fj = il[c]
    fjm1 = il[rm1]
    fjp1 = il[rp1]
    diff1 = fj - fjm1
    diff2 = fj - fjp1
    st = spatial_thresh
    dir_ok = ((diff1 > st) & (diff2 > st)) | ((diff1 < -st) & (diff2 < -st))
    five = jnp.abs(il[rm2] + (fj << 2) + il[rp2] - 3 * (fjm1 + fjp1))
    mask = (dir_ok & (five > 6 * st)).astype(jnp.float32)

    # triples at i in [2, w): mask[i-2]*mask[i-1]*mask[i]
    triple = mask[:, :-2] * mask[:, 1:-1] * mask[:, 2:]
    triple = jnp.pad(triple, ((0, 0), (2, 0)))
    seg = jnp.asarray(_segment_matrix(w, block_width))
    scores = triple @ seg  # [bands*bh, n_blocks]
    # edge pairs
    pair_left = mask[:, 0] * mask[:, 1]
    pair_right = mask[:, -2] * mask[:, -1]
    scores = scores.at[:, 0].add(pair_left)
    scores = scores.at[:, -1].add(pair_right)
    scores = scores.reshape(n_bands, block_height, -1).sum(axis=1)
    band_max = jnp.max(scores, axis=-1)  # [bands]
    combed = jnp.any(band_max > block_thresh)
    slightly = jnp.any((band_max > block_thresh // 2)
                       & (band_max <= block_thresh))
    full = jnp.float32(1.0 if interlaced_input else 2.0)
    return jnp.where(combed, full, jnp.where(slightly, 1.0, 0.0))


# ---------------------------------------------------------------------------
# Fused default-metric kernel (r5 perf)
# ---------------------------------------------------------------------------
# One Pallas pass computes, for every frame of a window, the four plane
# accumulators behind the element's five default metrics (field-metric=ssd,
# frame-metric=5-tap, gstfieldanalysis.c:74-84):
#   ssd  — (y - prev)^2 noise-gated, ALL rows (t = even-row sum, b = odd)
#   f    — vertical [1,-3,4,-3,1] on y itself, interior even rows
#   t_b  — the same tap on interleave(even=y, odd=prev)
#   b_t  — the same tap on interleave(even=prev, odd=y)
# The XLA formulation paid ~111 ms/window at 256x720p (i32 materialization
# of every tap plane + strided row selects); this kernel reads each frame
# ONCE as packed 4-pixel i32 words (the lane axis carries W/4 words; byte
# planes unpack in registers) and accumulates [8, W/4] i32 partials whose
# sublane parity == global row parity, so the host-side split into t/b is
# a tiny slice-sum.  Mirrored edge rows (first/last field line) are added
# host-side from 2-row slices.

_MHALO = 8  # row halo on each side (tap reach is 2; 8 keeps blocks aligned)


def _metrics_kernel(yw_ref, pw_ref, yprv_ref, ynxt_ref, pprv_ref,
                    pnxt_ref, thr_ref, out_ref, *, br, w4, h):
    rb = pl.program_id(1)

    @pl.when(rb == 0)
    def _init():
        out_ref[0] = jnp.zeros((32, w4), jnp.int32)

    nf2 = thr_ref[0]   # noise_floor^2 (ssd gate)
    nt6 = thr_ref[1]   # noise_floor*6 (tap gate)
    rows = br + 2 * _MHALO
    # global x64: every literal must be a TYPED i32 or Mosaic recurses
    # lowering the weak-i64 converts (CLAUDE.md)
    i32 = jnp.int32
    c0, c1, c2, c3, c4 = i32(0), i32(1), i32(2), i32(3), i32(4)
    c255 = i32(255)

    yall = jnp.concatenate([yprv_ref[0], yw_ref[0], ynxt_ref[0]], axis=0)
    pall = jnp.concatenate([pprv_ref[0], pw_ref[0], pnxt_ref[0]], axis=0)

    # global row of plane row i is rb*br + i - _MHALO; br is a multiple of
    # 8 so parity == i%2 — a static sublane pattern
    sub = lax.broadcasted_iota(jnp.int32, (rows, w4), 0)
    even = (sub & c1) == c0
    # center-row global indices for the tap band masks
    g = rb * i32(br) + lax.broadcasted_iota(jnp.int32, (br, w4), 0)
    tap_ok = (g >= c2) & (g < i32(h - 2)) & ((g & c1) == c0)
    row_ok = g < i32(h)

    acc = [jnp.zeros((8, w4), jnp.int32) for _ in range(4)]
    for c in range(4):
        yp = (yall >> i32(8 * c)) & c255
        pp = (pall >> i32(8 * c)) & c255

        d = yp[_MHALO:_MHALO + br] - pp[_MHALO:_MHALO + br]
        d = d * d
        d = jnp.where((d > nf2) & row_ok, d, c0)

        il_tb = jnp.where(even, yp, pp)
        il_bt = jnp.where(even, pp, yp)
        vals = [d]
        for il in (yp, il_tb, il_bt):
            m2 = il[_MHALO - 2:_MHALO - 2 + br]
            m1 = il[_MHALO - 1:_MHALO - 1 + br]
            z0 = il[_MHALO:_MHALO + br]
            p1 = il[_MHALO + 1:_MHALO + 1 + br]
            p2 = il[_MHALO + 2:_MHALO + 2 + br]
            v = jnp.abs(m2 - c3 * m1 + c4 * z0 - c3 * p1 + p2)
            vals.append(jnp.where((v > nt6) & tap_ok, v, c0))
        for i, v in enumerate(vals):
            acc[i] = acc[i] + jnp.sum(
                v.reshape(br // 8, 8, w4), axis=0, dtype=jnp.int32)

    for i in range(4):
        out_ref[0, 8 * i:8 * i + 8, :] = out_ref[0, 8 * i:8 * i + 8, :] \
            + acc[i]


@functools.partial(jax.jit, static_argnames=("h", "interpret"))
def _metrics_pallas(yw, pw, thr, h: int, interpret: bool = False):
    """yw/pw: [B, Hp, W4] i32 packed 4-pixel words (Hp multiple of 8,
    zero-padded rows/lanes).  thr: [2] i32 (nf^2, nf*6).  h: the TRUE
    frame height (the tap band mask must stop at h-2, not the pad).
    Returns [B, 32, W4] i32: 4 stacked [8, W4] accumulators (ssd, f,
    t_b, b_t)."""
    b, hp, w4 = yw.shape
    br = 64
    while hp % br:
        br //= 2
    nrb = hp // br
    sub = br // 8
    nsub = hp // 8
    zero = np.int32(0)

    def mk(prv):
        def idx(bi, r):
            if prv:
                return (bi, jnp.maximum(r * sub - 1, 0), zero)
            return (bi, jnp.minimum((r + 1) * sub, nsub - 1), zero)
        return idx

    return pl.pallas_call(
        functools.partial(_metrics_kernel, br=br, w4=w4, h=h),
        grid=(b, nrb),
        in_specs=[
            pl.BlockSpec((1, br, w4), lambda bi, r: (bi, r, zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, br, w4), lambda bi, r: (bi, r, zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, w4), mk(True), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, w4), mk(False), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, w4), mk(True), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, w4), mk(False), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 32, w4), lambda bi, r: (bi, zero, zero),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 32, w4), jnp.int32),
        interpret=interpret,
    )(yw, pw, yw, yw, pw, pw, thr)


def _pack_words(y):
    """[B, H, W] u8 -> [B, Hp, ceil(W/4 -> lane-pad)] i32 little-endian
    4-pixel words, rows zero-padded to a multiple of 8."""
    b, h, w = y.shape
    wp = -(-w // 4) * 4
    hp = -(-h // 8) * 8
    if wp != w or hp != h:
        y = jnp.pad(y, ((0, 0), (0, hp - h), (0, wp - w)))
    word = lax.bitcast_convert_type(
        y.reshape(b, hp, wp // 4, 4), jnp.int32)
    w4 = wp // 4
    w4p = -(-w4 // 128) * 128
    if w4p != w4:
        word = jnp.pad(word, ((0, 0), (0, 0), (0, w4p - w4)))
    return word


def metrics_default(y, prev, noise_floor, interpret: bool = False):
    """All five default-config metrics for a window: y/prev [B, H, W] u8,
    prev[i] = the previous valid frame of slot i.  Returns (f, t, b, t_b,
    b_t) each [B] f32 — bit-identical to the per-frame metric functions
    (same_parity_ssd / opposite_parity_5_tap)."""
    b, h, w = y.shape
    nf = jnp.asarray(noise_floor, jnp.int32)
    thr = jnp.stack([nf * nf, nf * 6]).astype(jnp.int32)
    acc = _metrics_pallas(_pack_words(y), _pack_words(prev), thr, h,
                          interpret=interpret)
    acc64 = acc.astype(jnp.int64)
    ssd = acc64[:, 0:8]
    t = jnp.sum(ssd[:, 0::2], axis=(1, 2))
    bm = jnp.sum(ssd[:, 1::2], axis=(1, 2))
    tap_int = jnp.sum(acc64[:, 8:32].reshape(b, 3, 8, acc.shape[-1]),
                      axis=(2, 3))

    # mirrored edge rows (the kernel covers interior even rows only):
    # row 0 taps E[1],O[0],E[0]; row h-2 taps E[-2],O[-2],E[-1]
    # (opposite_parity_5_tap's v_first / v_last)
    nt = nf * 6

    def edge(il_top, il_bot):
        yi = il_top.astype(jnp.int32)
        pi = il_bot.astype(jnp.int32)
        v_first = jnp.abs(2 * yi[:, 2] - 6 * pi[:, 1] + 4 * yi[:, 0])
        v_last = jnp.abs(2 * yi[:, h - 4] - 6 * pi[:, h - 3]
                         + 4 * yi[:, h - 2])
        return (jnp.sum(jnp.where(v_first > nt, v_first, 0),
                        axis=-1, dtype=jnp.int64)
                + jnp.sum(jnp.where(v_last > nt, v_last, 0),
                          axis=-1, dtype=jnp.int64))

    e_f = edge(y, y)
    e_tb = edge(y, prev)
    e_bt = edge(prev, y)
    f_tot = tap_int[:, 0] + e_f
    tb_tot = tap_int[:, 1] + e_tb
    bt_tot = tap_int[:, 2] + e_bt

    field_norm = jnp.float32(0.5 * w * h)
    frame_norm = jnp.float32(3.0 * w * h)
    return (f_tot.astype(jnp.float32) / frame_norm,
            t.astype(jnp.float32) / field_norm,
            bm.astype(jnp.float32) / field_norm,
            tb_tot.astype(jnp.float32) / frame_norm,
            bt_tot.astype(jnp.float32) / frame_norm)
