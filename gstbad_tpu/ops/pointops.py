"""Per-pixel point ops in JAX — exact int32 transcriptions of the
gaudieffects / coloreffects / videofilters math.

All ops take [..., 4] uint8 (channel order = memory byte order) and return
uint8.  Channel-asymmetric ops take rgb channel indices (static Python ints)
so one traced program serves every packed format.  These are elementwise, so
XLA fuses arbitrary chains of them into one kernel — the whole-graph fusion
the reference cannot do across element threads.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def _i32(x):
    return x.astype(jnp.int32)


def _per_frame(p, ndim):
    """Broadcast a per-frame [B] param against [B, ...spatial] data."""
    return p.reshape(p.shape + (1,) * (ndim - p.ndim)) if p.ndim else p


def _scatter_rgb(shape_like, values, rgb, fill):
    """Rebuild a packed pixel from per-channel planes, zeroing `fill`
    (the C codes rebuild the guint32 word without the fill byte)."""
    out = jnp.zeros_like(shape_like)
    for ch in rgb:
        out = out.at[..., ch].set(values[..., ch])
    return out


def burn(img: jnp.ndarray, adjustment: jnp.ndarray) -> jnp.ndarray:
    """gaudi_orc_burn (gstgaudieffectsorc.orc:1-26); all 4 bytes processed.
    Evaluated as a composed byte LUT (ops/lut.py) — gather-free."""
    from gstbad_tpu.ops import lut
    packed = lut.pack_table(lut.burn_table(adjustment))
    return lut.apply_lut(_i32(img), packed)


def chromium(img: jnp.ndarray, edge_a: jnp.ndarray, edge_b: jnp.ndarray,
             cos_table: jnp.ndarray, rgb: Sequence[int], fill: Optional[int]
             ) -> jnp.ndarray:
    """gstchromium.c:315-360 cosine fold; cos_table from
    golden.gaudieffects.chromium_cos_table (int32 [1024])."""
    from gstbad_tpu.ops import lut
    packed = lut.pack_table(lut.chromium_table(edge_a, edge_b, cos_table))
    v = lut.apply_lut(_i32(img), packed)
    return _scatter_rgb(img, v, rgb, fill)


def dodge(img: jnp.ndarray, rgb: Sequence[int], fill: Optional[int]
          ) -> jnp.ndarray:
    """gstdodge.c:232-255."""
    from gstbad_tpu.ops import lut
    packed = lut.pack_table(lut.dodge_table())
    v = lut.apply_lut(_i32(img), packed)
    return _scatter_rgb(img, v, rgb, fill)


def exclusion(img: jnp.ndarray, factor: jnp.ndarray, rgb: Sequence[int],
              fill: Optional[int]) -> jnp.ndarray:
    """gstexclusion.c:257-290 (the green-in-red-term quirk preserved)."""
    f = _per_frame(factor.astype(jnp.int32), img.ndim - 1)
    r = _i32(img[..., rgb[0]])
    g = _i32(img[..., rgb[1]])
    b = _i32(img[..., rgb[2]])
    rr = f - (((f - r) * (f - r)) // f + (g * r) // f)
    gg = f - (((f - g) * (f - g)) // f + (g * g) // f)
    bb = f - (((f - b) * (f - b)) // f + (b * b) // f)
    out = jnp.zeros_like(img)
    out = out.at[..., rgb[0]].set(jnp.clip(rr, 0, 255).astype(jnp.uint8))
    out = out.at[..., rgb[1]].set(jnp.clip(gg, 0, 255).astype(jnp.uint8))
    out = out.at[..., rgb[2]].set(jnp.clip(bb, 0, 255).astype(jnp.uint8))
    return out


def solarize(img: jnp.ndarray, threshold: jnp.ndarray, start: jnp.ndarray,
             end: jnp.ndarray, rgb: Sequence[int], fill: Optional[int]
             ) -> jnp.ndarray:
    """gstsolarize.c:287-339 as a composed byte LUT (the exact C int/uint32
    wrap semantics run on the 256 table entries, ops/lut.solarize_table)."""
    from gstbad_tpu.ops import lut
    packed = lut.pack_table(lut.solarize_table(threshold, start, end))
    col = lut.apply_lut(_i32(img), packed)
    return _scatter_rgb(img, col, rgb, fill)


def dilate(img: jnp.ndarray, erode: jnp.ndarray, rgb: Sequence[int]
           ) -> jnp.ndarray:
    """gstdilate.c:273-350: sequential neighbor propagation over
    down, right, left (the reference's `up` pointer always clamps to self).
    Whole pixels copy; luminance = 90r + 115g + 51b."""
    def lum(a):
        a32 = _i32(a)
        return (90 * a32[..., rgb[0]] + 115 * a32[..., rgb[1]]
                + 51 * a32[..., rgb[2]])

    # neighbors via edge-replicating shifts on H (axis -3) and W (axis -2)
    down = jnp.concatenate([img[..., 1:, :, :], img[..., -1:, :, :]], axis=-3)
    right = jnp.concatenate([img[..., :, 1:, :], img[..., :, -1:, :]], axis=-2)
    left = jnp.concatenate([img[..., :, :1, :], img[..., :, :-1, :]], axis=-2)

    out = img
    out_lum = lum(img)
    for n in (down, right, left):
        n_lum = lum(n)
        take = jnp.where(_per_frame(erode, n_lum.ndim),
                         n_lum < out_lum, n_lum > out_lum)
        out = jnp.where(take[..., None], n, out)
        out_lum = jnp.where(take, n_lum, out_lum)
    return out


def lut_rgb(img: jnp.ndarray, table: jnp.ndarray, map_luma: bool,
            rgb: Sequence[int]) -> jnp.ndarray:
    """coloreffects RGB path (gstcoloreffects.c:306-360); table int32
    [256, 3]."""
    from gstbad_tpu.ops import lut
    r = _i32(img[..., rgb[0]])
    g = _i32(img[..., rgb[1]])
    b = _i32(img[..., rgb[2]])
    packed = [lut.pack_table(table[:, c]) for c in range(3)]
    out = img
    if map_luma:
        luma = (((r << 8) * 54) + ((g << 8) * 183) + ((b << 8) * 19)) >> 16
        out = out.at[..., rgb[0]].set(lut.apply_lut(luma, packed[0]))
        out = out.at[..., rgb[1]].set(lut.apply_lut(luma, packed[1]))
        out = out.at[..., rgb[2]].set(lut.apply_lut(luma, packed[2]))
    else:
        out = out.at[..., rgb[0]].set(lut.apply_lut(r, packed[0]))
        out = out.at[..., rgb[1]].set(lut.apply_lut(g, packed[1]))
        out = out.at[..., rgb[2]].set(lut.apply_lut(b, packed[2]))
    return out


_YCBCR2RGB = np.array([[298, 0, 409, -57068],
                       [298, -100, -208, 34707],
                       [298, 516, 0, -70870]], np.int32)
_RGB2YCBCR = np.array([[66, 129, 25, 4096],
                       [-38, -74, 112, 32768],
                       [112, -94, -18, 32768]], np.int32)


def _apply_matrix(m, v1, v2, v3):
    """APPLY_MATRIX (gstcoloreffects.c:303-304) — >> 8 is arithmetic."""
    return [(m[o][0] * v1 + m[o][1] * v2 + m[o][2] * v3 + m[o][3]) >> 8
            for o in range(3)]


def lut_ayuv(img: jnp.ndarray, table: jnp.ndarray, map_luma: bool
             ) -> jnp.ndarray:
    """coloreffects AYUV path (gstcoloreffects.c:362-430); img byte order
    A,Y,U,V."""
    from gstbad_tpu.ops import lut
    y = _i32(img[..., 1])
    u = _i32(img[..., 2])
    v = _i32(img[..., 3])
    packed = [lut.pack_table(table[:, c]) for c in range(3)]
    if map_luma:
        r, g, b = (lut.apply_lut(y, packed[c]).astype(jnp.int32)
                   for c in range(3))
    else:
        r, g, b = _apply_matrix(_YCBCR2RGB, y, u, v)
        r = lut.apply_lut(jnp.clip(r, 0, 255), packed[0]).astype(jnp.int32)
        g = lut.apply_lut(jnp.clip(g, 0, 255), packed[1]).astype(jnp.int32)
        b = lut.apply_lut(jnp.clip(b, 0, 255), packed[2]).astype(jnp.int32)
    yy, uu, vv = _apply_matrix(_RGB2YCBCR, r, g, b)
    out = img
    out = out.at[..., 1].set(jnp.clip(yy, 0, 255).astype(jnp.uint8))
    out = out.at[..., 2].set(jnp.clip(uu, 0, 255).astype(jnp.uint8))
    out = out.at[..., 3].set(jnp.clip(vv, 0, 255).astype(jnp.uint8))
    return out


def rgb_to_hue(r, g, b):
    """gstchromahold.c:271-299 in int32; -1 for achromatic."""
    m = jnp.minimum(jnp.minimum(r, g), b)
    M = jnp.maximum(jnp.maximum(r, g), b)
    C = M - m
    C2 = C >> 1
    Cs = jnp.maximum(C, 1)

    def cdiv(a, d):  # C division truncates toward zero
        return jnp.sign(a) * (jnp.abs(a) // d)

    h_r = cdiv(256 * 60 * (g - b) + C2, Cs)
    h_g = cdiv(256 * 60 * (b - r) + C2, Cs) + 120 * 256
    h_b = cdiv(256 * 60 * (r - g) + C2, Cs) + 240 * 256
    h = jnp.where(M == r, h_r, jnp.where(M == g, h_g, h_b))
    h = h >> 8
    h = jnp.where(h >= 360, h - 360, h)
    h = jnp.where(h < 0, h + 360, h)
    return jnp.where(C == 0, -1, h)


def chromahold(img: jnp.ndarray, target_hue: jnp.ndarray,
               tolerance: jnp.ndarray, rgb: Sequence[int]) -> jnp.ndarray:
    """gstchromahold.c:318-360."""
    r = _i32(img[..., rgb[0]])
    g = _i32(img[..., rgb[1]])
    b = _i32(img[..., rgb[2]])
    h1 = _per_frame(target_hue.astype(jnp.int32), img.ndim - 1)
    tolerance = _per_frame(tolerance, img.ndim - 1)
    h2 = rgb_to_hue(r, g, b)
    d1 = h1 - h2
    d2 = h2 - h1
    d1 = jnp.where(d1 < 0, d1 + 360, d1)
    d2 = jnp.where(d2 < 0, d2 + 360, d2)
    diff = jnp.minimum(d1, d2)
    grey = jnp.clip((13938 * r + 46869 * g + 4730 * b) >> 16, 0, 255)
    make_grey = (h1 == -1) | (diff > tolerance.astype(jnp.int32))
    out = img
    out = out.at[..., rgb[0]].set(
        jnp.where(make_grey, grey, r).astype(jnp.uint8))
    out = out.at[..., rgb[1]].set(
        jnp.where(make_grey, grey, g).astype(jnp.uint8))
    out = out.at[..., rgb[2]].set(
        jnp.where(make_grey, grey, b).astype(jnp.uint8))
    return out


def zebrastripe(y: jnp.ndarray, y_threshold: jnp.ndarray, t: jnp.ndarray
                ) -> jnp.ndarray:
    """gstzebrastripe.c:205-253 on a luma plane [..., H, W]; t broadcasts
    per frame ([..., 1, 1] for a batch)."""
    h, w = y.shape[-2], y.shape[-1]
    i = jnp.arange(w, dtype=jnp.int32)[None, :]
    j = jnp.arange(h, dtype=jnp.int32)[:, None]
    stripe = ((i + j + t) & 0x4) != 0
    return jnp.where((y >= y_threshold.astype(jnp.uint8)) & stripe,
                     jnp.uint8(16), y)


def videodiff(cur: jnp.ndarray, old: jnp.ndarray, threshold: jnp.ndarray,
              t: jnp.ndarray) -> jnp.ndarray:
    """gstvideodiff.c:91-116 on luma planes."""
    h, w = cur.shape[-2], cur.shape[-1]
    s1 = _i32(old)
    s2 = _i32(cur)
    thr = threshold.astype(jnp.int32)
    moved = (s2 < s1 - thr) | (s2 > s1 + thr)
    i = jnp.arange(w, dtype=jnp.int32)[None, :]
    j = jnp.arange(h, dtype=jnp.int32)[:, None]
    stripe = ((i + j + t) & 0x4) != 0
    return jnp.where(moved,
                     jnp.where(stripe, jnp.uint8(16), jnp.uint8(240)),
                     cur)


def sad(f1: jnp.ndarray, f2: jnp.ndarray) -> jnp.ndarray:
    """orc_sad_nxm_u8 (gstscenechangeorc.orc) over [..., H, W] luma ->
    [...] float64 mean score (gstscenechange.c:146-160)."""
    d = jnp.abs(_i32(f1) - _i32(f2))
    total = jnp.sum(d, axis=(-2, -1), dtype=jnp.int64)
    area = f1.shape[-2] * f1.shape[-1]
    return total.astype(jnp.float64) / area
