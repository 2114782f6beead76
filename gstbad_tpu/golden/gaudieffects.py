"""Golden transcriptions of the gaudieffects hot loops.

All functions take/return uint8 arrays [H, W, 4] whose channel order is the
memory byte order of the negotiated format.  On little-endian the C code's
guint32 view decomposes as blue = byte0, green = byte1, red = byte2,
fill = byte3 for BGRx (gstburn.c:80-84 CAPS_STR) — callers pass channel
indices when the math is asymmetric.
"""

from __future__ import annotations

import numpy as np


def burn(img: np.ndarray, adjustment: int = 175) -> np.ndarray:
    """gaudi_orc_burn (gst/gaudieffects/gstgaudieffectsorc.orc:1-26).

    Per byte c (all four, including the fill byte):
      a = ((c + adjustment) >> 1) & 0xff   (shruw; divluw uses the low byte)
      q = ((255 - c) << 7) / a             (ORC divluw: quotient SATURATES
                                            to 255; divide-by-zero -> 255)
      out = 255 - q                        (in [0,255]; convwb low byte)

    divluw semantics verified against the compiled reference backup
    (gstgaudieffectsorc-dist.c "/* 10: divluw */": ((a & 0xff) == 0) ? 255 :
    ORC_CLAMP_UB(t / (a & 0xff)) — the round-1 transcription wrongly kept a
    full 16-bit quotient with wraparound, which diverges for dark pixels).
    """
    c = img.astype(np.int32)
    a = ((c + int(adjustment)) >> 1) & 0xFF
    t = (255 - c) << 7
    q = np.where(a == 0, 255, np.minimum(t // np.maximum(a, 1), 255))
    return (255 - q).astype(np.uint8)


_COS_TABLE = None


def chromium_cos_table() -> np.ndarray:
    """setup_cos_table (gstchromium.c:283-293): 1024-entry table of
    (int)(cosf(angle/512 * 3.141582f) * 512) — note the reference's
    typo'd pi constant, computed in C float precision."""
    global _COS_TABLE
    if _COS_TABLE is None:
        pi = np.float32(3.141582)
        angle = np.arange(1024, dtype=np.float32)
        rad = (angle / np.float32(512)) * pi  # float expression in C
        # cos() takes the float arg promoted to double; (int) truncates
        _COS_TABLE = np.trunc(np.cos(rad.astype(np.float64)) * 512.0
                              ).astype(np.int32)
    return _COS_TABLE


def chromium(img: np.ndarray, edge_a: int = 200, edge_b: int = 1,
             rgb=(2, 1, 0), fill=3) -> np.ndarray:
    """transform (gstchromium.c:315-360): per-channel cosine fold
    abs(cosTable[(c + edge_a + c*edge_b/2) & 1023]) clamped to 255;
    the fill byte is zeroed by the word rebuild."""
    table = chromium_cos_table()
    c = img.astype(np.int64)
    idx = (c + int(edge_a) + (c * int(edge_b)) // 2) & 1023
    v = np.clip(np.abs(table[idx]), 0, 255).astype(np.uint8)
    out = np.zeros_like(img)
    for ch in rgb:
        out[..., ch] = v[..., ch]
    if fill is not None:
        out[..., fill] = 0
    return out


def dodge(img: np.ndarray, rgb=(2, 1, 0), fill=3) -> np.ndarray:
    """transform (gstdodge.c:232-255): c' = clamp(256*c/(256-c), 0, 255);
    fill byte zeroed."""
    c = img.astype(np.int32)
    v = np.clip((256 * c) // (256 - c), 0, 255).astype(np.uint8)
    out = np.zeros_like(img)
    for ch in rgb:
        out[..., ch] = v[..., ch]
    if fill is not None:
        out[..., fill] = 0
    return out


def exclusion(img: np.ndarray, factor: int = 175,
              rgb=(2, 1, 0), fill=3) -> np.ndarray:
    """transform (gstexclusion.c:257-290).

    Reference quirk preserved: the "red" channel's second term uses
    green*red (not red*red) — red = f - ((f-red)^2/f + green*red/f).
    """
    f = int(factor)
    r = img[..., rgb[0]].astype(np.int64)
    g = img[..., rgb[1]].astype(np.int64)
    b = img[..., rgb[2]].astype(np.int64)
    rr = f - (((f - r) * (f - r)) // f + (g * r) // f)
    gg = f - (((f - g) * (f - g)) // f + (g * g) // f)
    bb = f - (((f - b) * (f - b)) // f + (b * b) // f)
    out = np.zeros_like(img)
    out[..., rgb[0]] = np.clip(rr, 0, 255).astype(np.uint8)
    out[..., rgb[1]] = np.clip(gg, 0, 255).astype(np.uint8)
    out[..., rgb[2]] = np.clip(bb, 0, 255).astype(np.uint8)
    if fill is not None:
        out[..., fill] = 0
    return out


def solarize(img: np.ndarray, threshold: int = 127, start: int = 50,
             end: int = 185, rgb=(2, 1, 0), fill=3) -> np.ndarray:
    """transform (gstsolarize.c:287-339) with exact C int/uint semantics.

    period/up_length/down_length fall back to 1 when degenerate; param wraps
    with C truncating %, and the down-ramp arithmetic runs in guint32 with
    wraparound before the final >255 clamp.
    """
    period = (end - start) if end != start else 1
    up_length = (threshold - start) if threshold != start else 1
    down_length = (end - threshold) if threshold != end else 1

    c = img.astype(np.int64)
    param = c + 256 - start
    # C %: truncation toward zero; dividend here is always >= 0
    param = param - np.trunc(param / period).astype(np.int64) * period

    # up branch: guint32 arithmetic, unsigned division
    up = ((param * 255) & 0xFFFFFFFF) // (np.int64(up_length) & 0xFFFFFFFF)
    # down branch
    v = (down_length - (param - up_length)) & 0xFFFFFFFF
    down = ((v * 255) & 0xFFFFFFFF) // (np.int64(down_length) & 0xFFFFFFFF)

    col = np.where(param < up_length, up, down)
    col = np.where(col > 255, 255, col).astype(np.uint8)

    out = np.zeros_like(img)
    for ch in rgb:
        out[..., ch] = col[..., ch]
    if fill is not None:
        out[..., fill] = 0
    return out


def _dilate_luminance(img32: np.ndarray, rgb) -> np.ndarray:
    """get_luminance (gstdilate.c:258-270): 90*red + 115*green + 51*blue."""
    return (90 * img32[..., rgb[0]] + 115 * img32[..., rgb[1]]
            + 51 * img32[..., rgb[2]])


def dilate(img: np.ndarray, erode: bool = False, rgb=(2, 1, 0)) -> np.ndarray:
    """transform (gstdilate.c:273-350): sequential neighbor propagation.

    Faithful to the reference's pointer logic: the down neighbor is self on
    the last row (the frame-end check applies per-pixel, so it only clamps on
    row H-1), right/left clamp at line ends, and the "up" pointer compare
    `up < src` is always true so up never differs from self (reference
    quirk).  Comparison order: down, right, up, left; the whole 4-byte pixel
    is copied.
    """
    h, w, _ = img.shape
    src = img.astype(np.int32)
    lum = _dilate_luminance(src, rgb)

    def shifted(a, dy, dx, fill_self):
        out = np.empty_like(a)
        ys = np.clip(np.arange(h) + dy, 0, h - 1)
        xs = np.clip(np.arange(w) + dx, 0, w - 1)
        out = a[ys][:, xs]
        return out

    # neighbor pixel/luminance arrays with the reference's edge policy
    down_img = np.concatenate([img[1:], img[-1:]], axis=0)
    down_lum = np.concatenate([lum[1:], lum[-1:]], axis=0)
    right_img = np.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    right_lum = np.concatenate([lum[:, 1:], lum[:, -1:]], axis=1)
    left_img = np.concatenate([img[:, :1], img[:, :-1]], axis=1)
    left_lum = np.concatenate([lum[:, :1], lum[:, :-1]], axis=1)

    out = img.copy()
    out_lum = lum.copy()
    for n_img, n_lum in ((down_img, down_lum), (right_img, right_lum),
                         (left_img, left_lum)):
        if erode:
            take = n_lum < out_lum
        else:
            take = n_lum > out_lum
        out = np.where(take[..., None], n_img, out)
        out_lum = np.where(take, n_lum, out_lum)
    return out


def gaussian_kernel(sigma: float):
    """make_gaussian_kernel (gstgaussblur.c:361-422) in C float precision.

    Returns (kernel, prefix_sums) float32 arrays; negative sigma builds the
    sharpen kernel (sum negated, centre += 2*sum, normalize by negated sum).
    """
    sigma = np.float32(sigma)
    center = int(np.ceil(2.5 * np.abs(float(sigma))))
    window = 1 + 2 * center
    if window == 1:
        return (np.ones(1, np.float32), np.ones(1, np.float32))
    # C: `const float fe = -0.5 / (sigma * sigma)` — double expr cast to float
    fe = np.float32(-0.5 / (np.float64(sigma) * np.float64(sigma)))
    dx = np.float32(1.0 / (np.float64(sigma) * np.sqrt(2 * np.pi)))
    kern = np.zeros(window, np.float32)
    kern[center] = dx
    s = dx
    for i in range(1, center + 1):
        # C: `float fx = dx * pow(G_E, fe * i * i)` — (fe*i)*i associates in
        # float, then pow promotes to double
        arg = np.float32(np.float32(fe * np.float32(i)) * np.float32(i))
        fx = np.float32(np.float64(dx) * np.power(np.e, np.float64(arg)))
        kern[center + i] = kern[center - i] = fx
        s = np.float32(s + np.float32(2) * fx)
    if sigma < 0:
        s = np.float32(-s)
        kern[center] = np.float32(kern[center] + np.float32(2.0) * s)
    kern = (kern / s).astype(np.float32)
    ksum = np.cumsum(kern, dtype=np.float32).astype(np.float32)
    return kern, ksum


def gaussianblur(img: np.ndarray, sigma: float = 1.2) -> np.ndarray:
    """gaussian_smooth (gstgaussblur.c:260-356) on AYUV [H, W, 4].

    Two separable passes in float32: x-pass to a float temp with
    border-truncated kernel normalization, y-pass with + 0.5 then clamp and
    uint8 truncation.  sigma == 0 is a passthrough (transform_frame:253-254).
    """
    if sigma == 0.0:
        return img.copy()
    kern, ksum = gaussian_kernel(sigma)
    window = kern.shape[0]
    center = window // 2
    h, w, ch = img.shape
    x = img.astype(np.float32)

    def pass_1d(arr, n, axis):
        # arr: float32, blur along `axis` of length n
        out = np.zeros_like(arr)
        moved = np.moveaxis(arr, axis, 0)
        res = np.moveaxis(out, axis, 0)
        for c in range(n):
            cc = center - c
            kmin = max(0, cc)
            base = c - center + kmin  # first source index
            kmax = min(window, n - base)
            ssum = ksum[kmax - 1] - (ksum[kmin - 1] if kmin else np.float32(0))
            acc = np.zeros(moved.shape[1:], np.float32)
            for k in range(kmin, kmax):
                acc += moved[base + (k - kmin)] * kern[k]
            res[c] = acc / ssum
        return out

    tmp = pass_1d(x, w, axis=1)
    out = pass_1d(tmp, h, axis=0)
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)
