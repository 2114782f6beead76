"""Golden bayer2rgb / rgb2bayer (gst/bayer/gstbayer2rgb.c, gstrgb2bayer.c,
gstbayerorc.orc)."""

from __future__ import annotations

import numpy as np


def _avgub(a, b):
    """ORC avgub: rounded unsigned byte average (a + b + 1) >> 1."""
    return ((a.astype(np.uint16) + b.astype(np.uint16) + 1) >> 1).astype(np.uint8)


def split_and_upsample_row(src: np.ndarray):
    """gst_bayer2rgb_split_and_upsample_horiz (gstbayer2rgb.c:355-381).

    One bayer row [W] -> (dest0, dest1): dest0 carries the even-position
    component at full width (odd slots = rounded average of the two even
    neighbors), dest1 the odd-position component likewise.
    """
    n = src.shape[0]
    s = src.astype(np.uint16)
    d0 = np.empty(n, np.uint8)
    d1 = np.empty(n, np.uint8)
    # leading scalar pixels (lines 360-363)
    d0[0] = src[0]
    d1[0] = src[1]
    d0[1] = (int(s[0]) + int(s[2]) + 1) >> 1
    d1[1] = src[1]
    # ORC middle: even i in [2, n-2): d0[i]=src[i], d0[i+1]=avg(src[i],src[i+2]);
    # d1[i]=avg(src[i-1],src[i+1]), d1[i+1]=src[i+1]
    ev = np.arange(2, n - 2, 2)
    d0[ev] = src[ev]
    d0[ev + 1] = _avgub(src[ev], src[ev + 2])
    d1[ev] = _avgub(src[ev - 1], src[ev + 1])
    d1[ev + 1] = src[ev + 1]
    # trailing scalar pixels (lines 371-379)
    for i in range(n - 2, n):
        if i % 2 == 0:
            d0[i] = src[i]
            d1[i] = src[i - 1]
        else:
            d0[i] = src[i - 1]
            d1[i] = src[i]
    return d0, d1


def bayer2rgb(raw: np.ndarray, fmt: str, out_order: str = "RGBA") -> np.ndarray:
    """gst_bayer2rgb_process (gstbayer2rgb.c:385-447) -> [H, W, 4] uint8.

    Reproduces the 8-line ring quirks: row 0 uses row 1 as its "above"
    neighbor (the initial split primes LINE(6)/LINE(7) with row 1), and the
    last row's "below" neighbor is row H-4 (the ring wraps without a bottom
    clamp).  Requires H >= 4.

    fmt in {bggr, gbrg, grbg, rggb}; out_order is a permutation string of
    "RGBA" giving the output byte order ("BGRA", "ARGB", ...).
    """
    h, w = raw.shape
    assert h >= 4 and w >= 4 and w % 2 == 0
    d0 = np.empty((h, w), np.uint8)
    d1 = np.empty((h, w), np.uint8)
    for j in range(h):
        d0[j], d1[j] = split_and_upsample_row(raw[j])

    # neighbor row indices with the ring-buffer quirks
    above = np.arange(h) - 1
    above[0] = 1
    below = np.arange(h) + 1
    below[h - 1] = h - 4 if h >= 4 else 0

    # row parity semantics for the BGGR base arrangement:
    #  even rows (merge[0] = bg): current d0 = B-phase, d1 = G-phase
    #  odd rows  (merge[1] = gr): current d0 = G-phase, d1 = R-phase
    # GRBG/GBRG swap the merge order (gstbayer2rgb.c:421-425); RGGB/GBRG swap
    # the red/blue output offsets (gstbayer2rgb.c:400-404).
    swap_merge = fmt in ("grbg", "gbrg")
    swap_rb = fmt in ("rggb", "gbrg")

    R = np.empty((h, w), np.uint8)
    G = np.empty((h, w), np.uint8)
    B = np.empty((h, w), np.uint8)
    for j in range(h):
        is_bg = (j % 2 == 0) != swap_merge
        a, b = above[j], below[j]
        if is_bg:
            # current row: B at even cols, G at odd; neighbors are GR rows
            b1, g1 = d0[j], d1[j]
            g0, r0 = d0[a], d1[a]
            g2, r2 = d0[b], d1[b]
            r = _avgub(r0, r2)
            gblend = _avgub(_avgub(g0, g2), g1)
            g = np.where(np.arange(w) % 2 == 0, gblend, g1)
            bb = b1
        else:
            g1, r1 = d0[j], d1[j]
            b0, g0 = d0[a], d1[a]
            b2, g2 = d0[b], d1[b]
            bb = _avgub(b0, b2)
            gblend = _avgub(_avgub(g0, g2), g1)
            g = np.where(np.arange(w) % 2 == 0, g1, gblend)
            r = r1
        R[j], G[j], B[j] = r, g, bb
    if swap_rb:
        R, B = B, R
    comp = {"R": R, "G": G, "B": B,
            "A": np.full((h, w), 255, np.uint8),
            "x": np.full((h, w), 255, np.uint8)}
    return np.stack([comp[c] for c in out_order], axis=-1)


def rgb2bayer(argb: np.ndarray, fmt: str) -> np.ndarray:
    """gst_rgb2bayer_transform (gstrgb2bayer.c:236-262): ARGB [H,W,4] ->
    bayer [H,W] decimation.  Position code is_blue = ((j&1)<<1)|(i&1);
    format index bggr=0, gbrg=1, grbg=2, rggb=3 picks which position takes
    B (src byte 3), which takes R (byte 1), the rest take G (byte 2)."""
    fmt_idx = {"bggr": 0, "gbrg": 1, "grbg": 2, "rggb": 3}[fmt]
    h, w = argb.shape[:2]
    i = np.arange(w)[None, :]
    j = np.arange(h)[:, None]
    pos = ((j & 1) << 1) | (i & 1)
    out = argb[..., 2].copy()  # green by default
    out = np.where(pos == fmt_idx, argb[..., 3], out)
    out = np.where((pos ^ 3) == fmt_idx, argb[..., 1], out)
    return out.astype(np.uint8)
