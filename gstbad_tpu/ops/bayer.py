"""Bayer demosaic — vectorized rebuild of the ORC split/merge scheme
(gst/bayer/gstbayerorc.orc, gstbayer2rgb.c:355-447).

The reference splits each bayer row into even/odd phase planes with a
horizontal rounded-average upsample, then merges three row-pairs vertically
per output row.  Here both stages are batched jnp ops in uint16 (avgub =
(a+b+1)>>1, exact), including the reference's 8-line ring quirks: row 0's
"above" is row 1, and the last row's "below" is row H-4.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _avgub(a, b):
    return ((a.astype(jnp.uint16) + b.astype(jnp.uint16) + 1) >> 1
            ).astype(jnp.uint8)


def split_rows(raw: jnp.ndarray):
    """[B, H, W] bayer -> (d0, d1) phase planes, each [B, H, W]."""
    w = raw.shape[-1]
    left = jnp.concatenate([raw[..., :1], raw[..., :-1]], axis=-1)
    right = jnp.concatenate([raw[..., 1:], raw[..., -1:]], axis=-1)
    avg = _avgub(left, right)
    even = (jnp.arange(w) % 2) == 0
    d0 = jnp.where(even, raw, avg)
    d1 = jnp.where(even, avg, raw)
    # scalar edge overrides (gstbayer2rgb.c:360-379)
    d0 = d0.at[..., w - 1].set(raw[..., w - 2])
    d1 = d1.at[..., 0].set(raw[..., 1])
    d1 = d1.at[..., w - 2].set(raw[..., w - 3])
    return d0, d1


def neighbor_rows(h: int) -> tuple[np.ndarray, np.ndarray]:
    """Above/below row indices with the 8-line-ring behavior."""
    above = np.arange(h) - 1
    above[0] = 1
    below = np.arange(h) + 1
    below[h - 1] = h - 4
    return above, below


def demosaic(raw: jnp.ndarray, fmt: str, out_offsets) -> jnp.ndarray:
    """[B, H, W] bayer -> [B, H, W, 4] with (r, g, b, alpha) at
    `out_offsets` channel positions; alpha = 255.

    fmt in {bggr, gbrg, grbg, rggb}; H >= 4, W even.
    """
    b, h, w = raw.shape
    d0, d1 = split_rows(raw)
    above, below = neighbor_rows(h)
    d0a = jnp.take(d0, jnp.asarray(above), axis=1)
    d1a = jnp.take(d1, jnp.asarray(above), axis=1)
    d0b = jnp.take(d0, jnp.asarray(below), axis=1)
    d1b = jnp.take(d1, jnp.asarray(below), axis=1)

    swap_merge = fmt in ("grbg", "gbrg")
    swap_rb = fmt in ("rggb", "gbrg")
    row_is_bg = ((jnp.arange(h) % 2) == 0) != swap_merge  # [H]
    col_even = (jnp.arange(w) % 2) == 0  # [W]

    # bg rows: cur = (B, G) phases, neighbors GR
    bg_R = _avgub(d1a, d1b)
    bg_B = d0
    bg_Gblend = _avgub(_avgub(d0a, d0b), d1)
    bg_G = jnp.where(col_even, bg_Gblend, d1)
    # gr rows: cur = (G, R) phases, neighbors BG
    gr_B = _avgub(d0a, d0b)
    gr_R = d1
    gr_Gblend = _avgub(_avgub(d1a, d1b), d0)
    gr_G = jnp.where(col_even, d0, gr_Gblend)

    is_bg = row_is_bg[None, :, None]
    R = jnp.where(is_bg, bg_R, gr_R)
    G = jnp.where(is_bg, bg_G, gr_G)
    B = jnp.where(is_bg, bg_B, gr_B)
    if swap_rb:
        R, B = B, R

    r_off, g_off, b_off, a_off = out_offsets
    out = jnp.empty((b, h, w, 4), jnp.uint8)
    out = out.at[..., r_off].set(R)
    out = out.at[..., g_off].set(G)
    out = out.at[..., b_off].set(B)
    out = out.at[..., a_off].set(jnp.uint8(255))
    return out


def to_bayer(argb_like: jnp.ndarray, fmt: str, offsets) -> jnp.ndarray:
    """rgb2bayer decimation (gstrgb2bayer.c:236-262). argb_like [B,H,W,4]
    with (r, g, b) channel positions in `offsets`."""
    fmt_idx = {"bggr": 0, "gbrg": 1, "grbg": 2, "rggb": 3}[fmt]
    b, h, w = argb_like.shape[:3]
    i = jnp.arange(w, dtype=jnp.int32)[None, :]
    j = jnp.arange(h, dtype=jnp.int32)[:, None]
    pos = ((j & 1) << 1) | (i & 1)
    r_off, g_off, b_off = offsets[:3]
    out = argb_like[..., g_off]
    out = jnp.where(pos == fmt_idx, argb_like[..., b_off], out)
    out = jnp.where((pos ^ 3) == fmt_idx, argb_like[..., r_off], out)
    return out
