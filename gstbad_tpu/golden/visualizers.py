"""Numpy transcriptions of the audiovisualizers' render loops — the spec.

Sources: gst/audiovisualizers/gstdrawhelpers.h (draw_dot/draw_dot_c/
draw_dot_aa/draw_line_aa), gstwavescope.c:214-405 (render_dots/lines/
color_dots/color_lines + the 2-stage resonant `filter` macro),
gstspacescope.c:213-380 (same four styles on the stereo X-Y plane).

C type semantics preserved: gfloat (f32) step interpolation, gdouble (f64)
filter state, (guint)/(gint) truncation casts.  draw_line_aa's x+1/y+1
taps can land one pixel past the row/frame (flat-index wraparound in the
C); the canvas carries a one-row guard band that is cropped afterwards,
matching the reference's in-stride behavior for interior rows and
dropping the final-row overflow the C writes past the frame.

The wavescope (guint) cast of a negative filtered y is UB in C; on the
reference targets (x86-64 cvttsd2si) it wraps to a huge value that
MIN(y, h-2) then pins to h-2 — transcribed as `h-2 when negative`.
"""

from __future__ import annotations

import numpy as np

CUTOFF_1 = 0.15
CUTOFF_2 = 0.45
RESONANCE = 1.0 / 0.5

WHITE = 0x00FFFFFF
RED = 0x00FF0000
GREEN = 0x0000FF00
BLUE = 0x000000FF


def canvas(w: int, h: int) -> np.ndarray:
    """Flat u32 canvas with a one-row+2 guard band (see module doc)."""
    return np.zeros(h * w + w + 2, np.uint32)


def crop(vd: np.ndarray, w: int, h: int) -> np.ndarray:
    return vd[:h * w].reshape(h, w).copy()


def draw_dot(vd, x, y, st, c):
    vd[int(y) * st + int(x)] = c


def draw_dot_c(vd, x, y, st, c):
    vd[int(y) * st + int(x)] |= np.uint32(c)


def draw_dot_aa(vd, x, y, st, c, f):
    idx = int(y) * st + int(x)
    oc = int(vd[idx])
    f = np.float32(f)
    c3 = min(int(np.float32(oc & 0xFF) + np.float32(c & 0xFF) * f), 255)
    c2 = min(int(np.float32((oc >> 8) & 0xFF)
                 + np.float32((c >> 8) & 0xFF) * f), 255)
    c1 = min(int(np.float32((oc >> 16) & 0xFF)
                 + np.float32((c >> 16) & 0xFF) * f), 255)
    vd[idx] = (c1 << 16) | (c2 << 8) | c3


def draw_line_aa(vd, x1, x2, y1, y2, st, c):
    dx, dy = int(x2) - int(x1), int(y2) - int(y1)
    j = max(abs(dx), abs(dy))
    for i in range(j):
        f = np.float32(i) / np.float32(j)
        rx = np.float32(x1) + np.float32(dx) * f
        ry = np.float32(y1) + np.float32(dy) * f
        x, y = int(rx), int(ry)
        fx = np.float32(rx - np.float32(x))
        fy = np.float32(ry - np.float32(y))
        draw_dot_aa(vd, x, y, st, c, ((1.0 - fx) + (1.0 - fy)) / 2.0)
        draw_dot_aa(vd, x + 1, y, st, c, (fx + (1.0 - fy)) / 2.0)
        draw_dot_aa(vd, x, y + 1, st, c, ((1.0 - fx) + fy) / 2.0)
        draw_dot_aa(vd, x + 1, y + 1, st, c, (fx + fy) / 2.0)


def _wave_filter(flt, inp):
    """gstwavescope.c:302-310 `filter` macro (flt: 6 gdoubles)."""
    flt[2] = inp - (flt[1] * RESONANCE) - flt[0]
    flt[1] += flt[2] * CUTOFF_1
    flt[0] += flt[1] * CUTOFF_1
    flt[5] = (flt[1] + flt[2]) - (flt[4] * RESONANCE) - flt[3]
    flt[4] += flt[5] * CUTOFF_2
    flt[3] += flt[4] * CUTOFF_2


def _wave_y(val, oy, dy, h1):
    """(guint)(oy + flt*dy) then MIN(y, h1), negative -> h1 (see doc)."""
    v = float(oy) + float(val) * float(dy)
    iv = int(v)
    return h1 if iv < 0 else min(iv, h1)


def wavescope_render(vd, adata: np.ndarray, channels: int, w: int, h: int,
                     style: str, flt: np.ndarray) -> None:
    """adata: interleaved int16 [S*C]; flt: f64 [6*C] carried state."""
    num = len(adata) // channels
    if style == "dots":
        dx = np.float32(w) / np.float32(num)
        dy = np.float32(h / 65536.0)
        oy = h // 2
        for c in range(channels):
            s = c
            for i in range(num):
                x = int(np.float32(i) * dx)
                y = int(np.float32(oy) + np.float32(adata[s]) * dy)
                s += channels
                draw_dot(vd, x, y, w, WHITE)
    elif style == "lines":
        dx = np.float32(w - 1) / np.float32(num)
        dy = np.float32((h - 1) / 65536.0)
        oy = (h - 1) // 2
        for c in range(channels):
            s = c
            x2 = 0
            y2 = int(np.float32(oy) + np.float32(adata[s]) * dy)
            for i in range(1, num):
                x = int(np.float32(i) * dx)
                y = int(np.float32(oy) + np.float32(adata[s]) * dy)
                s += channels
                draw_line_aa(vd, x2, x, y2, y, w, WHITE)
                x2, y2 = x, y
    elif style == "color-dots":
        dx = np.float32(w) / np.float32(num)
        dy = np.float32(h / 65536.0)
        oy = h // 2
        h1 = h - 2
        for c in range(channels):
            f = flt[6 * c:6 * c + 6]
            s = c
            for i in range(num):
                x = int(np.float32(i) * dx)
                _wave_filter(f, np.float32(adata[s]))
                draw_dot_c(vd, x, _wave_y(f[0], oy, dy, h1), w, RED)
                draw_dot_c(vd, x, _wave_y(f[3], oy, dy, h1), w, GREEN)
                draw_dot_c(vd, x, _wave_y(f[4] + f[5], oy, dy, h1), w, BLUE)
                s += channels
    elif style == "color-lines":
        dx = np.float32(w - 1) / np.float32(num)
        dy = np.float32((h - 1) / 65536.0)
        oy = (h - 1) // 2
        h1 = h - 2
        for c in range(channels):
            f = flt[6 * c:6 * c + 6]
            s = c
            x2 = 0
            _wave_filter(f, np.float32(adata[s]))
            y2 = _wave_y(f[0], oy, dy, h1)
            y3 = _wave_y(f[3], oy, dy, h1)
            y4 = _wave_y(f[4] + f[5], oy, dy, h1)
            for i in range(1, num):
                x = int(np.float32(i) * dx)
                _wave_filter(f, np.float32(adata[s]))
                y = _wave_y(f[0], oy, dy, h1)
                draw_line_aa(vd, x2, x, y2, y, w, RED)
                y2 = y
                y = _wave_y(f[3], oy, dy, h1)
                draw_line_aa(vd, x2, x, y3, y, w, GREEN)
                y3 = y
                y = _wave_y(f[4] + f[5], oy, dy, h1)
                draw_line_aa(vd, x2, x, y4, y, w, BLUE)
                y4 = y
                x2 = x
                s += channels
    else:
        raise ValueError(f"unknown wavescope style {style!r}")


def _space_filter(st, il, ir):
    """gstspacescope.c:263-283 `filter` (st: 12 gdoubles:
    f1l_l,m,h, f2l_l,m,h, f1r_l,m,h, f2r_l,m,h)."""
    st[2] = il - (st[1] * RESONANCE) - st[0]
    st[1] += st[2] * CUTOFF_1
    st[0] += st[1] * CUTOFF_1
    st[5] = (st[1] + st[2]) - (st[4] * RESONANCE) - st[3]
    st[4] += st[5] * CUTOFF_2
    st[3] += st[4] * CUTOFF_2
    st[8] = ir - (st[7] * RESONANCE) - st[6]
    st[7] += st[8] * CUTOFF_1
    st[6] += st[7] * CUTOFF_1
    st[11] = (st[7] + st[8]) - (st[10] * RESONANCE) - st[9]
    st[10] += st[11] * CUTOFF_2
    st[9] += st[10] * CUTOFF_2


def spacescope_render(vd, adata: np.ndarray, w: int, h: int, style: str,
                      flt: np.ndarray) -> None:
    """adata: interleaved stereo int16 [S*2]; flt: f64 [12] carried."""
    num = len(adata) // 2
    if style == "dots":
        dx = np.float32(w / 65536.0)
        dy = np.float32(h / 65536.0)
        ox, oy = w // 2, h // 2
        s = 0
        for i in range(num):
            x = int(np.float32(ox) + np.float32(adata[s]) * dx)
            y = int(np.float32(oy) + np.float32(adata[s + 1]) * dy)
            s += 2
            draw_dot(vd, x, y, w, WHITE)
    elif style == "lines":
        dx = np.float32((w - 1) / 65536.0)
        dy = np.float32((h - 1) / 65536.0)
        ox, oy = (w - 1) // 2, (h - 1) // 2
        s = 0
        x2 = int(np.float32(ox) + np.float32(adata[s]) * dx)
        y2 = int(np.float32(oy) + np.float32(adata[s + 1]) * dy)
        s += 2
        for i in range(1, num):
            x = int(np.float32(ox) + np.float32(adata[s]) * dx)
            y = int(np.float32(oy) + np.float32(adata[s + 1]) * dy)
            s += 2
            draw_line_aa(vd, x2, x, y2, y, w, WHITE)
            x2, y2 = x, y
    elif style == "color-dots":
        dx = np.float32(w / 65536.0)
        dy = np.float32(h / 65536.0)
        ox, oy = w // 2, h // 2
        w1, h1 = w - 2, h - 2
        s = 0
        for i in range(num):
            il = float(adata[s])
            ir = float(adata[s + 1])
            s += 2
            _space_filter(flt, il, ir)
            x = min(max(int(float(ox) + flt[0] * dx), 0), w1)
            y = min(max(int(float(oy) + flt[6] * dy), 0), h1)
            draw_dot_c(vd, x, y, w, RED)
            x = min(max(int(float(ox) + flt[3] * dx), 0), w1)
            y = min(max(int(float(oy) + flt[9] * dy), 0), h1)
            draw_dot_c(vd, x, y, w, GREEN)
            x = min(max(int(float(ox) + (flt[4] + flt[5]) * dx), 0), w1)
            y = min(max(int(float(oy) + (flt[10] + flt[11]) * dy), 0), h1)
            draw_dot_c(vd, x, y, w, BLUE)
    elif style == "color-lines":
        dx = np.float32(w / 65536.0)
        dy = np.float32(h / 65536.0)
        ox, oy = w // 2, h // 2
        w1, h1 = w - 2, h - 2
        s = 0

        def pt(a, b):
            return (min(max(int(float(ox) + a * dx), 0), w1),
                    min(max(int(float(oy) + b * dy), 0), h1))

        il, ir = float(adata[0]), float(adata[1])
        s = 2
        _space_filter(flt, il, ir)
        x2, y2 = pt(flt[0], flt[6])
        x3, y3 = pt(flt[3], flt[9])
        x4, y4 = pt(flt[4] + flt[5], flt[10] + flt[11])
        for i in range(1, num):
            il, ir = float(adata[s]), float(adata[s + 1])
            s += 2
            _space_filter(flt, il, ir)
            x, y = pt(flt[0], flt[6])
            draw_line_aa(vd, x2, x, y2, y, w, RED)
            x2, y2 = x, y
            x, y = pt(flt[3], flt[9])
            draw_line_aa(vd, x3, x, y3, y, w, GREEN)
            x3, y3 = x, y
            x, y = pt(flt[4] + flt[5], flt[10] + flt[11])
            draw_line_aa(vd, x4, x, y4, y, w, BLUE)
            x4, y4 = x, y
    else:
        raise ValueError(f"unknown spacescope style {style!r}")


def shader_fade(img: np.ndarray, amount: int) -> np.ndarray:
    """pbutils gstaudiovisualizer shader_fade: per-byte saturating
    subtract of the packed shade bytes (B,G,R,x from the u32 amount)."""
    sub = np.array([(amount >> (8 * i)) & 0xFF for i in range(4)], np.uint8)
    x = img.astype(np.int16) - sub[None, None, :].astype(np.int16)
    return np.maximum(x, 0).astype(np.uint8)
