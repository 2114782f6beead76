"""On-device SSIM — the gstcompare.c:355-470 oracle as integral-image sums.

Reproduces the reference exactly: 16x16 windows stepped by 8 while
`pos + 8 < size`, integer moment sums, and the C's integer mean/variance
division before the double SSIM formula.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

C1 = (0.01 * 255.0) ** 2
C2 = (0.03 * 255.0) ** 2
WIN = 16


def _window_grid(h: int, w: int):
    js = list(range(0, max(h - WIN // 2 - 1, 0) + 1, WIN // 2))
    js = [j for j in range(0, h, WIN // 2) if j + WIN // 2 < h]
    is_ = [i for i in range(0, w, WIN // 2) if i + WIN // 2 < w]
    return js, is_


def ssim_plane(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W] uint8 pair -> [...] float64 component SSIM."""
    h, w = a.shape[-2], a.shape[-1]
    js, is_ = _window_grid(h, w)
    if not js or not is_:
        return jnp.ones(a.shape[:-2], jnp.float64)

    ai = a.astype(jnp.int64)
    bi = b.astype(jnp.int64)

    def integral(x):
        c = jnp.cumsum(jnp.cumsum(x, axis=-2), axis=-1)
        return jnp.pad(c, [(0, 0)] * (x.ndim - 2) + [(1, 0), (1, 0)])

    I1 = integral(ai)
    I2 = integral(bi)
    I11 = integral(ai * ai)
    I22 = integral(bi * bi)
    I12 = integral(ai * bi)

    # window corners (clipped sizes at the right/bottom edges)
    j0 = np.array([j for j in js for _ in is_])
    i0 = np.array([i for _ in js for i in is_])
    j1 = np.minimum(j0 + WIN, h)
    i1 = np.minimum(i0 + WIN, w)
    count = ((j1 - j0) * (i1 - i0)).astype(np.int64)

    def rect(I):
        return (I[..., j1, i1] - I[..., j0, i1]
                - I[..., j1, i0] + I[..., j0, i0])

    cnt = jnp.asarray(count)
    avg1 = rect(I1) // cnt
    avg2 = rect(I2) // cnt
    var1 = rect(I11) // cnt - avg1 * avg1
    var2 = rect(I22) // cnt - avg2 * avg2
    cov = rect(I12) // cnt - avg1 * avg2

    a1 = avg1.astype(jnp.float64)
    a2 = avg2.astype(jnp.float64)
    ssim = ((2 * a1 * a2 + C1) * (2 * cov.astype(jnp.float64) + C2)
            / ((a1 * a1 + a2 * a2 + C1)
               * ((var1 + var2).astype(jnp.float64) + C2)))
    return jnp.mean(ssim, axis=-1)


def ssim_weights(n_comps: int, is_yuv: bool):
    """Component weights (gstcompare.c:437-445)."""
    w = [1.0] * n_comps
    if is_yuv and n_comps > 1:
        w[0] = n_comps - 1
        norm = 2.0 * (n_comps - 1)
    else:
        norm = float(n_comps)
    return [x / norm for x in w]


def dssim_plane(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """DSSIM = (1 - ssim) / 2 — the iqa scoring convention
    (ext/iqa/iqa.c wraps pornel/dssim; same scale)."""
    return (1.0 - ssim_plane(a, b)) / 2.0


def ssim_map(a: jnp.ndarray, b: jnp.ndarray, win: int = 8) -> jnp.ndarray:
    """Per-pixel-block SSIM map in uint8 (iqa writes the SSIM map into the
    output frame, ext/iqa/iqa.c:240-263).  Non-overlapping win x win blocks
    upsampled back to frame size."""
    h, w = a.shape[-2], a.shape[-1]
    hb, wb = h // win, w // win
    av = a[..., :hb * win, :wb * win].reshape(
        a.shape[:-2] + (hb, win, wb, win)).astype(jnp.float64)
    bv = b[..., :hb * win, :wb * win].reshape(
        b.shape[:-2] + (hb, win, wb, win)).astype(jnp.float64)
    m1 = av.mean(axis=(-3, -1))
    m2 = bv.mean(axis=(-3, -1))
    v1 = (av * av).mean(axis=(-3, -1)) - m1 * m1
    v2 = (bv * bv).mean(axis=(-3, -1)) - m2 * m2
    cv = (av * bv).mean(axis=(-3, -1)) - m1 * m2
    s = ((2 * m1 * m2 + C1) * (2 * cv + C2)
         / ((m1 * m1 + m2 * m2 + C1) * (v1 + v2 + C2)))
    s8 = jnp.clip(s * 255.0, 0, 255).astype(jnp.uint8)
    up = jnp.repeat(jnp.repeat(s8, win, axis=-2), win, axis=-1)
    out = jnp.zeros_like(a)
    out = out.at[..., :hb * win, :wb * win].set(up)
    return out
