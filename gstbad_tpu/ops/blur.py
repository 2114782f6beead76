"""Separable gaussian blur with border-truncated normalization —
the TPU rebuild of gaussian_smooth (gst/gaudieffects/gstgaussblur.c:260-356).

The C code runs two float passes with per-position kernel windows clipped to
the frame and normalized by the partial kernel sum.  Zero-padded depthwise
convolution divided by the precomputed per-position partial sums reproduces
that exactly (padding contributes 0 to the numerator, and the denominator is
the same prefix-sum difference the C uses).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from gstbad_tpu.golden.gaudieffects import gaussian_kernel


def border_sums(n: int, kern: np.ndarray, ksum: np.ndarray) -> np.ndarray:
    """Per-position normalization sums (gstgaussblur.c:268-276,319-321)."""
    window = kern.shape[0]
    center = window // 2
    out = np.empty(n, np.float32)
    for c in range(n):
        kmin = max(0, center - c)
        base = c - center + kmin
        kmax = min(window, n - base)
        out[c] = ksum[kmax - 1] - (ksum[kmin - 1] if kmin else np.float32(0))
    return out


def make_blur_tables(sigma: float, height: int, width: int):
    """Host-side precompute: (kernel f32 [window], row_sums [H], col_sums [W])."""
    kern, ksum = gaussian_kernel(sigma)
    return kern, border_sums(height, kern, ksum), border_sums(width, kern, ksum)


def _shift_fma_1d(x: jnp.ndarray, kern: np.ndarray, axis: int) -> jnp.ndarray:
    """Zero-padded 1-D correlation along H or W as an unrolled
    roll-mask-FMA chain.

    This replaced a depthwise `conv_general_dilated`
    (feature_group_count=C): that conv is BOTH slower on TPU (the 1-wide
    channel groups defeat the MXU; 225 vs 330 fps at 1080p AYUV) and —
    measured on v5e — numerically WRONG there (up to 207/255 off vs the
    identical program on CPU, even at Precision.HIGHEST).  The unrolled
    FMA chain is exact to +-1 LSB of the CPU reference and fuses into one
    pass over the frame."""
    n = x.shape[axis]
    window = kern.shape[0]
    center = window // 2
    idx = np.arange(n)
    shape = [1, 1, 1, 1]
    shape[axis] = n
    acc = jnp.zeros_like(x)
    for k in range(window):
        off = k - center
        rolled = jnp.roll(x, -off, axis=axis)
        valid = jnp.asarray(((idx + off >= 0) & (idx + off < n))
                            .reshape(shape))
        acc = acc + np.float32(kern[k]) * jnp.where(valid, rolled, 0.0)
    return acc


def gaussian_blur(img: jnp.ndarray, kern: jnp.ndarray, row_sums: jnp.ndarray,
                  col_sums: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] uint8 -> uint8; matches the C two-pass order:
    x-blur (divide by col sums), y-blur (divide by row sums), +0.5, clamp,
    truncating uint8 cast."""
    kern_np = np.asarray(kern)
    x = img.astype(jnp.float32)
    tmp = _shift_fma_1d(x, kern_np, axis=2) / col_sums[None, None, :, None]
    out = _shift_fma_1d(tmp, kern_np, axis=1) / row_sums[None, :, None, None]
    return jnp.clip(out + 0.5, 0.0, 255.0).astype(jnp.uint8)
