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
    truncating uint8 cast.

    Layout: the channel axis folds into the minor dimension ([B, H, W*C])
    so vector lanes see W*C contiguous floats instead of a C=4-lane
    channel-minor tail; an x-shift of `off` pixels is a roll of C*off
    lanes.  The arithmetic sequence per element is IDENTICAL to the
    unfolded form (same rolls, masks and FMA order), so results are
    bit-identical — only the vreg occupancy changes (4/128 -> full)."""
    kern_np = np.asarray(kern)
    b, h, w, c = img.shape
    window = kern_np.shape[0]
    center = window // 2
    x = img.astype(jnp.float32).reshape(b, h, w * c)
    # pad + static slices instead of rolls: the zero padding IS the
    # border mask (out-of-range taps contribute exactly 0.0), and XLA
    # fuses slice-of-pad into the FMA chain where the roll form
    # materialized one full-window buffer per tap (OOM at w32 1080p)
    xp = jnp.pad(x, ((0, 0), (0, 0), (center * c, center * c)))
    acc = jnp.zeros_like(x)
    for k in range(window):
        acc = acc + np.float32(kern_np[k]) \
            * lax.slice_in_dim(xp, k * c, k * c + w * c, axis=2)
    tmp = acc / jnp.asarray(np.repeat(np.asarray(col_sums), c)
                            )[None, None, :]
    tp = jnp.pad(tmp, ((0, 0), (center, center), (0, 0)))
    acc2 = jnp.zeros_like(tmp)
    for k in range(window):
        acc2 = acc2 + np.float32(kern_np[k]) \
            * lax.slice_in_dim(tp, k, k + h, axis=1)
    out = acc2 / row_sums[None, :, None]
    return jnp.clip(out + 0.5, 0.0, 255.0).astype(jnp.uint8
                                                  ).reshape(b, h, w, c)
