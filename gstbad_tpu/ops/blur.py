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


def _depthwise_1d(x: jnp.ndarray, kern: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Zero-padded depthwise 1-D convolution of NHWC f32 along H or W."""
    c = x.shape[-1]
    window = kern.shape[0]
    if axis == 2:  # along W
        k = jnp.tile(kern.reshape(1, window, 1, 1), (1, 1, 1, c))
        pad = ((0, 0), (window // 2, window // 2))
    else:  # along H
        k = jnp.tile(kern.reshape(window, 1, 1, 1), (1, 1, 1, c))
        pad = ((window // 2, window // 2), (0, 0))
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        # HIGHEST keeps full f32 accuracy on the TPU MXU (default would
        # truncate the taps to bf16 and miss the <=1e-3 fidelity gate)
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def gaussian_blur(img: jnp.ndarray, kern: jnp.ndarray, row_sums: jnp.ndarray,
                  col_sums: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] uint8 -> uint8; matches the C two-pass order:
    x-blur (divide by col sums), y-blur (divide by row sums), +0.5, clamp,
    truncating uint8 cast."""
    x = img.astype(jnp.float32)
    tmp = _depthwise_1d(x, kern, axis=2) / col_sums[None, None, :, None]
    out = _depthwise_1d(tmp, kern, axis=1) / row_sums[None, :, None, None]
    return jnp.clip(out + 0.5, 0.0, 255.0).astype(jnp.uint8)
