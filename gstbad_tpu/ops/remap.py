"""Warp engine — the geometrictransform base rebuilt as a batched gather.

The reference precomputes a double[w*h*2] inverse map once per caps change
(gstgeometrictransform.c:80-128) and walks it per pixel with memcpy
(:167-207).  Here the map is fixed to int32 source indices + a validity mask
on the host (same double-precision math, golden.geometric), and the per-frame
work is ONE flat gather per window — which XLA vectorizes across the batch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from gstbad_tpu.golden.geometric import mod_float


def fix_map(mp: np.ndarray, width: int, height: int, off_edge: str
            ) -> Tuple[np.ndarray, np.ndarray]:
    """Apply the off-edge policy + truncation sampling on the host.

    Returns (flat_idx int32 [H*W], valid bool [H*W]); invalid entries index 0.
    Mirrors gst_geometric_transform_do_map (gstgeometrictransform.c:167-207).
    """
    in_x = mp[..., 0].astype(np.float64).copy()
    in_y = mp[..., 1].astype(np.float64).copy()
    if off_edge == "clamp":
        in_x = np.clip(in_x, 0, width - 1)
        in_y = np.clip(in_y, 0, height - 1)
    elif off_edge == "wrap":
        in_x = mod_float(in_x, width)
        in_y = mod_float(in_y, height)
        in_x = np.where(in_x < 0, in_x + width, in_x)
        in_y = np.where(in_y < 0, in_y + height, in_y)
    tx = np.trunc(in_x).astype(np.int64)
    ty = np.trunc(in_y).astype(np.int64)
    valid = (tx >= 0) & (tx < width) & (ty >= 0) & (ty < height)
    flat = np.where(valid, ty * width + tx, 0).astype(np.int32)
    return flat.reshape(-1), valid.reshape(-1)


def remap(img: jnp.ndarray, flat_idx: jnp.ndarray, valid: jnp.ndarray,
          background: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] x flat map -> [B, H, W, C]; one gather per window."""
    b, h, w, c = img.shape
    flat_img = img.reshape(b, h * w, c)
    out = jnp.take(flat_img, flat_idx, axis=1)
    out = jnp.where(valid[None, :, None], out,
                    background[None, None, :].astype(img.dtype))
    return out.reshape(b, h, w, c)
