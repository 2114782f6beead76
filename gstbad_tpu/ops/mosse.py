"""MOSSE correlation-filter tracking (Bolme et al., CVPR 2010) — the
engine behind the cvtracker element (ext/opencv/gstcvtracker.cpp).

The reference delegates to opencv_contrib tracker classes; this cv2
build ships none of the model-free ones (legacy MOSSE/KCF/MedianFlow are
gone, the remaining trackers need DNN model files), so the element runs
this deterministic from-paper MOSSE: log/normalize/Hanning-window patch
preprocessing, a correlation filter trained to a Gaussian response,
online numerator/denominator updates with learning rate 0.125, and PSR
(peak-to-sidelobe ratio) loss detection.  2D FFTs map straight onto
XLA's FFT (no random augmentation warps — deterministic by design,
documented divergence from the paper's init).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

LEARN_RATE = 0.125
EPS = 1e-5
SIGMA = 2.0          # gaussian response width (paper: 2.0)
PSR_THRESHOLD = 5.7  # below -> lost (paper: 3-10 band, 5.7 typical)


def _hann(h: int, w: int) -> np.ndarray:
    wy = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(h) / (h - 1))
    wx = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(w) / (w - 1))
    return (wy[:, None] * wx[None, :]).astype(np.float32)


def _gauss_response(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    g = np.exp(-((yy - h // 2) ** 2 + (xx - w // 2) ** 2)
               / (2 * SIGMA ** 2)).astype(np.float32)
    return np.fft.fftshift(g)    # peak at (0, 0)


def preprocess(patch: jnp.ndarray, hann: jnp.ndarray) -> jnp.ndarray:
    """log -> zero-mean/unit-norm -> cosine window (paper sec. 3.1)."""
    p = jnp.log(patch.astype(jnp.float32) + 1.0)
    p = p - jnp.mean(p)
    p = p / (jnp.sqrt(jnp.mean(p * p)) + EPS)
    return p * hann


def extract_patch(gray: jnp.ndarray, cy, cx, h: int, w: int
                  ) -> jnp.ndarray:
    """Dynamic [h, w] crop centered at (cy, cx), edge-clamped."""
    H, W = gray.shape
    y0 = jnp.clip(jnp.round(cy).astype(jnp.int32) - h // 2, 0, H - h)
    x0 = jnp.clip(jnp.round(cx).astype(jnp.int32) - w // 2, 0, W - w)
    return jax.lax.dynamic_slice(gray, (y0, x0), (h, w))


def init_state(gray: jnp.ndarray, box: Tuple[int, int, int, int]
               ) -> Dict[str, jnp.ndarray]:
    """tracker->init: train the filter on the initial box."""
    x, y, w, h = box
    hann = jnp.asarray(_hann(h, w))
    g_hat = jnp.fft.fft2(jnp.asarray(_gauss_response(h, w)))
    cy = jnp.float32(y + h / 2)
    cx = jnp.float32(x + w / 2)
    patch = extract_patch(gray, cy, cx, h, w)
    # deterministic augmentation: the paper trains on 8 random affine
    # warps; here 9 integer shifts (+-2 px grid) regularize the filter
    # without RNG (documented)
    a = jnp.zeros((h, w), jnp.complex64)
    b = jnp.full((h, w), EPS, jnp.complex64)
    for dy in (-2, 0, 2):
        for dx in (-2, 0, 2):
            f = preprocess(jnp.roll(patch, (dy, dx), axis=(0, 1)), hann)
            f_hat = jnp.fft.fft2(f)
            g_shift = g_hat * jnp.exp(
                -2j * jnp.pi * (dy * jnp.fft.fftfreq(h)[:, None]
                                + dx * jnp.fft.fftfreq(w)[None, :]))
            a = a + g_shift * jnp.conj(f_hat)
            b = b + f_hat * jnp.conj(f_hat)
    return {
        "a": a.astype(jnp.complex64), "b": b.astype(jnp.complex64),
        "cy": cy, "cx": cx,
        "ok": jnp.bool_(True),
    }


def update(state: Dict[str, jnp.ndarray], gray: jnp.ndarray,
           h: int, w: int):
    """tracker->update: locate the peak, move the box, retrain.
    Returns (state, ok, cy, cx)."""
    hann = jnp.asarray(_hann(h, w))
    g_hat = jnp.fft.fft2(jnp.asarray(_gauss_response(h, w)))
    f = preprocess(extract_patch(gray, state["cy"], state["cx"], h, w),
                   hann)
    f_hat = jnp.fft.fft2(f)
    filt = state["a"] / state["b"]     # = H* (paper eq. 5)
    resp = jnp.real(jnp.fft.ifft2(filt * f_hat)).astype(jnp.float32)
    peak = jnp.max(resp)
    idx = jnp.argmax(resp)
    py = (idx // w).astype(jnp.int32)
    px = (idx % w).astype(jnp.int32)
    # wrap displacements to [-dim/2, dim/2)
    dy = jnp.where(py > h // 2, py - h, py).astype(jnp.float32)
    dx = jnp.where(px > w // 2, px - w, px).astype(jnp.float32)
    # PSR over the sidelobe (exclude an 11x11 peak window)
    yy = (jnp.arange(h, dtype=jnp.int32)[:, None] - py + h) % h
    xx = (jnp.arange(w, dtype=jnp.int32)[None, :] - px + w) % w
    near = (jnp.minimum(yy, h - yy) <= 5) & (jnp.minimum(xx, w - xx) <= 5)
    side = jnp.where(near, jnp.nan, resp)
    mu = jnp.nanmean(side)
    sd = jnp.nanstd(side)
    psr = (peak - mu) / (sd + EPS)
    # a lost frame freezes the box and skips retraining but keeps
    # trying (the element calls update() every frame either way)
    ok = psr > PSR_THRESHOLD

    H, W = gray.shape
    cy = jnp.clip(state["cy"] + dy, h / 2, H - h / 2)
    cx = jnp.clip(state["cx"] + dx, w / 2, W - w / 2)
    cy = jnp.where(ok, cy, state["cy"])
    cx = jnp.where(ok, cx, state["cx"])

    # retrain at the new position
    f2 = preprocess(extract_patch(gray, cy, cx, h, w), hann)
    f2_hat = jnp.fft.fft2(f2)
    a2 = (LEARN_RATE * g_hat * jnp.conj(f2_hat)
          + (1 - LEARN_RATE) * state["a"])
    b2 = (LEARN_RATE * (f2_hat * jnp.conj(f2_hat) + EPS)
          + (1 - LEARN_RATE) * state["b"])
    a2 = jnp.where(ok, a2, state["a"])
    b2 = jnp.where(ok, b2, state["b"])
    return ({"a": a2, "b": b2, "cy": cy, "cx": cx, "ok": ok},
            ok, cy, cx)
