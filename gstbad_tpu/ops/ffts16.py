"""Device-side gst_fft_s16 model (see golden/ffts16.py for the spec and
the documented divergence story: scale-faithful kissfft FIXED_POINT=16
aggregate scaling, per-butterfly rounding noise not modeled).

The FFT itself rides XLA's native FFT (MXU-friendly batched transform)
with the fixed-point scale applied afterwards — the TPU-first shape for
this op: one fused rfft over the whole window instead of the
reference's per-frame scalar butterfly walk."""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from gstbad_tpu.golden.ffts16 import fft_scale, kf_factor  # noqa: F401


@lru_cache(maxsize=None)
def _hamming_f64(n: int):
    return np.asarray(0.54 - 0.46 * np.cos(2 * np.pi * np.arange(n) / n))


def window_hamming(s16: jnp.ndarray) -> jnp.ndarray:
    """Batched gst_fft_s16_window HAMMING: [..., N] i16-valued ->
    windowed i16 values (C (gint16) truncation)."""
    w = jnp.asarray(_hamming_f64(s16.shape[-1]))
    return jnp.trunc(s16.astype(jnp.float64) * w).astype(jnp.int32)


def fft_s16(s16: jnp.ndarray):
    """Batched [..., nfft] int-valued -> (real, imag) int32 pairs
    [..., nfft/2+1] on the gst_fft_s16 fixed-point scale."""
    nfft = s16.shape[-1]
    x = jnp.fft.rfft(s16.astype(jnp.float64), axis=-1)
    sc = fft_scale(nfft)
    r = jnp.floor(x.real * sc + 0.5).astype(jnp.int32)
    i = jnp.floor(x.imag * sc + 0.5).astype(jnp.int32)
    return r, i
