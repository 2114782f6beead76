"""audiovisualizers (gst/audiovisualizers/) — spectrascope, wavescope,
spacescope, synaescope: audio blocks -> rendered video frames.

The reference renders with per-pixel C loops into xRGB; here each scope
builds its image with batched jnp ops (the FFT runs on device).  Geometry
matches the reference (default 320x240 in BGRx); the exact pixel patterns of
the fade/connect styles are simplified where noted.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from gstbad_tpu.core.element import Element, Property
from gstbad_tpu.core.frame import FrameBatch
from gstbad_tpu.core.registry import register
from gstbad_tpu.core.spec import AudioFormat, MediaSpec, require
from fractions import Fraction


class _Scope(Element):
    """Base: audio [B, S, C] -> video [B, H, W, 4] BGRx."""

    PROPERTIES = (
        Property("width", int, 320, 16, 4096, static=True),
        Property("height", int, 240, 16, 4096, static=True),
    )

    def negotiate(self, in_spec: MediaSpec) -> MediaSpec:
        require(in_spec.kind == "audio", f"{self.NAME}: needs audio")
        require(in_spec.format in (AudioFormat.S16, AudioFormat.F32),
                f"{self.NAME}: needs S16/F32")
        self._audio_spec = in_spec
        return MediaSpec(kind="video", format="BGRx",
                         width=self.props["width"],
                         height=self.props["height"],
                         framerate=Fraction(25, 1))

    def _norm(self, x):
        if self._audio_spec.format == AudioFormat.S16:
            return x.astype(jnp.float32) / 32768.0
        return x.astype(jnp.float32)


@register
class SpectraScope(_Scope):
    """spectrascope: FFT magnitude bars."""

    NAME = "spectrascope"

    def process(self, params, state, batch: FrameBatch):
        w, h = self.props["width"], self.props["height"]
        x = self._norm(batch.data).mean(axis=-1)  # mono mix [B, S]
        spec = jnp.abs(jnp.fft.rfft(x, axis=-1))  # [B, S//2+1]
        nbins = spec.shape[-1] - 1
        # bucket bins into w columns
        cols = (jnp.arange(w) * nbins) // w
        mag = spec[:, cols + 1]
        bar = jnp.clip(jnp.log1p(mag) * (h / 6.0), 0, h - 1).astype(jnp.int32)
        rows = jnp.arange(h, dtype=jnp.int32)[None, :, None]  # [1, H, 1]
        lit = rows >= (h - bar[:, None, :])  # [B, H, W]
        img = jnp.zeros((x.shape[0], h, w, 4), jnp.uint8)
        img = img.at[..., 1].set(jnp.where(lit, 255, 0).astype(jnp.uint8))
        img = img.at[..., 2].set(jnp.where(lit, 64, 0).astype(jnp.uint8))
        return state, batch.with_data(img)


@register
class WaveScope(_Scope):
    """wavescope: waveform oscilloscope (nearest-row plot per column)."""

    NAME = "wavescope"

    def process(self, params, state, batch: FrameBatch):
        w, h = self.props["width"], self.props["height"]
        x = self._norm(batch.data).mean(axis=-1)  # [B, S]
        s = x.shape[-1]
        cols = (jnp.arange(w) * s) // w
        v = x[:, cols]  # [B, W]
        row = jnp.clip(((1.0 - v) * 0.5 * (h - 1)), 0, h - 1).astype(jnp.int32)
        rows = jnp.arange(h, dtype=jnp.int32)[None, :, None]
        lit = rows == row[:, None, :]
        img = jnp.zeros((x.shape[0], h, w, 4), jnp.uint8)
        img = img.at[..., 1].set(jnp.where(lit, 255, 0).astype(jnp.uint8))
        img = img.at[..., 0].set(jnp.where(lit, 128, 0).astype(jnp.uint8))
        return state, batch.with_data(img)


@register
class SpaceScope(_Scope):
    """spacescope: stereo X-Y scope (left -> x, right -> y)."""

    NAME = "spacescope"

    def negotiate(self, in_spec: MediaSpec) -> MediaSpec:
        require(in_spec.channels == 2, "spacescope: needs stereo")
        return super().negotiate(in_spec)

    def process(self, params, state, batch: FrameBatch):
        w, h = self.props["width"], self.props["height"]
        x = self._norm(batch.data)  # [B, S, 2]
        px = jnp.clip((x[..., 0] + 1.0) * 0.5 * (w - 1), 0, w - 1
                      ).astype(jnp.int32)
        py = jnp.clip((1.0 - x[..., 1]) * 0.5 * (h - 1), 0, h - 1
                      ).astype(jnp.int32)
        img = jnp.zeros((x.shape[0], h, w, 4), jnp.uint8)
        b_idx = jnp.arange(x.shape[0], dtype=jnp.int32)[:, None]
        b_idx = jnp.broadcast_to(b_idx, px.shape)
        img = img.at[b_idx, py, px, 1].set(255)
        return state, batch.with_data(img)


@register
class SynaeScope(_Scope):
    """synaescope: stereo phase/frequency colormap (simplified render:
    FFT magnitude colored by inter-channel balance)."""

    NAME = "synaescope"

    def negotiate(self, in_spec: MediaSpec) -> MediaSpec:
        require(in_spec.channels == 2, "synaescope: needs stereo")
        return super().negotiate(in_spec)

    def process(self, params, state, batch: FrameBatch):
        w, h = self.props["width"], self.props["height"]
        x = self._norm(batch.data)  # [B, S, 2]
        fl = jnp.abs(jnp.fft.rfft(x[..., 0], axis=-1))
        fr = jnp.abs(jnp.fft.rfft(x[..., 1], axis=-1))
        nbins = fl.shape[-1] - 1
        cols = (jnp.arange(w) * nbins) // w
        ml = fl[:, cols + 1]
        mr = fr[:, cols + 1]
        mag = jnp.log1p(ml + mr)
        bal = (mr + 1e-9) / (ml + mr + 2e-9)  # 0 left .. 1 right
        bar = jnp.clip(mag * (h / 6.0), 0, h - 1).astype(jnp.int32)
        rows = jnp.arange(h, dtype=jnp.int32)[None, :, None]
        lit = rows >= (h - bar[:, None, :])
        img = jnp.zeros((x.shape[0], h, w, 4), jnp.uint8)
        red = (bal[:, None, :] * 255).astype(jnp.uint8)
        blue = ((1 - bal[:, None, :]) * 255).astype(jnp.uint8)
        img = img.at[..., 2].set(jnp.where(lit, red, 0))
        img = img.at[..., 0].set(jnp.where(lit, blue, 0))
        return state, batch.with_data(img)
