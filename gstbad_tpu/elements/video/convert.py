"""videoconvert — format conversion (the gst-plugins-base videoconvert
dependency every reference launch line assumes).

Conversions use the same fixed-point 8-bit SDTV matrices the in-tree
coloreffects AYUV path uses (gstcoloreffects.c:286-301), so converted
pipelines stay consistent with the in-tree color math.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gstbad_tpu.core.element import Element, Property
from gstbad_tpu.core.frame import FrameBatch
from gstbad_tpu.core.registry import register
from gstbad_tpu.core.spec import MediaSpec, VideoFormat, require
from gstbad_tpu.ops.pointops import _apply_matrix, _RGB2YCBCR, _YCBCR2RGB


def _to_ayuv(data, fmt):
    """Any supported format -> AYUV [B, H, W, 4]."""
    if fmt == VideoFormat.AYUV:
        return data
    if fmt == VideoFormat.GRAY8:
        b, h, w = data.shape
        out = jnp.empty((b, h, w, 4), jnp.uint8)
        out = out.at[..., 0].set(255)
        out = out.at[..., 1].set(data)
        out = out.at[..., 2].set(128)
        out = out.at[..., 3].set(128)
        return out
    if fmt == VideoFormat.I420:
        y = data["y"]
        u = jnp.repeat(jnp.repeat(data["u"], 2, axis=-2), 2, axis=-1)
        v = jnp.repeat(jnp.repeat(data["v"], 2, axis=-2), 2, axis=-1)
        u = u[..., :y.shape[-2], :y.shape[-1]]
        v = v[..., :y.shape[-2], :y.shape[-1]]
        out = jnp.stack([jnp.full_like(y, 255), y, u, v], axis=-1)
        return out
    # packed RGB
    offs = VideoFormat.rgb_offsets(fmt)
    r = data[..., offs[0]].astype(jnp.int32)
    g = data[..., offs[1]].astype(jnp.int32)
    b = data[..., offs[2]].astype(jnp.int32)
    a = (data[..., offs[3]] if VideoFormat.has_alpha(fmt)
         else jnp.full_like(data[..., 0], 255))
    y, u, v = _apply_matrix(_RGB2YCBCR, r, g, b)
    return jnp.stack([a,
                      jnp.clip(y, 0, 255).astype(jnp.uint8),
                      jnp.clip(u, 0, 255).astype(jnp.uint8),
                      jnp.clip(v, 0, 255).astype(jnp.uint8)], axis=-1)


def _from_ayuv(ayuv, fmt):
    if fmt == VideoFormat.AYUV:
        return ayuv
    if fmt == VideoFormat.GRAY8:
        return ayuv[..., 1]
    if fmt == VideoFormat.I420:
        y = ayuv[..., 1]
        u = ayuv[..., 2].astype(jnp.uint16)
        v = ayuv[..., 3].astype(jnp.uint16)
        # 2x2 rounded average subsample
        u = ((u[..., ::2, ::2] + u[..., ::2, 1::2] + u[..., 1::2, ::2]
              + u[..., 1::2, 1::2] + 2) >> 2).astype(jnp.uint8)
        v = ((v[..., ::2, ::2] + v[..., ::2, 1::2] + v[..., 1::2, ::2]
              + v[..., 1::2, 1::2] + 2) >> 2).astype(jnp.uint8)
        return {"y": y, "u": u, "v": v}
    # packed RGB
    y = ayuv[..., 1].astype(jnp.int32)
    u = ayuv[..., 2].astype(jnp.int32)
    v = ayuv[..., 3].astype(jnp.int32)
    r, g, b = _apply_matrix(_YCBCR2RGB, y, u, v)
    offs = VideoFormat.rgb_offsets(fmt)
    n = VideoFormat.n_channels(fmt)
    out = jnp.empty(ayuv.shape[:-1] + (n,), jnp.uint8)
    out = out.at[..., offs[0]].set(jnp.clip(r, 0, 255).astype(jnp.uint8))
    out = out.at[..., offs[1]].set(jnp.clip(g, 0, 255).astype(jnp.uint8))
    out = out.at[..., offs[2]].set(jnp.clip(b, 0, 255).astype(jnp.uint8))
    if offs[3] is not None:
        out = out.at[..., offs[3]].set(ayuv[..., 0])
    return out


_ALL = (VideoFormat.PACKED_RGB4 + VideoFormat.PACKED_RGB3
        + (VideoFormat.AYUV, VideoFormat.I420, VideoFormat.GRAY8))


@register
class VideoConvert(Element):
    NAME = "videoconvert"
    PROPERTIES = (Property("format", str, VideoFormat.AYUV, static=True),)

    def negotiate(self, in_spec: MediaSpec) -> MediaSpec:
        require(in_spec.kind == "video", "videoconvert: needs video")
        require(in_spec.format in _ALL,
                f"videoconvert: unsupported source {in_spec.format}")
        require(self.props["format"] in _ALL,
                f"videoconvert: unsupported target {self.props['format']}")
        if self.props["format"] == VideoFormat.I420:
            require(in_spec.width % 2 == 0 and in_spec.height % 2 == 0,
                    "videoconvert: I420 needs even dimensions")
        return in_spec.with_(format=self.props["format"])

    def process(self, params, state, batch: FrameBatch):
        src = self.in_spec.format
        dst = self.out_spec.format
        if src == dst:
            return state, batch
        data = batch.data
        # pure packed-RGB permutation fast path
        if VideoFormat.is_rgb(src) and VideoFormat.is_rgb(dst):
            s_off = VideoFormat.rgb_offsets(src)
            d_off = VideoFormat.rgb_offsets(dst)
            n = VideoFormat.n_channels(dst)
            out = jnp.empty(data.shape[:-1] + (n,), jnp.uint8)
            for i in range(3):
                out = out.at[..., d_off[i]].set(data[..., s_off[i]])
            if d_off[3] is not None:
                alpha = (data[..., s_off[3]] if VideoFormat.has_alpha(src)
                         else jnp.full_like(data[..., 0], 255))
                out = out.at[..., d_off[3]].set(alpha)
            return state, batch.with_data(out)
        return state, batch.with_data(_from_ayuv(_to_ayuv(data, src), dst))

    def word_map(self, params):
        """Packed-4 -> packed-4 conversions are pure word functions, so the
        table-fusion pass can run them on 256-entry tables."""
        from gstbad_tpu.ops import pointops
        src = self.in_spec.format
        dst = self.out_spec.format
        if src == dst:
            return lambda w: w
        if not (VideoFormat.is_rgb(src)
                and src in VideoFormat.PACKED_RGB4):
            return None
        s_off = VideoFormat.rgb_offsets(src)
        has_a = VideoFormat.has_alpha(src)
        if dst == VideoFormat.AYUV:
            return lambda w: pointops.rgb_word_to_ayuv_word(w, s_off, has_a)
        if VideoFormat.is_rgb(dst) and dst in VideoFormat.PACKED_RGB4:
            d_off = VideoFormat.rgb_offsets(dst)
            return lambda w: pointops.rgb_word_permute(w, s_off, d_off,
                                                       has_a)
        return None
