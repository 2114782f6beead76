"""faceoverlay (gst/faceoverlay/gstfaceoverlay.c) — composite an overlay
image over the detected face.

The reference is a bin `facedetect ! videoconvert ! rsvgoverlay`: the
first face rectangle from facedetect's element message positions the SVG
at (face.x + x*face.w, face.y + y*face.h) scaled to (w*face.w, h*face.h)
(gstfaceoverlay.c:196-250).  Properties x/y/w/h reproduced exactly
(defaults 0/0/1/1, gstfaceoverlay.c:296-315).

Detection (r3): the REAL facedetect path — this environment ships
OpenCV's trained models (/usr/share/opencv4/haarcascades), so the
default detector is the frontal-face Haar cascade evaluated by the
repo's engine (elements/cv/facedetect.py machinery); the detected box
snaps to the nearest static overlay scale.  `detector=skin` keeps the
round-2 skin-density window search as the model-free fallback.  A
`face` element message (x, y, width, height) is posted per frame like
facedetect's.

Overlay (r3): SVG locations render through the REAL librsvg
(io/rsvg.py — the exact library the reference's rsvgoverlay wraps),
vector-rasterized at each detection scale on the host; PNG/PNM rasters
remain supported via PIL.  The per-frame composite picks the scale
branch with lax.switch.
- in/out stays the negotiated packed format (the reference bin converts
  to BGRA for rsvgoverlay).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from gstbad_tpu.core.element import Property, VideoFilter
from gstbad_tpu.core.frame import FrameBatch
from gstbad_tpu.core.registry import register
from gstbad_tpu.core.spec import VideoFormat
from gstbad_tpu.ops import cv as cvops

# detection window heights as fractions of the frame height (the static
# scale pyramid); windows are square-ish like frontal-face cascades
_SCALES = (0.5, 0.35, 0.25, 0.18)


def _unpremultiply(bgra: np.ndarray) -> np.ndarray:
    """cairo premultiplied B,G,R,A -> straight RGBA (round-half-up),
    matching the straight-alpha composite the raster path uses."""
    a = bgra[..., 3:4].astype(np.uint32)
    rgb = bgra[..., [2, 1, 0]].astype(np.uint32)
    straight = np.where(a > 0, np.minimum(
        (rgb * 255 + a // 2) // np.maximum(a, 1), 255), 0)
    return np.concatenate([straight, a], axis=-1).astype(np.uint8)
_MIN_DENSITY = 0.35   # a window must be at least this skin-dense
_STRIDE = 4           # window search stride in pixels


@register
class FaceOverlay(VideoFilter):
    NAME = "faceoverlay"
    FORMATS = VideoFormat.PACKED_RGB4
    PROPERTIES = (
        Property("location", str, "", static=True,
                 doc="overlay image file (PNG/PNM; RGBA respected)"),
        Property("profile", str,
                 "/usr/share/opencv4/haarcascades/"
                 "haarcascade_frontalface_default.xml", static=True),
        Property("detector", str, "auto", static=True,
                 doc="auto | haar | skin"),
        Property("scale-factor", float, 1.25, 1.1, 10.0, static=True),
        Property("x", float, 0.0, static=True),
        Property("y", float, 0.0, static=True),
        Property("w", float, 1.0, 0.0, None, static=True),
        Property("h", float, 1.0, 0.0, None, static=True),
    )

    def prepare(self):
        spec = self.out_spec
        H, W = spec.height, spec.width
        self._rgb = VideoFormat.rgb_offsets(spec.format)[:3]
        from gstbad_tpu.elements.cv.facedetect import _load
        mode = self.props["detector"]
        self._arrs = (_load(self.props["profile"])
                      if mode in ("auto", "haar") else None)
        if mode == "haar" and self._arrs is None:
            raise ValueError("faceoverlay: detector=haar but profile "
                             f"{self.props['profile']} is missing")
        # face windows per scale (static shapes)
        self._wins = []
        for s in _SCALES:
            fh = max(8, int(H * s))
            fw = max(8, int(fh * 0.8))  # faces are taller than wide
            if fh <= H and fw <= W:
                self._wins.append((fh, fw))
        if not self._wins:
            self._wins = [(min(8, H), min(8, W))]
        loc = self.props["location"]
        self._overlays = None
        if loc and self._is_svg(loc):
            # the reference's actual format: SVG via librsvg (r3) —
            # vector-rendered crisp at every detection scale
            from gstbad_tpu.io import rsvg as iorsvg
            svg = iorsvg.Svg.from_file(loc)
            self._overlays = []
            for (fh, fw) in self._wins:
                sw = max(1, int(self.props["w"] * fw))
                sh = max(1, int(self.props["h"] * fh))
                bgra = svg.render(sw, sh, sx=sw / max(svg.width, 1),
                                  sy=sh / max(svg.height, 1))
                self._overlays.append(jnp.asarray(_unpremultiply(bgra)))
        elif loc:
            from PIL import Image
            img = Image.open(loc).convert("RGBA")
            self._overlays = []
            for (fh, fw) in self._wins:
                sw = max(1, int(self.props["w"] * fw))
                sh = max(1, int(self.props["h"] * fh))
                o = np.asarray(img.resize((sw, sh), Image.BILINEAR),
                               np.uint8)
                self._overlays.append(jnp.asarray(o))

    @staticmethod
    def _is_svg(loc: str) -> bool:
        from gstbad_tpu.io import rsvg as iorsvg
        if not iorsvg.available():
            return False
        if loc.lower().endswith((".svg", ".svgz")):
            return True
        try:
            with open(loc, "rb") as f:
                return iorsvg.looks_like_svg(f.read(4096))
        except OSError:
            return False

    def _detect(self, frame):
        if self._arrs is not None:
            return self._detect_haar(frame)
        return self._detect_skin(frame)

    def _detect_haar(self, frame):
        """First Haar face box, snapped to the nearest overlay
        scale -> (found, fy, fx, scale_idx)."""
        from gstbad_tpu.elements.cv.facedetect import _detect_faces
        r = frame[..., self._rgb[0]].astype(jnp.float32)
        g = frame[..., self._rgb[1]].astype(jnp.float32)
        b = frame[..., self._rgb[2]].astype(jnp.float32)
        gray = jnp.clip((r * 4899 + g * 9617 + b * 1868 + 8192)
                        / 16384.0, 0, 255)
        boxes, valid = _detect_faces(
            gray, self._arrs, self.props["scale-factor"], 3, 30, 30)
        found = valid.any()
        first = jnp.argmax(valid)
        box = boxes[first]
        hs = jnp.asarray([wn[0] for wn in self._wins], jnp.int32)
        k = jnp.argmin(jnp.abs(hs - box[3])).astype(jnp.int32)
        return found, box[1].astype(jnp.int32), \
            box[0].astype(jnp.int32), k

    def _detect_skin(self, frame):
        """Skin-density window search -> (found, fy, fx, scale_idx)."""
        r = frame[..., self._rgb[0]].astype(jnp.float32)
        g = frame[..., self._rgb[1]].astype(jnp.float32)
        b = frame[..., self._rgb[2]].astype(jnp.float32)
        rgb = jnp.stack([r, g, b], -1).astype(jnp.uint8)
        hsv = cvops.rgb2hsv_u8(rgb)
        h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
        mask = ((h > 10) & (h <= 20) & (s > 48) & (v > 80)
                ).astype(jnp.float32)
        ii = jnp.pad(jnp.cumsum(jnp.cumsum(mask, 0), 1),
                     ((1, 0), (1, 0)))
        H, W = mask.shape
        best = (jnp.float32(-1.0), jnp.int32(0), jnp.int32(0), jnp.int32(0))
        for k, (fh, fw) in enumerate(self._wins):
            ys = jnp.arange(0, H - fh + 1, _STRIDE)
            xs = jnp.arange(0, W - fw + 1, _STRIDE)
            yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
            dens = (ii[yy + fh, xx + fw] - ii[yy, xx + fw]
                    - ii[yy + fh, xx] + ii[yy, xx]) / (fh * fw)
            i = jnp.argmax(dens)
            d = dens.reshape(-1)[i]
            fy = yy.reshape(-1)[i]
            fx = xx.reshape(-1)[i]
            take = d > jnp.maximum(best[0], _MIN_DENSITY)
            best = (jnp.where(take, d, best[0]),
                    jnp.where(take, fy, best[1]).astype(jnp.int32),
                    jnp.where(take, fx, best[2]).astype(jnp.int32),
                    jnp.where(take, k, best[3]).astype(jnp.int32))
        return (best[0] >= _MIN_DENSITY), best[1], best[2], best[3]

    def _composite(self, frame, found, fy, fx, k):
        """Alpha-blend the pre-scaled overlay at the face box."""
        if self._overlays is None:
            return frame

        def branch(idx):
            fh, fw = self._wins[idx]
            over = self._overlays[idx]
            sh, sw = over.shape[0], over.shape[1]

            def apply(fr):
                sx = fx + jnp.int32(round(self.props["x"] * fw))
                sy = fy + jnp.int32(round(self.props["y"] * fh))
                # pad so a clipped overlay never clamps into view
                pad_h, pad_w = sh, sw
                big = jnp.pad(fr, ((pad_h, pad_h), (pad_w, pad_w),
                                   (0, 0)))
                region = lax.dynamic_slice(
                    big, (sy + pad_h, sx + pad_w, jnp.int32(0)),
                    (sh, sw, big.shape[2]))
                a = over[..., 3:4].astype(jnp.float32) / 255.0
                blend = region.astype(jnp.float32)
                for i, c in enumerate(self._rgb):
                    blend = blend.at[..., c].set(
                        region[..., c].astype(jnp.float32) * (1 - a[..., 0])
                        + over[..., i].astype(jnp.float32) * a[..., 0])
                blend = jnp.clip(blend + 0.5, 0, 255).astype(jnp.uint8)
                big = lax.dynamic_update_slice(
                    big, blend, (sy + pad_h, sx + pad_w, jnp.int32(0)))
                return big[pad_h:pad_h + fr.shape[0],
                           pad_w:pad_w + fr.shape[1]]

            return apply

        out = lax.switch(k, [branch(i) for i in range(len(self._wins))],
                         frame)
        return jnp.where(found, out, frame)

    def process(self, params, state, batch: FrameBatch):
        def one(frame):
            found, fy, fx, k = self._detect(frame)
            out = self._composite(frame, found, fy, fx, k)
            fh = jnp.array([w[0] for w in self._wins], jnp.int32)[k]
            fw = jnp.array([w[1] for w in self._wins], jnp.int32)[k]
            return out, (found, fx, fy, fw, fh)

        out, (found, fx, fy, fw, fh) = jax.vmap(one)(batch.data)
        msgs = {"face": {"x": fx, "y": fy, "width": fw, "height": fh,
                         "_emit": found}}
        return state, batch.with_data(out), msgs
