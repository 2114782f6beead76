"""interlace (gst/interlace/gstinterlace.c) — progressive -> interlaced /
telecine field weaver with the 11 pulldown patterns.

The reference's chain loop (gstinterlace.c:1292-1448) consumes
n_fields[phase] fields per input frame and emits woven buffers while >= 2
fields are available; since the per-frame loop runs at most twice, it
becomes 2 gated output slots per input frame in a lax.scan, with the phase
index / field index / stored-frame as carried state.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from gstbad_tpu.core.element import Property, VideoFilter
from gstbad_tpu.core.frame import (FLAG_INTERLACED, FLAG_ONEFIELD, FLAG_RFF,
                                   FLAG_TFF, FrameBatch)
from gstbad_tpu.core.registry import register
from gstbad_tpu.core.spec import MediaSpec, VideoFormat, require

# gstinterlace.c:363-385: name -> (ratio_n, ratio_d, n_fields per phase)
PATTERNS = {
    "1:1": (1, 2, [1]),
    "2:2": (1, 1, [2]),
    "2:3": (5, 4, [2, 3]),
    "2:3:3:2": (5, 4, [2, 3, 3, 2]),
    "2-11:3": (25, 24, [2] * 11 + [3]),
    "3:4-3": (15, 8, [3, 4, 4, 4]),
    "3-7:4": (25, 16, [3] * 7 + [4]),
    "3:3:4": (5, 3, [3, 3, 4]),
    "3:3": (3, 2, [3, 3]),
    "3:2-4": (11, 10, [3, 2, 2, 2, 2]),
    "1:2-4": (9, 10, [1, 2, 2, 2, 2]),
}


@register
class Interlace(VideoFilter):
    NAME = "interlace"
    FORMATS = (VideoFormat.I420, VideoFormat.AYUV, VideoFormat.GRAY8)
    PROPERTIES = (
        Property("top-field-first", bool, False, static=True),
        Property("pattern", str, "2:3", static=True),
        Property("pattern-offset", int, 0, 0, 12, static=True),
        Property("allow-rff", bool, False, static=True),
    )

    def negotiate(self, in_spec: MediaSpec) -> MediaSpec:
        require(in_spec.kind == "video", "interlace: needs video")
        require(in_spec.format in self.FORMATS,
                f"interlace: format {in_spec.format} unsupported")
        require(self.props["pattern"] in PATTERNS,
                f"interlace: unknown pattern {self.props['pattern']}")
        rn, rd, fields = PATTERNS[self.props["pattern"]]
        require(self.props["pattern-offset"] < len(fields),
                "interlace: pattern-offset beyond pattern")
        mode = ("mixed" if self.props["pattern"] not in ("1:1", "2:2")
                else "interleaved")
        return in_spec.with_(
            framerate=in_spec.framerate * Fraction(rn, rd),
            interlace_mode=mode)

    def prepare(self):
        rn, rd, fields = PATTERNS[self.props["pattern"]]
        self._table = np.array(fields + [0], np.int32)  # 0-terminated
        self._mixed = self.props["pattern"] not in ("1:1", "2:2")
        out_fr = self.out_spec.framerate
        # field duration in ns = 1e9 * fps_d / (2 * fps_n)
        self._field_ns = int(round(1e9 * out_fr.denominator
                                   / (2 * out_fr.numerator)))

    def init_state(self, batch: int):
        spec = self.in_spec
        h, w = spec.height, spec.width
        if spec.format == VideoFormat.I420:
            stored = {"y": jnp.zeros((h, w), jnp.uint8),
                      "u": jnp.zeros((h // 2, w // 2), jnp.uint8),
                      "v": jnp.zeros((h // 2, w // 2), jnp.uint8)}
        elif spec.format == VideoFormat.AYUV:
            stored = {"p": jnp.zeros((h, w, 4), jnp.uint8)}
        else:
            stored = {"p": jnp.zeros((h, w), jnp.uint8)}
        return {
            "phase": jnp.int32(self.props["pattern-offset"]),
            "field_index": jnp.int32(0 if self.props["top-field-first"]
                                     else 1),
            "stored": stored,
            "stored_fields": jnp.int32(0),
            "timebase": jnp.int64(0),
            "fields_since": jnp.int32(0),
            "started": jnp.bool_(False),
        }

    @staticmethod
    def _weave(stored, current, field_index):
        """Rows of parity `field_index` from stored, others from current
        (copy_fields, gstinterlace.c:1070-1113)."""
        out = {}
        for k in stored:
            h = stored[k].shape[0]
            rows = (jnp.arange(h) % 2)[:, None]
            if stored[k].ndim == 3:
                rows = rows[..., None]
            out[k] = jnp.where(rows == field_index, stored[k], current[k])
        return out

    def process(self, params, state, batch: FrameBatch):
        table = jnp.asarray(self._table)
        offset = self.props["pattern-offset"]
        allow_rff = self.props["allow-rff"]
        mixed = self._mixed
        field_ns = self._field_ns
        is_dict = isinstance(batch.data, dict)

        def step(st, inp):
            frame, pts = inp
            planes = frame if isinstance(frame, dict) else {"p": frame}
            # timebase reset (gstinterlace.c:1261-1266)
            at_reset = (st["stored_fields"] == 0) & (st["phase"] == offset)
            timebase = jnp.where(at_reset, pts, st["timebase"])
            fields_since = jnp.where(at_reset, 0, st["fields_since"])

            current = table[st["phase"]]
            phase = st["phase"] + 1
            phase = jnp.where(table[phase] == 0, 0, phase)

            stored = st["stored"]
            stored_fields = st["stored_fields"]
            field_index = st["field_index"]
            num = stored_fields + current

            outs, out_pts, out_flags, out_valid = [], [], [], []
            for _ in range(2):
                emit = num >= 2
                use_stored = stored_fields > 0
                woven = self._weave(stored, planes, field_index)
                frame_out = {k: jnp.where(use_stored, woven[k], planes[k])
                             for k in planes}
                take3 = (~use_stored) & (num >= 3) & allow_rff
                nout = jnp.where(use_stored, 2, jnp.where(take3, 3, 2))
                interlaced = use_stored
                # flags (gst_interlace_decorate_buffer)
                flags = jnp.where(field_index == 0, FLAG_TFF, 0)
                flags = flags | jnp.where(nout == 3, FLAG_RFF, 0)
                if mixed:
                    flags = flags | jnp.where(interlaced & (nout == 2),
                                              FLAG_INTERLACED, 0)
                pts_out = timebase + jnp.int64(field_ns) \
                    * fields_since.astype(jnp.int64)

                consumed_cur = jnp.where(use_stored, 1, nout)
                current = jnp.where(emit, current - consumed_cur, current)
                stored_fields = jnp.where(
                    emit & use_stored, stored_fields - 1, stored_fields)
                fields_since = jnp.where(emit, fields_since + nout,
                                         fields_since)
                field_index = jnp.where(emit, field_index ^ (nout & 1),
                                        field_index)
                num = jnp.where(emit, num - nout, num)

                outs.append(frame_out)
                out_pts.append(pts_out)
                out_flags.append(jnp.where(emit, flags, 0).astype(jnp.int32))
                out_valid.append(emit)

            # store leftover field (gstinterlace.c:1436-1447)
            keep = current > 0
            stored = {k: jnp.where(keep, planes[k], stored[k])
                      for k in planes}
            stored_fields = jnp.where(keep, current, jnp.int32(0))

            new_st = {"phase": phase, "field_index": field_index,
                      "stored": stored, "stored_fields": stored_fields,
                      "timebase": timebase, "fields_since": fields_since,
                      "started": jnp.bool_(True)}
            stacked = {k: jnp.stack([o[k] for o in outs]) for k in planes}
            return new_st, (stacked, jnp.stack(out_pts),
                            jnp.stack(out_flags), jnp.stack(out_valid))

        data = batch.data if is_dict else {"p": batch.data}
        state, (frames, pts, flags, valid) = lax.scan(
            step, state, (data, batch.pts))
        b = batch.batch
        out_data = {k: v.reshape((2 * b,) + v.shape[2:])
                    for k, v in frames.items()}
        if not is_dict:
            out_data = out_data["p"]
        out = FrameBatch(data=out_data, pts=pts.reshape(2 * b),
                         flags=flags.reshape(2 * b),
                         valid=valid.reshape(2 * b))
        return state, out
