"""ivtc + combdetect (gst/ivtc/) — inverse telecine as an in-graph field
queue.

The reference keeps a queue of mapped field buffers and per output frame
picks weave vs single-field reconstruction by comb-score thresholds
(gstivtc.c construct_frame).  Here the queue is a ring of device arrays
carried through a lax.scan over the window; data-dependent emission (0-2
frames per input) becomes 2 gated output slots per input with validity
masks — SURVEY.md hard part #3.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from gstbad_tpu.core.element import Property, VideoFilter
from gstbad_tpu.core.frame import (FLAG_INTERLACED, FLAG_ONEFIELD, FLAG_RFF,
                                   FLAG_TFF, FrameBatch)
from gstbad_tpu.core.registry import register
from gstbad_tpu.core.spec import MediaSpec, VideoFormat, require
from gstbad_tpu.ops import comb as comb_ops
from gstbad_tpu.ops import ivtc as ivtc_ops

CAP = 8  # field queue capacity (reference GST_IVTC_MAX_FIELDS = 10)
THRESHOLD = 100


def _planes_of(data):
    return data if isinstance(data, dict) else {"y": data}


@register
class Ivtc(VideoFilter):
    """Inverse telecine.  The reference strips framerate and forces
    progressive in transform_caps (gstivtc.c:160-185); downstream picks the
    rate — here the `output-framerate` property (default 4/5 of the input,
    the 30000/1001 -> 24000/1001 pulldown inverse)."""

    NAME = "ivtc"
    FORMATS = (VideoFormat.I420, VideoFormat.GRAY8)
    PROPERTIES = (Property("output-framerate", str, "", static=True),)

    def negotiate(self, in_spec: MediaSpec) -> MediaSpec:
        from fractions import Fraction
        require(in_spec.kind == "video", "ivtc: needs video")
        require(in_spec.format in self.FORMATS,
                f"ivtc: format {in_spec.format} unsupported")
        fr = self.props["output-framerate"]
        out_fr = (Fraction(fr) if fr
                  else in_spec.framerate * Fraction(4, 5))
        return in_spec.with_(framerate=out_fr,
                             interlace_mode="progressive")

    def init_state(self, batch: int):
        spec = self.in_spec
        h, w = spec.height, spec.width
        planes = {"y": jnp.zeros((CAP, h, w), jnp.uint8)}
        if spec.format == VideoFormat.I420:
            planes["u"] = jnp.zeros((CAP, h // 2, w // 2), jnp.uint8)
            planes["v"] = jnp.zeros((CAP, h // 2, w // 2), jnp.uint8)
        return {
            "q": planes,
            "parity": jnp.zeros(CAP, jnp.int32),
            "ts": jnp.zeros(CAP, jnp.int64),
            "head": jnp.int32(0),
            "count": jnp.int32(0),
            "current_ts": jnp.int64(0),
        }

    def process(self, params, state, batch: FrameBatch):
        spec = self.in_spec
        field_dur = jnp.int64(spec.frame_duration_ns // 2)
        out_dur = jnp.int64(self.out_spec.frame_duration_ns)
        is_dict = isinstance(batch.data, dict)

        def slot(st, i):
            return (st["head"] + i) % CAP

        def field_plane(st, k, i):
            return st["q"][k][slot(st, i)]

        def similarity_pair(st):
            """prev (0,1) and next (1,2) comb scores in ONE batched pass
            (the row chain dominates; two frames per scan step halve the
            dispatch count)."""
            f = [field_plane(st, "y", i) for i in range(3)]
            p = [st["parity"][slot(st, i)] for i in range(3)]
            tops, bottoms = [], []
            for a, bb in ((0, 1), (1, 2)):
                top_first = p[a] == 0
                tops.append(jnp.where(top_first, f[a], f[bb]))
                bottoms.append(jnp.where(top_first, f[bb], f[a]))
            scores = comb_ops.comb_score(jnp.stack(tops),
                                         jnp.stack(bottoms))
            return scores[0], scores[1]

        def weave_frame(st, i1, i2):
            p1 = st["parity"][slot(st, i1)]
            out = {}
            for k in st["q"]:
                f1 = field_plane(st, k, i1)
                f2 = field_plane(st, k, i2)
                top = jnp.where(p1 == 0, f1, f2)
                bottom = jnp.where(p1 == 0, f2, f1)
                out[k] = ivtc_ops.weave(top, bottom)
            return out

        def single_frame(st, i1):
            p = st["parity"][slot(st, i1)]
            out = {"y": ivtc_ops.reconstruct_single_luma(
                field_plane(st, "y", i1), p)}
            for k in st["q"]:
                if k != "y":
                    out[k] = ivtc_ops.reconstruct_single_chroma(
                        field_plane(st, k, i1), p)
            return out

        def construct(st):
            """construct_frame (gstivtc.c:565-630)."""
            forward_ok = st["ts"][slot(st, 1)] < st["current_ts"]
            prev_score, next_score = similarity_pair(st)

            weave_next = weave_frame(st, 1, 2)
            weave_prev = weave_frame(st, 1, 0)
            single = single_frame(st, 1)

            use_next_a = forward_ok & (next_score < prev_score)
            branch_prev = prev_score < THRESHOLD
            branch_next = ~branch_prev & (next_score < THRESHOLD)

            def sel(k):
                return jnp.where(
                    branch_prev,
                    jnp.where(use_next_a, weave_next[k], weave_prev[k]),
                    jnp.where(branch_next, weave_next[k], single[k]))

            out = {k: sel(k) for k in st["q"]}
            n_retire = jnp.where(
                branch_prev, jnp.where(use_next_a, 3, 2),
                jnp.where(branch_next, jnp.where(forward_ok, 3, 2), 2)
            ).astype(jnp.int32)
            pts = st["current_ts"]
            st = {**st,
                  "head": (st["head"] + n_retire) % CAP,
                  "count": st["count"] - n_retire,
                  "current_ts": st["current_ts"] + out_dur}
            return st, out, pts

        def step(st, inp):
            frame, pts, flags = inp
            planes = _planes_of(frame)
            tff = (flags & FLAG_TFF) != 0
            onefield = (flags & FLAG_ONEFIELD) != 0
            rff = (flags & FLAG_RFF) != 0
            p0 = jnp.where(tff, 0, 1).astype(jnp.int32)
            adds = [(p0, jnp.bool_(True)),
                    (1 - p0, ~onefield),
                    (p0, ~onefield & rff)]
            for idx, (par, ok) in enumerate(adds):
                pos = (st["head"] + st["count"]) % CAP
                newq = {k: st["q"][k].at[pos].set(
                    jnp.where(ok, planes[k], st["q"][k][pos]))
                    for k in st["q"]}
                st = {**st,
                      "q": newq,
                      "parity": st["parity"].at[pos].set(
                          jnp.where(ok, par, st["parity"][pos])),
                      "ts": st["ts"].at[pos].set(
                          jnp.where(ok, pts + idx * field_dur,
                                    st["ts"][pos])),
                      "count": st["count"] + ok.astype(jnp.int32)}

            # retire early fields (gstivtc.c:536-540)
            def retire_cond(hc):
                head, count = hc
                return (count > 0) & (st["ts"][head % CAP]
                                      + 50_000_000 < st["current_ts"])

            head, count = lax.while_loop(
                retire_cond, lambda hc: ((hc[0] + 1) % CAP, hc[1] - 1),
                (st["head"], st["count"]))
            st = {**st, "head": head, "count": count}

            outs = []
            outs_pts = []
            outs_valid = []
            for _ in range(2):
                can = st["count"] >= 4

                def do(st=st):
                    return construct(st)

                def dont(st=st):
                    dummy = {k: st["q"][k][0] for k in st["q"]}
                    return st, dummy, jnp.int64(0)

                st, out, opts = lax.cond(can, do, dont)
                outs.append(out)
                outs_pts.append(opts)
                outs_valid.append(can)
            stacked = {k: jnp.stack([o[k] for o in outs]) for k in outs[0]}
            return st, (stacked, jnp.stack(outs_pts),
                        jnp.stack(outs_valid))

        data = batch.data if is_dict else {"y": batch.data}
        state, (frames, pts, valid) = lax.scan(
            step, state, (data, batch.pts, batch.flags))
        # [B, 2, ...] -> [2B, ...]
        b = batch.batch
        out_data = {k: v.reshape((2 * b,) + v.shape[2:])
                    for k, v in frames.items()}
        if not is_dict:
            out_data = out_data["y"]
        out = FrameBatch(
            data=out_data,
            pts=pts.reshape(2 * b),
            flags=jnp.zeros(2 * b, jnp.int32),  # progressive, flags cleared
            valid=valid.reshape(2 * b))
        return state, out


@register
class CombDetect(VideoFilter):
    """combdetect (gstcombdetect.c): paint zebra over combed cells; border
    rows (j<2, j>=h-2) are halved."""

    NAME = "combdetect"
    FORMATS = (VideoFormat.I420, VideoFormat.GRAY8)

    def init_state(self, batch: int):
        return jnp.int32(0)  # z frame counter

    def process(self, params, state, batch: FrameBatch):
        is_dict = isinstance(batch.data, dict)
        y = batch.data["y"] if is_dict else batch.data
        b, h, w = y.shape
        z = state + 1 + jnp.arange(b, dtype=jnp.int32)

        # comb_mask is batched (one pallas chain pass for the window)
        mask, _ = comb_ops.comb_mask(y)
        i = jnp.arange(w, dtype=jnp.int32)[None, None, :]
        j = jnp.arange(h, dtype=jnp.int32)[None, :, None]
        zebra = jnp.where(((i + j + z[:, None, None]) & 0x4) != 0,
                          jnp.uint8(235), jnp.uint8(16))
        out_y = jnp.where(mask, zebra, y)
        border = (j < 2) | (j >= h - 2)
        out_y = jnp.where(border, y // 2, out_y)
        if is_dict:
            out = {**batch.data, "y": out_y}
        else:
            out = out_y
        return state + b, batch.with_data(out)
