"""Closed-caption elements (ext/closedcaption/): line21encoder,
line21decoder, cccombiner, ccextractor.

Caption bytes travel as a `"cc"` auxiliary plane on planar video batches:
[B, 6] u8 in the CEA-608 S334-1A layout the reference uses for caption
meta (two triplets: field byte with 0x80 = field 1 + 5-bit line offset,
then the two parity-carrying data bytes — gstline21dec.c:533-556).  The
reference moves the same bytes as GstVideoCaptionMeta on the buffers;
elements that rebuild plane dicts wholesale pass the plane through.

line21encoder (gstline21enc.c): I420-family 720x525/486 interleaved;
renders both field waveforms (golden/line21.py, the io-sim.c math) into
luma rows 21/22 (height 525) or 1/2 (reduced height, gstline21enc.c:520).
line21decoder (gstline21dec.c): probes the first max-line-probes=40 rows
for a pair of consecutive CC lines, attaches the S334-1A bytes + posts a
`line21` message; modes disabled/add/drop/replace.  The zvbi adaptive
bit slicer is replaced by the deterministic mid-range slicer in
ops/line21.py (round-trip bit-exact; documented divergence).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gstbad_tpu.core.element import Element, Property
from gstbad_tpu.core.frame import FrameBatch
from gstbad_tpu.core.registry import register
from gstbad_tpu.core.spec import VideoFormat, require
from gstbad_tpu.ops import line21 as l21ops

MAX_LINE_PROBES = 40     # gstline21dec.c:230


def _vbi_row(height: int) -> int:
    """Field-1 waveform row (gstline21enc.c:517-520)."""
    return 21 if height == 525 else 1


@register
class CcCombiner(Element):
    """cccombiner (gstcccombiner.c): attach a caption stream's bytes to
    the video frames.  Inputs: [video(planar), captions([B, 6] u8
    S334-1A)]; output video gains the "cc" plane."""

    NAME = "cccombiner"
    N_INPUTS = 2

    def negotiate(self, in_spec):
        require(isinstance(in_spec, list) and len(in_spec) == 2,
                "cccombiner: needs (video, captions) inputs")
        video, _cap = in_spec
        require(video.kind == "video", "cccombiner: first input is video")
        self._planar = video.format in (VideoFormat.I420, "I420")
        require(self._planar or isinstance(video.format, str),
                "cccombiner: video input required")
        return video

    def process(self, params, state, batches):
        video, caps = batches
        cc = caps.data
        if cc.ndim == 3:            # [B, 2, 3] triplets -> [B, 6]
            cc = cc.reshape(cc.shape[0], -1)
        require(isinstance(video.data, dict),
                "cccombiner: planar video required (use videoconvert "
                "format=I420)")
        return state, video.with_data({**video.data,
                                       "cc": cc.astype(jnp.uint8)})


@register
class CcExtractor(Element):
    """ccextractor (gstccextractor.c): split caption meta off the video.
    The caption bytes post as per-frame `cc-data` messages (the caption
    source pad analog); remove-caption-meta drops the "cc" plane from the
    video output (gstccextractor.c property of the same name)."""

    NAME = "ccextractor"
    PROPERTIES = (
        Property("remove-caption-meta", bool, False, static=True),
    )

    def negotiate(self, in_spec):
        require(in_spec.kind == "video", "ccextractor: needs video")
        return in_spec

    def process(self, params, state, batch: FrameBatch):
        if not isinstance(batch.data, dict) or "cc" not in batch.data:
            return state, batch
        cc = batch.data["cc"]
        msgs = {"cc-data": {"data": cc,
                            "_emit": jnp.ones(batch.batch, bool)}}
        out = batch
        if self.props["remove-caption-meta"]:
            out = batch.with_data(
                {k: v for k, v in batch.data.items() if k != "cc"})
        return state, out, msgs


@register
class Line21Encoder(Element):
    """line21encoder (gstline21enc.c)."""

    NAME = "line21encoder"
    PROPERTIES = (
        Property("remove-caption-meta", bool, False, static=True),
    )

    def negotiate(self, in_spec):
        require(in_spec.kind == "video"
                and in_spec.format == VideoFormat.I420,
                "line21encoder: needs I420 (use videoconvert)")
        require(in_spec.width == 720,
                "line21encoder: only 720 pixel wide formats are supported"
                " (gstline21enc.c:49)")
        require(in_spec.height in (525, 486),
                "line21encoder: height must be 525 or 486")
        return in_spec

    def process(self, params, state, batch: FrameBatch):
        data = batch.data
        b = batch.batch
        if "cc" in data:
            cc = data["cc"].astype(jnp.int32)          # [B, 6] S334-1A
            f1_sel = (cc[:, 0] & 0x80) != 0
            t1 = cc[:, 1:3]
            t2_is_f1 = (cc[:, 3] & 0x80) != 0
            t2 = cc[:, 4:6]
            pad = jnp.full((b, 2), 0x80, jnp.int32)    # gstline21enc.c:446
            f1 = jnp.where(f1_sel[:, None], t1,
                           jnp.where(t2_is_f1[:, None], t2, pad))
            f2 = jnp.where(~t2_is_f1[:, None], t2,
                           jnp.where(~f1_sel[:, None], t1, pad))
        else:
            f1 = f2 = jnp.full((b, 2), 0x80, jnp.int32)
        wave1 = l21ops.encode_lines(f1.astype(jnp.uint8))
        wave2 = l21ops.encode_lines(f2.astype(jnp.uint8))
        row = _vbi_row(self.out_spec.height)
        y = data["y"]
        y = y.at[:, row, :].set(wave1)
        y = y.at[:, row + 1, :].set(wave2)
        out = {**data, "y": y}
        if self.props["remove-caption-meta"]:
            out.pop("cc", None)
        return state, batch.with_data(out)


@register
class Line21Decoder(Element):
    """line21decoder (gstline21dec.c)."""

    NAME = "line21decoder"
    PROPERTIES = (
        Property("mode", str, "add", static=True,
                 doc="disabled | add | drop | replace "
                     "(gstline21dec.c:76-101)"),
        Property("ntsc-only", bool, False, static=True),
    )

    def negotiate(self, in_spec):
        require(in_spec.kind == "video"
                and in_spec.format == VideoFormat.I420,
                "line21decoder: needs I420 (use videoconvert)")
        self._compatible = in_spec.width == 720 and in_spec.height >= 200
        if self.props["ntsc-only"]:
            self._compatible &= in_spec.height in (525, 486)
        return in_spec

    def process(self, params, state, batch: FrameBatch):
        mode = self.props["mode"]
        has_meta = isinstance(batch.data, dict) and "cc" in batch.data
        if (not self._compatible or mode == "disabled"
                or (mode == "drop" and has_meta)):
            return state, batch
        y = batch.data["y"]
        b, h, _ = y.shape
        n = min(MAX_LINE_PROBES, h - 1)
        rows = y[:, :n + 1, :]
        found, pairs = l21ops.decode_lines(rows)       # [B, n+1], [.., 2]
        both = found[:, :n] & found[:, 1:n + 1]        # consecutive pair
        hit = both.any(axis=1)
        off = jnp.argmax(both, axis=1).astype(jnp.int32)
        f1 = jnp.take_along_axis(pairs, off[:, None, None], 1)[:, 0]
        f2 = jnp.take_along_axis(pairs, (off + 1)[:, None, None], 1)[:, 0]
        # S334-1A bytes incl. the line-offset fields (gstline21dec.c:550)
        base1 = 9 if h == 525 else (5 if h == 625 else 0)
        base2 = 272 if h == 525 else (318 if h == 625 else 0)
        o1 = jnp.where(off > base1, off - base1, 0) & 0x1F
        o2 = jnp.where(off > base2, off - base2, 0) & 0x1F
        cc = jnp.stack([
            (0x80 | o1), f1[:, 0].astype(jnp.int32), f1[:, 1].astype(
                jnp.int32),
            o2, f2[:, 0].astype(jnp.int32), f2[:, 1].astype(jnp.int32),
        ], axis=1).astype(jnp.uint8)
        blank = jnp.tile(jnp.asarray(
            [0x80, 0x80, 0x80, 0x00, 0x80, 0x80], jnp.uint8), (b, 1))
        cc = jnp.where(hit[:, None], cc, blank)
        out = dict(batch.data)
        if has_meta and mode == "add":
            pass                                   # keep the existing meta
        else:
            out["cc"] = cc
        msgs = {"line21": {"cc": cc, "_emit": hit}}
        return state, batch.with_data(out), msgs


@register
class CcConverter(Element):
    """ccconverter (gstccconverter.c): convert the caption representation
    between raw CEA-608 pairs, S334-1A triplets, CEA-708 cc_data and CDP
    packets.  The reference negotiates the types via caps; here
    input-type/output-type properties pick them, and io/cea608.py holds
    the byte-level spec (this element is its vectorized in-graph mirror
    for the fixed-size window layout).  CDP packets carry the running
    cdp_hdr_sequence_cntr as element state and the additive checksum
    (gstccconverter.c:1137-1152); timecode sections are skipped on input
    and never written (we have PTS, not SMPTE timecodes — documented)."""

    NAME = "ccconverter"
    PROPERTIES = (
        Property("input-type", str, "s334-1a", static=True,
                 doc="raw | s334-1a | cc-data | cdp"),
        Property("output-type", str, "cdp", static=True),
    )

    def _fps(self):
        from gstbad_tpu.io.cea608 import CDP_FPS_TABLE
        fr = self.out_spec.framerate
        key = (fr.numerator, fr.denominator)
        require(key in CDP_FPS_TABLE,
                f"ccconverter: no CDP framerate entry for {fr} "
                "(gstccconverter.c:483-492)")
        return CDP_FPS_TABLE[key]

    def negotiate(self, in_spec):
        for p in ("input-type", "output-type"):
            require(self.props[p] in ("raw", "s334-1a", "cc-data", "cdp"),
                    f"ccconverter: bad {p} {self.props[p]!r}")
        return in_spec

    def init_state(self, window: int):
        return jnp.int32(0)      # cdp_hdr_sequence_cntr

    # -- the fixed-2-triplet vectorized transforms -------------------------

    def _to_s334(self, cc, kind):
        b = cc.shape[0]
        cc = cc.astype(jnp.int32)
        if kind == "s334-1a":
            return cc
        if kind == "raw":                    # field-1 pairs
            n = cc.shape[1] // 2
            out = jnp.zeros((b, 3 * n), jnp.int32)
            for i in range(n):
                out = out.at[:, 3 * i].set(0x80)
                out = out.at[:, 3 * i + 1].set(cc[:, 2 * i])
                out = out.at[:, 3 * i + 2].set(cc[:, 2 * i + 1])
            return out
        if kind == "cc-data":
            n = cc.shape[1] // 3
            out = jnp.zeros((b, 3 * n), jnp.int32)
            for i in range(n):
                hdr = cc[:, 3 * i]
                valid = (hdr & 0x04) == 0x04
                typ = hdr & 0x03
                f1 = valid & (typ == 0)
                out = out.at[:, 3 * i].set(jnp.where(f1, 0x80, 0x00))
                keep = valid & (typ <= 1)
                out = out.at[:, 3 * i + 1].set(
                    jnp.where(keep, cc[:, 3 * i + 1], 0x80))
                out = out.at[:, 3 * i + 2].set(
                    jnp.where(keep, cc[:, 3 * i + 2], 0x80))
            return out
        # cdp: flags at byte 4; cc_data section starts at 9 (no timecode)
        # or 14 (timecode present) — select per frame
        flags = cc[:, 4]
        has_tc = (flags & 0x80) != 0
        base = jnp.where(has_tc, 14, 9).astype(jnp.int32)
        n = 2
        out = jnp.zeros((b, 3 * n), jnp.int32)
        idx = (base[:, None]
               + jnp.arange(3 * n, dtype=jnp.int32)[None, :])
        trips = jnp.take_along_axis(cc, idx, axis=1)
        for i in range(n):
            hdr = trips[:, 3 * i]
            valid = (hdr & 0x04) == 0x04
            typ = hdr & 0x03
            keep = valid & (typ <= 1)
            out = out.at[:, 3 * i].set(
                jnp.where(valid & (typ == 0), 0x80, 0x00))
            out = out.at[:, 3 * i + 1].set(
                jnp.where(keep, trips[:, 3 * i + 1], 0x80))
            out = out.at[:, 3 * i + 2].set(
                jnp.where(keep, trips[:, 3 * i + 2], 0x80))
        return out

    def _from_s334(self, s334, kind, state):
        b = s334.shape[0]
        n = s334.shape[1] // 3
        if kind == "s334-1a":
            return s334, state
        if kind == "raw":
            # field-1 pairs only; non-field-1 slots pad 0x80 (fixed shape)
            out = jnp.full((b, 2 * n), 0x80, jnp.int32)
            for i in range(n):
                f1 = (s334[:, 3 * i] & 0x80) != 0
                out = out.at[:, 2 * i].set(
                    jnp.where(f1, s334[:, 3 * i + 1], 0x80))
                out = out.at[:, 2 * i + 1].set(
                    jnp.where(f1, s334[:, 3 * i + 2], 0x80))
            return out, state
        ccd = jnp.zeros((b, 3 * n), jnp.int32)
        for i in range(n):
            f1 = (s334[:, 3 * i] & 0x80) != 0
            ccd = ccd.at[:, 3 * i].set(jnp.where(f1, 0xFC, 0xFD))
            ccd = ccd.at[:, 3 * i + 1].set(s334[:, 3 * i + 1])
            ccd = ccd.at[:, 3 * i + 2].set(s334[:, 3 * i + 2])
        if kind == "cc-data":
            return ccd, state
        # cdp
        fps_idx, max_cc = self._fps()
        length = 11 + 2 + 3 * max_cc
        seqs = (state + jnp.arange(b, dtype=jnp.int32)) & 0xFFFF
        out = jnp.zeros((b, length), jnp.int32)
        out = out.at[:, 0].set(0x96).at[:, 1].set(0x69)
        out = out.at[:, 2].set(length).at[:, 3].set(fps_idx)
        out = out.at[:, 4].set(0x02 | 0x40 | 0x01)
        out = out.at[:, 5].set(seqs >> 8).at[:, 6].set(seqs & 0xFF)
        out = out.at[:, 7].set(0x72).at[:, 8].set(0xE0 | max_cc)
        out = out.at[:, 9:9 + 3 * n].set(ccd)
        pad = jnp.tile(jnp.asarray([0xFA, 0x00, 0x00], jnp.int32),
                       max_cc - n)
        out = out.at[:, 9 + 3 * n:9 + 3 * max_cc].set(pad[None, :])
        out = out.at[:, -4].set(0x74)
        out = out.at[:, -3].set(seqs >> 8).at[:, -2].set(seqs & 0xFF)
        checksum = (256 - (jnp.sum(out, axis=1) & 0xFF)) & 0xFF
        out = out.at[:, -1].set(checksum)
        return out, state + b

    def process(self, params, state, batch: FrameBatch):
        is_dict = isinstance(batch.data, dict)
        cc = batch.data["cc"] if is_dict else batch.data
        s334 = self._to_s334(cc, self.props["input-type"])
        out, state = self._from_s334(s334, self.props["output-type"],
                                     state)
        out = out.astype(jnp.uint8)
        if is_dict:
            return state, batch.with_data({**batch.data, "cc": out})
        return state, batch.with_data(out)


@register
class CeaCcOverlay(Element):
    """ceaccoverlay (ext/closedcaption/gstceaccoverlay.c): decode CEA-708
    DTVCC captions (io/cea708.py) and blend the caption windows onto
    AYUV video.

    Caption data arrives via `push_cc(data, pts_ns, kind)` before the
    run (the reference takes a caption sink pad; same host-push model as
    dvdspu/dvbsuboverlay): kind "cc-data" (raw triplets), "cdp" (the
    0x9669 packet — unwrapped via io/cea608.py like
    extract_ccdata_from_cdp, gstceaccoverlay.c:1575-1639) or "s334-1a"
    (608-only payloads carry no 708 data and render nothing).  Each feed
    that completes DTVCC windows snapshots an overlay shown from its PTS
    until the next snapshot; `silent` mutes rendering;
    `service-number` selects the DTVCC service (1-63, default 1).
    Rendering uses the fixed bitmap face (data/cc_font.npz) instead of
    the reference's Pango/Cairo + font-desc markup — documented."""

    NAME = "ceaccoverlay"
    PROPERTIES = (
        Property("silent", bool, False, static=True),
        Property("service-number", int, 1, 1, 63, static=True),
    )

    def __init__(self, **props):
        super().__init__(**props)
        from gstbad_tpu.io.cea708 import Cea708Decoder
        self._decoder = Cea708Decoder(
            int(self.props["service-number"]))
        self._snapshots = []      # (pts_ns, decoder-state snapshot fn)
        self._pending = []        # raw (pts, cc_data) feeds

    def push_cc(self, data: bytes, pts_ns: int = 0,
                kind: str = "cc-data") -> None:
        from gstbad_tpu.io import cea608
        if kind == "cdp":
            data, _fps = cea608.cdp_to_cc_data(bytes(data))
        elif kind == "s334-1a":
            data = cea608.s334_to_cc_data(bytes(data))
        elif kind != "cc-data":
            raise ValueError(f"ceaccoverlay: unknown kind {kind!r}")
        self._pending.append((int(pts_ns), bytes(data)))

    def negotiate(self, in_spec):
        require(in_spec.kind == "video"
                and in_spec.format == VideoFormat.AYUV,
                "ceaccoverlay: needs AYUV video (use videoconvert)")
        return in_spec

    def _render_snapshots(self, width: int, height: int):
        from gstbad_tpu.io.cea708 import render_overlay
        out = []
        for pts, data in sorted(self._pending, key=lambda t: t[0]):
            if self._decoder.feed_cc_data(data):
                out.append((pts, render_overlay(self._decoder, width,
                                                height)))
        return out

    def process(self, params, state, batch: FrameBatch):
        if self.props["silent"] or not self._pending:
            return state, batch
        out = batch.data
        b, h, w, _ = out.shape
        if not self._snapshots:
            self._snapshots = self._render_snapshots(w, h)
        for i, (pts, canvas) in enumerate(self._snapshots):
            ov = jnp.asarray(canvas)
            a = ov[..., 0].astype(jnp.int32)
            active = batch.pts >= pts
            if i + 1 < len(self._snapshots):
                active = active & (batch.pts < self._snapshots[i + 1][0])
            act = active[:, None, None, None]
            d = out.astype(jnp.int32)
            s = ov.astype(jnp.int32)
            blended = (d * (256 - a[None, ..., None])
                       + s * a[None, ..., None]) >> 8
            blended = blended.at[..., 0].set(d[..., 0])
            out = jnp.where(act & (a[None] > 0)[..., None],
                            blended.astype(jnp.uint8), out)
        return state, batch.with_data(out)
