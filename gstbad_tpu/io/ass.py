"""SSA/ASS subtitle support (ext/assrender/gstassrender.c).

The reference hands everything to libass: codec_data goes through
ass_process_codec_private, stream chunks through ass_process_chunk,
and the returned ASS_Image list is composited by the element's own
blit_bgra_premultiplied (gstassrender.c:679-744) — THAT math is
transcribed exactly here (k = src*alpha/255; first-touch writes k and
k*c/255; subsequent touches blend k + (255-k)*dst/255 into a
premultiplied BGRA buffer).

libass itself is absent; parse + layout are implemented from the SSA/
ASS format spec:
- [Script Info] PlayResX/PlayResY;
- [V4+ Styles] / [V4 Styles] Format-driven style lines (Fontsize,
  PrimaryColour/OutlineColour in &HAABBGGRR with inverted alpha,
  Bold/Italic flags, Alignment incl. the legacy SSA +4/+8 encoding,
  MarginL/R/V, Outline);
- [Events] Format-driven Dialogue lines (h:mm:ss.cc times) and
  Matroska ASS chunks ("ReadOrder,Layer,Style,Name,MarginL,MarginR,
  MarginV,Effect,Text" with buffer pts/duration, the
  ass_process_chunk shape);
- text handling: \\N and \\n line breaks, \\h hard space, override
  blocks {\\...} with \\an/\\a alignment and \\pos(x,y) honoured and
  every other tag stripped (documented divergence — libass implements
  the full tag machine);
- layout: numpad alignment 1-9 against PlayRes with margins, events
  stacked bottom-up for bottom alignments like libass' collision
  handling, glyphs from the framework's bitmap face with a 1-px
  outline in the outline colour (libass' FreeType rasterization is
  the documented divergence, same family as ttml/ceaccoverlay)."""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


def parse_ass_color(s: str) -> Tuple[int, int, int, int]:
    """&HAABBGGRR (alpha inverted: 00 = opaque) -> (r, g, b, a)."""
    s = s.strip().lstrip("&Hh").rstrip("&")
    try:
        v = int(s, 16)
    except ValueError:
        return (255, 255, 255, 255)
    b = (v >> 16) & 0xFF
    g = (v >> 8) & 0xFF
    r = v & 0xFF
    a = 255 - ((v >> 24) & 0xFF)
    return (r, g, b, a)


def parse_ass_time(s: str) -> int:
    """h:mm:ss.cc -> ns."""
    m = re.match(r"(\d+):(\d+):(\d+)[.:](\d+)", s.strip())
    if not m:
        return 0
    h, mi, sec, cs = (int(g) for g in m.groups())
    return ((h * 3600 + mi * 60 + sec) * 100 + cs) * 10 ** 7


@dataclass
class AssStyle:
    name: str = "Default"
    fontsize: float = 20.0
    primary: Tuple[int, int, int, int] = (255, 255, 255, 255)
    outline_color: Tuple[int, int, int, int] = (0, 0, 0, 255)
    back: Tuple[int, int, int, int] = (0, 0, 0, 128)
    bold: bool = False
    italic: bool = False
    outline: float = 2.0
    alignment: int = 2
    margin_l: int = 10
    margin_r: int = 10
    margin_v: int = 10


@dataclass
class AssEvent:
    start: int
    end: int
    style: str
    text: str
    margin_l: int = 0
    margin_r: int = 0
    margin_v: int = 0
    alignment_override: Optional[int] = None
    pos: Optional[Tuple[float, float]] = None
    read_order: int = -1


def _legacy_alignment(a: int) -> int:
    """SSA \\a codes: 1-3 bottom, +4 top (5-7), +8 mid (9-11)."""
    sub = a & 0x3
    if a & 0x4:
        return {1: 7, 2: 8, 3: 9}.get(sub, 8)
    if a & 0x8:
        return {1: 4, 2: 5, 3: 6}.get(sub, 5)
    return sub if sub else 2


def strip_override_tags(text: str
                        ) -> Tuple[str, Optional[int],
                                   Optional[Tuple[float, float]]]:
    """Remove {\\...} blocks, honouring \\an, \\a and \\pos."""
    align = None
    pos = None
    for block in re.findall(r"\{([^}]*)\}", text):
        m = re.search(r"\\an(\d)", block)
        if m:
            align = int(m.group(1))
        else:
            m = re.search(r"\\a(\d+)", block)
            if m:
                align = _legacy_alignment(int(m.group(1)))
        m = re.search(r"\\pos\(\s*([\d.]+)\s*,\s*([\d.]+)\s*\)", block)
        if m:
            pos = (float(m.group(1)), float(m.group(2)))
    text = re.sub(r"\{[^}]*\}", "", text)
    text = text.replace("\\N", "\n").replace("\\n", "\n")
    text = text.replace("\\h", "\u00a0")
    return text, align, pos


class AssTrack:
    """ass_track analog: headers via process_codec_private, events via
    process_chunk / full-script dialogue lines."""

    def __init__(self):
        self.play_res_x = 384
        self.play_res_y = 288
        self.styles: Dict[str, AssStyle] = {"Default": AssStyle()}
        self.events: List[AssEvent] = []
        self._style_format: Optional[List[str]] = None
        self._event_format: Optional[List[str]] = None

    # -- header / script parsing -------------------------------------------

    def process_codec_private(self, data: str) -> None:
        self.process_script(data, events=False)

    def process_script(self, data: str, events: bool = True) -> None:
        section = ""
        for raw in data.splitlines():
            line = raw.strip().lstrip("\ufeff")
            if not line or line.startswith(";"):
                continue
            if line.startswith("["):
                section = line.strip("[]").lower()
                continue
            key, _, value = line.partition(":")
            key = key.strip()
            value = value.strip()
            if section == "script info":
                if key == "PlayResX":
                    self.play_res_x = int(float(value))
                elif key == "PlayResY":
                    self.play_res_y = int(float(value))
            elif section in ("v4+ styles", "v4 styles"):
                if key == "Format":
                    self._style_format = [f.strip() for f in
                                          value.split(",")]
                elif key == "Style" and self._style_format:
                    self._add_style(value, section == "v4 styles")
            elif section == "events":
                if key == "Format":
                    self._event_format = [f.strip() for f in
                                          value.split(",")]
                elif key == "Dialogue" and events and self._event_format:
                    self._add_dialogue(value)

    def _add_style(self, value: str, legacy: bool) -> None:
        fields = value.split(",", len(self._style_format) - 1)
        d = {k: v.strip() for k, v in zip(self._style_format, fields)}
        st = AssStyle(name=d.get("Name", "Default"))
        if "Fontsize" in d:
            st.fontsize = float(d["Fontsize"])
        if "PrimaryColour" in d:
            st.primary = parse_ass_color(d["PrimaryColour"])
        if "OutlineColour" in d:
            st.outline_color = parse_ass_color(d["OutlineColour"])
        elif "TertiaryColour" in d:                  # SSA name
            st.outline_color = parse_ass_color(d["TertiaryColour"])
        if "BackColour" in d:
            st.back = parse_ass_color(d["BackColour"])
        if "Bold" in d:
            st.bold = d["Bold"] not in ("0", "")
        if "Italic" in d:
            st.italic = d["Italic"] not in ("0", "")
        if "Outline" in d:
            try:
                st.outline = float(d["Outline"])
            except ValueError:
                pass
        if "Alignment" in d:
            a = int(float(d["Alignment"]))
            st.alignment = _legacy_alignment(a) if legacy else a
        for key, attr in (("MarginL", "margin_l"), ("MarginR",
                          "margin_r"), ("MarginV", "margin_v")):
            if key in d:
                try:
                    setattr(st, attr, int(float(d[key])))
                except ValueError:
                    pass
        self.styles[st.name] = st

    def _add_dialogue(self, value: str) -> None:
        fields = value.split(",", len(self._event_format) - 1)
        d = {k: v for k, v in zip(self._event_format, fields)}
        text, align, pos = strip_override_tags(d.get("Text", ""))
        self.events.append(AssEvent(
            start=parse_ass_time(d.get("Start", "0:00:00.00")),
            end=parse_ass_time(d.get("End", "0:00:00.00")),
            style=d.get("Style", "Default").strip(),
            text=text,
            margin_l=int(float(d.get("MarginL", "0") or 0)),
            margin_r=int(float(d.get("MarginR", "0") or 0)),
            margin_v=int(float(d.get("MarginV", "0") or 0)),
            alignment_override=align, pos=pos))

    def process_chunk(self, data: str, pts_ns: int,
                      duration_ns: int) -> None:
        """Matroska ASS chunk: ReadOrder,Layer,Style,Name,MarginL,
        MarginR,MarginV,Effect,Text (ass_process_chunk analog;
        duplicate ReadOrders are dropped like libass)."""
        fields = data.split(",", 8)
        if len(fields) < 9:
            return
        read_order = int(fields[0] or 0)
        if any(e.read_order == read_order for e in self.events):
            return
        text, align, pos = strip_override_tags(fields[8])
        self.events.append(AssEvent(
            start=pts_ns, end=pts_ns + duration_ns,
            style=fields[2].strip(), text=text,
            margin_l=int(fields[4] or 0), margin_r=int(fields[5] or 0),
            margin_v=int(fields[6] or 0),
            alignment_override=align, pos=pos,
            read_order=read_order))


# -- rendering --------------------------------------------------------------

def _glyph(ch: int, h: int, w: int) -> np.ndarray:
    from gstbad_tpu.io.ttml import _glyph as g
    return g(ch, h, w)


def render_events(track: AssTrack, time_ns: int, width: int,
                  height: int) -> List[dict]:
    """ASS_Image-list analog: [{'bitmap': [h, w] u8, 'dst_x', 'dst_y',
    'color': 0xRRGGBBAA with INVERTED alpha byte like libass}] for the
    events active at @time_ns."""
    images = []
    sx = width / track.play_res_x
    sy = height / track.play_res_y
    bottom_stack = height
    for ev in track.events:
        if not (ev.start <= time_ns < ev.end):
            continue
        style = track.styles.get(ev.style,
                                 track.styles.get("Default",
                                                  AssStyle()))
        align = ev.alignment_override or style.alignment
        ml = (ev.margin_l or style.margin_l) * sx
        mr = (ev.margin_r or style.margin_r) * sx
        mv = (ev.margin_v or style.margin_v) * sy
        font_h = max(4, int(style.fontsize * sy))
        char_w = max(2, int(font_h * 14 / 26))
        lines = ev.text.split("\n")
        text_h = len(lines) * font_h
        bitmaps = []
        for li, line in enumerate(lines):
            lw = len(line) * char_w
            bm = np.zeros((font_h, max(1, lw)), np.uint8)
            for ci, ch in enumerate(line):
                if ch == "\u00a0":
                    continue
                g = _glyph(ord(ch) if ord(ch) < 128 else ord("?"),
                           font_h, char_w)
                bm[:, ci * char_w:(ci + 1) * char_w] = \
                    np.where(g, 255, 0)
            bitmaps.append(bm)
        max_w = max(bm.shape[1] for bm in bitmaps)
        if ev.pos is not None:
            x0 = ev.pos[0] * sx - max_w / 2
            y0 = ev.pos[1] * sy - text_h
        else:
            col = (align - 1) % 3            # 0 left, 1 center, 2 right
            rowp = (align - 1) // 3          # 0 bottom, 1 mid, 2 top
            if col == 0:
                x0 = ml
            elif col == 1:
                x0 = (width - max_w) / 2
            else:
                x0 = width - mr - max_w
            if rowp == 2:
                y0 = mv
            elif rowp == 1:
                y0 = (height - text_h) / 2
            else:
                y0 = bottom_stack - mv - text_h
                bottom_stack = y0
        for li, bm in enumerate(bitmaps):
            lw = bm.shape[1]
            col = (align - 1) % 3
            if col == 1:
                lx = x0 + (max_w - lw) / 2
            elif col == 2:
                lx = x0 + (max_w - lw)
            else:
                lx = x0
            ly = y0 + li * font_h
            if style.outline > 0:
                grown = np.zeros((bm.shape[0] + 2, lw + 2), np.uint8)
                for dy in (0, 1, 2):
                    for dx in (0, 1, 2):
                        np.maximum(grown[dy:dy + bm.shape[0],
                                         dx:dx + lw], bm, grown[
                                   dy:dy + bm.shape[0], dx:dx + lw])
                oc = style.outline_color
                images.append({
                    "bitmap": grown, "dst_x": int(lx) - 1,
                    "dst_y": int(ly) - 1,
                    "color": (oc[0] << 24) | (oc[1] << 16)
                    | (oc[2] << 8) | (255 - oc[3])})
            pc = style.primary
            images.append({
                "bitmap": bm, "dst_x": int(lx), "dst_y": int(ly),
                "color": (pc[0] << 24) | (pc[1] << 16) | (pc[2] << 8)
                | (255 - pc[3])})
    return images


def blit_bgra_premultiplied(images: List[dict], width: int,
                            height: int) -> np.ndarray:
    """gstassrender.c:679-744 transcribed: premultiplied BGRA
    composite of the image list; returns [height, width, 4] u8 in
    B,G,R,A byte order."""
    data = np.zeros((height, width, 4), np.uint8)
    for im in images:
        dst_x, dst_y = im["dst_x"], im["dst_y"]
        bm = im["bitmap"]
        src_y0 = max(0, -dst_y)
        src_x0 = max(0, -dst_x)
        dst_y0 = max(0, dst_y)
        dst_x0 = max(0, dst_x)
        w = min(bm.shape[1] - src_x0, width - dst_x0)
        h = min(bm.shape[0] - src_y0, height - dst_y0)
        if w <= 0 or h <= 0:
            continue
        alpha = 255 - (im["color"] & 0xFF)
        if not alpha:
            continue
        r = (im["color"] >> 24) & 0xFF
        g = (im["color"] >> 16) & 0xFF
        b = (im["color"] >> 8) & 0xFF
        src = bm[src_y0:src_y0 + h, src_x0:src_x0 + w].astype(np.int32)
        dst = data[dst_y0:dst_y0 + h, dst_x0:dst_x0 + w].astype(np.int32)
        k = src * alpha // 255
        on = src > 0
        first = on & (dst[..., 3] == 0)
        blend = on & ~first
        for ch, c in ((3, None), (2, r), (1, g), (0, b)):
            if c is None:
                dst[..., 3] = np.where(
                    first, k, np.where(
                        blend, k + (255 - k) * dst[..., 3] // 255,
                        dst[..., 3]))
            else:
                dst[..., ch] = np.where(
                    first, k * c // 255, np.where(
                        blend, (k * c + (255 - k) * dst[..., ch]) // 255,
                        dst[..., ch]))
        data[dst_y0:dst_y0 + h, dst_x0:dst_x0 + w] = \
            dst.astype(np.uint8)
    return data
