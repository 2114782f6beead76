"""Kate subtitle/overlay stream codec (ext/kate/): native transcription.

The reference wraps libkate (absent from this environment), so the wire
format here is pinned by the only in-tree spec: the canned packets in
/root/reference/tests/check/elements/kate.c:30-73 (ID header, comment
header, text data packet, EOS packet) plus the byte offsets the
reference itself pokes (gstkatetag.c:282-310 rewrites language at 32,
category at 48, canvas sizes at 16/18 with the (base<<4)|shift packing
of gstkatetag.c:240-261).

ID header (0x80), 64 bytes, all integers little-endian
(kate.c:30-35 vector):
  [0]      packet type 0x80
  [1:9]    magic "kate\\0\\0\\0\\0"
  [9]      bitstream version major (0)
  [10]     bitstream version minor (1)
  [11]     number of headers (9)
  [12]     text encoding       (0 = UTF-8)
  [13]     text directionality (0 = L2R_T2B)
  [14]     default text markup type (0 = none; field position inferred,
           the vector carries 0 and gstkateutil.c:343-352 needs a markup
           type in the ID header to pick utf8 vs pango-markup caps)
  [15]     granule shift (32)
  [16:18]  original canvas width,  u16: (base << 4) | shift, size=base<<shift
  [18:20]  original canvas height, same packing (gstkatetag.c:240-261)
  [20:24]  reserved (0)
  [24:28]  granule rate numerator   (1000)
  [28:32]  granule rate denominator (1)
  [32:48]  language, NUL-terminated, max 15 chars (gstkatetag.c:295)
  [48:64]  category, NUL-terminated, max 15 chars (gstkatetag.c:300)

Comment header (0x81): type + magic, then a vorbiscomment block
(u32 vendor length, vendor, u32 count, then per comment u32 length +
"KEY=value"), no framing byte (kate.c:37-42 vector).

Auxiliary headers 0x82..0x88 (regions, styles, curves, motions,
palettes, bitmaps, fonts): the reference encoder never populates these
(gstkateenc.c sets no styles/regions); serialized as type + magic +
u32 count=0.  The parser accepts any payload (the upstream unit test
feeds truncated 10/11-byte variants, kate.c:44-49).

Text data packet (0x00), pinned by the kate.c:51-56 vector
(45 bytes = 1 + 3*8 + 4 + 14 + 2):
  [0]     packet type 0x00
  [1:9]   i64 start, granule-rate units (1000 = 1.0 s at 1000/1)
  [9:17]  i64 duration, granule-rate units
  [17:25] i64 backlink (0)
  [25:29] u32 text length
  text bytes
  u8 flags   -- 0x08 in the vector
  then flag-gated sections, in bit order:
    0x01 region   (u8 metric + 4*i32 x,y,w,h)
    0x02 palette  (u32 ncolors + 4 bytes RGBA each)
    0x04 bitmap   (u32 w + u32 h + u8 bpp + w*h palette indices)
    0x08 markup type (u8; 0x00 = none in the vector)
The region/palette/bitmap layouts are repo-defined (this module writes
and reads both ends; libkate's sub-byte packing is not recoverable from
the in-tree vectors) -- the flag byte and the markup tail match the
upstream vector bit-for-bit, so upstream-canned packets decode exactly.

EOS packet: the single byte 0x7f (kate.c:58-60).

Granule math (gstkateenc.c:1122-1131, gstkateparse.c:249-266):
  granpos = (base << granule_shift) | offset
  time(granpos) = (base + offset) * gps_denominator / gps_numerator
  duration_granule(t) = floor(t * gps_numerator / gps_denominator + 0.5)

The SPU (DVD subpicture) bridge transcribes gstkatespu.c: decode_spu
(gstkatespu.c:473-640) turns a DVD SPU packet into a paletted kate
bitmap + 4-colour palette + region (with the reference's crop, RLE
overflow clearing and yuv2rgb float path); encode_spu
(gstkatespu.c:703-915) re-emits a DVD SPU from a kate event (two-pass
interlaced RLE, SET_COLOR/SET_ALPHA/SET_DAREA/DSPXA/DSP command
sequence, STP_DSP delay chunk).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional, Tuple

import numpy as np

MAGIC = b"kate\x00\x00\x00\x00"
NUM_HEADERS = 9
EOS_PACKET = b"\x7f"
EOS_TYPE = 0x7F
TEXT_TYPE = 0x00
KEEPALIVE_TYPE = 0x01
VENDOR = "gstbad_tpu kate"

MARKUP_NONE = 0
MARKUP_SIMPLE = 1  # pango-ish simple markup (kate_markup_simple)

FLAG_REGION = 0x01
FLAG_PALETTE = 0x02
FLAG_BITMAP = 0x04
FLAG_MARKUP = 0x08

METRIC_PIXEL = 0
METRIC_MILLIONTHS = 1


class KateError(ValueError):
    """Raised on malformed Kate packets (maps to GST_FLOW_ERROR)."""


def encode_canvas_size(size: int) -> int:
    """(base << 4) | shift packing — gstkatetag.c:240-261 exactly,
    including the return-0 when low bits would be lost."""
    base = size
    shift = 0
    while base & ~((1 << 12) - 1):
        if (size >> shift) & 1:
            return 0
        shift += 1
        base >>= 1
    if shift >= 16:
        return 0
    return ((base << 4) | shift) & 0xFFFF


def decode_canvas_size(packed: int) -> int:
    return (packed >> 4) << (packed & 0x0F)


@dataclass
class KateInfo:
    """kate_info analog (the fields the reference elements touch)."""

    bitstream_version_major: int = 0
    bitstream_version_minor: int = 1
    num_headers: int = NUM_HEADERS
    text_encoding: int = 0          # UTF-8
    text_directionality: int = 0    # L2R, T2B
    text_markup_type: int = MARKUP_NONE
    granule_shift: int = 32
    original_canvas_width: int = 0
    original_canvas_height: int = 0
    gps_numerator: int = 1000
    gps_denominator: int = 1
    language: str = ""
    category: str = ""

    def granule_time(self, granpos: int) -> float:
        """kate_granule_time: seconds for a granulepos."""
        if granpos < 0:
            return -1.0
        base = granpos >> self.granule_shift
        offset = granpos & ((1 << self.granule_shift) - 1)
        return (base + offset) * self.gps_denominator / self.gps_numerator

    def duration_granule(self, seconds: float) -> int:
        """kate_duration_granule: granule count for a duration."""
        return int(seconds * self.gps_numerator / self.gps_denominator + 0.5)


def serialize_id_header(info: KateInfo) -> bytes:
    out = bytearray(64)
    out[0] = 0x80
    out[1:9] = MAGIC
    out[9] = info.bitstream_version_major
    out[10] = info.bitstream_version_minor
    out[11] = info.num_headers
    out[12] = info.text_encoding
    out[13] = info.text_directionality
    out[14] = info.text_markup_type
    out[15] = info.granule_shift
    struct.pack_into("<HH", out, 16,
                     encode_canvas_size(info.original_canvas_width),
                     encode_canvas_size(info.original_canvas_height))
    struct.pack_into("<II", out, 24, info.gps_numerator,
                     info.gps_denominator)
    out[32:32 + min(15, len(info.language))] = \
        info.language.encode()[:15]
    out[48:48 + min(15, len(info.category))] = \
        info.category.encode()[:15]
    return bytes(out)


def parse_id_header(data: bytes) -> KateInfo:
    if len(data) < 64 or data[0] != 0x80 or data[1:9] != MAGIC:
        raise KateError("not a Kate ID header")
    cw, ch = struct.unpack_from("<HH", data, 16)
    num, den = struct.unpack_from("<II", data, 24)
    if num == 0 or den == 0:
        raise KateError("zero granule rate")

    def _str(off: int) -> str:
        raw = data[off:off + 16]
        return raw.split(b"\x00", 1)[0].decode("utf-8", "replace")

    return KateInfo(
        bitstream_version_major=data[9], bitstream_version_minor=data[10],
        num_headers=data[11], text_encoding=data[12],
        text_directionality=data[13], text_markup_type=data[14],
        granule_shift=data[15],
        original_canvas_width=decode_canvas_size(cw),
        original_canvas_height=decode_canvas_size(ch),
        gps_numerator=num, gps_denominator=den,
        language=_str(32), category=_str(48))


def serialize_comment_header(vendor: str,
                             comments: List[str]) -> bytes:
    out = bytearray()
    out.append(0x81)
    out += MAGIC
    v = vendor.encode()
    out += struct.pack("<I", len(v)) + v
    out += struct.pack("<I", len(comments))
    for c in comments:
        b = c.encode()
        out += struct.pack("<I", len(b)) + b
    return bytes(out)


def parse_comment_header(data: bytes) -> Tuple[str, List[str]]:
    if len(data) < 13 or data[0] != 0x81 or data[1:9] != MAGIC:
        raise KateError("not a Kate comment header")
    pos = 9
    (vlen,) = struct.unpack_from("<I", data, pos)
    pos += 4
    if pos + vlen + 4 > len(data):
        raise KateError("truncated Kate comment header")
    vendor = data[pos:pos + vlen].decode("utf-8", "replace")
    pos += vlen
    (count,) = struct.unpack_from("<I", data, pos)
    pos += 4
    comments = []
    for _ in range(count):
        if pos + 4 > len(data):
            break
        (clen,) = struct.unpack_from("<I", data, pos)
        pos += 4
        comments.append(data[pos:pos + clen].decode("utf-8", "replace"))
        pos += clen
    return vendor, comments


def serialize_aux_header(header_type: int) -> bytes:
    """Headers 0x82..0x88: empty definition lists."""
    return bytes([header_type]) + MAGIC + struct.pack("<I", 0)


def is_header(packet: bytes) -> bool:
    """gstkateutil.c:298: a packet is a header iff byte0 has bit 7."""
    return len(packet) > 0 and bool(packet[0] & 0x80)


def check_header_magic(packet: bytes) -> bool:
    """Tolerant check used by parse/tag passthrough: the upstream test
    pushes truncated aux headers (kate.c:44-49) that still begin with
    type + at least the start of the magic."""
    return (len(packet) >= 9 and bool(packet[0] & 0x80)
            and packet[1:9] == MAGIC) or (
        len(packet) >= 2 and bool(packet[0] & 0x80)
        and MAGIC.startswith(packet[1:min(len(packet), 9)]))


@dataclass
class KateRegion:
    metric: int = METRIC_PIXEL
    x: int = 0
    y: int = 0
    w: int = 0
    h: int = 0


@dataclass
class KatePalette:
    colors: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 4), np.uint8))  # RGBA rows


@dataclass
class KateBitmap:
    width: int = 0
    height: int = 0
    bpp: int = 2
    pixels: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 0), np.uint8))


@dataclass
class KateEvent:
    """kate_event analog: what a decoded data packet carries."""

    start_time: float = 0.0
    end_time: float = 0.0
    backlink: int = 0
    text: str = ""
    text_markup_type: int = MARKUP_NONE
    region: Optional[KateRegion] = None
    palette: Optional[KatePalette] = None
    bitmap: Optional[KateBitmap] = None
    ki: Optional[KateInfo] = None


def serialize_text_packet(info: KateInfo, t0: float, t1: float,
                          text: bytes, markup_type: int = MARKUP_NONE,
                          region: Optional[KateRegion] = None,
                          palette: Optional[KatePalette] = None,
                          bitmap: Optional[KateBitmap] = None,
                          backlink: int = 0) -> bytes:
    start = info.duration_granule(t0)
    duration = info.duration_granule(t1 - t0)
    out = bytearray()
    out.append(TEXT_TYPE)
    out += struct.pack("<qqq", start, duration, backlink)
    out += struct.pack("<I", len(text)) + text
    flags = FLAG_MARKUP
    if region is not None:
        flags |= FLAG_REGION
    if palette is not None:
        flags |= FLAG_PALETTE
    if bitmap is not None:
        flags |= FLAG_BITMAP
    out.append(flags)
    if region is not None:
        out += struct.pack("<Biiii", region.metric, region.x, region.y,
                           region.w, region.h)
    if palette is not None:
        cols = np.asarray(palette.colors, np.uint8)
        out += struct.pack("<I", cols.shape[0]) + cols.tobytes()
    if bitmap is not None:
        px = np.asarray(bitmap.pixels, np.uint8)
        out += struct.pack("<IIB", bitmap.width, bitmap.height, bitmap.bpp)
        out += px.tobytes()
    out.append(markup_type)
    return bytes(out)


def parse_text_packet(info: KateInfo, data: bytes) -> KateEvent:
    if len(data) < 30 or data[0] != TEXT_TYPE:
        raise KateError("not a Kate text packet")
    try:
        return _parse_text_packet(info, data)
    except (struct.error, IndexError) as e:
        raise KateError(f"truncated Kate text packet: {e}")


def _parse_text_packet(info: KateInfo, data: bytes) -> KateEvent:
    start, duration, backlink = struct.unpack_from("<qqq", data, 1)
    (tlen,) = struct.unpack_from("<I", data, 25)
    pos = 29
    if pos + tlen > len(data):
        raise KateError("text length out of range")
    text = data[pos:pos + tlen].decode("utf-8", "replace")
    pos += tlen
    ev = KateEvent(
        start_time=start * info.gps_denominator / info.gps_numerator,
        end_time=(start + duration)
        * info.gps_denominator / info.gps_numerator,
        backlink=backlink, text=text, ki=info)
    if pos >= len(data):
        return ev
    flags = data[pos]
    pos += 1
    if flags & FLAG_REGION:
        metric, x, y, w, h = struct.unpack_from("<Biiii", data, pos)
        pos += 17
        ev.region = KateRegion(metric, x, y, w, h)
    if flags & FLAG_PALETTE:
        (ncolors,) = struct.unpack_from("<I", data, pos)
        pos += 4
        cols = np.frombuffer(data[pos:pos + 4 * ncolors],
                             np.uint8).reshape(ncolors, 4).copy()
        pos += 4 * ncolors
        ev.palette = KatePalette(cols)
    if flags & FLAG_BITMAP:
        w, h, bpp = struct.unpack_from("<IIB", data, pos)
        pos += 9
        px = np.frombuffer(data[pos:pos + w * h],
                           np.uint8).reshape(h, w).copy()
        pos += w * h
        ev.bitmap = KateBitmap(w, h, bpp, px)
    if flags & FLAG_MARKUP and pos < len(data):
        ev.text_markup_type = data[pos]
        pos += 1
    return ev


def serialize_keepalive(info: KateInfo, t: float) -> bytes:
    return bytes([KEEPALIVE_TYPE]) + struct.pack(
        "<q", info.duration_granule(t))


def remove_markup(text: str) -> str:
    """kate_text_remove_markup: strip <...> tag spans (libkate's simple
    markup model has no entities beyond tags)."""
    out = []
    depth = 0
    for ch in text:
        if ch == "<":
            depth += 1
        elif ch == ">" and depth:
            depth -= 1
        elif not depth:
            out.append(ch)
    return "".join(out)


class KateEncoder:
    """kate_encode_* surface (what gstkateenc.c calls)."""

    def __init__(self, info: KateInfo, comments: List[str] = (),
                 vendor: str = VENDOR):
        self.info = replace(info)
        self.comments = list(comments)
        self.vendor = vendor
        self._granpos = 0
        self._eos = False

    def encode_headers(self) -> List[bytes]:
        """The 9 header packets (gstkateenc.c:608-627 loop)."""
        packets = [serialize_id_header(self.info),
                   serialize_comment_header(self.vendor, self.comments)]
        for t in range(0x82, 0x82 + NUM_HEADERS - 2):
            packets.append(serialize_aux_header(t))
        return packets

    def encode_text(self, t0: float, t1: float, text: bytes,
                    markup_type: int = MARKUP_NONE,
                    region: Optional[KateRegion] = None,
                    palette: Optional[KatePalette] = None,
                    bitmap: Optional[KateBitmap] = None) -> bytes:
        if self._eos:
            raise KateError("stream already finished")
        if t1 < t0:
            raise KateError("end time before start time")
        pkt = serialize_text_packet(self.info, t0, t1, text, markup_type,
                                    region, palette, bitmap)
        self._granpos = (self.info.duration_granule(t0)
                         << self.info.granule_shift)
        return pkt

    def encode_keepalive(self, t: float) -> bytes:
        if self._eos:
            raise KateError("stream already finished")
        pkt = serialize_keepalive(self.info, t)
        self._granpos = (self.info.duration_granule(t)
                         << self.info.granule_shift)
        return pkt

    def encode_finish(self) -> bytes:
        """kate_encode_finish(-1): the 1-byte EOS packet."""
        self._eos = True
        return EOS_PACKET

    def get_granule(self) -> int:
        """kate_encode_get_granule: granulepos of the last packet."""
        return self._granpos


class KateDecoder:
    """kate_high_decode_* surface (what gstkateutil.c calls).

    packetin returns:
      ("header", header_type)  for header packets
      ("event", KateEvent)     for text packets
      ("keepalive", None)      for keepalives
      ("eos", None)            for the EOS packet
    and raises KateError on garbage (-> GST_FLOW_ERROR,
    test_kate_empty_identification_header)."""

    def __init__(self):
        self.info: Optional[KateInfo] = None
        self.vendor: Optional[str] = None
        self.comments: List[str] = []
        self.headers_seen = 0
        self.headers_complete = False
        self.saw_eos = False

    def packetin(self, packet: bytes):
        if len(packet) == 0:
            raise KateError("empty packet")
        t = packet[0]
        if t & 0x80:
            return self._headerin(packet)
        if not self.headers_complete and self.info is None:
            raise KateError("data packet before headers")
        if t == EOS_TYPE:
            self.saw_eos = True
            return ("eos", None)
        if t == TEXT_TYPE:
            return ("event", parse_text_packet(self.info, packet))
        if t == KEEPALIVE_TYPE:
            return ("keepalive", None)
        raise KateError(f"unknown packet type {t:#x}")

    def _headerin(self, packet: bytes):
        t = packet[0]
        if t == 0x80:
            self.info = parse_id_header(packet)
        elif t == 0x81:
            if self.info is None:
                raise KateError("comment header before ID header")
            self.vendor, self.comments = parse_comment_header(packet)
        else:
            if self.info is None:
                raise KateError("auxiliary header before ID header")
            if not check_header_magic(packet):
                raise KateError("bad auxiliary header magic")
        self.headers_seen += 1
        if self.info is not None \
                and self.headers_seen >= self.info.num_headers:
            self.headers_complete = True
        return ("header", t)


# ----------------------------------------------------------------------
# DVD SPU bridge (gstkatespu.c)

SPU_CMD_FSTA_DSP = 0x00
SPU_CMD_DSP = 0x01
SPU_CMD_STP_DSP = 0x02
SPU_CMD_SET_COLOR = 0x03
SPU_CMD_SET_ALPHA = 0x04
SPU_CMD_SET_DAREA = 0x05
SPU_CMD_DSPXA = 0x06
SPU_CMD_CHG_COLCON = 0x07
SPU_CMD_END = 0xFF

MAX_SPU_SIZE = 53220

# gstkatespu.c:35-40
DEFAULT_CLUT = [0xB48080, 0x248080, 0x628080, 0xD78080] + [0x808080] * 12

NSEC = 1_000_000_000
MSEC = 1_000_000


def stm_to_ns(stm: int) -> int:
    """GST_KATE_STM_TO_GST (gstkatespu.h:33)."""
    return (MSEC * 1024 * stm) // 90


def ns_to_stm(ns: int) -> int:
    """GST_KATE_GST_TO_STM (gstkatespu.h:34)."""
    return int((ns * 90000) // 1024 // NSEC)


def _clamp8(v: float) -> int:
    return 0 if v < 0 else (255 if v > 255 else int(v))


def _yuv2rgb(y: int, u: int, v: int) -> Tuple[int, int, int]:
    """gstkatespu.c:405-425 (the live #else branch)."""
    y = (y - 16) * 255 // 219
    u = (u - 128) * 255 // 224
    v = (v - 128) * 255 // 224
    return (_clamp8(y + 1.402 * v),
            _clamp8(y - 0.34414 * u - 0.71414 * v),
            _clamp8(y + 1.772 * u))


def _rgb2yuv(r: int, g: int, b: int) -> Tuple[int, int, int]:
    """gstkatespu.c:655-663."""
    y = _clamp8(r * 0.299 * 219 / 255 + g * 0.587 * 219 / 255
                + b * 0.114 * 219 / 255 + 16)
    u = _clamp8(-r * 0.16874 * 224 / 255 - g * 0.33126 * 224 / 255
                + b * 0.5 * 224 / 255 + 128)
    v = _clamp8(r * 0.5 * 224 / 255 - g * 0.41869 * 224 / 255
                - b * 0.08131 * 224 / 255 + 128)
    return y, u, v


class _SpuState:
    def __init__(self):
        self.colormap = [0, 0, 0, 0]
        self.alpha = [0, 0, 0, 0]
        self.top = self.left = 1
        self.bottom = self.right = 0
        self.pix_data = [0, 0]
        self.show_time = 0
        self.hide_time = 0


def _decode_colcon(ptr: bytes) -> int:
    """gstkatespu.c:81-137: skip a CHG_COLCON payload, returning the
    number of bytes consumed."""
    if len(ptr) < 2:
        return 0
    nbytes = struct.unpack_from(">H", ptr, 0)[0]
    if nbytes < 2 or nbytes > len(ptr):
        return 0
    pos, left = 2, nbytes - 2
    while left > 0:
        if left < 4:
            break
        entry = struct.unpack_from(">I", ptr, pos)[0]
        nchanges = min(max(ptr[pos + 2] >> 4, 1), 8)
        pos += 4
        left -= 4
        if entry == 0x0FFFFFFF:
            break
        sz = 6 * nchanges
        if sz > left:
            break
        pos += sz
        left -= sz
    return nbytes - left


def _decode_command_sequence(data: bytes, offset: int,
                             st: _SpuState) -> None:
    """gstkatespu.c:278-395."""
    seen = set()
    while True:
        if offset >= len(data) or offset in seen:
            raise KateError("SPU command sequence offset out of range")
        seen.add(offset)
        pos = offset
        if pos + 4 > len(data):
            raise KateError("truncated SPU command header")
        date = struct.unpack_from(">H", data, pos)[0]
        next_seq = struct.unpack_from(">H", data, pos + 2)[0]
        pos += 4
        while pos < len(data):
            cmd = data[pos]
            pos += 1
            if cmd == SPU_CMD_FSTA_DSP:
                pass
            elif cmd == SPU_CMD_DSP:
                st.show_time = date
            elif cmd == SPU_CMD_STP_DSP:
                st.hide_time = date
            elif cmd == SPU_CMD_SET_COLOR:
                st.colormap = [data[pos + 1] & 0x0F, data[pos + 1] >> 4,
                               data[pos] & 0x0F, data[pos] >> 4]
                pos += 2
            elif cmd == SPU_CMD_SET_ALPHA:
                st.alpha = [data[pos + 1] & 0x0F, data[pos + 1] >> 4,
                            data[pos] & 0x0F, data[pos] >> 4]
                pos += 2
            elif cmd == SPU_CMD_SET_DAREA:
                b = data[pos:pos + 6]
                st.left = (b[0] << 4) | (b[1] >> 4)
                st.right = ((b[1] & 0x0F) << 8) | b[2]
                st.top = (b[3] << 4) | (b[4] >> 4)
                st.bottom = ((b[4] & 0x0F) << 8) | b[5]
                pos += 6
            elif cmd == SPU_CMD_DSPXA:
                st.pix_data = [struct.unpack_from(">H", data, pos)[0],
                               struct.unpack_from(">H", data, pos + 2)[0]]
                pos += 4
            elif cmd == SPU_CMD_CHG_COLCON:
                consumed = _decode_colcon(data[pos:])
                if consumed == 0:
                    raise KateError("bad CHG_COLCON payload")
                pos += consumed
            elif cmd == SPU_CMD_END:
                if next_seq != offset:
                    offset = next_seq
                    break
                return
            else:
                raise KateError(f"invalid SPU command {cmd}")
        else:
            raise KateError("SPU sequence ran off the end")


def _get_rle_code(nybbles: bytes, state: List[int]) -> int:
    """gstkatespu.c:157-173."""
    def nyb() -> int:
        off = state[0]
        b = nybbles[off // 2]
        state[0] = off + 1
        return (b & 0x0F) if (off & 1) else (b >> 4)

    code = nyb()
    if code < 0x4:
        code = (code << 4) | nyb()
        if code < 0x10:
            code = (code << 4) | nyb()
            if code < 0x40:
                code = (code << 4) | nyb()
    return code


def spu_decode(data: bytes, clut: List[int],
               canvas_w: int = 0, canvas_h: int = 0
               ) -> Tuple[Optional[KateRegion], Optional[KateBitmap],
                          Optional[KatePalette], int, int]:
    """gst_kate_spu_decode_spu (gstkatespu.c:473-640): DVD SPU packet ->
    (region, bitmap, palette, show_stm, hide_stm).  Returns an empty
    (width 0) bitmap for wholly transparent SPUs, like the reference."""
    if len(data) < 4:
        raise KateError("SPU too short")
    packet_size = struct.unpack_from(">H", data, 0)[0]
    next_seq = struct.unpack_from(">H", data, 2)[0]
    st = _SpuState()
    _decode_command_sequence(data, next_seq, st)

    if (st.right - st.left < 0 or st.bottom - st.top < 0
            or st.pix_data[0] == 0 or st.pix_data[1] == 0):
        return None, KateBitmap(0, 0), None, st.show_time, st.hide_time

    # palette (gstkatespu.c:427-471)
    cols = np.zeros((4, 4), np.uint8)
    for n in range(4):
        color = clut[st.colormap[n]]
        y = (color >> 16) & 0xFF
        v = (color >> 8) & 0xFF
        u = color & 0xFF
        r, g, b = _yuv2rgb(y, u, v)
        cols[n] = (r, g, b, st.alpha[n] * 17)
    palette = KatePalette(cols)

    width = st.right - st.left + 1
    height = st.bottom - st.top + 1
    pixels = np.zeros((height, width), np.uint8)
    offs = [[0], [0]]
    maxn = [2 * (packet_size - st.pix_data[0]),
            2 * (packet_size - st.pix_data[1])]
    for y in range(height):
        f = y & 1
        offs[f][0] = (offs[f][0] + 1) & ~1  # GST_ROUND_UP_2
        nybbles = data[st.pix_data[f]:]
        x = 0
        while x < width:
            if offs[f][0] >= maxn[f]:
                break  # RLE overflow: remainder stays zero
            code = _get_rle_code(nybbles, offs[f])
            if code == 0:
                break  # rest of line is zero
            npix = min(code >> 2, width - x)
            pixels[y, x:x + npix] = code & 3
            x += npix

    # crop (gstkatespu.c:175-260); zero = colour 0
    x0, y0 = st.left, st.top
    rows = np.any(pixels != 0, axis=1)
    colsny = np.any(pixels != 0, axis=0)
    if rows.any():
        top = int(np.argmax(rows))
        bottom = int(len(rows) - 1 - np.argmax(rows[::-1]))
        left = int(np.argmax(colsny))
        right = int(len(colsny) - 1 - np.argmax(colsny[::-1]))
    else:
        # fully zero bitmap: the reference crop walks top past bottom and
        # produces height 0, which kateenc then treats as invisible
        # (gstkateenc.c:825-830)
        return (None, KateBitmap(width, 0, 2,
                                 np.zeros((0, width), np.uint8)),
                palette, st.show_time, st.hide_time)
    pixels = pixels[top:bottom + 1, left:right + 1]
    x0 += left
    y0 += top
    h, w = pixels.shape

    bitmap = KateBitmap(w, h, 2, pixels)
    if canvas_w > 0 and canvas_h > 0:
        region = KateRegion(METRIC_MILLIONTHS,
                            1000000 * x0 // canvas_w,
                            1000000 * y0 // canvas_h,
                            1000000 * w // canvas_w,
                            1000000 * h // canvas_h)
    else:
        region = KateRegion(METRIC_PIXEL, x0, y0, w, h)
    return region, bitmap, palette, st.show_time, st.hide_time


def spu_encode(ev: KateEvent) -> Tuple[Optional[bytes],
                                       Optional[Dict[str, int]]]:
    """gst_kate_spu_encode_spu (gstkatespu.c:703-915): kate event ->
    (DVD SPU bytes, dvd-spu-clut-change event fields) or (None, None)."""
    if ev.region is None or ev.bitmap is None or ev.palette is None:
        return None, None
    kb, kp = ev.bitmap, ev.palette
    if kb.bpp != 2 or kp.colors.shape[0] != 4:
        return None, None

    ki = ev.ki or KateInfo()
    ocw, och = ki.original_canvas_width, ki.original_canvas_height
    # kate_tracker_update resolves the region against the canvas
    if ev.region.metric == METRIC_MILLIONTHS and ocw > 0 and och > 0:
        left = int(ev.region.x * ocw / 1000000 + 0.5)
        top = int(ev.region.y * och / 1000000 + 0.5)
    else:
        left, top = ev.region.x, ev.region.y
    right = left + kb.width - 1
    bottom = top + kb.height - 1

    out = bytearray(4)  # size + first command offset, patched at the end
    nybbles: List[int] = []

    def flush_nybbles():
        nonlocal out
        if len(nybbles) & 1:
            nybbles.append(0)
        for i in range(0, len(nybbles), 2):
            out.append((nybbles[i] << 4) | nybbles[i + 1])
        nybbles.clear()

    px = np.asarray(kb.pixels, np.uint8)
    lines_offset = [0, 0]
    for pass_ in range(2):
        lines_offset[pass_] = len(out)
        for line in range(pass_, kb.height, 2):
            row = px[line]
            x = 0
            while x < kb.width:
                run = 1
                while (x + run < kb.width and run < 255
                       and row[x + run] == row[x]):
                    run += 1
                pix = int(row[x])
                if run >= 63 and x + run == kb.width:
                    nybbles += [0, 0, 0, pix]  # end-of-line marker
                elif 1 <= run <= 3:
                    nybbles.append((run << 2) | pix)
                elif run <= 15:
                    nybbles += [run >> 2, ((run & 3) << 2) | pix]
                elif run <= 63:
                    nybbles += [0, run >> 2, ((run & 3) << 2) | pix]
                else:
                    nybbles += [0, run >> 6, (run >> 2) & 0xF,
                                ((run & 3) << 2) | pix]
                x += run
            flush_nybbles()
            if len(out) > MAX_SPU_SIZE:
                return None, None
    first_commands_offset = len(out)

    # dvd-spu-clut-change fields (gstkatespu.c:666-700)
    clut_fields = {}
    for n in range(16):
        color = 0
        if n < 4:
            r, g, b = (int(kp.colors[n][0]), int(kp.colors[n][1]),
                       int(kp.colors[n][2]))
            y, u, v = _rgb2yuv(r, g, b)
            color = (y << 16) | (v << 8) | u
        clut_fields[f"clut{n:02d}"] = color

    palette = [0, 1, 2, 3]
    alphas = [int(kp.colors[i][3]) // 17 for i in range(4)]
    out += bytes([0, 0, 0, 0])  # date + next-seq (patched below)
    out += bytes([SPU_CMD_SET_COLOR,
                  (palette[3] << 4) | palette[2],
                  (palette[1] << 4) | palette[0]])
    out += bytes([SPU_CMD_SET_ALPHA,
                  (alphas[palette[3]] << 4) | alphas[palette[2]],
                  (alphas[palette[1]] << 4) | alphas[palette[0]]])
    out += bytes([SPU_CMD_SET_DAREA,
                  left >> 4, ((left & 0xF) << 4) | (right >> 8),
                  right & 0xFF,
                  top >> 4, ((top & 0xF) << 4) | (bottom >> 8),
                  bottom & 0xFF])
    out += bytes([SPU_CMD_DSPXA,
                  (lines_offset[0] >> 8) & 0xFF, lines_offset[0] & 0xFF,
                  (lines_offset[1] >> 8) & 0xFF, lines_offset[1] & 0xFF])
    out += bytes([SPU_CMD_DSP, SPU_CMD_END])

    second_commands_offset = len(out)
    out[first_commands_offset + 2] = (second_commands_offset >> 8) & 0xFF
    out[first_commands_offset + 3] = second_commands_offset & 0xFF
    delay = ns_to_stm(int((ev.end_time - ev.start_time) * NSEC))
    out += bytes([(delay >> 8) & 0xFF, delay & 0xFF,
                  (second_commands_offset >> 8) & 0xFF,
                  second_commands_offset & 0xFF,
                  SPU_CMD_STP_DSP, SPU_CMD_END])

    out[0] = (len(out) >> 8) & 0xFF
    out[1] = len(out) & 0xFF
    out[2] = (first_commands_offset >> 8) & 0xFF
    out[3] = first_commands_offset & 0xFF
    if len(out) > MAX_SPU_SIZE:
        return None, None
    return bytes(out), clut_fields
