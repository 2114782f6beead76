"""AV1 OBU-level bitstream parsing (gst/videoparsers/gstav1parse.c
over codecparsers/gstav1parser.c).

Covers the OBU layer the parser element frames with:
  - leb128 read/write, OBU headers (type, extension, has-size) and the
    low-overhead (size-delimited) stream walk;
  - annex-b framing both ways (temporal_unit_size / frame_unit_size /
    obu_length prefixes, has_size_field stripped exactly like
    gst_av1_parse_push_data's annexb writer);
  - sequence-header OBU parse: profile, still picture, operating
    points, frame width/height bits -> max sizes, color config bit
    depth (the upstream test pins 400x300, profile "0", depth 8);
  - temporal-unit grouping at temporal delimiters.

Frame-level alignment (tile-group completion) requires the full
frame-header/tile-info parse and is not implemented — the element
offers obu and tu alignment (gstav1parse.c's other two modes).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from gstbad_tpu.io.h264 import BitReader

OBU_SEQUENCE_HEADER = 1
OBU_TEMPORAL_DELIMITER = 2
OBU_FRAME_HEADER = 3
OBU_TILE_GROUP = 4
OBU_METADATA = 5
OBU_FRAME = 6
OBU_REDUNDANT_FRAME_HEADER = 7
OBU_TILE_LIST = 8
OBU_PADDING = 15


def read_leb128(data: bytes, pos: int) -> Tuple[int, int]:
    value = 0
    for i in range(8):
        b = data[pos + i]
        value |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            return value, pos + i + 1
    raise ValueError("leb128 too long")


def write_leb128(value: int) -> bytes:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


@dataclass
class Obu:
    obu_type: int
    has_size: bool
    extension: bytes          # 0 or 1 byte
    payload: bytes
    raw: bytes                # header + size field + payload

    def without_size_field(self) -> bytes:
        """Header with has_size cleared + payload (annex-b form)."""
        hdr = bytes([self.raw[0] & ~0x02]) + self.extension
        return hdr + self.payload

    def with_size_field(self) -> bytes:
        hdr = bytes([self.raw[0] | 0x02]) + self.extension
        return hdr + write_leb128(len(self.payload)) + self.payload


def parse_obu(data: bytes, pos: int = 0,
              bounded_size: Optional[int] = None) -> Tuple[Obu, int]:
    """One OBU at pos; bounded_size (annex-b obu_length) covers OBUs
    without a size field."""
    start = pos
    b0 = data[pos]
    if b0 & 0x80:
        raise ValueError("obu forbidden bit set")
    obu_type = (b0 >> 3) & 0x0F
    has_ext = bool(b0 & 0x04)
    has_size = bool(b0 & 0x02)
    pos += 1
    ext = b""
    if has_ext:
        ext = data[pos:pos + 1]
        pos += 1
    if has_size:
        size, pos = read_leb128(data, pos)
    elif bounded_size is not None:
        size = bounded_size - (pos - start)
    else:
        raise ValueError("obu without size in an unbounded stream")
    payload = data[pos:pos + size]
    if len(payload) < size:
        raise ValueError("truncated obu")
    pos += size
    return Obu(obu_type, has_size, ext, payload,
               data[start:pos]), pos


def split_obu_stream(data: bytes) -> List[Obu]:
    """Low-overhead bitstream: size-delimited OBUs back to back."""
    out = []
    pos = 0
    while pos < len(data):
        obu, pos = parse_obu(data, pos)
        out.append(obu)
    return out


def split_annexb(data: bytes) -> List[List[List[Obu]]]:
    """Annex-B: [temporal units [frame units [obus]]]."""
    tus = []
    pos = 0
    while pos < len(data):
        tu_size, pos = read_leb128(data, pos)
        tu_end = pos + tu_size
        frames = []
        while pos < tu_end:
            fu_size, pos = read_leb128(data, pos)
            fu_end = pos + fu_size
            obus = []
            while pos < fu_end:
                obu_len, pos = read_leb128(data, pos)
                obu, pos = parse_obu(data, pos, bounded_size=obu_len)
                obus.append(obu)
            frames.append(obus)
        tus.append(frames)
    return tus


def to_annexb_tu(frames: List[List[Obu]]) -> bytes:
    """One temporal unit in annex-b form (size fields stripped)."""
    body = b""
    for obus in frames:
        fu = b""
        for obu in obus:
            raw = obu.without_size_field()
            fu += write_leb128(len(raw)) + raw
        body += write_leb128(len(fu)) + fu
    return write_leb128(len(body)) + body


@dataclass
class SequenceHeader:
    profile: int = 0
    still_picture: bool = False
    level: int = 0
    tier: int = 0
    max_width: int = 0
    max_height: int = 0
    bit_depth: int = 8
    monochrome: bool = False


def parse_sequence_header(payload: bytes) -> SequenceHeader:
    """5.5.1 sequence_header_obu."""
    r = BitReader(payload)
    sh = SequenceHeader()
    sh.profile = r.read(3)
    sh.still_picture = bool(r.read(1))
    reduced = r.read(1)
    if reduced:
        sh.level = r.read(5)
    else:
        timing_info_present = r.read(1)
        decoder_model_info = 0
        if timing_info_present:
            # timing_info: num_units_in_display_tick, time_scale,
            # equal_picture_interval(+uvlc)
            r.read(32)
            r.read(32)
            if r.read(1):
                _read_uvlc(r)
            decoder_model_info = r.read(1)
            if decoder_model_info:
                bdl = r.read(5) + 1
                r.read(32)
                br_scale = r.read(4)
                r.read(5)
                sh._bdl = bdl
        initial_display_delay = r.read(1)
        n_ops = r.read(5) + 1
        for i in range(n_ops):
            r.read(12)  # operating_point_idc
            level = r.read(5)
            tier = r.read(1) if level > 7 else 0
            if i == 0:
                sh.level = level
                sh.tier = tier
            if timing_info_present and decoder_model_info:
                if r.read(1):  # decoder_model_present_for_op
                    n = getattr(sh, "_bdl", 0)
                    r.read(n)
                    r.read(n)
                    r.read(1)
            if initial_display_delay:
                if r.read(1):
                    r.read(4)
    wbits = r.read(4) + 1
    hbits = r.read(4) + 1
    sh.max_width = r.read(wbits) + 1
    sh.max_height = r.read(hbits) + 1
    # frame id numbers
    if not sh.still_picture or not reduced:
        if not reduced and r.read(1):  # frame_id_numbers_present
            r.read(4)
            r.read(3)
    r.read(3)  # use_128x128_superblock, filter_intra, intra_edge_filter
    if not reduced:
        r.read(4)  # interintra, masked, warped, dual_filter
        enable_order_hint = r.read(1)
        if enable_order_hint:
            r.read(2)  # jnt_comp, ref_frame_mvs
        if r.read(1):  # seq_choose_screen_content_tools
            force_sct = 2
        else:
            force_sct = r.read(1)
        if force_sct > 0:
            if not r.read(1):  # seq_choose_integer_mv
                r.read(1)
        if enable_order_hint:
            r.read(3)  # order_hint_bits_minus_1
    r.read(3)  # superres, cdef, restoration
    # color config
    high = r.read(1)
    if sh.profile == 2 and high:
        sh.bit_depth = 12 if r.read(1) else 10
    else:
        sh.bit_depth = 10 if high else 8
    if sh.profile != 1:
        sh.monochrome = bool(r.read(1))
    return sh


def _read_uvlc(r: BitReader) -> int:
    zeros = 0
    while r.read(1) == 0:
        zeros += 1
        if zeros > 31:
            return (1 << 32) - 1
    if zeros == 0:
        return 0
    return (1 << zeros) - 1 + r.read(zeros)
