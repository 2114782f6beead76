"""H.265/HEVC bitstream parsing (gst/videoparsers/gsth265parse.c over
codecparsers/gsth265parser.c).

From-spec (ITU-T H.265) pieces the parser element uses: Annex-B /
length-prefixed NAL framing (2-byte NAL headers), profile_tier_level
and SPS parse (pic size + conformance window in chroma units -> width/
height, VUI par/timing), prefix-SEI walk (CLLI/MDCV share the H.264
payload syntax, gsth265parse.c caps strings), hvcC codec_data
(ISO 14496-15 HEVCDecoderConfigurationRecord), and AU boundaries via
first_slice_segment_in_pic_flag (the first bit after the NAL header).

Upstream goldens: the x265-generated 16x16 SPS must parse to
main/main-tier/level 2.1 (tests/check/elements/h265parse.c:279-285),
the 128x128 SPS to 128x128.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import List, Optional, Tuple

from gstbad_tpu.io.h264 import (BitReader, remove_emulation,
                                split_bytestream, split_avc,
                                to_bytestream, to_avc,
                                content_light_level_string,
                                mastering_display_string)

NAL_IDR_W_RADL = 19
NAL_IDR_N_LP = 20
NAL_CRA = 21
NAL_VPS = 32
NAL_SPS = 33
NAL_PPS = 34
NAL_AUD = 35
NAL_PREFIX_SEI = 39

SEI_MDCV = 137
SEI_CLLI = 144


def nal_type(nal: bytes) -> int:
    return (nal[0] >> 1) & 0x3F if nal else 0


def is_slice(t: int) -> bool:
    return t <= 31


def is_irap(t: int) -> bool:
    return 16 <= t <= 23


@dataclass
class Ptl:
    profile_space: int = 0
    tier_flag: int = 0
    profile_idc: int = 0
    compat_flags: int = 0
    level_idc: int = 0


def _parse_ptl(r: BitReader, max_sub_layers_minus1: int) -> Ptl:
    """7.3.3 profile_tier_level."""
    ptl = Ptl()
    ptl.profile_space = r.read(2)
    ptl.tier_flag = r.read(1)
    ptl.profile_idc = r.read(5)
    ptl.compat_flags = r.read(32)
    r.read(4)   # progressive/interlaced/non-packed/frame-only
    r.read(32)  # reserved_zero_43bits...
    r.read(11)
    r.read(1)   # reserved / inbld
    ptl.level_idc = r.read(8)
    sub_profile = []
    sub_level = []
    for _ in range(max_sub_layers_minus1):
        sub_profile.append(r.read(1))
        sub_level.append(r.read(1))
    if max_sub_layers_minus1 > 0:
        for _ in range(8 - max_sub_layers_minus1):
            r.read(2)
    for i in range(max_sub_layers_minus1):
        if sub_profile[i]:
            r.read(32)
            r.read(32)
            r.read(24)
        if sub_level[i]:
            r.read(8)
    return ptl


@dataclass
class Sps:
    sps_id: int = 0
    chroma_format_idc: int = 1
    width: int = 0
    height: int = 0
    bit_depth_luma: int = 8
    bit_depth_chroma: int = 8
    ptl: Ptl = None
    par_n: int = 0
    par_d: int = 0
    fps_n: int = 0
    fps_d: int = 0
    raw: bytes = b""


def parse_sps(nal: bytes) -> Sps:
    """7.3.2.2.1 seq_parameter_set_rbsp."""
    rbsp = remove_emulation(nal[2:])  # 2-byte NAL header
    r = BitReader(rbsp)
    sps = Sps(raw=bytes(nal))
    r.read(4)  # sps_video_parameter_set_id
    max_sub_layers_minus1 = r.read(3)
    r.read(1)  # temporal_id_nesting
    sps.ptl = _parse_ptl(r, max_sub_layers_minus1)
    sps.sps_id = r.ue()
    sps.chroma_format_idc = r.ue()
    if sps.chroma_format_idc == 3:
        r.read(1)  # separate_colour_plane
    w = r.ue()
    hgt = r.ue()
    crop_l = crop_r = crop_t = crop_b = 0
    if r.read(1):  # conformance_window_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    sub_wc = [1, 2, 2, 1][sps.chroma_format_idc]
    sub_hc = [1, 2, 1, 1][sps.chroma_format_idc]
    sps.width = w - sub_wc * (crop_l + crop_r)
    sps.height = hgt - sub_hc * (crop_t + crop_b)
    sps.bit_depth_luma = r.ue() + 8
    sps.bit_depth_chroma = r.ue() + 8
    log2_max_poc = r.ue() + 4
    sub_layer_ordering = r.read(1)
    for _ in range((max_sub_layers_minus1 + 1) if sub_layer_ordering
                   else 1):
        r.ue()
        r.ue()
        r.ue()
    r.ue()  # log2_min_luma_coding_block_size_minus3
    r.ue()  # log2_diff_max_min_luma_coding_block_size
    r.ue()  # log2_min_luma_transform_block_size_minus2
    r.ue()  # log2_diff_max_min_luma_transform_block_size
    r.ue()  # max_transform_hierarchy_depth_inter
    r.ue()  # max_transform_hierarchy_depth_intra
    if r.read(1):  # scaling_list_enabled
        if r.read(1):  # sps_scaling_list_data_present
            _skip_scaling_list_data(r)
    r.read(2)  # amp_enabled, sample_adaptive_offset_enabled
    if r.read(1):  # pcm_enabled
        r.read(8)
        r.ue()
        r.ue()
        r.read(1)
    num_short_term_rps = r.ue()
    prev_pics = 0
    for i in range(num_short_term_rps):
        prev_pics = _skip_st_rps(r, i, num_short_term_rps, prev_pics)
    if r.read(1):  # long_term_ref_pics_present
        for _ in range(r.ue()):
            r.read(log2_max_poc)
            r.read(1)
    r.read(2)  # temporal_mvp_enabled, strong_intra_smoothing
    if r.read(1):  # vui_parameters_present
        _parse_vui(r, sps)
    return sps


def _skip_scaling_list_data(r: BitReader) -> None:
    for size_id in range(4):
        matrix_count = 6 if size_id != 3 else 2
        for _ in range(matrix_count):
            if not r.read(1):  # pred_mode_flag
                r.ue()
            else:
                coefs = min(64, 1 << (4 + (size_id << 1)))
                if size_id > 1:
                    r.se()
                for _ in range(coefs):
                    r.se()


def _skip_st_rps(r: BitReader, idx: int, total: int,
                 prev_pics: int) -> int:
    """7.3.7 st_ref_pic_set; returns NumDeltaPocs for the next set."""
    inter_pred = r.read(1) if idx else 0
    if inter_pred:
        r.read(1)  # delta_rps_sign
        r.ue()     # abs_delta_rps_minus1
        kept = 0
        for _ in range(prev_pics + 1):
            used = r.read(1)
            if not used:
                if r.read(1):
                    kept += 1
            else:
                kept += 1
        return kept
    neg = r.ue()
    pos = r.ue()
    for _ in range(neg + pos):
        r.ue()
        r.read(1)
    return neg + pos


_ASPECT_RATIOS = [
    (0, 0), (1, 1), (12, 11), (10, 11), (16, 11), (40, 33), (24, 11),
    (20, 11), (32, 11), (80, 33), (18, 11), (15, 11), (64, 33),
    (160, 99), (4, 3), (3, 2), (2, 1),
]


def _parse_vui(r: BitReader, sps: Sps) -> None:
    """E.2.1 vui_parameters (prefix only, through timing)."""
    if r.read(1):  # aspect_ratio_info
        idc = r.read(8)
        if idc == 255:
            sps.par_n = r.read(16)
            sps.par_d = r.read(16)
        elif idc < len(_ASPECT_RATIOS):
            sps.par_n, sps.par_d = _ASPECT_RATIOS[idc]
    if r.read(1):  # overscan
        r.read(1)
    if r.read(1):  # video_signal_type
        r.read(4)
        if r.read(1):
            r.read(24)
    if r.read(1):  # chroma_loc
        r.ue()
        r.ue()
    r.read(3)  # neutral_chroma, field_seq, frame_field_info
    if r.read(1):  # default_display_window
        r.ue()
        r.ue()
        r.ue()
        r.ue()
    if r.read(1):  # vui_timing_info_present
        num = r.read(32)
        scale = r.read(32)
        if num and scale:
            sps.fps_n = scale
            sps.fps_d = num


def first_slice_segment_in_pic(nal: bytes) -> int:
    """The first slice-header bit after the 2-byte NAL header."""
    return (nal[2] >> 7) & 1 if len(nal) > 2 else 0


def parse_sei(nal: bytes) -> List[Tuple[int, bytes]]:
    """Prefix SEI: same payload walk as H.264 after the 2-byte header."""
    from gstbad_tpu.io import h264 as _h264
    return _h264.parse_sei(nal[1:])  # reuse: skip one extra header byte


# ---------------------------------------------------------------- names

def profile_name(ptl: Ptl) -> Optional[str]:
    """gst_codec_utils_h265_get_profile (the common cases)."""
    return {1: "main", 2: "main-10", 3: "main-still-picture",
            4: "format-range-extensions"}.get(ptl.profile_idc)


def tier_name(ptl: Ptl) -> str:
    return "high" if ptl.tier_flag else "main"


def level_name(ptl: Ptl) -> str:
    """level_idc is 30 x the level number."""
    if ptl.level_idc % 30 == 0:
        return str(ptl.level_idc // 30)
    return f"{ptl.level_idc // 30}.{(ptl.level_idc % 30) // 3}"


# ---------------------------------------------------------------- hvcC

def build_hvcc(vps_list: List[bytes], sps_list: List[bytes],
               pps_list: List[bytes], length_size: int = 4) -> bytes:
    """ISO 14496-15 8.3.3.1 HEVCDecoderConfigurationRecord
    (gst_h265_parse_make_codec_data)."""
    if not sps_list:
        raise ValueError("hvcC needs an SPS")
    sps = parse_sps(sps_list[0])
    ptl = sps.ptl
    out = bytearray()
    out.append(1)  # configurationVersion
    out.append((ptl.profile_space << 6) | (ptl.tier_flag << 5)
               | ptl.profile_idc)
    out += struct.pack(">I", ptl.compat_flags)
    out += b"\x00" * 6  # constraint indicator flags (general)
    out.append(ptl.level_idc)
    out += struct.pack(">H", 0xF000)  # min_spatial_segmentation_idc
    out.append(0xFC)  # parallelismType
    out.append(0xFC | (sps.chroma_format_idc & 0x3))
    out.append(0xF8 | ((sps.bit_depth_luma - 8) & 0x7))
    out.append(0xF8 | ((sps.bit_depth_chroma - 8) & 0x7))
    out += b"\x00\x00"  # avgFrameRate
    out.append((length_size - 1) & 0x3)  # constFrameRate=0 numTemporal=0
    arrays = [(NAL_VPS, vps_list), (NAL_SPS, sps_list),
              (NAL_PPS, pps_list)]
    arrays = [(t, lst) for t, lst in arrays if lst]
    out.append(len(arrays))
    for t, lst in arrays:
        out.append(0x80 | t)  # array_completeness=1
        out += struct.pack(">H", len(lst))
        for n in lst:
            out += struct.pack(">H", len(n)) + n
    return bytes(out)


def parse_hvcc(data: bytes) -> Tuple[int, List[bytes]]:
    """-> (nal_length_size, all nals in array order)."""
    if len(data) < 23 or data[0] != 1:
        raise ValueError("bad hvcC")
    length_size = (data[21] & 0x3) + 1
    n_arrays = data[22]
    pos = 23
    nals = []
    for _ in range(n_arrays):
        pos += 1
        (count,) = struct.unpack_from(">H", data, pos)
        pos += 2
        for _ in range(count):
            (ln,) = struct.unpack_from(">H", data, pos)
            pos += 2
            nals.append(data[pos:pos + ln])
            pos += ln
    return length_size, nals
