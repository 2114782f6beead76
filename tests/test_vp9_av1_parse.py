"""vp9parse + av1parse (gst/videoparsers) — upstream unit-test
transcription over the upstream binary vectors (tests/data/*.bin,
carried as data from vp9parse.h / av1parse.h)."""

import json
import os

import pytest

import gstbad_tpu as gt
from gstbad_tpu.io import av1obu as av1
from gstbad_tpu.io import vp9

DATA = os.path.join(os.path.dirname(__file__), "data")


def _vp9_frames():
    blob = open(os.path.join(DATA, "vp9_frames.bin"), "rb").read()
    idx = json.load(open(os.path.join(DATA, "vp9_frames.json")))
    return [blob[f["offset"]:f["offset"] + f["len"]]
            for f in idx["frames"]], idx


def _av1_streams():
    blob = open(os.path.join(DATA, "av1_streams.bin"), "rb").read()
    idx = json.load(open(os.path.join(DATA, "av1_streams.json")))
    arr = {k: blob[v[0]:v[0] + v[1]] for k, v in idx["arrays"].items()}
    return arr, idx["nums"]


# ------------------------------------------------------------------ vp9

def test_vp9_keyframe_header():
    """vp9parse.c:102-104: 256x144 profile 0."""
    frames, _ = _vp9_frames()
    h = vp9.parse_frame_header(frames[0])
    assert (h.width, h.height) == (256, 144)
    assert h.profile == 0 and h.bit_depth == 8
    assert h.frame_type == vp9.FRAME_KEY
    assert vp9.chroma_format(h) == "4:2:0"


def test_vp9_superframe_split():
    """vp9parse.h: the 6171-byte superframe = 5796 + 369."""
    frames, idx = _vp9_frames()
    sub = vp9.split_superframe(frames[1])
    assert [len(s) for s in sub] == [idx["first_len"], idx["last_len"]]
    assert vp9.split_superframe(frames[0]) == [frames[0]]


def test_vp9parse_element():
    """test_split_superframe (vp9parse.c:36-131): caps on the first
    frame, delta flags afterwards, decode-only for the hidden
    superframe member."""
    frames, idx = _vp9_frames()
    el = gt.make("vp9parse")
    out0 = el.push(frames[0])
    assert len(out0) == 1 and len(out0[0]["data"]) == len(frames[0])
    assert out0[0]["keyframe"] and not out0[0]["decode_only"]
    caps = el.src_caps
    assert caps["width"] == 256 and caps["height"] == 144
    assert caps["profile"] == "0"

    out1 = el.push(frames[1])
    assert [len(o["data"]) for o in out1] == [idx["first_len"],
                                              idx["last_len"]]
    assert out1[0]["decode_only"] and not out1[0]["keyframe"]
    assert not out1[1]["decode_only"]

    out2 = el.push(frames[2])
    assert len(out2) == 1 and not out2[0]["keyframe"]

    # super-frame alignment passes superframes through whole
    el2 = gt.make("vp9parse")
    el2.set_output("super-frame")
    assert [len(o["data"]) for o in el2.push(frames[1])] \
        == [len(frames[1])]


# ------------------------------------------------------------------ av1

def test_av1_obu_split_golden():
    arr, nums = _av1_streams()
    obus = av1.split_obu_stream(arr["stream_no_annexb_av1"])
    assert [len(o.raw) for o in obus] == nums["stream_av1_obu_size"]


def test_av1_sequence_header_golden():
    """av1parse.c:63-66: 400x300 profile 0 depth 8."""
    arr, _ = _av1_streams()
    obus = av1.split_obu_stream(arr["stream_no_annexb_av1"])
    sh = av1.parse_sequence_header(
        [o for o in obus if o.obu_type == av1.OBU_SEQUENCE_HEADER][0]
        .payload)
    assert (sh.max_width, sh.max_height) == (400, 300)
    assert sh.profile == 0 and sh.bit_depth == 8


def test_av1_byte_to_frame():
    """test_byte_to_frame: 14 frames with the exact upstream sizes,
    pushed in 5 arbitrary chunks."""
    arr, nums = _av1_streams()
    stream = arr["stream_no_annexb_av1"]
    el = gt.make("av1parse")
    el.set_output("obu-stream", "frame")
    outs = []
    ln = len(stream) // 5
    for i in range(5):
        chunk = stream[i * ln:(i + 1) * ln] if i < 4 else \
            stream[4 * ln:]
        outs += el.push(chunk)
    outs += el.finish()
    assert [len(o["data"]) for o in outs] == \
        nums["stream_av1_frame_size"]
    caps = el.src_caps
    assert caps["width"] == 400 and caps["height"] == 300
    assert caps["profile"] == "0"
    assert caps["bit-depth-chroma"] == 8


def test_av1_byte_to_annexb():
    """test_byte_to_annexb: the produced annex-b TUs match the
    upstream stream byte-exactly."""
    arr, nums = _av1_streams()
    el = gt.make("av1parse")
    el.set_output("annexb", "tu")
    outs = el.push(arr["stream_no_annexb_av1"]) + el.finish()
    assert [len(o["data"]) for o in outs] == \
        nums["stream_annexb_av1_tu_len"]
    assert b"".join(o["data"] for o in outs) == arr["stream_annexb_av1"]


def test_av1_annexb_to_obu():
    """test_annexb_to_obu: size-field re-added per obu."""
    arr, nums = _av1_streams()
    el = gt.make("av1parse")
    el.set_caps("annexb")
    el.set_output("obu-stream", "obu")
    outs = el.push(arr["stream_annexb_av1"]) + el.finish()
    assert [len(o["data"]) for o in outs] == nums["stream_av1_obu_size"]


def test_av1_annexb_to_frame():
    """test_annexb_to_frame."""
    arr, nums = _av1_streams()
    el = gt.make("av1parse")
    el.set_caps("annexb")
    el.set_output("obu-stream", "frame")
    outs = el.push(arr["stream_annexb_av1"]) + el.finish()
    assert [len(o["data"]) for o in outs] == \
        nums["stream_av1_frame_size"]


def test_av1_leb128_roundtrip():
    for v in (0, 1, 127, 128, 300, 5454, 10519, 1 << 30):
        enc = av1.write_leb128(v)
        dec, pos = av1.read_leb128(enc, 0)
        assert dec == v and pos == len(enc)
