"""libavcodec encode/decode oracle (native/codecoracle.c).

Test-side ground truth for the codecs DPB layer
(gst-libs/gst/codecs/gsth264decoder.c et al.): encode structured
streams (IPPP / B / B-pyramid / multi-ref) with the REAL encoders the
ecosystem trusts (libx264, mpeg2video, libvpx) and recover the TRUE
decoder output order to validate our POC/DPB/bumping engines against.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import struct
import subprocess
from dataclasses import dataclass
from typing import List

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "codecoracle.c")
_LIB = None


def _so_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_REPO, "native", "build",
                        f"libcodecoracle-{digest}.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = _so_path()
    if not os.path.exists(so):
        os.makedirs(os.path.dirname(so), exist_ok=True)
        subprocess.check_call(
            ["gcc", "-O2", "-shared", "-fPIC", "-o", so, _SRC,
             "-lavcodec", "-lavutil"])
    lib = ctypes.CDLL(so)
    lib.codecoracle_encode.restype = ctypes.c_int
    lib.codecoracle_encode.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_uint64)]
    lib.codecoracle_decode_pts.restype = ctypes.c_int
    lib.codecoracle_decode_pts.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.c_uint64)]
    lib.codecoracle_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


@dataclass
class Packet:
    data: bytes
    pts: int
    dts: int
    key: bool


def encode(enc_name: str, opts: str, width: int, height: int,
           n_frames: int) -> List[Packet]:
    """Encode n synthetic frames (pts = 0..n-1); returns the coded
    packets in decode order with the encoder's pts/dts."""
    lib = _load()
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_size = ctypes.c_uint64()
    rc = lib.codecoracle_encode(enc_name.encode(), opts.encode(),
                                width, height, n_frames,
                                ctypes.byref(out), ctypes.byref(out_size))
    if rc != 0:
        raise RuntimeError(f"codecoracle encode({enc_name}) failed")
    blob = ctypes.string_at(out, out_size.value)
    lib.codecoracle_free(out)
    return _parse_blob(blob)


def _parse_blob(blob: bytes) -> List[Packet]:
    if blob[:4] != b"CORC":
        raise ValueError("bad oracle blob")
    (n,) = struct.unpack_from("<I", blob, 4)
    pos = 8
    hdrs = []
    for _ in range(n):
        size, pts, dts, flags, _pad = struct.unpack_from("<QqqII", blob, pos)
        hdrs.append((size, pts, dts, flags))
        pos += 32
    pkts = []
    for size, pts, dts, flags in hdrs:
        pkts.append(Packet(blob[pos:pos + size], pts, dts, bool(flags & 1)))
        pos += size
    return pkts


def _pack_blob(packets: List[Packet]) -> bytes:
    out = bytearray(struct.pack("<4sI", b"CORC", len(packets)))
    for p in packets:
        out += struct.pack("<QqqII", len(p.data), p.pts, p.dts,
                           1 if p.key else 0, 0)
    for p in packets:
        out += p.data
    return bytes(out)


def decode_output_pts(dec_name: str, packets: List[Packet]) -> List[int]:
    """Feed the packets to the real decoder; the returned pts sequence
    is the decoder's output (presentation) order — the ground truth the
    DPB bumping process must reproduce."""
    lib = _load()
    blob = _pack_blob(packets)
    pts_out = ctypes.POINTER(ctypes.c_int64)()
    n_out = ctypes.c_uint64()
    rc = lib.codecoracle_decode_pts(dec_name.encode(), blob, len(blob),
                                    ctypes.byref(pts_out),
                                    ctypes.byref(n_out))
    if rc != 0:
        raise RuntimeError(f"codecoracle decode({dec_name}) failed")
    vals = [pts_out[i] for i in range(n_out.value)]
    lib.codecoracle_free(pts_out)
    return vals
