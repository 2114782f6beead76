"""libavformat MPEG-TS oracle binding (native/tsoracle.c).

Test-side cross-validation for io/mpegts.py (the io/zvbi.py pattern:
bind the real system library the ecosystem trusts, and check our
from-spec implementation against it in both directions)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import struct
import subprocess
from dataclasses import dataclass
from typing import List, Optional, Tuple

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "tsoracle.c")
_LIB = None

KIND_MPEG2VIDEO = 1
KIND_MP2 = 2
KIND_H264 = 3
KIND_AAC = 4

NO_TS = -(1 << 63)  # INT64_MIN marker used by the shim


def _so_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_REPO, "native", "build",
                        f"libtsoracle-{digest}.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = _so_path()
    if not os.path.exists(so):
        os.makedirs(os.path.dirname(so), exist_ok=True)
        subprocess.check_call(
            ["gcc", "-O2", "-shared", "-fPIC", "-o", so, _SRC,
             "-lavformat", "-lavcodec", "-lavutil"])
    lib = ctypes.CDLL(so)
    for fn in ("tsoracle_demux", "tsoracle_mux", "tsoracle_demux_any",
               "tsoracle_mux_ps"):
        f = getattr(lib, fn)
        f.restype = ctypes.c_int
        f.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                      ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                      ctypes.POINTER(ctypes.c_uint64)]
    lib.tsoracle_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    lib.tsoracle_make_sample.restype = ctypes.c_int
    lib.tsoracle_make_sample.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_uint64)]
    _LIB = lib
    return lib


def make_sample(container: str, n_frames: int = 10) -> bytes:
    """Encode a real mpeg2video+pcm_s16le sample into `container`
    (e.g. "mxf") — for demuxer tests against genuine encoder output."""
    lib = _load()
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_size = ctypes.c_uint64()
    rc = lib.tsoracle_make_sample(container.encode(), n_frames,
                                  ctypes.byref(out),
                                  ctypes.byref(out_size))
    if rc != 0:
        raise RuntimeError(f"tsoracle_make_sample({container}) failed")
    blob = ctypes.string_at(out, out_size.value)
    lib.tsoracle_free(out)
    return blob


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


@dataclass
class OraclePacket:
    stream_index: int
    pts: Optional[int]
    dts: Optional[int]
    key: bool
    data: bytes


def demux(ts_bytes: bytes, any_format: bool = False
          ) -> Tuple[List[int], List[OraclePacket]]:
    """ffmpeg-demux a TS (or any probed container with
    any_format=True): (per-stream kinds, packets)."""
    lib = _load()
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_size = ctypes.c_uint64()
    fn = lib.tsoracle_demux_any if any_format else lib.tsoracle_demux
    rc = fn(ts_bytes, len(ts_bytes),
            ctypes.byref(out), ctypes.byref(out_size))
    if rc != 0:
        raise RuntimeError("tsoracle_demux failed")
    blob = ctypes.string_at(out, out_size.value)
    lib.tsoracle_free(out)

    pos = 0
    (n,) = struct.unpack_from("<I", blob, pos)
    pos += 4
    kinds = []
    for _ in range(n):
        _idx, kind = struct.unpack_from("<ii", blob, pos)
        pos += 8
        kinds.append(kind)
    packets = []
    while pos < len(blob):
        idx, pts, dts, key, sz = struct.unpack_from("<iqqiI", blob, pos)
        pos += 28
        packets.append(OraclePacket(
            idx, None if pts == NO_TS else pts,
            None if dts == NO_TS else dts, bool(key),
            blob[pos:pos + sz]))
        pos += sz
    return kinds, packets


def mux(stream_kinds: List[int],
        packets: List[Tuple[int, Optional[int], Optional[int], bytes]],
        program_stream: bool = False) -> bytes:
    """ffmpeg-mux (stream_index, pts90k, dts90k, data) packets to TS,
    or to MPEG-2 PS (the "vob" muxer) with program_stream=True."""
    lib = _load()
    spec = struct.pack("<I", len(stream_kinds))
    for k in stream_kinds:
        spec += struct.pack("<I", k)
    for idx, pts, dts, data in packets:
        spec += struct.pack("<IqqI", idx,
                            NO_TS if pts is None else pts,
                            NO_TS if dts is None else dts, len(data))
        spec += data
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_size = ctypes.c_uint64()
    fn = lib.tsoracle_mux_ps if program_stream else lib.tsoracle_mux
    rc = fn(spec, len(spec), ctypes.byref(out), ctypes.byref(out_size))
    if rc != 0:
        raise RuntimeError("tsoracle_mux failed")
    blob = ctypes.string_at(out, out_size.value)
    lib.tsoracle_free(out)
    return blob
