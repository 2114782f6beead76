"""GDP analog — wire serialization of frames + spec (gst/gdp/).

The reference's GStreamer Data Protocol payloads buffers/caps/events as
typed packets for transport.  Here a FrameBatch + MediaSpec serializes to a
self-describing binary packet: a JSON header (the caps analog) + raw plane
bytes — the (tensor, MediaSpec, pts) tuple SURVEY.md section 2.6 calls for.
"""

from __future__ import annotations

import json
import struct
from fractions import Fraction
from typing import Tuple

import numpy as np

from gstbad_tpu.core.frame import FrameBatch
from gstbad_tpu.core.spec import MediaSpec

MAGIC = b"GTP0"  # gstbad-tpu protocol v0


def _spec_dict(spec: MediaSpec) -> dict:
    return {
        "kind": spec.kind, "format": spec.format, "width": spec.width,
        "height": spec.height,
        "framerate": [spec.framerate.numerator, spec.framerate.denominator],
        "rate": spec.rate, "channels": spec.channels, "layout": spec.layout,
        "interlace_mode": spec.interlace_mode,
    }


def _spec_from(d: dict) -> MediaSpec:
    return MediaSpec(kind=d["kind"], format=d["format"], width=d["width"],
                     height=d["height"],
                     framerate=Fraction(*d["framerate"]), rate=d["rate"],
                     channels=d["channels"], layout=d["layout"],
                     interlace_mode=d["interlace_mode"])


def pay(batch: FrameBatch, spec: MediaSpec) -> bytes:
    """Serialize (gdppay analog)."""
    np_batch = batch.to_numpy()
    if isinstance(np_batch.data, dict):
        planes = {k: np.ascontiguousarray(v) for k, v in np_batch.data.items()}
    else:
        planes = {"_": np.ascontiguousarray(np_batch.data)}
    header = {
        "spec": _spec_dict(spec),
        "planes": [{"name": k, "shape": list(v.shape),
                    "dtype": str(v.dtype)} for k, v in planes.items()],
        "pts": np.asarray(np_batch.pts).tolist(),
        "flags": np.asarray(np_batch.flags).tolist(),
        "valid": np.asarray(np_batch.valid).astype(int).tolist(),
    }
    hbytes = json.dumps(header).encode()
    out = [MAGIC, struct.pack("<I", len(hbytes)), hbytes]
    for v in planes.values():
        out.append(v.tobytes())
    return b"".join(out)


def depay(blob: bytes) -> Tuple[FrameBatch, MediaSpec]:
    """Deserialize (gdpdepay analog)."""
    if blob[:4] != MAGIC:
        raise ValueError("bad GTP magic")
    (hlen,) = struct.unpack("<I", blob[4:8])
    header = json.loads(blob[8:8 + hlen])
    off = 8 + hlen
    planes = {}
    for p in header["planes"]:
        n = int(np.prod(p["shape"])) * np.dtype(p["dtype"]).itemsize
        arr = np.frombuffer(blob[off:off + n], dtype=p["dtype"]
                            ).reshape(p["shape"])
        planes[p["name"]] = arr
        off += n
    data = planes["_"] if list(planes) == ["_"] else planes
    import jax.numpy as jnp
    batch = FrameBatch(
        data=(jnp.asarray(data) if not isinstance(data, dict)
              else {k: jnp.asarray(v) for k, v in data.items()}),
        pts=jnp.asarray(header["pts"], jnp.int64),
        flags=jnp.asarray(header["flags"], jnp.int32),
        valid=jnp.asarray(header["valid"], bool))
    return batch, _spec_from(header["spec"])


# ---------------------------------------------------------------------------
# ipcpipeline typed chunks (sys/ipcpipeline/protocol.txt:12-23)
# ---------------------------------------------------------------------------
# Same chunk grammar as the reference — type byte, little-endian request id
# and payload size — with JSON payloads where the reference serializes
# GstStructure strings (we are not GObject-wire-compatible; the protocol
# *shape* — typed chunks, request ids, acks carrying results — is the parity
# point).

CHUNK_ACK = 1
CHUNK_QUERY_RESULT = 2
CHUNK_BUFFER = 3
CHUNK_EVENT = 4
CHUNK_SINK_MESSAGE_EVENT = 5
CHUNK_QUERY = 6
CHUNK_STATE_CHANGE = 7
CHUNK_STATE_LOST = 8
CHUNK_MESSAGE = 9
CHUNK_ERROR_MESSAGE = 10

_CHUNK_HDR = struct.Struct("<BII")


def pack_chunk(ctype: int, req_id: int, payload: bytes = b"") -> bytes:
    return _CHUNK_HDR.pack(ctype, req_id, len(payload)) + payload


def unpack_chunk(blob: bytes) -> Tuple[int, int, bytes]:
    ctype, req_id, size = _CHUNK_HDR.unpack_from(blob)
    payload = blob[_CHUNK_HDR.size:_CHUNK_HDR.size + size]
    if len(payload) != size:
        raise ValueError(f"chunk truncated: want {size}, got {len(payload)}")
    return ctype, req_id, payload


def pack_json_chunk(ctype: int, req_id: int, obj) -> bytes:
    return pack_chunk(ctype, req_id, json.dumps(obj).encode())


def unpack_json(payload: bytes):
    return json.loads(payload.decode())
