"""Observability elements — fpsdisplaysink, videocodectestsink, debugspy
(gst/debugutils/) and netsim (gst/netsim/)."""

from __future__ import annotations

import hashlib
import time

import numpy as np
import jax.numpy as jnp

from gstbad_tpu.core.bus import Message
from gstbad_tpu.core.element import Element, Property
from gstbad_tpu.core.frame import FrameBatch
from gstbad_tpu.core.registry import register


@register
class FpsDisplaySink(Element):
    """fpsdisplaysink (gst/debugutils/fpsdisplaysink.c:80-91): rendered/
    dropped counts and min/max/avg fps, posted as `fps-measurements`."""

    NAME = "fpsdisplaysink"
    KIND = "sink"
    HOST = True
    PROPERTIES = (Property("fps-update-interval", int, 500),)  # ms

    def __init__(self, **props):
        super().__init__(**props)
        self.frames_rendered = 0
        self.frames_dropped = 0
        self._t0 = None
        self._last_update = None
        self._last_frames = 0
        self.min_fps = float("inf")
        self.max_fps = 0.0

    def process(self, params, state, batch: FrameBatch):
        return state, batch

    def host_process(self, np_batch: FrameBatch, bus) -> None:
        now = time.monotonic()
        if self._t0 is None:
            self._t0 = self._last_update = now
        self.frames_rendered += np_batch.batch
        interval = self.props["fps-update-interval"] / 1000.0
        if now - self._last_update >= interval:
            fps = ((self.frames_rendered - self._last_frames)
                   / (now - self._last_update))
            self.min_fps = min(self.min_fps, fps)
            self.max_fps = max(self.max_fps, fps)
            self._last_update = now
            self._last_frames = self.frames_rendered
            if bus is not None:
                elapsed = now - self._t0
                bus.post(Message(self.NAME, "fps-measurements",
                                 int(np_batch.pts[-1]),
                                 {"fps": fps,
                                  "drop-rate": 0.0,
                                  "avg-fps": self.frames_rendered / elapsed
                                  if elapsed else 0.0}))

    @property
    def average_fps(self):
        elapsed = time.monotonic() - self._t0 if self._t0 else 0
        return self.frames_rendered / elapsed if elapsed else 0.0


@register
class VideoCodecTestSink(Element):
    """videocodectestsink (gstvideocodectestsink.c:33-46,193-230): per-frame
    and whole-stream MD5 conformance checksums posted as `conformance`
    messages."""

    NAME = "videocodectestsink"
    KIND = "sink"
    HOST = True

    def __init__(self, **props):
        super().__init__(**props)
        self._stream_md5 = hashlib.md5()
        self.frame_checksums = []

    def process(self, params, state, batch: FrameBatch):
        return state, batch

    @staticmethod
    def _frame_bytes(data, i):
        if isinstance(data, dict):
            return b"".join(np.ascontiguousarray(data[k][i]).tobytes()
                            for k in sorted(data))
        return np.ascontiguousarray(data[i]).tobytes()

    def host_process(self, np_batch: FrameBatch, bus) -> None:
        for i in range(np_batch.batch):
            blob = self._frame_bytes(np_batch.data, i)
            digest = hashlib.md5(blob).hexdigest()
            self._stream_md5.update(blob)
            self.frame_checksums.append(digest)
            if bus is not None:
                bus.post(Message(self.NAME, "conformance",
                                 int(np_batch.pts[i]),
                                 {"checksum": digest}))

    @property
    def stream_checksum(self) -> str:
        return self._stream_md5.hexdigest()


@register
class DebugSpy(Element):
    """debugspy: posts a buffer-info message per frame (PTS, flags,
    checksum-free)."""

    NAME = "debugspy"
    PROPERTIES = (Property("silent", bool, False),)

    def process(self, params, state, batch: FrameBatch):
        msgs = {"buffer-info": {
            "_emit": jnp.broadcast_to(~params["silent"], (batch.batch,)),
            "flags": batch.flags,
        }}
        return state, batch, msgs


@register
class NetSim(Element):
    """netsim (gst/netsim/gstnetsim.c:58-68): network fault injection —
    drop/duplicate probability and reorder.  Dropping uses the validity
    mask; duplicates emit a second gated slot per frame.

    The reference's delay distributions apply to wall-clock transmission;
    here `delay-probability` + `max-delay-ns` shift PTS instead (the
    observable effect on a dataflow graph)."""

    NAME = "netsim"
    PROPERTIES = (
        Property("drop-probability", float, 0.0, 0.0, 1.0),
        Property("duplicate-probability", float, 0.0, 0.0, 1.0),
        Property("delay-probability", float, 0.0, 0.0, 1.0),
        Property("max-delay-ns", int, 0),
        Property("seed", int, 0, static=True),
    )

    def init_state(self, batch: int):
        import jax
        return jax.random.PRNGKey(self.props["seed"])

    def process(self, params, state, batch: FrameBatch):
        import jax
        key, k1, k2, k3, k4 = jax.random.split(state, 5)
        b = batch.batch
        drop = jax.random.uniform(k1, (b,)) < params["drop-probability"]
        dup = jax.random.uniform(k2, (b,)) < params["duplicate-probability"]
        delay = jax.random.uniform(k3, (b,)) < params["delay-probability"]
        delay_ns = (jax.random.uniform(k4, (b,))
                    * params["max-delay-ns"].astype(jnp.float64)
                    ).astype(jnp.int64)
        pts = batch.pts + jnp.where(delay, delay_ns, 0)

        def dup2(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == b:
                return jnp.concatenate([x, x], axis=0)
            return x

        data = (jax.tree_util.tree_map(dup2, batch.data)
                if isinstance(batch.data, dict) else dup2(batch.data))
        out = FrameBatch(
            data=data,
            pts=jnp.concatenate([pts, pts]),
            flags=jnp.concatenate([batch.flags, batch.flags]),
            valid=jnp.concatenate([batch.valid & ~drop,
                                   batch.valid & ~drop & dup]))
        return key, out
