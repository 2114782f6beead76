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

    Connected with TWO inputs (video branch + audio branch, the reference's
    vsink/asink pads), audio samples are binned to video frames by PTS and
    one message per video frame is posted; the video stream passes through.
    With a single (audio) input, frame boundaries derive from `framerate`
    and one message per audio block is posted.
    rms = sqrt(mean(sample^2)) on normalized [-1,1] samples.
    """

    NAME = "videoframe-audiolevel"
    N_INPUTS = 2
    FORMATS = AudioFormat.ALL
    PROPERTIES = (Property("framerate", str, "30/1", static=True),)

    def negotiate(self, in_spec):
        if isinstance(in_spec, list):
            video, audio = in_spec
            from gstbad_tpu.core.spec import require
            require(video.kind == "video" and audio.kind == "audio",
                    "videoframe-audiolevel: needs (video, audio) inputs")
            self._audio_spec = audio
            return video
        self._audio_spec = in_spec
        return in_spec

    def _norm(self, x):
        fmt = self._audio_spec.format
        if fmt == AudioFormat.S16:
            return x.astype(jnp.float64) / 32768.0
        if fmt == AudioFormat.S32:
            return x.astype(jnp.float64) / 2147483648.0
        return x.astype(jnp.float64)

    def process(self, params, state, batch):
        if isinstance(batch, list):
            video, audio = batch
            xf = self._norm(audio.data)          # [Ba, S, C]
            ba, s, c = xf.shape
            rate = self._audio_spec.rate
            # absolute pts of every audio sample
            sample_pts = (audio.pts[:, None]
                          + (jnp.arange(s, dtype=jnp.int64)
                             * jnp.int64(round(1e9 / rate)))[None, :]
                          ).reshape(-1)           # [Ba*S]
            sq = (xf * xf).reshape(-1, c)
            vdur = jnp.int64(self.out_spec.frame_duration_ns)
            lo = video.pts[:, None]               # [Bv, 1]
            hi = lo + vdur
            m = ((sample_pts[None, :] >= lo)
                 & (sample_pts[None, :] < hi)).astype(jnp.float64)
            counts = jnp.maximum(m.sum(axis=1), 1.0)
            sums = m @ sq                         # [Bv, C]
            rms = jnp.sqrt(sums / counts[:, None])
            msgs = {"videoframe-audiolevel": {"rms": rms}}
            return state, video, msgs
        xf = self._norm(batch.data)
        rms = jnp.sqrt(jnp.mean(xf * xf, axis=1))  # [B, C]
        return state, batch, {"videoframe-audiolevel": {"rms": rms}}


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
