"""Smaller reference plugins: accurip, segmentclip (audio/video), speed,
timecodestamper, avwait, autoconvert, switchbin, audiobuffersplit's sibling
rawparse elements."""

from __future__ import annotations

import zlib
from fractions import Fraction

import numpy as np
import jax.numpy as jnp

from gstbad_tpu.core.bus import Message
from gstbad_tpu.core.element import AudioFilter, Element, Property
from gstbad_tpu.core.frame import FrameBatch
from gstbad_tpu.core.registry import make, register
from gstbad_tpu.core.spec import AudioFormat, MediaSpec, VideoFormat, require


@register
class AccurateRip(Element):
    """accurip (gst/accurip/gstaccurip.c): AccurateRip v1/v2 CRCs of S16
    stereo audio, posted at EOS via `crc()` (host accumulation)."""

    NAME = "accurip"
    HOST = True

    def __init__(self, **props):
        super().__init__(**props)
        self._offset = 1  # AccurateRip sample index is 1-based
        self._crc_v1 = 0
        self._crc_v2 = 0

    def process(self, params, state, batch: FrameBatch):
        return state, batch

    def host_process(self, np_batch: FrameBatch, bus) -> None:
        x = np.asarray(np_batch.data).reshape(-1, 2).astype(np.uint16)
        values = (x[:, 1].astype(np.uint32) << 16) | x[:, 0]
        idx = np.arange(self._offset, self._offset + len(values),
                        dtype=np.uint64)
        self._crc_v1 = (self._crc_v1
                        + int((idx * values).sum() & 0xFFFFFFFF)) & 0xFFFFFFFF
        prod = idx * values
        self._crc_v2 = (self._crc_v2
                        + int((prod & 0xFFFFFFFF).sum() & 0xFFFFFFFF)
                        + int((prod >> 32).sum() & 0xFFFFFFFF)) & 0xFFFFFFFF
        self._offset += len(values)

    @property
    def crc(self):
        return self._crc_v1

    @property
    def crc_v2(self):
        return self._crc_v2


@register
class AudioSegmentClip(AudioFilter):
    """audiosegmentclip (gst/segmentclip/): drop buffers outside
    [start, stop] ns."""

    NAME = "audiosegmentclip"
    FORMATS = AudioFormat.ALL
    PROPERTIES = (
        Property("start", int, 0),
        Property("stop", int, -1),
    )

    def process(self, params, state, batch: FrameBatch):
        start = params["start"].astype(jnp.int64)
        stop = params["stop"].astype(jnp.int64)
        inside = (batch.pts >= start) & ((stop < 0) | (batch.pts <= stop))
        return state, batch.replace(valid=batch.valid & inside)


@register
class VideoSegmentClip(Element):
    """videosegmentclip (gst/segmentclip/)."""

    NAME = "videosegmentclip"
    PROPERTIES = (
        Property("start", int, 0),
        Property("stop", int, -1),
    )

    def process(self, params, state, batch: FrameBatch):
        start = params["start"].astype(jnp.int64)
        stop = params["stop"].astype(jnp.int64)
        inside = (batch.pts >= start) & ((stop < 0) | (batch.pts <= stop))
        return state, batch.replace(valid=batch.valid & inside)


@register
class Speed(AudioFilter):
    """speed (gst/speed/gstspeed.c:433-511, :580-640): per-buffer linear
    resample walk.  The reference restarts i_float = 0.5*(speed-1) on every
    buffer (no carried phase) and blends the previously SELECTED sample with
    in[ceil(i_float)]; the walk is static per (block size, speed), so the
    gather indices + gfloat weights are baked on the host and the per-window
    work is two gathers and one FMA.  Output PTS follows the reference's
    perfect-stream rule: timestamp = scale(out_offset, GST_SECOND, rate)
    accumulated across buffers (carried in state)."""

    NAME = "speed"
    FORMATS = (AudioFormat.F32, AudioFormat.S16)
    PROPERTIES = (Property("speed", float, 1.0, 0.1, 40.0, static=True),)

    def init_state(self, batch: int):
        return {"offset": jnp.zeros((), jnp.int64)}

    def process(self, params, state, batch: FrameBatch):
        from gstbad_tpu.golden.audio import speed_resample_indices
        speed = self.props["speed"]
        x = batch.data.astype(jnp.float32)
        b, s, c = x.shape
        prev_idx, idx, interp = speed_resample_indices(s, speed)
        w1 = jnp.asarray(interp)[None, :, None]
        w0 = jnp.asarray(np.float32(1) - interp)[None, :, None]
        y = x[:, prev_idx] * w0 + x[:, idx] * w1
        if self.in_spec.format == AudioFormat.S16:
            y = jnp.trunc(y).astype(jnp.int16)  # C gfloat->gint16 cast
        j = len(idx)
        rate = self.in_spec.rate
        offs = state["offset"] + jnp.arange(b, dtype=jnp.int64) * j
        pts = offs * 1_000_000_000 // rate
        state = {"offset": state["offset"] + b * j}
        return state, batch.replace(data=y, pts=pts)


@register
class TimecodeStamper(Element):
    """timecodestamper (gst/timecode/): attach SMPTE timecode per frame,
    posted as messages (our buffers carry no meta list; the message stream
    is the metadata channel)."""

    NAME = "timecodestamper"
    PROPERTIES = (Property("fps-numerator-override", int, 0, static=True),)

    def process(self, params, state, batch: FrameBatch):
        fr = self.out_spec.framerate
        fps = float(fr)
        frame_idx = (batch.pts.astype(jnp.float64) * fps / 1e9
                     + 0.5).astype(jnp.int64)
        frames = frame_idx % int(round(fps))
        total_sec = frame_idx // int(round(fps))
        msgs = {"timecode": {
            "hours": total_sec // 3600,
            "minutes": (total_sec // 60) % 60,
            "seconds": total_sec % 60,
            "frames": frames,
        }}
        return state, batch, msgs


@register
class AvWait(Element):
    """avwait (gst/timecode/): pass frames only from `target-running-time`
    on (mode=1 analog)."""

    NAME = "avwait"
    PROPERTIES = (Property("target-running-time", int, 0),)

    def process(self, params, state, batch: FrameBatch):
        tgt = params["target-running-time"].astype(jnp.int64)
        return state, batch.replace(valid=batch.valid & (batch.pts >= tgt))


class _SelectorBin(Element):
    """Shared logic for autoconvert/switchbin: pick the first child chain
    whose negotiation accepts the input spec (gstautoconvert.c:23-29,
    gstswitchbin.c:23-29 — runtime caps-driven path selection happens at
    our graph-build time)."""

    CANDIDATES = ()

    def __init__(self, **props):
        self._elements_prop = props.pop("elements", None)
        super().__init__(**props)
        self._chosen = None

    def negotiate(self, in_spec: MediaSpec) -> MediaSpec:
        names = (self._elements_prop.split(",") if self._elements_prop
                 else list(self.CANDIDATES))
        errors = []
        for name in names:
            el = make(name.strip())
            try:
                out = el.set_info(in_spec)
            except Exception as e:  # noqa: BLE001
                errors.append(f"{name}: {e}")
                continue
            self._chosen = el
            return out
        raise ValueError(f"{self.NAME}: no candidate accepted {in_spec}: "
                         f"{errors}")

    @property
    def chosen(self):
        return self._chosen

    def init_state(self, batch: int):
        return self._chosen.init_state(batch)

    def dynamic_params(self):
        return self._chosen.dynamic_params()

    def process(self, params, state, batch: FrameBatch):
        return self._chosen.process(params, state, batch)


@register
class AutoConvert(_SelectorBin):
    NAME = "autoconvert"
    CANDIDATES = ("identity",)


@register
class SwitchBin(_SelectorBin):
    NAME = "switchbin"
    CANDIDATES = ("identity",)


@register
class VideoParse(Element):
    """videoparse (gst/rawparse/): frame raw bytes into video frames.
    Use via `push_bytes` + appsrc-style pull (host source)."""

    NAME = "videoparse"
    KIND = "host-source"
    PROPERTIES = (
        Property("format", str, "GRAY8", static=True),
        Property("width", int, 320, static=True),
        Property("height", int, 240, static=True),
        Property("framerate", str, "30/1", static=True),
    )

    def __init__(self, **props):
        super().__init__(**props)
        self._buf = b""
        self._n = 0

    def negotiate(self, in_spec):
        num, _, den = self.props["framerate"].partition("/")
        return MediaSpec(kind="video", format=self.props["format"],
                         width=self.props["width"],
                         height=self.props["height"],
                         framerate=Fraction(int(num), int(den or "1")))

    def push_bytes(self, data: bytes) -> None:
        self._buf += data

    def _frame_size(self):
        w, h = self.props["width"], self.props["height"]
        fmt = self.props["format"]
        if fmt == VideoFormat.GRAY8:
            return w * h
        if fmt == VideoFormat.I420:
            return w * h * 3 // 2
        return w * h * VideoFormat.n_channels(fmt)

    def pull_window(self, window: int):
        fsz = self._frame_size()
        n = min(len(self._buf) // fsz, window)
        if n == 0:
            return None
        w, h = self.props["width"], self.props["height"]
        fmt = self.props["format"]
        frames = []
        for i in range(n):
            raw = np.frombuffer(self._buf[i * fsz:(i + 1) * fsz], np.uint8)
            if fmt == VideoFormat.GRAY8:
                frames.append(raw.reshape(h, w))
            elif fmt == VideoFormat.I420:
                frames.append({
                    "y": raw[:w * h].reshape(h, w),
                    "u": raw[w * h:w * h * 5 // 4].reshape(h // 2, w // 2),
                    "v": raw[w * h * 5 // 4:].reshape(h // 2, w // 2)})
            else:
                c = VideoFormat.n_channels(fmt)
                frames.append(raw.reshape(h, w, c))
        self._buf = self._buf[n * fsz:]
        dur = self.out_spec.frame_duration_ns
        pts = np.arange(self._n, self._n + n) * dur
        self._n += n
        if isinstance(frames[0], dict):
            data = {k: jnp.asarray(np.stack([f[k] for f in frames] + [
                frames[-1][k]] * (window - n))) for k in frames[0]}
        else:
            data = jnp.asarray(np.stack(frames + [frames[-1]] * (window - n)))
        return FrameBatch(
            data=data,
            pts=jnp.asarray(list(pts) + [int(pts[-1])] * (window - n),
                            jnp.int64),
            flags=jnp.zeros(window, jnp.int32),
            valid=jnp.asarray([True] * n + [False] * (window - n)))

    def process(self, params, state, batch):
        return state, batch


@register
class AudioParse(Element):
    """audioparse (gst/rawparse/): frame raw bytes into PCM blocks."""

    NAME = "audioparse"
    KIND = "host-source"
    PROPERTIES = (
        Property("format", str, AudioFormat.S16, static=True),
        Property("rate", int, 48000, static=True),
        Property("channels", int, 2, static=True),
        Property("samplesperbuffer", int, 1024, static=True),
    )

    def __init__(self, **props):
        super().__init__(**props)
        self._buf = b""
        self._n = 0

    def negotiate(self, in_spec):
        return MediaSpec(kind="audio", format=self.props["format"],
                         rate=self.props["rate"],
                         channels=self.props["channels"])

    def push_bytes(self, data: bytes) -> None:
        self._buf += data

    def pull_window(self, window: int):
        c = self.props["channels"]
        s = self.props["samplesperbuffer"]
        dt = np.dtype(AudioFormat.dtype(self.props["format"]))
        bsz = s * c * dt.itemsize
        n = min(len(self._buf) // bsz, window)
        if n == 0:
            return None
        raw = np.frombuffer(self._buf[:n * bsz], dt).reshape(n, s, c)
        self._buf = self._buf[n * bsz:]
        dur = int(1e9 * s / self.props["rate"])
        pts = np.arange(self._n, self._n + n) * dur
        self._n += n
        data = jnp.asarray(np.concatenate(
            [raw, np.repeat(raw[-1:], window - n, 0)]) if window > n else raw)
        return FrameBatch(
            data=data,
            pts=jnp.asarray(list(pts) + [int(pts[-1])] * (window - n),
                            jnp.int64),
            flags=jnp.zeros(window, jnp.int32),
            valid=jnp.asarray([True] * n + [False] * (window - n)))

    def process(self, params, state, batch):
        return state, batch
