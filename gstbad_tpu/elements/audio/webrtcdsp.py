"""webrtcdsp / webrtcechoprobe — voice-processing chain
(ext/webrtcdsp/gstwebrtcdsp.cpp, gstwebrtcechoprobe.cpp).

The reference wraps the WebRTC AudioProcessing module: a 10 ms-frame chain
of high-pass filter, echo cancellation (fed by a webrtcechoprobe element on
the playback path), noise suppression, adaptive gain control, and voice
detection, on S16 audio at {48000,32000,16000,8000} Hz
(gstwebrtcdsp.cpp:94-118 caps, :981-1130 properties).

TPU rebuild (documented approximations — the APM's exact fixed-point
internals are an external library, not in-tree):
- high-pass-filter: 2nd-order Butterworth at 90 Hz, run as ONE parallel
  associative scan over 2x2 affine maps (ops/audio.biquad) — no
  sample-serial loop.
- noise-suppression: the published WebRTC NS float algorithm's structure
  over a Hann 50%-overlap STFT (ops/audio.noise_suppress): staggered
  3-window log-quantile noise estimation, time-averaged per-bin LRT +
  spectral flatness + template-difference speech probability,
  speech-gated noise update and a decision-directed Wiener gain;
  suppression level maps to the mode attenuation caps
  low/moderate/high/very-high -> 6/10/15/25 dB.  Parameters follow the
  published ns_core.c; the library is absent here so the output is
  structurally (not bit-) validated.
- gain-control: adaptive-digital mode walks a dB gain toward
  target-level-dbfs bounded by compression-gain-db (rate-limited per
  frame); fixed-digital applies compression-gain-db flat.  limiter
  hard-clips to full scale.
- voice-detection: per-frame energy VAD; likelihood maps to a dBFS
  threshold very-low/low/moderate/high -> -70/-60/-50/-40; posts the
  reference's "voice-activity" message with stream-has-voice on
  transitions (gstwebrtcdsp.cpp:445-473).
- echo-cancel: the far-end (playback) stream arrives as a SECOND graph
  input (`near ! dsp.  far ! webrtcechoprobe ! dsp.  webrtcdsp name=dsp`)
  and a REAL adaptive canceller runs per 10 ms block: the published
  WebRTC AEC structure — a partitioned-block frequency-domain NLMS
  filter (PBFDAF with gradient constraint; ops/audio.aec_cancel) whose
  echo tail is 8 partitions (80 ms), 16 when extended-filter=true
  (aec_core.c's partitioned filter / ExtendedFilter config,
  gstwebrtcdsp.cpp:591), followed by the coherence NLP: per-bin
  hNl = min(coh(d,e), 1 - coh(x,d)) raised to a per-level overdrive
  (echo-suppression-level low/moderate/high -> 1/2/4).  In the
  reference the probe is an element on the playback pipeline feeding
  the DSP through a shared object; here it is explicit dataflow, so
  the far block is a traced input — never a trace-time constant.
  Without a second input the element skips cancellation, like the
  reference's "No echo probe found" warning path; cross-pipeline
  probes route through the inter/proxy bridges.
- delay-agnostic: in the reference this stops reporting stream delay
  to the APM so its internal estimator takes over
  (gstwebrtcdsp.cpp:396,434).  Here the probe is explicit dataflow —
  near and far are sample-aligned by construction and the P-block
  filter absorbs any in-path delay — so the property is accepted and
  has nothing to estimate (documented no-op).
- experimental-agc / startup-min-volume: the APM's ExperimentalAgc
  lifts the analog mic volume to startup-min-volume at startup
  (gstwebrtcdsp.cpp:593).  There is no analog stage here; the digital
  emulation seeds the adaptive gain walk at 20*log10(v/12) dB
  (volume 12 = the property minimum = 0 dB boost), capped at
  compression-gain-db.
"""

from __future__ import annotations


import jax.numpy as jnp
from jax import lax

from gstbad_tpu.core.element import AudioFilter, Element, Property
from gstbad_tpu.core.frame import FrameBatch
from gstbad_tpu.core.registry import register
from gstbad_tpu.core.spec import AudioFormat, MediaSpec, require
from gstbad_tpu.ops import audio as ops

RATES = (48000, 32000, 16000, 8000)  # gstwebrtcdsp.cpp:97
NS_ATTEN_DB = {"low": 6.0, "moderate": 10.0, "high": 15.0,
               "very-high": 25.0}
VAD_THRESH_DB = {"very-low": -70.0, "low": -60.0, "moderate": -50.0,
                 "high": -40.0}
AEC_OVERDRIVE = {"low": 1.0, "moderate": 2.0, "high": 4.0}

@register
class WebrtcEchoProbe(Element):
    """webrtcechoprobe: marks the far-end (playback) branch feeding
    webrtcdsp's second input (gstwebrtcechoprobe.cpp).  Pure passthrough —
    the far-end samples flow to the DSP as explicit dataflow rather than
    through the reference's shared-object side channel."""

    NAME = "webrtcechoprobe"
    PROPERTIES = (Property("probe", str, "webrtcdsp-probe", static=True),)

    def negotiate(self, in_spec: MediaSpec) -> MediaSpec:
        require(in_spec.kind == "audio", "webrtcechoprobe: needs audio")
        return in_spec

    def process(self, params, state, batch: FrameBatch):
        return state, batch


@register
class WebrtcDsp(AudioFilter):
    NAME = "webrtcdsp"
    FORMATS = (AudioFormat.S16,)
    CHANNELS = (1, 2)
    PROPERTIES = (
        Property("probe", str, "webrtcdsp-probe", static=True),
        Property("high-pass-filter", bool, True, static=True),
        Property("echo-cancel", bool, True, static=True),
        Property("echo-suppression-level", str, "moderate", static=True),
        Property("noise-suppression", bool, True, static=True),
        Property("noise-suppression-level", str, "moderate", static=True),
        Property("gain-control", bool, True, static=True),
        Property("gain-control-mode", str, "adaptive-digital", static=True),
        Property("experimental-agc", bool, False, static=True),
        Property("extended-filter", bool, True, static=True),
        Property("delay-agnostic", bool, False, static=True),
        Property("target-level-dbfs", int, 3, 0, 31),
        Property("compression-gain-db", int, 9, 0, 90),
        Property("startup-min-volume", int, 12, 12, 255, static=True),
        Property("limiter", bool, True),
        Property("voice-detection", bool, False, static=True),
        Property("voice-detection-frame-size-ms", int, 10, 10, 30,
                 static=True),
        Property("voice-detection-likelihood", str, "low", static=True),
    )

    def negotiate(self, in_spec: MediaSpec) -> MediaSpec:
        if isinstance(in_spec, list):  # second input = the echo probe
            require(len(in_spec) == 2, "webrtcdsp: at most 2 inputs "
                    "(near-end + echo probe)")
            near, far = in_spec
            require(far.kind == "audio" and far.rate == near.rate,
                    "webrtcdsp: probe stream must match the near-end rate")
            self._has_probe = True
            in_spec = near
        else:
            self._has_probe = False
        spec = super().negotiate(in_spec)
        require(spec.rate in RATES,
                f"webrtcdsp: rate {spec.rate} not in {RATES}")
        require(self.props["noise-suppression-level"] in NS_ATTEN_DB,
                f"webrtcdsp: bad noise-suppression-level")
        require(self.props["echo-suppression-level"] in AEC_OVERDRIVE,
                "webrtcdsp: bad echo-suppression-level")
        require(self.props["voice-detection-likelihood"] in VAD_THRESH_DB,
                "webrtcdsp: bad voice-detection-likelihood")
        self._frame = spec.rate // 100  # 10 ms
        self._hop = self._frame // 2
        self._bins = self._frame // 2 + 1
        self._near_spec = spec  # in_spec may be the 2-input list
        return spec

    def init_state(self, batch: int):
        c = self._near_spec.channels
        gain0 = 0.0
        if (self.props["experimental-agc"]
                and self.props["gain-control-mode"] != "fixed-digital"):
            # digital emulation of ExperimentalAgc's startup volume lift
            import math
            gain0 = min(float(self.props["compression-gain-db"]),
                        20.0 * math.log10(
                            self.props["startup-min-volume"] / 12.0))
        st = {
            "hpf": jnp.zeros((2, c), jnp.float32),
            "stft_tail": jnp.zeros((self._hop, c), jnp.float32),
            "ola_acc": jnp.zeros((self._hop, c), jnp.float32),
            "noise": ops.ns_init(self._bins, c),
            "gain_db": jnp.float32(gain0),
            "had_voice": jnp.bool_(False),
        }
        if self._has_probe and self.props["echo-cancel"]:
            parts = 16 if self.props["extended-filter"] else 8
            st["aec"] = ops.aec_init(self._frame, c, parts)
        return st

    def dynamic_params(self):
        return {
            "target-level-dbfs": jnp.float32(
                self.props["target-level-dbfs"]),
            "compression-gain-db": jnp.float32(
                self.props["compression-gain-db"]),
            "limiter": jnp.bool_(self.props["limiter"]),
        }

    def process(self, params, state, batch: FrameBatch):
        far_batch = None
        if isinstance(batch, list):
            batch, far_batch = batch[0], batch[1]
        b, s, c = batch.data.shape
        n = b * s
        frame, hop = self._frame, self._hop
        require(n % hop == 0,
                f"webrtcdsp: window samples {n} must be a multiple of "
                f"{hop} (5 ms)")
        x = batch.data.reshape(n, c).astype(jnp.float32)

        # 1. high-pass filter (rumble/DC removal)
        hpf_state = state["hpf"]
        if self.props["high-pass-filter"]:
            bq_b, bq_a = ops.butter_highpass(90.0, self._near_spec.rate)
            x, hpf_state = ops.biquad(x, bq_b, bq_a, hpf_state)

        # 2. adaptive echo cancellation on 10 ms blocks (PBFDAF +
        # coherence NLP, ops/audio.aec_cancel); reference: GST_WARNING +
        # skip when no probe is found
        aec_state = state.get("aec")
        ec_on = (self.props["echo-cancel"] and far_batch is not None
                 and aec_state is not None and n % frame == 0)
        if ec_on:
            fd = far_batch.data.reshape(-1, far_batch.data.shape[-1]
                                        ).astype(jnp.float32)
            if fd.shape[0] < n:  # pad a short probe window
                fd = jnp.concatenate(
                    [fd, jnp.zeros((n - fd.shape[0], fd.shape[1]),
                                   jnp.float32)])
            fd = fd[:n]
            far = (jnp.broadcast_to(fd[:, :1], (n, c)) if fd.shape[1] != c
                   else fd)
            od = AEC_OVERDRIVE[self.props["echo-suppression-level"]]
            x, aec_state = ops.aec_cancel(x, far, aec_state, od)

        # 3. STFT chain: noise suppression
        frames, stft_tail = ops.stft_frames(x, state["stft_tail"], frame)
        noise = state["noise"]
        ns_on = self.props["noise-suppression"]
        if ns_on:
            g_min = jnp.float32(10.0 ** (
                -NS_ATTEN_DB[self.props["noise-suppression-level"]] / 20.0))
            frames, noise = ops.noise_suppress(frames, noise, g_min)
        if ns_on:
            y, ola_acc = ops.ola(frames, state["ola_acc"])
        else:
            y, ola_acc = x, state["ola_acc"]

        # 4. gain control on 10 ms frames (skipped when the window is
        # shorter than one frame — nothing to measure)
        gain_db = state["gain_db"]
        if self.props["gain-control"] and n >= frame:
            f10 = y.reshape(n // frame, frame, c) if n % frame == 0 \
                else y[: n - n % frame].reshape(n // frame, frame, c)
            rms = jnp.sqrt(jnp.mean(jnp.square(f10 / 32768.0),
                                    axis=(1, 2)) + 1e-12)
            lvl_db = 20.0 * jnp.log10(rms)
            if self.props["gain-control-mode"] == "fixed-digital":
                gains = jnp.full(f10.shape[0],
                                 params["compression-gain-db"])
            else:
                gain_db, gains = ops.agc_adaptive(
                    lvl_db, gain_db, params["target-level-dbfs"],
                    params["compression-gain-db"])
            lin = 10.0 ** (gains / 20.0)
            lin_s = jnp.repeat(lin, frame)
            if lin_s.shape[0] < n:
                lin_s = jnp.concatenate(
                    [lin_s, jnp.full(n - lin_s.shape[0], lin[-1])])
            y = y * lin_s[:, None]

        # 5. limiter + int16 out
        y = jnp.where(params["limiter"], jnp.clip(y, -32768.0, 32767.0), y)
        y = jnp.clip(y, -32768.0, 32767.0)
        out = y.reshape(b, s, c).astype(jnp.int16)

        new_state = {"hpf": hpf_state, "stft_tail": stft_tail,
                     "ola_acc": ola_acc, "noise": noise,
                     "gain_db": gain_db, "had_voice": state["had_voice"]}
        if aec_state is not None:
            new_state["aec"] = aec_state

        msgs = {}
        if self.props["voice-detection"]:
            vf = (self._near_spec.rate
                  * self.props["voice-detection-frame-size-ms"]) // 1000
            nb = s // vf
            blocks = batch.data[:, :nb * vf].reshape(b, nb, vf, c)
            rms = jnp.sqrt(jnp.mean(jnp.square(
                blocks.astype(jnp.float32) / 32768.0), axis=(2, 3)) + 1e-12)
            db = 20.0 * jnp.log10(rms)
            thr = VAD_THRESH_DB[self.props["voice-detection-likelihood"]]
            has_voice = jnp.any(db > thr, axis=1)
            prev = jnp.concatenate([state["had_voice"][None],
                                    has_voice[:-1]])
            changed = has_voice != prev
            new_state["had_voice"] = has_voice[-1]
            msgs["voice-activity"] = {"_emit": changed,
                                      "stream-has-voice": has_voice}
        return new_state, batch.with_data(out), msgs
