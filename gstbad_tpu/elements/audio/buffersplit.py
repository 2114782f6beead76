"""audiobuffersplit (gst/audiobuffersplit/) — exact-duration re-chunker.

The reference accumulates input in an adapter and emits buffers of exactly
output-buffer-duration (gstaudiobuffersplit.c:99-155).  Static-shape rebuild:
each window re-chunks B*S samples plus the carried remainder into
fixed-size output blocks with a validity mask for the partial tail.
"""

from __future__ import annotations

from fractions import Fraction

import jax.numpy as jnp
import numpy as np

from gstbad_tpu.core.element import AudioFilter, Property
from gstbad_tpu.core.frame import FLAG_DISCONT, FrameBatch
from gstbad_tpu.core.registry import register
from gstbad_tpu.core.spec import AudioFormat, MediaSpec


@register
class AudioBufferSplit(AudioFilter):
    NAME = "audiobuffersplit"
    FORMATS = AudioFormat.ALL
    PROPERTIES = (
        Property("output-buffer-duration", str, "1/50", static=True,
                 doc="seconds, as a fraction (default 20 ms)"),
        # GstAudioStreamAlign knobs (gstaudiobuffersplit.c:123-136):
        # a timestamp drift beyond alignment-threshold sustained for
        # discont-wait resyncs the output timeline to the input pts.
        # Detection here is at window granularity (our chain unit).
        Property("alignment-threshold", int, 40_000_000),   # ns, 40 ms
        Property("discont-wait", int, 1_000_000_000),       # ns, 1 s
        # strict-buffer-size: discard the carried partial tail at EOS
        # instead of emitting a short buffer (gstaudiobuffersplit.c:138-141)
        Property("strict-buffer-size", bool, False, static=True),
        # gapless silence insertion (gstaudiobuffersplit.c:145-155) needs
        # data-dependent sample insertion — incompatible with the fused
        # static-shape window; resync (the default path) is implemented.
        Property("gapless", bool, False, static=True),
    )

    def __init__(self, **props):
        super().__init__(**props)
        if self.props["gapless"]:
            raise ValueError(
                "audiobuffersplit: gapless silence insertion is not "
                "supported in the fused window program (data-dependent "
                "output length); use the default resync behavior")

    def negotiate(self, in_spec: MediaSpec) -> MediaSpec:
        frac = Fraction(self.props["output-buffer-duration"])
        self._out_samples = int(in_spec.rate * frac)
        if self._out_samples < 1:
            raise ValueError("output-buffer-duration too small")
        return in_spec

    def init_state(self, batch: int):
        c = self.in_spec.channels
        dtype = jnp.dtype(AudioFormat.dtype(self.in_spec.format))
        return {
            "rem": jnp.zeros((self._out_samples, c), dtype),
            "rem_fill": jnp.int32(0),
            "next_pts": jnp.int64(0),
            "have_pts": jnp.bool_(False),
            "next_in_pts": jnp.int64(0),
            "misaligned_since": jnp.int64(-1),
        }

    def process(self, params, state, batch: FrameBatch):
        b, s, c = batch.data.shape
        so = self._out_samples
        total_max = b * s + so  # remainder + window samples
        n_out = total_max // so  # fixed output block count per window
        # lay remainder + input contiguously, zero-padded to n_out*so
        flat = batch.data.reshape(b * s, c)
        buf = jnp.zeros((n_out * so + so, c), flat.dtype)
        buf = lax_dynamic_update(buf, state["rem"], 0)
        buf = lax_dynamic_update(buf, flat, state["rem_fill"])
        fill = state["rem_fill"] + b * s
        n_full = fill // so
        blocks = buf[:n_out * so].reshape(n_out, so, c)
        valid = jnp.arange(n_out) < n_full
        # carry the tail
        tail_start = n_full * so
        rem = jnp.zeros((so, c), flat.dtype)
        rem_fill = fill - tail_start
        idx = tail_start + jnp.arange(so)
        rem = jnp.where((jnp.arange(so) < rem_fill)[:, None],
                        buf[idx], rem)
        # timestamps: continuous from the first input pts seen; a drift
        # beyond alignment-threshold sustained past discont-wait resyncs
        # the output timeline to the input pts (GstAudioStreamAlign)
        in_pts = batch.pts[0]
        drift = jnp.abs(in_pts - state["next_in_pts"])
        misaligned = state["have_pts"] & \
            (drift > params["alignment-threshold"])
        since = jnp.where(misaligned,
                          jnp.where(state["misaligned_since"] >= 0,
                                    state["misaligned_since"], in_pts),
                          jnp.int64(-1))
        resync = misaligned & (since >= 0) & \
            (in_pts - since >= params["discont-wait"])
        base = jnp.where(resync, in_pts, state["next_pts"])
        since = jnp.where(resync, jnp.int64(-1), since)

        first_pts = jnp.where(state["have_pts"], base, in_pts)
        dur = jnp.int64(round(1e9 * so / self.in_spec.rate))
        pts = first_pts + jnp.arange(n_out, dtype=jnp.int64) * dur
        next_pts = first_pts + n_full.astype(jnp.int64) * dur
        in_dur = (jnp.int64(b * s) * 1_000_000_000) // self.in_spec.rate
        # expected input position accumulates from the aligned timeline;
        # only a resync (or stream start) re-anchors it to the actual pts —
        # otherwise a sustained jump would "self-heal" after one window and
        # discont-wait could never elapse (GstAudioStreamAlign tracks the
        # accumulated expected position the same way)
        next_in = jnp.where(resync | ~state["have_pts"],
                            in_pts + in_dur,
                            state["next_in_pts"] + in_dur)
        new_state = {"rem": rem, "rem_fill": rem_fill.astype(jnp.int32),
                     "next_pts": next_pts, "have_pts": jnp.bool_(True),
                     "next_in_pts": next_in,
                     "misaligned_since": since}
        flags = jnp.zeros(n_out, jnp.int32).at[0].set(
            jnp.where(resync, jnp.int32(FLAG_DISCONT), 0))
        out = FrameBatch(data=blocks, pts=pts, flags=flags, valid=valid)
        return new_state, out


def lax_dynamic_update(buf, update, start):
    import jax.lax as lax
    return lax.dynamic_update_slice(
        buf, update, (jnp.asarray(start, jnp.int32), jnp.int32(0)))
