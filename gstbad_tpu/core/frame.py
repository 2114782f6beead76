"""FrameBatch — the buffer analog: a window of media frames as one pytree.

The reference moves one GstBuffer at a time between streaming threads; here a
window of W frames moves through one compiled XLA program.  Buffer metadata
(PTS, video field flags — GST_VIDEO_BUFFER_FLAG_* as used by
gst/ivtc/gstivtc.c:519-534 and gst/fieldanalysis) rides along as int arrays,
and a validity mask replaces data-dependent buffer dropping
(GST_BASE_TRANSFORM_FLOW_DROPPED) so shapes stay static under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

# Video buffer flags (values are ours; semantics mirror GST_VIDEO_BUFFER_FLAG_*)
FLAG_INTERLACED = 1 << 0
FLAG_TFF = 1 << 1
FLAG_RFF = 1 << 2
FLAG_ONEFIELD = 1 << 3
FLAG_GAP = 1 << 4
FLAG_DISCONT = 1 << 5  # GST_BUFFER_FLAG_DISCONT analog
# composed field markers for interlace-mode=alternate streams, mirroring
# GStreamer's TOP_FIELD = TFF|ONEFIELD / BOTTOM_FIELD = ONEFIELD composition
FLAG_TOP_FIELD = FLAG_TFF | FLAG_ONEFIELD
FLAG_BOTTOM_FIELD = FLAG_ONEFIELD

Array = Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FrameBatch:
    """A batch/window of frames.

    data: uint8 [B, H, W, C] for packed video; {plane: array} for planar;
          [B, S, C] for audio (S samples per frame-block, C channels).
    pts:  int64 [B] nanoseconds.
    flags: int32 [B] bitmask of FLAG_*.
    valid: bool [B]; frames with valid=False are dropped by the runner.
    """

    data: Union[Array, Dict[str, Array]]
    pts: Array
    flags: Array
    valid: Array
    # optional packed-u32 twin of `data` for 4-byte packed video ([B, H, W]
    # i32, byte c of the word == data[..., c]): producers that already hold
    # the word (videotestsrc's broadcast path) attach it so the table-fusion
    # chain can start without the u8<->i32 relayout round trip.  Any
    # with_data() drops it — it is only ever a view of the CURRENT data.
    word: Optional[Array] = None
    # optional [1, H, W] i32 BROADCAST base of `word`: producers whose
    # frame is static across the window (videotestsrc non-animated
    # patterns) attach the single source frame so the fused chain kernel
    # (ops/chainfuse.py) can read it once instead of reading a
    # materialized [B, H, W] broadcast per frame.  Like `word`, any
    # with_data() drops it.
    word_base: Optional[Array] = None
    # optional [B, 2] int32 (head, tail) samples logically REMOVED from
    # audio blocks — the gst_audio_buffer_clip analog for static shapes.
    # Gating elements (avwait, audiosegmentclip) set it on boundary
    # blocks; the runner slices it away host-side when compacting, so
    # sinks and run() callers observe the sample-exact clipped stream.
    # with_data() keeps it only while the sample axis is unchanged;
    # elements that re-chunk must translate or drop it themselves.
    trim: Optional[Array] = None

    @staticmethod
    def make(data, pts=None, flags=None, valid=None) -> "FrameBatch":
        if isinstance(data, dict):
            b = next(iter(data.values())).shape[0]
        else:
            b = data.shape[0]
        if pts is None:
            pts = jnp.zeros((b,), jnp.int64)
        if flags is None:
            flags = jnp.zeros((b,), jnp.int32)
        if valid is None:
            valid = jnp.ones((b,), bool)
        return FrameBatch(data=data, pts=pts, flags=flags, valid=valid)

    @property
    def batch(self) -> int:
        if isinstance(self.data, dict):
            return next(iter(self.data.values())).shape[0]
        return self.data.shape[0]

    def with_data(self, data) -> "FrameBatch":
        trim = self.trim
        if trim is not None:
            same = (not isinstance(data, dict)
                    and not isinstance(self.data, dict)
                    and getattr(data, "shape", None)
                    == getattr(self.data, "shape", None))
            if not same:
                trim = None
        return dataclasses.replace(self, data=data, word=None,
                                   word_base=None, trim=trim)

    def replace(self, **kw) -> "FrameBatch":
        return dataclasses.replace(self, **kw)

    def to_numpy(self) -> "FrameBatch":
        return jax.tree_util.tree_map(np.asarray, self)


def pts_ramp(batch: int, spec, start_ns: int = 0) -> jnp.ndarray:
    """PTS values for `batch` consecutive frames of `spec`."""
    dur = spec.frame_duration_ns
    return (jnp.arange(batch, dtype=jnp.int64) * dur + start_ns)
