"""adpcmdec — IMA/DVI and Microsoft ADPCM audio decoder
(gst/adpcmdec/adpcmdec.c).

A real in-tree codec with pure per-sample compute (no external library):
4-bit codes expand through a predictor + adaptive step recurrence.  The
recurrence is sequential per channel but independent across blocks, so
the window decodes as ONE `lax.scan` over code positions vectorized over
[blocks, channels] (ops/audio.adpcm_ima_decode / adpcm_ms_decode) —
wall-clock scales with samples-per-block, not total samples.

Input: uint8 blocks [B, blocksize] (one ADPCM block per frame slot, the
reference's block-aligned chain, adpcmdec.c:398-454); push bytes through
`push_bytes` for host-source framing.  Output: interleaved S16.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gstbad_tpu.core.element import Element, Property
from gstbad_tpu.core.frame import FrameBatch
from gstbad_tpu.core.registry import register
from gstbad_tpu.core.spec import AudioFormat, MediaSpec, require
from gstbad_tpu.ops import audio as ops


@register
class AdpcmDec(Element):
    NAME = "adpcmdec"
    KIND = "host-source"
    PROPERTIES = (
        Property("layout", str, "dvi", static=True),  # dvi | microsoft
        Property("blocksize", int, 1024, 8, None, static=True),
        Property("rate", int, 44100, 1, None, static=True),
        Property("channels", int, 1, 1, 2, static=True),
    )

    def __init__(self, **props):
        super().__init__(**props)
        self._buf = b""
        self._n = 0

    def negotiate(self, in_spec):
        require(self.props["layout"] in ("dvi", "microsoft"),
                f"adpcmdec: bad layout {self.props['layout']!r} "
                "(want dvi or microsoft)")
        bs, ch = self.props["blocksize"], self.props["channels"]
        if self.props["layout"] == "dvi":
            require(bs >= 4 * ch, "adpcmdec: blocksize < dvi header")
            self._n_samples = (bs - 4 * ch) * 2 + ch
            # the code region must form whole 8-sample-per-channel groups
            require((self._n_samples - ch) % (8 * ch) == 0,
                    "adpcmdec: blocksize not group-aligned for dvi")
        else:
            require(bs >= 7 * ch, "adpcmdec: blocksize < ms header")
            self._n_samples = (bs - 7 * ch) * 2 + 2 * ch
        return MediaSpec(kind="audio", format=AudioFormat.S16,
                         rate=self.props["rate"], channels=ch)

    def push_bytes(self, data: bytes) -> None:
        self._buf += data

    def pull_window(self, window: int):
        bs = self.props["blocksize"]
        n = min(len(self._buf) // bs, window)
        if n == 0:
            return None
        blocks = np.frombuffer(self._buf[: n * bs],
                               np.uint8).reshape(n, bs)
        self._buf = self._buf[n * bs:]
        dur = self._n_samples * 1_000_000_000 // self.props["rate"]
        pts = (self._n + np.arange(n, dtype=np.int64)) * dur
        self._n += n
        return FrameBatch.make(jnp.asarray(blocks),
                               pts=jnp.asarray(pts))

    def process(self, params, state, batch: FrameBatch):
        ch = self.props["channels"]
        if self.props["layout"] == "dvi":
            out = ops.adpcm_ima_decode(batch.data, ch)
        else:
            out = ops.adpcm_ms_decode(batch.data, ch)
        return state, batch.with_data(out)
