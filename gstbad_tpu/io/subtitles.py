"""Subtitle encoders (gst/subenc/): srtenc + webvttenc, byte-domain.

srtenc (gstsrtenc.c:82-131): per text buffer emits
  "<counter>\\n<HH:MM:SS,mmm> --> <HH:MM:SS,mmm>\\n<text>\\n\\n"
with counter starting at 1 (gstsrtenc.c:161), default duration 1 s when
the buffer carries none, and controllable timestamp/duration offsets.
webvttenc (gstwebvttenc.c:81-135): a "WEBVTT\\n\\n" stream header, no
stanza counter, and '.' as the milliseconds separator.
"""

from __future__ import annotations

NSEC = 1_000_000_000
MSEC = 1_000_000


def _ts(t_ns: int, sep: str) -> str:
    h, t_ns = divmod(t_ns, 3600 * NSEC)
    m, t_ns = divmod(t_ns, 60 * NSEC)
    s, t_ns = divmod(t_ns, NSEC)
    ms = t_ns // MSEC
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{ms:03d}"


class SrtEnc:
    SEP = ","
    HEADER = ""

    def __init__(self, timestamp_offset_ns: int = 0,
                 duration_offset_ns: int = 0):
        self.timestamp = timestamp_offset_ns
        self.duration = duration_offset_ns
        self.counter = 1
        self._started = False

    def encode(self, text: str, pts_ns: int,
               duration_ns: int = -1) -> bytes:
        ts = pts_ns + self.timestamp
        if duration_ns >= 0:
            dur = duration_ns + self.duration
        elif self.duration > 0:
            dur = self.duration
        else:
            dur = NSEC
        parts = []
        if not self._started and self.HEADER:
            parts.append(self.HEADER)
        self._started = True
        if self.SEP == ",":  # srt stanza counter (gstsrtenc.c:105)
            parts.append(f"{self.counter}\n")
            self.counter += 1
        parts.append(f"{_ts(ts, self.SEP)} --> {_ts(ts + dur, self.SEP)}\n")
        parts.append(text)
        parts.append("\n\n")
        return "".join(parts).encode()


class WebvttEnc(SrtEnc):
    SEP = "."
    HEADER = "WEBVTT\n\n"
