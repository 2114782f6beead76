"""Transcoder — the GstTranscoder analog (gst-libs/gst/transcoder/).

The reference wraps uritranscodebin (decodebin3 -> profile encoders -> mux)
with position signals.  Here a Transcoder runs a source file (y4m or raw)
through a filter description to an output file, posting progress on the bus
— the gst-transcoder CLI (tools/gst-transcoder.c) maps onto
tools/tpu_transcode.py.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

from gstbad_tpu.core.frame import FrameBatch
from gstbad_tpu.core.bus import Message
from gstbad_tpu.core.pipeline import Pipeline, parse_launch
from gstbad_tpu.core.spec import MediaSpec, VideoFormat
from gstbad_tpu.io import y4m


class Transcoder:
    def __init__(self, src_uri: str, dest_uri: str, filters: str = "",
                 window: int = 8,
                 on_position: Optional[Callable[[int, int], None]] = None):
        self.src_uri = src_uri
        self.dest_uri = dest_uri
        self.filters = filters.strip()
        self.window = window
        self.on_position = on_position
        desc = "appsrc name=tsrc"
        if self.filters:
            desc += " ! " + self.filters
        desc += " ! appsink"
        self.pipeline = parse_launch(desc)

    @property
    def bus(self):
        return self.pipeline.bus

    def run(self) -> int:
        """Transcode to completion; returns the number of frames written."""
        if not self.src_uri.endswith(".y4m"):
            raise ValueError("transcoder v0 reads y4m input")
        spec, planes = y4m.read_y4m(self.src_uri)
        src = self.pipeline.get_by_name("tsrc")
        src.props["kind"] = "video"
        src.props["format"] = VideoFormat.I420
        src.props["width"] = spec.width
        src.props["height"] = spec.height
        src.props["framerate"] = (f"{spec.framerate.numerator}/"
                                  f"{spec.framerate.denominator}")
        out_spec = self.pipeline.negotiate()
        n = planes["y"].shape[0]
        src.push_frames(planes)
        outs = self.pipeline.run(window=self.window)
        batches = outs if isinstance(outs, list) else outs[0]
        total_ns = int(n * spec.frame_duration_ns)
        written = 0
        out_planes = {"y": [], "u": [], "v": []}
        for b in batches:
            data = b.data
            if not isinstance(data, dict):
                raise ValueError(
                    f"transcoder v0 writes y4m (I420) output; pipeline "
                    f"produced {out_spec}; add `videoconvert format=I420`")
            for k in out_planes:
                out_planes[k].append(np.asarray(data[k]))
            written += b.batch
            pos = int(np.asarray(b.pts)[-1]) if b.batch else 0
            if self.on_position:
                self.on_position(pos, total_ns)
            self.bus.post(Message("transcoder", "position", pos,
                                  {"position": pos, "duration": total_ns}))
        merged = {k: np.concatenate(v) for k, v in out_planes.items()}
        y4m.write_y4m(self.dest_uri, out_spec, merged)
        return written
