"""Play — the GstPlay session API analog (gst-libs/gst/play/gstplay.c).

The reference runs a dedicated GMainContext thread wrapping playbin and
marshals API calls into it (gstplay.c:276,510,616-628).  Here Play owns a
worker thread stepping a Pipeline window-by-window, optionally paced to the
stream framerate, with position/duration queries and bus callbacks —
play/pause/stop/seek against the same state names.
"""

from __future__ import annotations

import threading
import time
from enum import Enum
from typing import Callable, Optional

import numpy as np

from gstbad_tpu.core.pipeline import Pipeline, parse_launch


class PlayState(Enum):
    STOPPED = "stopped"
    PAUSED = "paused"
    PLAYING = "playing"


class Play:
    def __init__(self, pipeline, window: int = 8, realtime: bool = True,
                 on_frame: Optional[Callable] = None,
                 n_frames: Optional[int] = None):
        if isinstance(pipeline, str):
            pipeline = parse_launch(pipeline)
        self.pipeline = pipeline
        self.window = window
        self.realtime = realtime
        self.on_frame = on_frame
        self.n_frames = n_frames
        self.state = PlayState.STOPPED
        self._position_ns = 0
        self._thread: Optional[threading.Thread] = None
        self._wake = threading.Event()
        self._stop = threading.Event()

    @classmethod
    def from_uri(cls, uri: str, **kw) -> "Play":
        """GstPlay-style URI entry point.  Supports `testbin://` stream
        specs (gsttestsrcbin.c URI handler; one pipeline chain per stream)
        and `.y4m` file paths/URIs via the y4m reader."""
        if uri.startswith("testbin://"):
            from gstbad_tpu.session.testbin import testbin_launch
            return cls(testbin_launch(uri), **kw)
        path = uri[len("file://"):] if uri.startswith("file://") else uri
        if path.endswith(".y4m"):
            from gstbad_tpu.core.pipeline import parse_launch
            from gstbad_tpu.io import y4m
            spec, planes = y4m.read_y4m(path)
            p = parse_launch(
                f"appsrc name=src format={spec.format} width={spec.width} "
                f"height={spec.height} framerate={spec.framerate.numerator}"
                f"/{spec.framerate.denominator} ! fakevideosink")
            p.get_by_name("src").push_frames(planes)
            kw.setdefault("n_frames", next(iter(planes.values())).shape[0])
            return cls(p, **kw)
        # typefind + decodebin fallback (r3): sniff the file and build
        # the matching real-decoder source (H.265, AV1/IVF, WebP,
        # JPEG2000, game-music, tracker modules, AIFF)
        import os
        if os.path.exists(path):
            import gstbad_tpu as gt
            from gstbad_tpu.core.pipeline import Pipeline
            from gstbad_tpu.io import typefind
            with open(path, "rb") as f:
                data = f.read()
            mtype, src = typefind.make_source(data, path=path)
            sink = gt.make("fakeaudiosink"
                           if mtype.startswith("audio/")
                           else "fakevideosink")
            return cls(Pipeline([src, sink]), **kw)
        raise ValueError(f"Play.from_uri: unsupported uri {uri!r} "
                         "(testbin://, .y4m, or a typefindable file)")

    @property
    def bus(self):
        return self.pipeline.bus

    # -- state machine ------------------------------------------------------
    def play(self) -> None:
        if self.state == PlayState.PLAYING:
            return
        self.state = PlayState.PLAYING
        self._wake.set()
        if self._thread is None or not self._thread.is_alive():
            self._stop.clear()
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    def pause(self) -> None:
        if self.state == PlayState.PLAYING:
            self.state = PlayState.PAUSED
            self._wake.clear()

    def stop(self) -> None:
        self.state = PlayState.STOPPED
        self._stop.set()
        self._wake.set()
        if self._thread:
            self._thread.join(timeout=5)
            self._thread = None
        self._position_ns = 0

    def seek(self, position_ns: int) -> None:
        """Flush + restart at position (sources regenerate from counters;
        stateful element carries reset, like a FLUSH_STOP)."""
        was_playing = self.state == PlayState.PLAYING
        self.stop()
        self.pipeline._states = None
        self.pipeline._step = None
        for n in self.pipeline.nodes:
            el = n.element
            if hasattr(el, "_pts"):
                el._pts = 0
        self._position_ns = position_ns
        if was_playing:
            self.play()

    @property
    def position(self) -> int:
        return self._position_ns

    # -- worker --------------------------------------------------------------
    def _clock(self):
        """Pacing clock: a clockselect element in the graph wins
        (gstclockselect.c), else the monotonic default."""
        for n in getattr(self.pipeline, "nodes", []):
            if getattr(n.element, "NAME", "") == "clockselect":
                return n.element.clock()
        return time.monotonic

    def _loop(self) -> None:
        spec = self.pipeline.negotiate() if self.pipeline._order is None \
            else self.pipeline.out_spec
        dur = spec.frame_duration_ns if spec.kind == "video" else int(1e9 / 30)
        frames_done = 0
        clock = self._clock()
        while not self._stop.is_set():
            if self.state != PlayState.PLAYING:
                self._wake.wait(timeout=0.1)
                continue
            t0 = clock()
            outs = self.pipeline.run(n_frames=self.window, window=self.window)
            batches = outs if isinstance(outs, list) else outs[0]
            for b in batches:
                if self.on_frame is not None:
                    for i in range(b.batch):
                        self.on_frame(b, i)
                if b.batch:
                    self._position_ns = int(np.asarray(b.pts)[-1]) + dur
            frames_done += self.window
            if self.n_frames is not None and frames_done >= self.n_frames:
                self.state = PlayState.STOPPED
                return
            if self.realtime:
                budget = self.window * dur / 1e9
                elapsed = clock() - t0
                if elapsed < budget:
                    time.sleep(budget - elapsed)
