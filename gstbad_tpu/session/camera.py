"""Camera — the camerabin2 capture-orchestration analog
(gst/camerabin2/gstcamerabin2.c).

The reference is a bin coordinating a camera source with two capture
modes: MODE_IMAGE (start-capture grabs one image to `location`, posts an
"image-done" element message, gstcamerabin2.c:46-49,333-380) and
MODE_VIDEO (start-capture/stop-capture bracket a recording).  `location`
is a printf pattern indexed by capture count; digital zoom sits in the
source path (gstdigitalzoom.c — our digitalzoom element).

Here Camera owns a source pipeline (any launch string) with a digitalzoom
stage, steps it window-by-window, and writes PNM snapshots / y4m
recordings through the io layer.  Messages post on the pipeline bus.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from gstbad_tpu.core.bus import Message
from gstbad_tpu.core.pipeline import parse_launch
from gstbad_tpu.core.spec import VideoFormat

MODE_IMAGE = 1  # gstcamerabin2.c MODE_IMAGE / MODE_VIDEO enum
MODE_VIDEO = 2


class Camera:
    def __init__(self, source: str = "videotestsrc pattern=bars "
                 "width=320 height=240 format=AYUV",
                 mode: int = MODE_IMAGE,
                 location: Optional[str] = None,
                 zoom: float = 1.0, window: int = 4,
                 post_previews: bool = False,
                 preview_width: Optional[int] = None,
                 preview_height: Optional[int] = None):
        self.mode = mode
        # DEFAULT location patterns: img_%d / vid_%d (gstcamerabin2.c)
        self.location = location or ("img_%d.pnm" if mode == MODE_IMAGE
                                     else "vid_%d.y4m")
        self.window = window
        self._capture_index = 0
        self._recording = None  # list of plane dicts while MODE_VIDEO runs
        # viewfinder branch (gstcamerabin2.c:102: the bin tees into
        # viewfinder + capture + preview branches; the viewfinder gets the
        # stream in EVERY mode, captures or not)
        self._viewfinder = None
        # post-previews / preview-caps (gstcamerabin2.c:713-756): one
        # preview-image element message per capture, in both modes
        self.post_previews = post_previews
        self.preview_size = ((preview_width, preview_height)
                             if preview_width and preview_height else None)
        self.pipeline = parse_launch(
            f"{source} ! digitalzoom name=zoom zoom={zoom} ! fakesink")
        self.pipeline.negotiate()
        self._zoom_el = self.pipeline.get_by_name("zoom")

    @property
    def bus(self):
        return self.pipeline.bus

    @property
    def zoom(self) -> float:
        return self._zoom_el.props["zoom"]

    @zoom.setter
    def zoom(self, value: float) -> None:
        self._zoom_el.props["zoom"] = float(value)

    def _next_location(self) -> str:
        loc = self.location
        out = loc % self._capture_index if "%" in loc else loc
        self._capture_index += 1
        return out

    def set_viewfinder(self, callback) -> None:
        """Attach the viewfinder sink: `callback(frames, spec)` receives
        every pulled window (the vfbin branch analog)."""
        self._viewfinder = callback

    def run_viewfinder(self, n_windows: int = 1) -> None:
        """Pump preview frames with no capture active — the reference
        pipeline runs the viewfinder branch as soon as it is PLAYING,
        before/between captures."""
        for _ in range(n_windows):
            self._pull()

    @property
    def idle(self) -> bool:
        """The `idle` property (gstcamerabin2.c): no capture running."""
        return self._recording is None

    @property
    def ready_for_capture(self) -> bool:
        return self.mode == MODE_IMAGE or self._recording is None

    def _frame_of(self, batch):
        valid = np.asarray(batch.valid)
        idx = int(np.argmax(valid)) if valid.any() else 0
        if isinstance(batch.data, dict):
            return np.asarray(batch.data["y"])[idx]
        return np.asarray(batch.data)[idx]

    def _post_preview(self, frame: np.ndarray, location: str) -> None:
        """preview-image element message (gstcamerabin2.c:58-60); the
        preview-caps rescale is nearest-neighbor here (the reference
        builds a videoscale preview pipeline)."""
        if not self.post_previews:
            return
        img = frame
        if self.preview_size is not None:
            pw, ph = self.preview_size
            ys = (np.arange(ph) * img.shape[0] // ph)
            xs = (np.arange(pw) * img.shape[1] // pw)
            img = img[ys][:, xs]
        self.bus.post(Message("camerabin", "preview-image", 0,
                              {"buffer": img, "location": location}))

    def _pull(self):
        outs = self.pipeline.run(n_frames=self.window, window=self.window)
        batches = outs if isinstance(outs, list) else outs[0]
        if self._viewfinder is not None:
            for b in batches:
                self._viewfinder(b, self.pipeline.out_spec)
        return batches

    def start_capture(self) -> Optional[str]:
        """MODE_IMAGE: grab one frame to the next location, post
        image-done.  MODE_VIDEO: begin accumulating frames."""
        if self.mode == MODE_IMAGE:
            batches = self._pull()
            frame = self._frame_of(batches[0])
            loc = self._next_location()
            self._write_image(frame, loc)
            self._post_preview(frame, loc)
            self.bus.post(Message("camerabin", "image-done", 0,
                                  {"filename": loc}))
            return loc
        self._recording = []
        # video mode posts its preview at capture start
        # (gstcamerabin2.c:33 "Post preview images for each capture
        # (video and image)")
        if self.post_previews:
            batches = self._pull()
            self._post_preview(self._frame_of(batches[0]),
                               self.location % self._capture_index
                               if "%" in self.location else self.location)
            self.step_batches(batches)
        return None

    def step(self) -> None:
        """MODE_VIDEO: advance one window while recording."""
        if self._recording is None:
            raise RuntimeError("camera: start_capture first")
        self.step_batches(self._pull())

    def step_batches(self, batches) -> None:
        for b in batches:
            valid = np.asarray(b.valid)
            data = b.data
            if isinstance(data, dict):
                self._recording.append(
                    {k: np.asarray(v)[valid] for k, v in data.items()})
            else:
                self._recording.append({"p": np.asarray(data)[valid]})

    def stop_capture(self) -> Optional[str]:
        """MODE_VIDEO: finish the recording, write it, post video-done."""
        if self.mode != MODE_VIDEO or self._recording is None:
            return None
        loc = self._next_location()
        spec = self.pipeline.out_spec
        frames = self._recording
        self._recording = None
        if not frames:
            return None
        merged = {k: np.concatenate([f[k] for f in frames])
                  for k in frames[0]}
        if spec.format == VideoFormat.I420:
            from gstbad_tpu.io import y4m
            y4m.write_y4m(loc, spec, merged)
        else:
            merged["p" if "p" in merged else "y"].tofile(loc)
        self.bus.post(Message("camerabin", "video-done", 0,
                              {"filename": loc}))
        return loc

    def _write_image(self, frame: np.ndarray, loc: str) -> None:
        from gstbad_tpu.io import pnm
        spec = self.pipeline.out_spec
        if frame.ndim == 3 and frame.shape[-1] == 4:
            if spec.format == VideoFormat.AYUV:
                # quick view: write luma; full conversion is videoconvert's
                pnm.write_pnm(loc, frame[..., 1])
            else:
                r, g, b, _ = VideoFormat.rgb_offsets(spec.format)
                pnm.write_pnm(loc, frame[..., [r, g, b]])
        else:
            pnm.write_pnm(loc, frame)
