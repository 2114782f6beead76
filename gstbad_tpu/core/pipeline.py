"""Pipeline — composition + compilation of element chains.

The reference schedules one streaming thread per element chain and moves
buffers through pad push (SURVEY.md section 3.1).  Here a pipeline is a list
of elements whose `process` functions compose into ONE pure window function,
compiled by jax.jit into a single fused XLA program — the north-star fusion
goal: a 10-element 1080p graph is one kernel launch per W-frame window, not
10 thread hops.

`parse_launch` maps gst-launch-1.0 syntax onto this composition:

    parse_launch("videotestsrc pattern=ball ! gaussianblur sigma=3 ! appsink")
"""

from __future__ import annotations

import re
import shlex
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gstbad_tpu.core.bus import Bus, Message
from gstbad_tpu.core.element import Element
from gstbad_tpu.core.frame import FrameBatch
from gstbad_tpu.core.registry import make
from gstbad_tpu.core.spec import MediaSpec, SpecError


class Pipeline:
    def __init__(self, elements: Sequence[Element]):
        if not elements:
            raise ValueError("empty pipeline")
        self.elements = list(elements)
        self.bus = Bus()
        self.specs: List[MediaSpec] = []
        self._step = None
        self._states = None
        self._window = None

    # -- negotiation -------------------------------------------------------
    def negotiate(self, in_spec: Optional[MediaSpec] = None) -> MediaSpec:
        """Run spec fixation through the chain (caps negotiation analog)."""
        first = self.elements[0]
        if first.KIND in ("source", "host-source"):
            spec = first.set_info(in_spec or MediaSpec())
        else:
            if in_spec is None:
                raise SpecError("pipeline without source needs an input spec")
            spec = in_spec
        self.specs = []
        for el in self.elements:
            if el.KIND in ("source", "host-source"):
                spec = el.out_spec
            else:
                spec = el.set_info(spec)
            self.specs.append(spec)
        return spec

    @property
    def out_spec(self) -> MediaSpec:
        return self.specs[-1]

    # -- compilation -------------------------------------------------------
    def compile(self, window: int, in_spec: Optional[MediaSpec] = None,
                jit: bool = True, donate_state: bool = True,
                out_shardings=None):
        """Build the fused window function.

        step(params_pytree, states, in_batch_or_None)
            -> (states, out_batch, messages)
        """
        if not self.specs:
            self.negotiate(in_spec)
        self._window = window
        has_source = self.elements[0].KIND == "source"

        def step(params: List[Dict[str, Any]], states: List[Any],
                 in_batch: Optional[FrameBatch]):
            new_states = []
            messages: Dict[str, Dict[str, Any]] = {}
            batch = in_batch
            for i, el in enumerate(self.elements):
                if el.KIND == "source":
                    out = el.generate(params[i], states[i], window)
                else:
                    out = el.process(params[i], states[i], batch)
                if len(out) == 3:
                    st, batch, msgs = out
                    for name, fields in msgs.items():
                        messages[f"{el.NAME}:{name}"] = fields
                else:
                    st, batch = out
                new_states.append(st)
            return new_states, batch, messages

        if jit:
            donate = (1,) if donate_state else ()
            step = jax.jit(step, donate_argnums=donate,
                           out_shardings=out_shardings)
        self._step = step
        if self._states is None:
            # element state (field queues, delay lines, score rings) is
            # window-size independent; keep it across window recompiles
            self._states = [el.init_state(window) for el in self.elements]
        self._has_source = has_source
        return step

    def init_states(self, window: int):
        return [el.init_state(window) for el in self.elements]

    def params(self) -> List[Dict[str, Any]]:
        return [el.dynamic_params() for el in self.elements]

    # -- host runner -------------------------------------------------------
    def run(self, n_frames: int = 0, inputs: Optional[FrameBatch] = None,
            window: Optional[int] = None) -> List[FrameBatch]:
        """Drive the pipeline; returns the valid output frames per window.

        Invalid (masked-out) frames are compacted away host-side between
        windows, the analog of GST_BASE_TRANSFORM_FLOW_DROPPED.
        """
        if inputs is not None:
            window = window or inputs.batch
        if self._step is None or window != self._window:
            self.compile(window)
        states = self._states
        params = self.params()
        outs: List[FrameBatch] = []
        if inputs is not None:
            windows = [jax.tree_util.tree_map(
                lambda x: x[i:i + window], inputs)
                for i in range(0, inputs.batch, window)]
        elif self.elements[0].KIND == "host-source":
            windows = []
            while True:
                w = self.elements[0].pull_window(window)
                if w is None:
                    break
                windows.append(w)
        else:
            n_windows = -(-n_frames // window)
            windows = [None] * n_windows
        host_elements = [el for el in self.elements
                         if getattr(el, "HOST", False)]
        for w in windows:
            states, batch, messages = self._step(params, states, w)
            self._drain_messages(batch, messages)
            np_batch = batch.to_numpy()
            mask = np.asarray(np_batch.valid)
            if not mask.all():
                if not mask.any():
                    continue
                np_batch = jax.tree_util.tree_map(
                    lambda x: x[mask] if x.ndim >= 1 and x.shape[0] == mask.shape[0] else x,
                    np_batch)
            for el in host_elements:
                el.host_process(np_batch, self.bus)
            outs.append(np_batch)
        self._states = states
        return outs

    def _drain_messages(self, batch: FrameBatch, messages) -> None:
        if not messages:
            return
        pts = np.asarray(batch.pts)
        for key, fields in messages.items():
            el_name, struct = key.split(":", 1)
            np_fields = {k: np.asarray(v) for k, v in fields.items()}
            emit = np_fields.pop("_emit", None)
            msg_pts = np_fields.pop("_pts", None)
            n = next(iter(np_fields.values())).shape[0] if np_fields else 0
            for b in range(n):
                if emit is not None and not emit[b]:
                    continue
                p = int(msg_pts[b]) if msg_pts is not None else (
                    int(pts[b]) if b < pts.shape[0] else 0)
                self.bus.post(Message(el_name, struct, p,
                                      {k: v[b].item() if v[b].ndim == 0 else v[b]
                                       for k, v in np_fields.items()}))

    def __repr__(self):
        return " ! ".join(e.NAME for e in self.elements)


_LAUNCH_SPLIT = re.compile(r"\s!\s*|!\s+|\s+!|^!|!$")


def parse_launch(description: str) -> Pipeline:
    """Parse a gst-launch-1.0 style description into a Pipeline.

    Supports `element prop=value ...` segments joined by `!`.  Values may be
    shell-quoted; caps-filter segments (`video/x-raw,format=...`) set the
    negotiation spec for the upstream source element.
    """
    segments = [s.strip() for s in description.split("!")]
    elements: List[Element] = []
    for seg in segments:
        if not seg:
            raise ValueError(f"empty segment in {description!r}")
        if seg.startswith(("video/", "audio/")):
            _apply_capsfilter(elements, seg)
            continue
        toks = shlex.split(seg)
        name, props = toks[0], {}
        for t in toks[1:]:
            if "=" not in t:
                raise ValueError(f"bad property token {t!r} in {seg!r}")
            k, v = t.split("=", 1)
            props[k] = v
        elements.append(make(name, **props))
    return Pipeline(elements)


def _apply_capsfilter(elements: List[Element], seg: str) -> None:
    """Apply `video/x-raw,key=value,...` constraints to the upstream element."""
    if not elements:
        raise ValueError("capsfilter with no upstream element")
    el = elements[-1]
    media, _, rest = seg.partition(",")
    for part in rest.split(",") if rest else []:
        k, _, v = part.partition("=")
        k, v = k.strip(), v.strip()
        if k in ("format",):
            el.set_property("format", v) if "format" in el.props else None
        if k in ("width", "height", "rate", "channels"):
            if k in el.props:
                el.set_property(k, int(v))
        if k == "framerate" and "framerate" in el.props:
            el.set_property("framerate", v)
