"""Golden fieldanalysis (gst/fieldanalysis/gstfieldanalysis.c).

Frames are luma planes [H, W] uint8 (even H).  parity: 0 = TOP, 1 = BOTTOM.
"""

from __future__ import annotations

import numpy as np

TOP, BOTTOM, BOTH = 0, 1, 2

# conclusions (enum FieldAnalysisConclusion)
PROGRESSIVE, INTERLACED, TC_PROGRESSIVE, TC_MIXED = 0, 1, 2, 3

# telecine_matches bits (gstfieldanalysis.c:598-601)
M_TOP_BOTTOM = 1 << 0
M_BOTTOM_TOP = 1 << 1
M_TOP_MATCH = 1 << 2
M_BOTTOM_MATCH = 1 << 3

DEFAULTS = dict(noise_floor=16, field_thresh=0.08, frame_thresh=0.002,
                spatial_thresh=9, block_width=16, block_height=16,
                block_thresh=80, ignored_lines=2)


def _field(frame, parity):
    return frame[parity::2].astype(np.int64)


def same_parity_sad(f0, p0, f1, p1, noise_floor=16):
    """same_parity_sad (gstfieldanalysis.c:812-849 + orc sad)."""
    a = _field(f0, p0)
    b = _field(f1, p1)
    d = np.abs(a - b)
    d = np.where(d > noise_floor, d, 0)
    h, w = f0.shape
    return float(d.sum()) / (0.5 * w * h)


def same_parity_ssd(f0, p0, f1, p1, noise_floor=16):
    a = _field(f0, p0)
    b = _field(f1, p1)
    d = (a - b) ** 2
    d = np.where(d > noise_floor * noise_floor, d, 0)
    h, w = f0.shape
    return float(d.sum()) / (0.5 * w * h)


def same_parity_3_tap(f0, p0, f1, p1, noise_floor=16):
    """same_parity_3_tap (gstfieldanalysis.c:898-955): horizontal [1,4,1].

    The reference's middle ORC call covers tap centers 1..w-1 where the last
    one reads one sample past the row (stride padding, undefined); this
    transcription covers the well-defined centers 1..w-2 plus the two
    unrolled edge cases.
    """
    a = _field(f0, p0)
    b = _field(f1, p1)
    nt = noise_floor * 6
    h, w = f0.shape
    total = 0
    # first unrolled: |4a0+2a1 - (4b0+2b1)|
    d = np.abs((a[:, 0] << 2) + (a[:, 1] << 1)
               - ((b[:, 0] << 2) + (b[:, 1] << 1)))
    total += d[d > nt].sum()
    # middle centers 1..w-2
    mid = np.abs((a[:, :-2] + 4 * a[:, 1:-1] + a[:, 2:])
                 - (b[:, :-2] + 4 * b[:, 1:-1] + b[:, 2:]))
    total += mid[mid > nt].sum()
    # last unrolled: |2a[w-2]+4a[w-1] - (2b[w-2]+4b[w-1])|
    d = np.abs((a[:, -2] << 1) + (a[:, -1] << 2)
               - ((b[:, -2] << 1) + (b[:, -1] << 2)))
    total += d[d > nt].sum()
    return float(total) / ((6.0 / 2.0) * w * h)


def _interleave_by_parity(f0, p0, f1):
    """Combined frame for opposite-parity metrics: even rows from the frame
    whose field of interest is examined (gstfieldanalysis.c:972-1006)."""
    if p0 == TOP:
        top_src, bottom_src = f0, f1
    else:
        top_src, bottom_src = f1, f0
    il = top_src.copy()
    il[1::2] = bottom_src[1::2]
    return il.astype(np.int64)


def opposite_parity_5_tap(f0, p0, f1, noise_floor=16):
    """opposite_parity_5_tap (gstfieldanalysis.c:959-1043):
    vertical [1,-3,4,-3,1] around each field-of-interest line with mirrored
    boundaries."""
    il = _interleave_by_parity(f0, p0, f1)
    h, w = il.shape
    nt = noise_floor * 6
    total = 0
    for j in range(h // 2):
        c = 2 * j
        if j == 0:
            rows = (c + 2, c + 1, c, c + 1, c + 2)
        elif j == h // 2 - 1:
            rows = (c - 2, c - 1, c, c - 1, c - 2)
        else:
            rows = (c - 2, c - 1, c, c + 1, c + 2)
        v = np.abs(il[rows[0]] - 3 * il[rows[1]] + 4 * il[rows[2]]
                   - 3 * il[rows[3]] + il[rows[4]])
        total += v[v > nt].sum()
    return float(total) / ((6.0 / 2.0) * w * h)


def _block_score_for_row_5_tap(il, j0, spatial_thresh, block_width,
                               block_height):
    """block_score_for_row_5_tap (gstfieldanalysis.c:1225-1330) on the
    interleaved frame; j0 is the absolute row of base_fj."""
    h, w_full = il.shape
    w = w_full - (w_full % block_width)
    n_blocks = w // block_width
    scores = np.zeros(w, np.int64)  # over-allocated like the reference
    stx6 = 6 * spatial_thresh

    def row(r):
        return il[min(max(r, 0), h - 1)]

    for j in range(block_height):
        c = j0 + j
        fjm2, fjm1 = il[c - 2], il[c - 1]
        fj, fjp1, fjp2 = il[c], il[c + 1] if c + 1 < h else il[c - 1], \
            il[c + 2] if c + 2 < h else il[c - 2]
        diff1 = fj.astype(np.int64) - fjm1
        diff2 = fj.astype(np.int64) - fjp1
        dir_ok = ((diff1 > spatial_thresh) & (diff2 > spatial_thresh)) | \
                 ((diff1 < -spatial_thresh) & (diff2 < -spatial_thresh))
        five = np.abs(fjm2 + (fj.astype(np.int64) << 2) + fjp2
                      - 3 * (fjm1 + fjp1))
        mask = dir_ok & (five > stx6)
        for i in range(1, w):
            res_idx = (i - 1) // block_width
            if i == 1:
                if mask[0] and mask[1]:
                    scores[res_idx] += 1
            elif i == w - 1:
                if mask[i - 2] and mask[i - 1] and mask[i]:
                    scores[res_idx] += 1
                if mask[i - 1] and mask[i]:
                    scores[i // block_width] += 1
            elif mask[i - 2] and mask[i - 1] and mask[i]:
                scores[res_idx] += 1
    return int(scores[:n_blocks].max()) if n_blocks else 0


def opposite_parity_windowed_comb(f0, p0, f1, interlaced_input=False,
                                  **params):
    """opposite_parity_windowed_comb (gstfieldanalysis.c:1337-1400)."""
    p = {**DEFAULTS, **params}
    il = _interleave_by_parity(f0, p0, f1)
    h = il.shape[0]
    bh = p["block_height"]
    slightly = False
    j = 0
    while j <= h - p["ignored_lines"] - bh:
        score = _block_score_for_row_5_tap(
            il, p["ignored_lines"] + j, p["spatial_thresh"],
            p["block_width"], bh)
        if p["block_thresh"] // 2 < score <= p["block_thresh"]:
            slightly = True
        elif score > p["block_thresh"]:
            return 1.0 if interlaced_input else 2.0
        j += bh
    return float(slightly)


class GoldenFieldAnalysis:
    """The 2-frame history pipeline + decision tree
    (gst_field_analysis_process_buffer, gstfieldanalysis.c:1404-1700).

    push(frame) returns a list of (frame, flags_dict, conclusion) outputs.
    """

    def __init__(self, **params):
        self.p = {**DEFAULTS, **params}
        self.frames = []   # [current, previous]
        self.results = []
        self.first_buffer = True
        self.is_telecine = False
        self.outputs = []

    # metric wrappers using defaults (SSD field metric, 5-tap frame metric)
    def _same_field(self, f0, p0, f1, p1):
        return same_parity_ssd(f0, p0, f1, p1, self.p["noise_floor"])

    def _same_frame(self, f0, p0, f1):
        return opposite_parity_5_tap(f0, p0, f1, self.p["noise_floor"])

    def _decorate(self, tff, onefield, conclusion, drop):
        frame, res = self.frames.pop(), self.results.pop()
        flags = {}
        # tff == -1 keeps the buffer's existing flag (absent on progressive
        # input), 1 sets, 0 clears (gstfieldanalysis.c:652-659)
        flags["tff"] = (tff == 1)
        flags["onefield"] = bool(onefield)
        flags["rff"] = bool(drop)
        flags["interlaced"] = conclusion not in (PROGRESSIVE, TC_PROGRESSIVE)
        self.outputs.append((frame, flags, conclusion))

    def push(self, frame):
        p = self.p
        self.frames.insert(0, frame)
        self.results.insert(0, dict(f=None, t=None, b=None, t_b=None,
                                    b_t=None, conclusion=PROGRESSIVE,
                                    holding=-1, drop=False))
        res0 = self.results[0]
        res0["f"] = self._same_frame(frame, TOP, frame)
        res0["conclusion"] = (PROGRESSIVE if res0["f"] <= p["frame_thresh"]
                              else INTERLACED)
        res0["holding"] = -1
        res0["drop"] = False
        if len(self.frames) < 2:
            return []

        prev = self.frames[1]
        res1 = self.results[1]
        first_buffer = self.first_buffer
        self.first_buffer = False

        res0["t"] = self._same_field(frame, TOP, prev, TOP)
        res0["b"] = self._same_field(frame, BOTTOM, prev, BOTTOM)
        res0["t_b"] = self._same_frame(frame, TOP, prev)
        res0["b_t"] = self._same_frame(frame, BOTTOM, prev)

        m = 0
        if res0["t_b"] <= p["frame_thresh"]:
            m |= M_TOP_BOTTOM
        if res0["b_t"] <= p["frame_thresh"]:
            m |= M_BOTTOM_TOP
        if res0["t"] <= p["field_thresh"] or res0["t"] * 10 < res0["b"]:
            m |= M_TOP_MATCH
        if res0["b"] <= p["field_thresh"] or res0["b"] * 10 < res0["t"]:
            m |= M_BOTTOM_MATCH

        n0 = len(self.outputs)
        if m & (M_TOP_MATCH | M_BOTTOM_MATCH):
            if res1["f"] <= p["frame_thresh"]:
                if (m & M_TOP_MATCH) and (m & M_BOTTOM_MATCH):
                    res0["conclusion"] = TC_PROGRESSIVE
                    res0["holding"] = 1 + BOTH
                    res1["drop"] = True
                    self._decorate(-1, False, res1["conclusion"],
                                   res1["drop"])
                else:
                    res0["conclusion"] = TC_MIXED
                    res0["holding"] = 1 + (not (m & M_BOTTOM_MATCH))
                    self._decorate(-1, False, res1["conclusion"],
                                   res1["drop"])
            else:
                if res0["f"] <= p["frame_thresh"]:
                    res0["conclusion"] = TC_PROGRESSIVE
                    res0["holding"] = 1 + BOTH
                else:
                    res0["conclusion"] = TC_MIXED
                    if (m & M_TOP_MATCH) and (m & M_BOTTOM_MATCH):
                        res0["holding"] = 0
                    else:
                        res0["holding"] = 1 + (not (m & M_BOTTOM_MATCH))
                if res1["holding"] == -1:
                    b = t = True
                else:
                    b = res1["holding"] == 1 + BOTTOM
                    t = res1["holding"] == 1 + TOP
                if (t and m & M_BOTTOM_MATCH) or (b and m & M_TOP_MATCH):
                    if t and m & M_BOTTOM_MATCH:
                        res1["holding"] = 1 + TOP
                    elif b and m & M_TOP_MATCH:
                        res1["holding"] = 1 + BOTTOM
                    self._decorate(not (res1["holding"] - 1), True,
                                   res1["conclusion"], res1["drop"])
                elif res0["f"] > p["frame_thresh"] and \
                        ((t and m & M_BOTTOM_TOP) or (b and m & M_TOP_BOTTOM)):
                    if t and m & M_BOTTOM_TOP:
                        res1["holding"] = 1 + TOP
                    elif b and m & M_TOP_BOTTOM:
                        res1["holding"] = 1 + BOTTOM
                    res0["conclusion"] = TC_MIXED
                    res0["holding"] = 1 + (res1["holding"] == 1 + TOP)
                    self._decorate(not (res1["holding"] - 1), True,
                                   res1["conclusion"], res1["drop"])
                elif first_buffer and (m & M_BOTTOM_TOP or m & M_TOP_BOTTOM):
                    res1["conclusion"] = TC_MIXED
                    res1["holding"] = 1 + (not (m & M_TOP_BOTTOM))
                    self._decorate(not (res1["holding"] - 1), True,
                                   res1["conclusion"], res1["drop"])
                elif res1["holding"] == 1 + BOTH or res1["holding"] == -1:
                    self._decorate(-1, False, res1["conclusion"],
                                   res1["drop"])
                else:
                    res1["drop"] = True
                    self._decorate(-1, False, res1["conclusion"],
                                   res1["drop"])
        elif res0["f"] <= p["frame_thresh"]:
            res0["conclusion"] = PROGRESSIVE
            res0["holding"] = 1 + BOTH
            if res1["holding"] == 1 + BOTH or res1["holding"] == -1:
                self._decorate(-1, False, res1["conclusion"], res1["drop"])
            elif res1["holding"] > 0:
                self._decorate(not (res1["holding"] - 1), True,
                               res1["conclusion"], res1["drop"])
            else:
                res1["drop"] = True
                self._decorate(-1, False, res1["conclusion"], res1["drop"])
        else:
            if m & (M_TOP_BOTTOM | M_BOTTOM_TOP):
                if res1["holding"] == -1:
                    b = t = True
                else:
                    b = res1["holding"] == 1 + BOTTOM
                    t = res1["holding"] == 1 + TOP
                res0["conclusion"] = TC_MIXED
                if res1["holding"] == 1 + BOTH:
                    self._decorate(-1, False, res1["conclusion"],
                                   res1["drop"])
                elif (t and m & M_TOP_BOTTOM) or (b and m & M_BOTTOM_TOP):
                    res1["holding"] = 1 + bool(m & M_TOP_BOTTOM)
                    res0["holding"] = 1 + (not (m & M_TOP_BOTTOM))
                    self._decorate(-1, False, res1["conclusion"],
                                   res1["drop"])
                elif (res1["holding"] > 0 and res1["holding"] != 1 + BOTH) \
                        or (t and m & M_BOTTOM_TOP) or (b and m & M_TOP_BOTTOM):
                    self._decorate(not (res1["holding"] - 1), True,
                                   res1["conclusion"], res1["drop"])
                else:
                    res1["drop"] = True
                    self._decorate(-1, False, res1["conclusion"],
                                   res1["drop"])
            else:
                res0["conclusion"] = INTERLACED
                res0["holding"] = 1 + BOTH
                res1["drop"] = res1["holding"] <= 0
                if res1["holding"] != 0:
                    res1["drop"] = False
                    if res1["holding"] == 1 + BOTH or res1["holding"] == -1:
                        self._decorate(-1, False, res1["conclusion"],
                                       res1["drop"])
                    else:
                        self._decorate(not (res1["holding"] - 1), True,
                                       res1["conclusion"], res1["drop"])
                else:
                    res1["drop"] = True
                    self._decorate(-1, False, res1["conclusion"],
                                   res1["drop"])
        return self.outputs[n0:]

    def flush(self):
        """EOS flush (gst_field_analysis_flush_frames)."""
        n0 = len(self.outputs)
        while self.frames:
            res = self.results[-1]  # oldest queued frame
            if res["holding"] in (1 + TOP, 1 + BOTTOM):
                self._decorate(res["holding"] == 1 + TOP, True,
                               res["conclusion"], False)
            else:
                self._decorate(-1, False, res["conclusion"],
                               not res["holding"])
        return self.outputs[n0:]
