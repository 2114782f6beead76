"""Golden ivtc / combdetect (gst/ivtc/gstivtc.c, gstcombdetect.c).

Frames are planar dicts {"y": [H,W], "u": [Hc,Wc], "v": [Hc,Wc]} uint8.
A "field" is (frame, parity): parity 0 = top (even lines), 1 = bottom.
"""

from __future__ import annotations

import numpy as np

THRESHOLD = 100  # gstivtc.c:586


def interleave(top: np.ndarray, bottom: np.ndarray) -> np.ndarray:
    """GET_LINE_IL semantics: even lines from `top`, odd from `bottom`."""
    out = top.copy()
    out[1::2] = bottom[1::2]
    return out


def get_comb_score(top: np.ndarray, bottom: np.ndarray) -> int:
    """get_comb_score (gstivtc.c:634-680) on luma planes.

    Vertical outlier test src2 < min(src1,src3)-5 or > max+5 on the woven
    frame, horizontal run-length accumulation clamped at 1000, score counts
    cells > 100; top/bottom two lines skipped.
    """
    il = interleave(top, bottom).astype(np.int32)
    h, w = il.shape
    score = 0
    thisline = np.zeros(w, np.int32)
    for j in range(2, h - 2):
        s1 = il[j - 1]
        s2 = il[j]
        s3 = il[j + 1]
        outlier = (s2 < np.minimum(s1, s3) - 5) | (s2 > np.maximum(s1, s3) + 5)
        for i in range(w):
            if outlier[i]:
                if i > 0:
                    thisline[i] += thisline[i - 1]
                thisline[i] += 1
                if thisline[i] > 1000:
                    thisline[i] = 1000
            else:
                thisline[i] = 0
            if thisline[i] > 100:
                score += 1
    return score


def reconstruct_line(line1, line2, i, a, b, c, d):
    """reconstruct_line (gstivtc.c:371-387)."""
    x = (int(line1[i - 3]) * a + int(line1[i - 2]) * b + int(line1[i - 1]) * c
         + int(line1[i]) * d + int(line2[i]) * d + int(line2[i + 1]) * c
         + int(line2[i + 2]) * b + int(line2[i + 3]) * a)
    return (x + 16) >> 5


def reconstruct_single_y(frame_y: np.ndarray, parity: int) -> np.ndarray:
    """reconstruct_single, luma part (gstivtc.c:389-470): line doubling with
    edge-directed interpolation (Sobel-ish dx/dy, 5 direction classes)."""
    h, w = frame_y.shape
    out = np.empty_like(frame_y)
    src = frame_y.astype(np.int32)
    for j in range(h):
        if (j & 1) == parity:
            out[j] = frame_y[j]
        elif j == 0 or j == h - 1:
            out[j] = frame_y[j ^ 1]
        else:
            line1 = src[j - 1]
            line2 = src[j + 1]
            dest = np.empty(w, np.int32)
            # borders: plain average
            for i in list(range(3)) + list(range(w - 3, w)):
                dest[i] = (line1[i] + line2[i] + 1) >> 1
            for i in range(3, w - 3):
                dx = (-line1[i - 1] - line2[i - 1]
                      + line1[i + 1] + line2[i + 1]) * 2
                dy = (-line1[i - 1] - 2 * line1[i] - line1[i + 1]
                      + line2[i - 1] + 2 * line2[i] + line2[i + 1])
                if dy < 0:
                    dy = -dy
                    dx = -dx
                if dx == 0 and dy == 0:
                    dest[i] = (line1[i] + line2[i] + 1) >> 1
                elif dx < 0:
                    if dx < -2 * dy:
                        dest[i] = reconstruct_line(line1, line2, i, 0, 0, 0, 16)
                    elif dx < -dy:
                        dest[i] = reconstruct_line(line1, line2, i, 0, 0, 8, 8)
                    elif 2 * dx < -dy:
                        dest[i] = reconstruct_line(line1, line2, i, 0, 4, 8, 4)
                    elif 3 * dx < -dy:
                        dest[i] = reconstruct_line(line1, line2, i, 1, 7, 7, 1)
                    else:
                        dest[i] = reconstruct_line(line1, line2, i, 4, 8, 4, 0)
                else:
                    if dx > 2 * dy:
                        dest[i] = reconstruct_line(line2, line1, i, 0, 0, 0, 16)
                    elif dx > dy:
                        dest[i] = reconstruct_line(line2, line1, i, 0, 0, 8, 8)
                    elif 2 * dx > dy:
                        dest[i] = reconstruct_line(line2, line1, i, 0, 4, 8, 4)
                    elif 3 * dx > dy:
                        dest[i] = reconstruct_line(line2, line1, i, 1, 7, 7, 1)
                    else:
                        dest[i] = reconstruct_line(line2, line1, i, 4, 8, 4, 0)
            out[j] = np.clip(dest, 0, 255)
    return out.astype(np.uint8)


def reconstruct_single_chroma(plane: np.ndarray, parity: int) -> np.ndarray:
    """reconstruct_single, chroma part (gstivtc.c:467-490): line doubling
    with plain rounded average."""
    h, w = plane.shape
    out = np.empty_like(plane)
    src = plane.astype(np.int32)
    for j in range(h):
        if (j & 1) == parity:
            out[j] = plane[j]
        elif j == 0 or j == h - 1:
            out[j] = plane[j ^ 1]
        else:
            out[j] = ((src[j - 1] + src[j + 1] + 1) >> 1).astype(np.uint8)
    return out


def combdetect_y(y: np.ndarray, z: int) -> np.ndarray:
    """gst_comb_detect_transform_frame luma path (gstcombdetect.c:215-260):
    zebra-paint cells whose run-length comb metric exceeds 100; border rows
    halved."""
    h, w = y.shape
    out = np.empty_like(y)
    src = y.astype(np.int32)
    thisline = np.zeros(w, np.int32)
    for j in range(h):
        if j < 2 or j >= h - 2:
            out[j] = y[j] // 2
        else:
            s1, s2, s3 = src[j - 1], src[j], src[j + 1]
            for i in range(w):
                if (s2[i] < min(s1[i], s3[i]) - 5
                        or s2[i] > max(s1[i], s3[i]) + 5):
                    if i > 0:
                        thisline[i] += thisline[i - 1]
                    thisline[i] += 1
                    if thisline[i] > 1000:
                        thisline[i] = 1000
                else:
                    thisline[i] = 0
                if thisline[i] > 100:
                    out[j, i] = 235 if ((i + j + z) & 0x4) else 16
                else:
                    out[j, i] = y[j, i]
    return out


class GoldenIvtc:
    """Field-queue inverse telecine (gstivtc.c transform/construct_frame).

    Fields enter as (planar_frame, parity, ts); construct_frame picks weave
    vs single-field reconstruction by comb-score thresholds and retires
    consumed fields.  Emits progressive frames at the src framerate.
    """

    def __init__(self, field_duration_ns: int, out_duration_ns: int):
        self.fields = []  # list of (frame, parity, ts)
        self.current_ts = 0
        self.field_duration = field_duration_ns
        self.out_duration = out_duration_ns
        self.outputs = []

    def add_frame(self, frame, tff: bool, ts: int, onefield=False, rff=False):
        order = [0, 1] if tff else [1, 0]
        parities = [order[0]]
        if not onefield:
            parities.append(order[1])
            if rff:
                parities.append(order[0])
        for idx, par in enumerate(parities):
            self.fields.append((frame, par, ts + idx * self.field_duration))
        # retire stale fields (gstivtc.c:536-540)
        while self.fields and (self.fields[0][2] + 50_000_000
                               < self.current_ts):
            self.fields.pop(0)
        while len(self.fields) >= 4:
            self.outputs.append(self.construct_frame())

    def _similarity(self, i1, i2) -> int:
        f1, p1, _ = self.fields[i1]
        f2, p2, _ = self.fields[i2]
        if p1 == 0:
            return get_comb_score(f1["y"], f2["y"])
        return get_comb_score(f2["y"], f1["y"])

    def _weave(self, i1, i2):
        f1, p1, _ = self.fields[i1]
        f2, p2, _ = self.fields[i2]
        top, bottom = (f1, f2) if p1 == 0 else (f2, f1)
        return {k: interleave(top[k], bottom[k]) for k in f1}

    def _single(self, i1):
        f, p, _ = self.fields[i1]
        out = {"y": reconstruct_single_y(f["y"], p)}
        for k in f:
            if k != "y":
                out[k] = reconstruct_single_chroma(f[k], p)
        return out

    def construct_frame(self):
        anchor = 1
        forward_ok = self.fields[anchor][2] < self.current_ts
        prev_score = self._similarity(anchor - 1, anchor)
        next_score = self._similarity(anchor, anchor + 1)
        if prev_score < THRESHOLD:
            if forward_ok and next_score < prev_score:
                out = self._weave(anchor, anchor + 1)
                n_retire = anchor + 2
            else:
                out = self._weave(anchor, anchor - 1)
                n_retire = anchor + 1
        elif next_score < THRESHOLD:
            out = self._weave(anchor, anchor + 1)
            n_retire = anchor + 2 if forward_ok else anchor + 1
        else:
            out = self._single(anchor)
            n_retire = anchor + 1
        del self.fields[:n_retire]
        out_ts = self.current_ts
        self.current_ts += self.out_duration
        return out, out_ts
