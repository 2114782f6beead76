"""Golden transcriptions of gst/videofilters: scenechange, zebrastripe,
videodiff; plus gst/smooth and gst/videosignal/videoanalyse."""

from __future__ import annotations

import numpy as np


def sad_score(f1: np.ndarray, f2: np.ndarray) -> float:
    """get_frame_score (gstscenechange.c:146-160): mean abs luma diff via
    orc_sad_nxm_u8 accumulator."""
    s = np.abs(f1.astype(np.int64) - f2.astype(np.int64)).sum()
    return float(s) / (f1.shape[0] * f1.shape[1])


SC_N_DIFFS = 5  # gstscenechange.h:37


class SceneChangeState:
    """The 5-score ring + decision tree (gstscenechange.c:206-244)."""

    def __init__(self):
        self.diffs = [0.0] * SC_N_DIFFS
        self.n_diffs = 0

    def update(self, score: float) -> bool:
        self.diffs = self.diffs[1:] + [score]
        self.n_diffs += 1
        # min/max over diffs[0..SC_N_DIFFS-2] (the current score excluded)
        window = self.diffs[:SC_N_DIFFS - 1]
        score_min = min(window)
        score_max = max(window)
        threshold = 1.8 * score_max - 0.8 * score_min
        if self.n_diffs > SC_N_DIFFS - 1:
            if score < 5:
                change = False
            elif score / threshold < 1.0:
                change = False
            elif score > 30 and score / self.diffs[SC_N_DIFFS - 2] > 1.4:
                change = True
            elif score / threshold > 2.3:
                change = True
            elif score > 50:
                change = True
            else:
                change = False
        else:
            change = False
        if change:
            self.diffs = [0.0] * SC_N_DIFFS
            self.n_diffs = 0
        return change


def zebra_y_threshold(threshold_pct: int) -> int:
    """gstzebrastripe.c:147-148: 16 + floor(0.5 + 2.19 * threshold)."""
    return 16 + int(np.floor(0.5 + 2.19 * threshold_pct))


def zebrastripe_y(y: np.ndarray, threshold_pct: int, t: int) -> np.ndarray:
    """Stripe the luma plane (gstzebrastripe.c:205-253): pixels with
    Y >= y_threshold and (i + j + t) & 0x4 set become Y=16."""
    thr = zebra_y_threshold(threshold_pct)
    h, w = y.shape
    i = np.arange(w)[None, :]
    j = np.arange(h)[:, None]
    stripe = ((i + j + t) & 0x4) != 0
    return np.where((y >= thr) & stripe, np.uint8(16), y)


def videodiff_y(cur: np.ndarray, old: np.ndarray, threshold: int,
                t: int) -> np.ndarray:
    """gst_video_diff_transform_frame_ip_planarY (gstvideodiff.c:91-116):
    mark pixels whose luma moved more than `threshold` with 16/240 stripes."""
    h, w = cur.shape
    s1 = old.astype(np.int32)
    s2 = cur.astype(np.int32)
    moved = (s2 < s1 - threshold) | (s2 > s1 + threshold)
    i = np.arange(w)[None, :]
    j = np.arange(h)[:, None]
    stripe = ((i + j + t) & 0x4) != 0
    return np.where(moved, np.where(stripe, np.uint8(16), np.uint8(240)),
                    cur).astype(np.uint8)


def smooth_y(y: np.ndarray, tolerance: int = 8, filtersize: int = 3) -> np.ndarray:
    """smooth_filter (gst/smooth/gstsmooth.c:130-176), literal transcription.

    Tolerance-gated window mean: neighbors strictly inside (ref-tol, ref+tol)
    are averaged with the reference pixel (integer division).  The reference's
    pointer arithmetic resets `src`/`dest` to `base + stride*y` at the END of
    row y, so iterations y>=1 read/write row y-1, row 0 is written twice, and
    the last row is never written (the C code leaves whatever was in the
    output buffer; we keep the input row there to stay deterministic).
    """
    h, w = y.shape
    src0 = y.astype(np.int32)
    out = y.copy()
    fy1 = 0
    fy2 = min(filtersize + 1, h)
    for it in range(h):
        if it > filtersize + 1:
            fy1 += 1
        if it < h - (filtersize + 1):
            fy2 += 1
        rrow = 0 if it == 0 else it - 1
        for x in range(w):
            ref = int(src0[rrow, x])
            fx1 = max(x - filtersize, 0)
            fx2 = min(x + filtersize + 1, w)
            win = src0[fy1:fy2, fx1:fx2]
            mask = (ref - tolerance - win) * (ref + tolerance - win) < 0
            s = ref + int(win[mask].sum())
            n = 1 + int(mask.sum())
            out[rrow, x] = s // n
    return out


def videoanalyse(y: np.ndarray):
    """gst_video_analyse_planar (gstvideoanalyse.c:208-243).

    Returns (luma_average, luma_variance) in 0..1 with the reference's
    integer-average quirk: the variance uses avg = sum // (w*h) (int)."""
    h, w = y.shape
    s = int(y.astype(np.int64).sum())
    avg = s // (w * h)
    luma_average = s / (255.0 * w * h)
    diff = avg - y.astype(np.int64)
    var = int((diff * diff).sum())
    luma_variance = var / (255.0 * 255.0 * w * h)
    return luma_average, luma_variance
