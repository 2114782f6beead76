"""Golden SSIM — transcription of the in-tree oracle
(gst/debugutils/gstcompare.c:355-470).

16x16 windows at stride 8, k1=.01 k2=.03 L=255, with the reference's
integer moment sums AND integer mean/variance division (`sum1 / count` is
gint/gint before the double assignment).
"""

from __future__ import annotations

import numpy as np

K1, K2, L = 0.01, 0.03, 255.0
C1 = (K1 * L) ** 2
C2 = (K2 * L) ** 2
WINDOW = 16


def ssim_window(d1: np.ndarray, d2: np.ndarray) -> float:
    """gst_compare_ssim_window (gstcompare.c:355-398)."""
    h, w = d1.shape
    if h <= 0 or w <= 0:
        return 1.0
    a = d1.astype(np.int64)
    b = d2.astype(np.int64)
    count = h * w
    sum1 = int(a.sum())
    sum2 = int(b.sum())
    ssum1 = int((a * a).sum())
    ssum2 = int((b * b).sum())
    acov = int((a * b).sum())
    # the reference divides gint by gint (truncation) before the double math
    avg1 = sum1 // count
    avg2 = sum2 // count
    var1 = ssum1 // count - avg1 * avg1
    var2 = ssum2 // count - avg2 * avg2
    cov = acov // count - avg1 * avg2
    return ((2 * avg1 * avg2 + C1) * (2 * cov + C2)
            / ((avg1 * avg1 + avg2 * avg2 + C1) * (var1 + var2 + C2)))


def ssim_component(d1: np.ndarray, d2: np.ndarray) -> float:
    """gst_compare_ssim_component (gstcompare.c:401-428): windows of up to
    16x16 stepped by 8 while `pos + 8 < size`."""
    h, w = d1.shape
    ssim_sum = 0.0
    count = 0
    j = 0
    while j + WINDOW // 2 < h:
        i = 0
        while i + WINDOW // 2 < w:
            ssim_sum += ssim_window(
                d1[j:j + min(WINDOW, h - j), i:i + min(WINDOW, w - i)],
                d2[j:j + min(WINDOW, h - j), i:i + min(WINDOW, w - i)])
            count += 1
            i += WINDOW // 2
        j += WINDOW // 2
    if count == 0:
        return 1.0
    return ssim_sum / count


def ssim(planes1, planes2, is_yuv: bool = True) -> float:
    """gst_compare_ssim (gstcompare.c:430-470): luma-weighted component mean.

    planes*: sequence of 2-D uint8 component arrays (Y,U,V or R,G,B).
    YUV with >1 component weights luma (comps-1) and each chroma 1, all
    normalized by 2*(comps-1); otherwise every component weighs 1/comps.
    """
    comps = len(planes1)
    weights = [1.0] * comps
    if is_yuv and comps > 1:
        weights[0] = comps - 1
        norm = 2.0 * (comps - 1)
    else:
        norm = float(comps)
    weights = [w / norm for w in weights]
    return sum(w * ssim_component(p1, p2)
               for w, p1, p2 in zip(weights, planes1, planes2))
