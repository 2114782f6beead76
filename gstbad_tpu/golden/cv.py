"""Golden oracles for the opencv element family.

Unlike the C plugins (transcribed into numpy by hand), this family's spec
library — OpenCV — is importable here, so the golden calls cv2 directly and
only transcribes the ELEMENT-level composition around it (gray conversion
order, mask application, ROI handling, message fields), with citations into
/root/reference/ext/opencv/.  Tolerance policy (tests/test_cv.py):
bit-exact everywhere except GaussianBlur with explicit sigma (±1 LSB, cv's
softdouble kernel generation) and bilateral (approximate; cv2 5.0's
bit-exact quantization is not reproduced — documented divergence).
"""

from __future__ import annotations

import numpy as np
import cv2

_METHODS = {
    "sqdiff": cv2.TM_SQDIFF,
    "sqdiff-normed": cv2.TM_SQDIFF_NORMED,
    "ccorr": cv2.TM_CCORR,
    "ccorr-normed": cv2.TM_CCORR_NORMED,
    "ccoeff": cv2.TM_CCOEFF,
    "ccoeff-normed": cv2.TM_CCOEFF_NORMED,
}


def _mask_or_gray(rgb: np.ndarray, edge: np.ndarray, mask: bool) -> np.ndarray:
    """outimg.setTo(0); mask ? img.copyTo(out, edge) : GRAY2RGB(edge)
    (gstcvsobel.cpp:267-271)."""
    if mask:
        return np.where(edge[..., None] != 0, rgb, 0).astype(np.uint8)
    return cv2.cvtColor(edge, cv2.COLOR_GRAY2RGB)


def cvsobel(rgb, x_order=1, y_order=0, aperture=3, mask=True):
    """gstcvsobel.cpp:258-273."""
    gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
    edge = cv2.Sobel(gray, cv2.CV_8U, x_order, y_order, ksize=aperture)
    return _mask_or_gray(rgb, edge, mask)


def cvlaplace(rgb, aperture=3, scale=1.0, shift=0.0, mask=True):
    """gstcvlaplace.cpp:261-280."""
    gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
    inter = cv2.Laplacian(gray, cv2.CV_16S, ksize=aperture)
    # intermediary.convertTo(Laplace, CV_8U, scale, shift)
    lap = np.clip(np.rint(inter.astype(np.float64) * scale + shift),
                  0, 255).astype(np.uint8)
    return _mask_or_gray(rgb, lap, mask)


def cvsmooth(img, kind="gaussian", kw=3, kh=3, color=0.0, spatial=0.0,
             px=0, py=0, rw=1 << 30, rh=1 << 30):
    """gstcvsmooth.cpp:385-430 incl. the ROI-view semantics."""
    out = img.copy()
    h, w = img.shape[:2]
    rw = min(rw, w - px)
    rh = min(rh, h - py)
    if px >= w or py >= h or rw <= 0 or rh <= 0:
        return out
    roi = out[py:py + rh, px:px + rw]
    if kind == "blur":
        sm = cv2.blur(roi, (kw, kh))
    elif kind == "gaussian":
        sm = cv2.GaussianBlur(roi, (kw, kh), color, color)
    elif kind == "median":
        sm = cv2.medianBlur(roi, kw)
    elif kind == "bilateral":
        sm = cv2.bilateralFilter(roi, -1, color, 0.0)
    else:
        raise ValueError(kind)
    out[py:py + rh, px:px + rw] = sm
    return out


def cvdilate(img, iterations=1):
    """gstcvdilate.cpp:104-111."""
    return cv2.dilate(img, None, iterations=iterations)


def cverode(img, iterations=1):
    return cv2.erode(img, None, iterations=iterations)


def cvequalizehist(gray):
    """gstcvequalizehist.cpp:117-121."""
    return cv2.equalizeHist(gray)


def edgedetect(rgb, threshold1=50, threshold2=150, aperture=3, mask=True):
    """gstedgedetect.cpp:259-276."""
    gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
    edge = cv2.Canny(gray, threshold1, threshold2, apertureSize=aperture)
    return _mask_or_gray(rgb, edge, mask)


def retinex_basic(rgb, sigma=14.0, gain=128, offset=128):
    """gstretinex.cpp:343-361 (METHOD_BASIC)."""
    a = rgb.astype(np.float32)
    fs = int(np.floor(sigma * 6) / 2) * 2 + 1
    with np.errstate(divide="ignore"):
        logb = np.log(a)
        blurred = cv2.GaussianBlur(a, (fs, fs), 0.0, 0.0)
        logc = np.log(blurred)
    return np.clip(np.rint((logb - logc) * gain + offset), 0,
                   255).astype(np.uint8)


def retinex_multiscale(rgb, scales=3, gain=128, offset=128):
    """gstretinex.cpp:370-409 (METHOD_MULTISCALE)."""
    a = rgb.astype(np.float32)
    weight = 1.0 / scales
    sigma_i = 10.0 + 4.0 * scales
    fs = int(np.floor(sigma_i * 6) / 2) * 2 + 1
    with np.errstate(divide="ignore"):
        acc = np.log(a)
        for _ in range(scales):
            blurred = cv2.GaussianBlur(a, (fs, fs), 0.0, 0.0)
            acc = acc - weight * np.log(blurred)
    return np.clip(np.rint(acc * gain + offset), 0, 255).astype(np.uint8)


def template_match(rgb, templ, method="ccorr-normed"):
    """gst_template_match_match (gsttemplatematch.cpp:289-306): returns
    (best_res, (x, y)) with the sqdiff-normed 1-result flip."""
    dist = cv2.matchTemplate(rgb, templ, _METHODS[method])
    mn, mx, mnp, mxp = cv2.minMaxLoc(dist)
    if method in ("sqdiff", "sqdiff-normed"):
        res, pos = mn, mnp
        if method == "sqdiff-normed":
            res = 1 - res
    else:
        res, pos = mx, mxp
    return res, pos


def skindetect(rgb, method="hsv", postprocess=True):
    """gstskindetect.cpp:299-396 composed from cv2 calls."""
    if method == "hsv":
        hsv = cv2.cvtColor(rgb, cv2.COLOR_RGB2HSV)
        h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
        _, h2 = cv2.threshold(h, 10, 255, cv2.THRESH_BINARY)
        _, hm = cv2.threshold(h, 20, 255, cv2.THRESH_BINARY_INV)
        _, sm = cv2.threshold(s, 48, 255, cv2.THRESH_BINARY)
        _, vm = cv2.threshold(v, 80, 255, cv2.THRESH_BINARY)
        hm = cv2.erode(hm, None, iterations=1)
        mask = cv2.bitwise_and(cv2.bitwise_and(cv2.bitwise_and(hm, sm), h2),
                               vm)
    else:
        r = rgb[..., 0].astype(np.float32)
        g = rgb[..., 1].astype(np.float32)
        b = rgb[..., 2].astype(np.float32)
        allc = r + g + b
        with np.errstate(invalid="ignore"):
            rp = np.where(allc > 0, r / allc, 0)
            gp = np.where(allc > 0, g / allc, 0)
        m = (r > 60) & (rp > 0.42) & (rp <= 0.6) & (gp > 0.28) & (gp <= 0.4)
        mask = np.where(m, 255, 0).astype(np.uint8)
    if postprocess:
        el = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3), (1, 1))
        mask = cv2.erode(mask, el, iterations=1)
        mask = cv2.dilate(mask, el, iterations=2)
        mask = cv2.erode(mask, el, iterations=1)
    return cv2.cvtColor(mask, cv2.COLOR_GRAY2RGB)


def cameraundistort(rgb, K, dist, alpha=0.0):
    """camera_undistort_init_undistort_rectify_map + remap
    (gstcameraundistort.cpp:310-357), CV_16SC2 maps like the reference."""
    size = (rgb.shape[1], rgb.shape[0])
    newK, _roi = cv2.getOptimalNewCameraMatrix(np.asarray(K),
                                               np.asarray(dist), size, alpha)
    m1, m2 = cv2.initUndistortRectifyMap(np.asarray(K), np.asarray(dist),
                                         None, newK, size, cv2.CV_16SC2)
    return cv2.remap(rgb, m1, m2, cv2.INTER_LINEAR)


def dewarp_panorama(rgba, x_center, y_center, inner, outer,
                    corr_x=1.0, corr_y=1.0):
    """gst_dewarp_update_map + panorama remap (gstdewarp.cpp:438-478,
    663-666) with the reference's output dimensions (:501-511)."""
    in_h, in_w = rgba.shape[:2]
    r1 = in_w * inner
    r2 = in_w * outer
    out_w = (int((2.0 * np.pi) * ((r2 + r1) / 2.0)) + 7) & ~7
    out_h = (int(r2 - r1) + 7) & ~7
    cx, cy = x_center * in_w, y_center * in_h
    y, x = np.meshgrid(np.arange(out_h, dtype=np.float32),
                       np.arange(out_w, dtype=np.float32), indexing="ij")
    r = (y / np.float32(out_h)) * np.float32(r2 - r1) + np.float32(r1)
    theta = (x / np.float32(out_w)) * np.float32(2.0 * np.pi)
    map_x = (np.float32(cx) + r * np.sin(theta) * np.float32(corr_x)
             ).astype(np.float32)
    map_y = (np.float32(cy) + r * np.cos(theta) * np.float32(corr_y)
             ).astype(np.float32)
    m1, m2 = cv2.convertMaps(map_x, map_y, cv2.CV_16SC2)
    return cv2.remap(rgba, m1, m2, cv2.INTER_LINEAR)
