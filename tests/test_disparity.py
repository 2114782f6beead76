"""disparity (ext/opencv/gstdisparity.cpp): StereoBM bit-exact vs cv2,
SGM correlation vs cv2.StereoSGBM, element wiring."""

import numpy as np
import jax.numpy as jnp
import pytest

import gstbad_tpu as gt
from gstbad_tpu.core.frame import FrameBatch
from gstbad_tpu.core.pipeline import Node, Pipeline
from gstbad_tpu.ops import stereo

cv2 = pytest.importorskip("cv2")

H, W = 40, 80


def _pair(shift, seed=7):
    rng = np.random.default_rng(seed)
    tex = rng.integers(0, 256, (H, W + 32), np.uint8)
    left = tex[:, 32:32 + W].copy()
    # right[x] = left[x + shift] -> true disparity = shift
    right = np.roll(tex, -shift, axis=1)[:, 32:32 + W].copy()
    return left, right


def _cv_sbm(disp12=-1):
    sbm = cv2.StereoBM_create()
    for k, v in dict(BlockSize=9, NumDisparities=32, PreFilterSize=9,
                     PreFilterCap=32, MinDisparity=0, TextureThreshold=0,
                     UniquenessRatio=0, SpeckleWindowSize=0,
                     SpeckleRange=0, Disp12MaxDiff=disp12).items():
        getattr(sbm, "set" + k)(v)
    return sbm


def test_stereo_bm_bit_exact_vs_cv2():
    sbm = _cv_sbm()
    rng = np.random.default_rng(1)
    for shift in (0, 3, 17, 31):
        left, right = _pair(shift)
        dc = sbm.compute(left, right)
        dm = np.asarray(stereo.stereo_bm(jnp.asarray(left),
                                         jnp.asarray(right),
                                         disp12_max_diff=-1))
        np.testing.assert_array_equal(dm, dc)
    l2 = rng.integers(0, 256, (H, W), np.uint8)
    r2 = rng.integers(0, 256, (H, W), np.uint8)
    np.testing.assert_array_equal(
        np.asarray(stereo.stereo_bm(jnp.asarray(l2), jnp.asarray(r2),
                                    disp12_max_diff=-1)),
        sbm.compute(l2, r2))


def test_stereo_bm_lrc_close_to_cv2():
    """disp12-max-diff 0 (the element's setting): our validateDisparity
    invalidates nearly the same set (exact tie-breaking is internal to
    OpenCV — documented divergence, ops/stereo.py)."""
    sbm = _cv_sbm(disp12=0)
    left, right = _pair(5)
    dc = sbm.compute(left, right)
    dm = np.asarray(stereo.stereo_bm(jnp.asarray(left),
                                     jnp.asarray(right),
                                     disp12_max_diff=0))
    agree = (dc == dm).mean()
    assert agree > 0.90
    # wherever BOTH maps are valid the disparities must be identical —
    # only the invalidation SETS differ (cv's internal claim costs are
    # not observable; ops/stereo.py documents this)
    both = (dc != -16) & (dm != -16)
    np.testing.assert_array_equal(dm[both], dc[both])
    assert both.mean() > 0.2


def test_stereo_sgm_recovers_disparity():
    left, right = _pair(9)
    dm = np.asarray(stereo.stereo_sgm(jnp.asarray(left),
                                      jnp.asarray(right)))
    inner = dm[4:-4, 66:-12] / 16.0
    # the true disparity is 9 (documented-approximate engine: allow 1px)
    assert np.abs(np.median(inner) - 9) <= 1.0

    sg = cv2.StereoSGBM_create(1, 64, 3)
    sg.setP1(200); sg.setP2(255); sg.setMode(cv2.STEREO_SGBM_MODE_HH)
    dc = sg.compute(left, right)
    a = dm[4:-4, 66:-2].astype(np.float64)
    b = dc[4:-4, 66:-2].astype(np.float64)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.5 or np.abs(np.median(a) - np.median(b)) < 16


def test_element_replaces_right_stream():
    left, right = _pair(5)
    lrgb = np.repeat(left[..., None], 3, axis=-1)[None]
    rrgb = np.repeat(right[..., None], 3, axis=-1)[None]

    lsrc = gt.make("appsrc", format="RGB", width=W, height=H)
    rsrc = gt.make("appsrc", format="RGB", width=W, height=H)
    el = gt.make("disparity", method="sbm")
    nl, nr = Node(lsrc), Node(rsrc)
    nd = Node(el)
    nd.inputs = [nl, nr]
    p = Pipeline(nodes=[nl, nr, nd])
    p.negotiate()
    lsrc.push_frames(lrgb)
    rsrc.push_frames(rrgb)
    outs = p.run(window=1)
    out = np.asarray(outs[0].data)
    # output is gray2rgb of the normalized disparity
    assert out.shape == (1, H, W, 3)
    assert (out[..., 0] == out[..., 1]).all()
    sbm = _cv_sbm(disp12=0)
    dc = sbm.compute(left, right)
    want = cv2.normalize(dc, None, 0, 255, cv2.NORM_MINMAX,
                         cv2.CV_8U)
    agree = (out[0, :, :, 0] == want).mean()
    assert agree > 0.9
