"""Fidelity tests: JAX gaudieffects elements vs the golden C transcriptions.

BASELINE.md gate: <= 1e-3 max per-element pixel error vs the C reference;
the integer elements must be bit-exact, the float blur within 1 LSB.
"""

import numpy as np
import pytest

from gstbad_tpu.core.harness import Harness
from gstbad_tpu.core.spec import MediaSpec, VideoFormat
from gstbad_tpu.golden import gaudieffects as golden


def _img(rng, h=33, w=47):
    img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    # include the edge cases: all-0, all-255
    img[0, 0] = 0
    img[0, 1] = 255
    return img


def _run(name, img, fmt=VideoFormat.BGRx, **props):
    h = Harness(name, **props)
    h.set_src_spec(MediaSpec(kind="video", format=fmt,
                             width=img.shape[1], height=img.shape[0]))
    return h.push_pull(img[None])[0]


@pytest.mark.parametrize("adjustment", [0, 1, 100, 175, 256])
def test_burn(rng, adjustment):
    img = _img(rng)
    np.testing.assert_array_equal(
        _run("burn", img, adjustment=adjustment),
        golden.burn(img, adjustment))


@pytest.mark.parametrize("edge_a,edge_b", [(200, 1), (0, 0), (31, 255)])
def test_chromium(rng, edge_a, edge_b):
    img = _img(rng)
    got = _run("chromium", img, **{"edge-a": edge_a, "edge-b": edge_b})
    np.testing.assert_array_equal(got, golden.chromium(img, edge_a, edge_b))


def test_dodge(rng):
    img = _img(rng)
    np.testing.assert_array_equal(_run("dodge", img), golden.dodge(img))


@pytest.mark.parametrize("factor", [1, 80, 175])
def test_exclusion(rng, factor):
    img = _img(rng)
    np.testing.assert_array_equal(
        _run("exclusion", img, factor=factor), golden.exclusion(img, factor))


@pytest.mark.parametrize("thr,start,end", [
    (127, 50, 185), (0, 0, 256), (256, 0, 256), (50, 50, 50), (10, 200, 40)])
def test_solarize(rng, thr, start, end):
    img = _img(rng)
    got = _run("solarize", img, threshold=thr, start=start, end=end)
    np.testing.assert_array_equal(got, golden.solarize(img, thr, start, end))


@pytest.mark.parametrize("erode", [False, True])
def test_dilate(rng, erode):
    img = _img(rng)
    np.testing.assert_array_equal(
        _run("dilate", img, erode=erode), golden.dilate(img, erode))


@pytest.mark.parametrize("sigma", [1.2, 0.5, 4.0, -2.0, 0.0])
def test_gaussianblur(rng, sigma):
    img = _img(rng, h=24, w=31)
    got = _run("gaussianblur", img, fmt=VideoFormat.AYUV, sigma=sigma)
    want = golden.gaussianblur(img, sigma)
    # float accumulation order differs from the C loop; allow 1 LSB
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert (diff > 0).mean() < 0.01


def test_burn_batch_matches_per_frame(rng):
    imgs = rng.integers(0, 256, (3, 16, 20, 4), dtype=np.uint8)
    h = Harness("burn")
    h.set_src_spec(MediaSpec(kind="video", format="BGRx", width=20, height=16))
    got = h.push_pull(imgs)
    for i in range(3):
        np.testing.assert_array_equal(got[i], golden.burn(imgs[i]))


@pytest.mark.parametrize("sigma", [1.2, 0.5, 3.0, -2.0])
def test_gaussianblur_pallas_kernel(rng, sigma):
    """The one-pass Pallas blur kernel (ops/blur_pallas.py) in interpret
    mode is bit-exact vs the golden C transcription on tile-aligned
    shapes, including the broadcast-source grid."""
    import jax.numpy as jnp
    from gstbad_tpu.ops import blur as blur_ops
    from gstbad_tpu.ops import blur_pallas
    from gstbad_tpu.ops.pointops import pack32, unpack32

    b, h, w = 2, 32, 128
    img = rng.integers(0, 256, (b, h, w, 4), dtype=np.uint8)
    kern, rows, cols = blur_ops.make_blur_tables(sigma, h, w)
    out = blur_pallas.gaussian_blur_words(
        pack32(jnp.asarray(img)), kern, rows, cols, interpret=True)
    got = np.asarray(unpack32(out))
    want = np.stack([golden.gaussianblur(f, sigma) for f in img])
    np.testing.assert_array_equal(got, want)

    # [1, H, W] broadcast base + batch=B == the materialized broadcast
    src1 = pack32(jnp.asarray(img[:1]))
    a = np.asarray(blur_pallas.gaussian_blur_words(
        src1, kern, rows, cols, batch=3, interpret=True))
    bb = np.asarray(blur_pallas.gaussian_blur_words(
        jnp.broadcast_to(src1, (3, h, w)), kern, rows, cols,
        interpret=True))
    np.testing.assert_array_equal(a, bb)


def test_gaussianblur_element_pallas_path(rng):
    """The element's Pallas fast path (forced via blur_pallas.INTERPRET)
    matches its XLA path on aligned AYUV frames."""
    from gstbad_tpu.ops import blur_pallas

    img = rng.integers(0, 256, (32, 128, 4), dtype=np.uint8)
    blur_pallas.INTERPRET = True
    try:
        got = _run("gaussianblur", img, fmt=VideoFormat.AYUV, sigma=1.2)
    finally:
        blur_pallas.INTERPRET = False
    want = _run("gaussianblur", img, fmt=VideoFormat.AYUV, sigma=1.2)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"
