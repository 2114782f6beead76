"""videoconvert: permutation exactness + YUV roundtrip sanity."""

import numpy as np
import pytest

import gstbad_tpu as gt
from gstbad_tpu.core.harness import Harness
from gstbad_tpu.core.spec import MediaSpec, VideoFormat


def _run(img, src, dst):
    h = Harness("videoconvert", format=dst)
    h.set_src_spec(MediaSpec(kind="video", format=src,
                             width=img.shape[-2] if img.ndim == 3
                             else img.shape[2 if isinstance(img, dict) else 2],
                             height=16))
    return h.push(img[None] if not isinstance(img, dict) else img)


@pytest.mark.parametrize("src,dst", [("BGRx", "RGBA"), ("RGBA", "ABGR"),
                                     ("ARGB", "BGRx")])
def test_rgb_permutation_exact(rng, src, dst):
    img = rng.integers(0, 256, (16, 24, 4), dtype=np.uint8)
    h = Harness("videoconvert", format=dst)
    h.set_src_spec(MediaSpec(kind="video", format=src, width=24, height=16))
    got = h.push_pull(img[None])[0]
    s_off = VideoFormat.rgb_offsets(src)
    d_off = VideoFormat.rgb_offsets(dst)
    for i in range(3):
        np.testing.assert_array_equal(got[..., d_off[i]], img[..., s_off[i]])
    if d_off[3] is not None:
        if VideoFormat.has_alpha(src):
            np.testing.assert_array_equal(got[..., d_off[3]],
                                          img[..., s_off[3]])
        else:
            assert (got[..., d_off[3]] == 255).all()


def test_rgb_yuv_roundtrip_close(rng):
    img = rng.integers(16, 240, (1, 16, 24, 4), dtype=np.uint8)
    img[..., 3] = 255
    p = gt.parse_launch("videoconvert format=AYUV "
                        "! videoconvert format=BGRx ! fakesink")
    p.negotiate(MediaSpec(kind="video", format="BGRx", width=24, height=16))
    from gstbad_tpu.core.frame import FrameBatch
    import jax.numpy as jnp
    outs = p.run(inputs=FrameBatch.make(jnp.asarray(img)))
    got = np.asarray(outs[0].data).astype(int)
    # fixed-point 8-bit SDTV round trip loses a little precision
    assert np.abs(got[..., :3] - img[..., :3].astype(int)).max() <= 8


def test_i420_ayuv_roundtrip(rng):
    y = rng.integers(0, 256, (1, 16, 24), dtype=np.uint8)
    u = rng.integers(0, 256, (1, 8, 12), dtype=np.uint8)
    v = rng.integers(0, 256, (1, 8, 12), dtype=np.uint8)
    from gstbad_tpu.core.frame import FrameBatch
    import jax.numpy as jnp
    p = gt.parse_launch("videoconvert format=AYUV "
                        "! videoconvert format=I420 ! fakesink")
    p.negotiate(MediaSpec(kind="video", format="I420", width=24, height=16))
    outs = p.run(inputs=FrameBatch.make(
        {"y": jnp.asarray(y), "u": jnp.asarray(u), "v": jnp.asarray(v)}))
    np.testing.assert_array_equal(np.asarray(outs[0].data["y"]), y)
    # chroma upsample(nearest)+downsample(avg of identical) is exact
    np.testing.assert_array_equal(np.asarray(outs[0].data["u"]), u)
    np.testing.assert_array_equal(np.asarray(outs[0].data["v"]), v)
