"""Pallas warp kernel vs golden remap (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gstbad_tpu.golden import geometric as golden
from gstbad_tpu.ops import warp_pallas as wp
from gstbad_tpu.ops.remap import fix_map

H, W = 64, 256


@pytest.mark.parametrize("name", ["fisheye", "twirl", "rotate", "mirror"])
def test_warp_kernel_matches_remap(rng, name):
    kwargs = {"angle": 0.4} if name == "rotate" else {}
    mp = golden.MAP_BUILDERS[name](W, H, **kwargs)
    p = wp.plan(mp, W, H, "ignore")
    assert p is not None, "plan rejected a smooth map"
    img = rng.integers(0, 256, (2, H, W, 4), dtype=np.uint8)
    _, valid = fix_map(mp, W, H, "ignore")
    bg = jnp.zeros(4, jnp.uint8)
    out = np.asarray(wp.warp_batch(jnp.asarray(img), p, jnp.asarray(valid),
                                   bg, interpret=True))
    want = np.stack([golden.remap(img[i], mp, "ignore") for i in range(2)])
    np.testing.assert_array_equal(out, want)


def test_plan_rejects_wild_maps(rng):
    # a random permutation map has full-frame tile spans (on a frame large
    # enough that the window caps bind)
    h2, w2 = 256, 1024
    mp = np.stack([rng.random((h2, w2)) * w2, rng.random((h2, w2)) * h2], -1)
    assert wp.plan(mp, w2, h2, "ignore") is None


def test_element_pallas_engine_matches_gather(rng):
    """fisheye engine=pallas (interpret off-TPU) == engine=gather."""
    import gstbad_tpu as gt
    from gstbad_tpu.core.frame import FrameBatch
    from gstbad_tpu.core.pipeline import Pipeline
    from gstbad_tpu.core.spec import MediaSpec

    img = rng.integers(0, 256, (2, H, W, 4), dtype=np.uint8)
    outs = {}
    for engine in ("pallas", "gather"):
        el = gt.make("fisheye", engine=engine)
        p = Pipeline([el])
        p.negotiate(MediaSpec(kind="video", format="RGBA", width=W, height=H))
        assert (el._warp_plan is not None) == (engine == "pallas")
        res = p.run(inputs=FrameBatch.make(jnp.asarray(img)))
        outs[engine] = np.asarray(res[0].data)
    np.testing.assert_array_equal(outs["pallas"], outs["gather"])


def test_warp_outlier_fixup(rng):
    """A map with a violently magnifying patch exercises the XLA
    gather+scatter fixup path for outlier tiles (row span > SR_CAP)."""
    h2, w2 = 256, 512
    mp = golden.MAP_BUILDERS["rotate"](w2, h2, angle=0.1)
    # make the top-left tile read rows spread across the whole frame
    mp = mp.copy()
    mp[:8, :128, 0] = np.arange(128)[None, :].astype(np.float64)
    mp[:8, :128, 1] = (np.arange(8 * 128).reshape(8, 128) * 7.9) % h2
    p = wp.plan(mp, w2, h2, "ignore", _allow_transpose=False)
    assert p is not None and len(p.fix_dst) == 8 * 128
    img = rng.integers(0, 256, (2, h2, w2, 4), dtype=np.uint8)
    _, valid = fix_map(mp, w2, h2, "ignore")
    bg = jnp.zeros(4, jnp.uint8)
    out = np.asarray(wp.warp_batch(jnp.asarray(img), p, jnp.asarray(valid),
                                   bg, interpret=True))
    want = np.stack([golden.remap(img[i], mp, "ignore") for i in range(2)])
    np.testing.assert_array_equal(out, want)


def test_warp_transposed_outlier_tiles(rng):
    """Rotation-dominant tiles (windows taller than the row cap — the
    twirl-center geometry, ROADMAP r2 #1) route through the nested
    TRANSPOSED plan instead of the XLA gather, bit-exactly."""
    h2, w2 = 256, 512
    mp = golden.MAP_BUILDERS["rotate"](w2, h2, angle=1.45)  # ~83deg
    p = wp.plan(mp, w2, h2, "ignore")
    assert p is not None, "plan rejected a near-90deg rotation"
    assert p.t_plan is not None, "expected a transposed sub-plan"
    assert len(p.fix_dst) == 0
    img = rng.integers(0, 256, (2, h2, w2, 4), dtype=np.uint8)
    _, valid = fix_map(mp, w2, h2, "ignore")
    bg = jnp.zeros(4, jnp.uint8)
    out = np.asarray(wp.warp_batch(jnp.asarray(img), p, jnp.asarray(valid),
                                   bg, interpret=True))
    want = np.stack([golden.remap(img[i], mp, "ignore") for i in range(2)])
    np.testing.assert_array_equal(out, want)


def test_warp_twirl_heavy_angle_transposed(rng):
    """A hard twirl (the config-4 shape) plans without any gather fixup
    and stays bit-exact."""
    h2, w2 = 256, 512
    mp = golden.MAP_BUILDERS["twirl"](w2, h2, angle=2 * np.pi)
    p = wp.plan(mp, w2, h2, "ignore")
    assert p is not None
    img = rng.integers(0, 256, (1, h2, w2, 4), dtype=np.uint8)
    _, valid = fix_map(mp, w2, h2, "ignore")
    bg = jnp.zeros(4, jnp.uint8)
    out = np.asarray(wp.warp_batch(jnp.asarray(img), p, jnp.asarray(valid),
                                   bg, interpret=True))
    want = golden.remap(img[0], mp, "ignore")[None]
    np.testing.assert_array_equal(out, want)


def test_jaxfilter_element(rng):
    import gstbad_tpu as gt
    from gstbad_tpu.core.pipeline import Pipeline
    from gstbad_tpu.core.spec import MediaSpec
    el = gt.make("jaxfilter", fn=lambda x: 255 - x)
    p = Pipeline([el])
    p.negotiate(MediaSpec(kind="video", format="GRAY8", width=16, height=16))
    from gstbad_tpu.core.frame import FrameBatch
    img = rng.integers(0, 256, (2, 16, 16), dtype=np.uint8)
    outs = p.run(inputs=FrameBatch.make(jnp.asarray(img)))
    np.testing.assert_array_equal(np.asarray(outs[0].data), 255 - img)
