"""assrender (ext/assrender/): io/ass.py parse/blit + the element."""

import fractions

import numpy as np
import jax.numpy as jnp
import pytest

import gstbad_tpu as gt
from gstbad_tpu.core.frame import FrameBatch
from gstbad_tpu.core.pipeline import Pipeline
from gstbad_tpu.core.spec import MediaSpec
from gstbad_tpu.io import ass

SCRIPT = """[Script Info]
PlayResX: 640
PlayResY: 480

[V4+ Styles]
Format: Name, Fontname, Fontsize, PrimaryColour, OutlineColour, BackColour, Bold, Italic, Outline, Alignment, MarginL, MarginR, MarginV
Style: Default,Arial,40,&H00FFFFFF,&H00000000,&H80000000,0,0,2,2,20,20,30
Style: Top,Arial,30,&H0000FFFF,&H00000000,&H80000000,0,0,1,8,20,20,15

[Events]
Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text
Dialogue: 0,0:00:01.00,0:00:03.50,Default,,0,0,0,,Hello world\\Nsecond line
Dialogue: 0,0:00:02.00,0:00:04.00,Top,,0,0,0,,{\\b1}Top text{\\b0}
"""


def test_color_and_time_parsing():
    # &HAABBGGRR with inverted alpha
    assert ass.parse_ass_color("&H00FF8040") == (0x40, 0x80, 0xFF, 255)
    assert ass.parse_ass_color("&H80FF8040") == (0x40, 0x80, 0xFF, 127)
    assert ass.parse_ass_time("0:00:01.00") == 10 ** 9
    assert ass.parse_ass_time("1:02:03.25") == \
        ((3600 + 123) * 100 + 25) * 10 ** 7


def test_override_tags():
    text, align, pos = ass.strip_override_tags(
        "{\\an7}{\\pos(100,200)}A\\Nb{\\i1}c")
    assert text == "A\nbc"
    assert align == 7 and pos == (100.0, 200.0)
    # legacy \a codes: 6 -> top-center (numpad 8)
    _, align2, _ = ass.strip_override_tags("{\\a6}x")
    assert align2 == 8


def test_script_parse():
    t = ass.AssTrack()
    t.process_script(SCRIPT)
    assert (t.play_res_x, t.play_res_y) == (640, 480)
    assert t.styles["Default"].fontsize == 40
    assert t.styles["Default"].alignment == 2
    assert t.styles["Top"].alignment == 8
    assert t.styles["Top"].primary == (255, 255, 0, 255)  # &H0000FFFF
    assert len(t.events) == 2
    assert t.events[0].text == "Hello world\nsecond line"
    assert t.events[0].start == 10 ** 9
    assert t.events[1].text == "Top text"


def test_chunk_parse_dedupe():
    t = ass.AssTrack()
    t.process_codec_private(SCRIPT.split("[Events]")[0])
    t.process_chunk("1,0,Default,,0,0,0,,Chunk text", 10 ** 9, 10 ** 9)
    t.process_chunk("1,0,Default,,0,0,0,,Chunk text", 10 ** 9, 10 ** 9)
    assert len(t.events) == 1                # duplicate ReadOrder
    assert t.events[0].text == "Chunk text"


def test_render_and_blit():
    t = ass.AssTrack()
    t.process_script(SCRIPT)
    W, H = 320, 240
    imgs = ass.render_events(t, int(1.5e9), W, H)
    assert imgs                               # event 1 active
    ov = ass.blit_bgra_premultiplied(imgs, W, H)
    assert ov.shape == (H, W, 4)
    ys, xs = np.where(ov[..., 3] > 0)
    assert ys.max() > H * 0.6                 # bottom aligned
    # white glyph pixels premultiplied: B=G=R where alpha=255
    solid = ov[ov[..., 3] == 255]
    assert (solid[:, :3] == 255).any()
    # at t=2.5 both events active; Top style yellow at the top
    imgs2 = ass.render_events(t, int(2.5e9), W, H)
    ov2 = ass.blit_bgra_premultiplied(imgs2, W, H)
    top = ov2[:60]
    sel = top[top[..., 3] == 255]
    # yellow = B 0, G 255, R 255 premultiplied at full alpha
    assert ((sel[:, 0] == 0) & (sel[:, 1] == 255)
            & (sel[:, 2] == 255)).any()


def test_blit_math_first_touch_and_blend():
    # two overlapping images exercise both branches of the blit
    bm = np.full((2, 2), 128, np.uint8)
    img1 = {"bitmap": bm, "dst_x": 0, "dst_y": 0,
            "color": 0xFF000000}             # red, alpha 255 (byte 0)
    img2 = {"bitmap": bm, "dst_x": 0, "dst_y": 0,
            "color": 0x00FF0000}             # green
    out = ass.blit_bgra_premultiplied([img1, img2], 2, 2)
    # first: k=128 -> a=128, r=128*255//255=128
    # second: k=128 over a=128: a' = 128 + 127*128//255 = 191
    px = out[0, 0]
    assert px[3] == 128 + (255 - 128) * 128 // 255
    assert px[2] == (128 * 0 + (255 - 128) * 128) // 255  # red decays
    assert px[1] == (128 * 255 + (255 - 128) * 0) // 255  # green lands


def test_assrender_element():
    W, H = 320, 240
    el = gt.make("assrender")
    el.push_script(SCRIPT)
    p = Pipeline([el])
    p.negotiate(MediaSpec(kind="video", format="BGRx", width=W, height=H,
                          framerate=fractions.Fraction(2)))
    img = np.full((4, H, W, 4), 100, np.uint8)
    pts = jnp.asarray([0, int(1.5e9), int(2.5e9), int(5e9)], jnp.int64)
    out = np.asarray(p.run(inputs=FrameBatch.make(
        jnp.asarray(img), pts=pts))[0].data)
    np.testing.assert_array_equal(out[0], img[0])     # before events
    assert (out[1] != img[1]).any()                   # event 1
    assert (out[2][:60] != img[2][:60]).any()         # Top event
    np.testing.assert_array_equal(out[3], img[3])     # after events
    # enable=false passes through
    el2 = gt.make("assrender", enable=False)
    el2.push_script(SCRIPT)
    p2 = Pipeline([el2])
    p2.negotiate(MediaSpec(kind="video", format="BGRx", width=W,
                           height=H, framerate=fractions.Fraction(2)))
    out2 = np.asarray(p2.run(inputs=FrameBatch.make(
        jnp.asarray(img), pts=pts))[0].data)
    np.testing.assert_array_equal(out2, img)
