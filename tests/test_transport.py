"""Transport layer: GDP serialization, inter/proxy bridges, appsrc, the
native shm ring (cross-process, both ends in one test process like the
reference's ipcpipeline tests), netsim, observability sinks, y4m."""

import os

import numpy as np
import pytest

import gstbad_tpu as gt
from gstbad_tpu.core.frame import FrameBatch
from gstbad_tpu.core.spec import MediaSpec, VideoFormat
from gstbad_tpu.io import gdp, y4m


def _video_batch(rng, n=3, h=16, w=24):
    import jax.numpy as jnp
    data = jnp.asarray(rng.integers(0, 256, (n, h, w, 4), dtype=np.uint8))
    return FrameBatch.make(data)


def test_gdp_roundtrip(rng):
    spec = MediaSpec(kind="video", format="BGRx", width=24, height=16)
    batch = _video_batch(rng)
    blob = gdp.pay(batch, spec)
    batch2, spec2 = gdp.depay(blob)
    assert spec2 == spec
    np.testing.assert_array_equal(np.asarray(batch.data),
                                  np.asarray(batch2.data))
    np.testing.assert_array_equal(np.asarray(batch.pts),
                                  np.asarray(batch2.pts))


def test_gdp_planar_roundtrip(rng):
    import jax.numpy as jnp
    spec = MediaSpec(kind="video", format="I420", width=24, height=16)
    data = {"y": jnp.asarray(rng.integers(0, 256, (2, 16, 24), np.uint8)),
            "u": jnp.asarray(rng.integers(0, 256, (2, 8, 12), np.uint8)),
            "v": jnp.asarray(rng.integers(0, 256, (2, 8, 12), np.uint8))}
    batch = FrameBatch.make(data)
    batch2, spec2 = gdp.depay(gdp.pay(batch, spec))
    for k in data:
        np.testing.assert_array_equal(np.asarray(data[k]),
                                      np.asarray(batch2.data[k]))


def test_appsrc_pipeline(rng):
    frames = rng.integers(0, 256, (5, 16, 24, 4), dtype=np.uint8)
    p = gt.parse_launch("appsrc width=24 height=16 format=BGRx "
                        "! burn ! fakesink")
    src = p.elements[0]
    p.negotiate()
    src.push_frames(frames)
    outs = p.run(window=2)
    got = np.concatenate([np.asarray(o.data) for o in outs])
    from gstbad_tpu.golden.gaudieffects import burn
    assert got.shape[0] == 5  # padding frames masked out
    for i in range(5):
        np.testing.assert_array_equal(got[i], burn(frames[i]))


def test_intervideo_bridge(rng):
    frames = rng.integers(0, 256, (4, 16, 24, 4), dtype=np.uint8)
    p1 = gt.parse_launch("appsrc width=24 height=16 format=BGRx "
                         "! intervideosink channel=t1")
    p1.negotiate()
    p1.elements[0].push_frames(frames)
    p1.run(window=2)
    p2 = gt.parse_launch("intervideosrc channel=t1 width=24 height=16 "
                         "format=BGRx ! dodge ! fakesink")
    outs = p2.run(window=2)
    got = np.concatenate([np.asarray(o.data) for o in outs])
    from gstbad_tpu.golden.gaudieffects import dodge
    assert got.shape[0] == 4
    for i in range(4):
        np.testing.assert_array_equal(got[i], dodge(frames[i]))


def test_shmring_roundtrip(rng):
    from gstbad_tpu.io.shm import ShmRing
    ring = ShmRing.create("gstbad-test-ring", 1 << 20, 4)
    try:
        other = ShmRing.open("gstbad-test-ring")
        payloads = [rng.integers(0, 256, (n,), dtype=np.uint8).tobytes()
                    for n in (10, 1000, 100000)]
        for b in payloads:
            ring.write(b)
        for b in payloads:
            assert other.read(1000) == b
        ring.eos()
        assert other.read(1000) is None
        other.close()
    finally:
        ring.close()


def test_shm_pipeline_cross_process_style(rng):
    """Both ends in one process, like tests/check/pipelines/ipcpipeline.c."""
    frames = rng.integers(0, 256, (4, 16, 24, 4), dtype=np.uint8)
    p1 = gt.parse_launch(
        "appsrc width=24 height=16 format=BGRx "
        "! shmsink socket-path=gstbad-test-pipe shm-size=1048576")
    p1.negotiate()
    p1.elements[0].push_frames(frames)
    p1.run(window=2)
    p1.elements[-1].eos()

    p2 = gt.parse_launch("shmsrc socket-path=gstbad-test-pipe timeout-ms=2000"
                         " ! burn ! fakesink")
    outs = p2.run(window=2)
    got = np.concatenate([np.asarray(o.data) for o in outs])
    from gstbad_tpu.golden.gaudieffects import burn
    assert got.shape[0] == 4
    for i in range(4):
        np.testing.assert_array_equal(got[i], burn(frames[i]))


def test_netsim_drop_and_duplicate(rng):
    p = gt.parse_launch("videotestsrc pattern=gradient width=16 height=16 "
                        "! netsim drop-probability=0.5 seed=3 ! fakesink")
    outs = p.run(n_frames=32, window=8)
    n = sum(o.batch for o in outs)
    assert 4 < n < 30  # ~half dropped
    p2 = gt.parse_launch("videotestsrc pattern=gradient width=16 height=16 "
                         "! netsim duplicate-probability=1.0 ! fakesink")
    outs2 = p2.run(n_frames=8, window=4)
    assert sum(o.batch for o in outs2) == 16


def test_videocodectestsink(rng):
    p = gt.parse_launch("videotestsrc pattern=bars width=16 height=16 "
                        "! videocodectestsink")
    p.run(n_frames=3, window=3)
    sink = p.elements[-1]
    assert len(sink.frame_checksums) == 3
    assert len(set(sink.frame_checksums)) == 1
    assert len(sink.stream_checksum) == 32
    msgs = p.bus.pop(element="videocodectestsink")
    assert len(msgs) == 3


def test_fpsdisplaysink():
    p = gt.parse_launch("videotestsrc pattern=black width=16 height=16 "
                        "! fpsdisplaysink fps-update-interval=1")
    p.run(n_frames=8, window=4)
    sink = p.elements[-1]
    assert sink.frames_rendered == 8
    assert sink.average_fps > 0


def test_y4m_roundtrip(tmp_path, rng):
    spec = MediaSpec(kind="video", format="I420", width=24, height=16)
    planes = {"y": rng.integers(0, 256, (3, 16, 24), dtype=np.uint8),
              "u": rng.integers(0, 256, (3, 8, 12), dtype=np.uint8),
              "v": rng.integers(0, 256, (3, 8, 12), dtype=np.uint8)}
    path = tmp_path / "t.y4m"
    y4m.write_y4m(path, spec, planes)
    spec2, planes2 = y4m.read_y4m(str(path))
    assert spec2.width == 24 and spec2.height == 16
    for k in planes:
        np.testing.assert_array_equal(planes[k], planes2[k])


def test_watchdog():
    import time
    p = gt.parse_launch("videotestsrc width=16 height=16 ! watchdog "
                        "timeout=1 ! fakesink")
    p.run(n_frames=2, window=2)
    wd = p.elements[1]
    time.sleep(0.01)
    with pytest.raises(TimeoutError):
        wd.check()


def test_pnm_roundtrip(tmp_path, rng):
    from gstbad_tpu.io import pnm
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    pnm.write_pnm(tmp_path / "t.ppm", img)
    spec, back = pnm.read_pnm(str(tmp_path / "t.ppm"))
    assert spec.format == "RGB" and spec.width == 24
    np.testing.assert_array_equal(img, back)
    gray = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    pnm.write_pnm(tmp_path / "t.pgm", gray)
    spec2, back2 = pnm.read_pnm(str(tmp_path / "t.pgm"))
    assert spec2.format == "GRAY8"
    np.testing.assert_array_equal(gray, back2)


def test_gdp_file_transport(tmp_path, rng):
    frames = rng.integers(0, 256, (5, 16, 24, 4), dtype=np.uint8)
    loc = str(tmp_path / "t.gdp")
    p1 = gt.parse_launch(f"appsrc width=24 height=16 format=BGRx "
                         f"! gdpfilesink location={loc}")
    p1.negotiate()
    p1.elements[0].push_frames(frames)
    p1.run(window=2)
    p1.elements[-1].close()

    p2 = gt.parse_launch(f"gdpfilesrc location={loc} ! solarize ! fakesink")
    spec = p2.negotiate()
    assert spec.width == 24 and spec.format == "BGRx"
    outs = p2.run(window=2)
    got = np.concatenate([np.asarray(o.data) for o in outs])
    from gstbad_tpu.golden.gaudieffects import solarize
    assert got.shape[0] == 5
    for i in range(5):
        np.testing.assert_array_equal(got[i], solarize(frames[i]))


def test_filesink_videoparse_roundtrip(tmp_path, rng):
    loc = str(tmp_path / "t.raw")
    p = gt.parse_launch("videotestsrc pattern=gradient width=16 height=16 "
                        f"format=GRAY8 ! filesink location={loc}")
    p.run(n_frames=3, window=3)
    p.elements[-1].close()
    p2 = gt.parse_launch("videoparse format=GRAY8 width=16 height=16 "
                         "! fakesink")
    p2.negotiate()
    p2.elements[0].push_bytes(open(loc, "rb").read())
    outs = p2.run(window=3)
    assert sum(o.batch for o in outs) == 3


def test_netsim_drop_packets_counter():
    p = gt.parse_launch("videotestsrc pattern=gradient width=16 height=16 "
                        "! netsim drop-packets=5 ! fakesink")
    outs = p.run(n_frames=12, window=4)
    n = sum(o.batch for o in outs)
    assert n == 7  # first 5 dropped, counter persists across windows


def test_netsim_token_bucket_rate_cap():
    # 16x16 AYUV = 1024 B = 8192 bits/frame at 30 fps = ~246 kbps stream;
    # cap at ~half that (123 kbps = 4100 tokens/frame, 9 Kb bucket) and
    # check the bucket passes every other frame in steady state.
    p = gt.parse_launch(
        "videotestsrc pattern=gradient width=16 height=16 "
        "! netsim max-kbps=123 max-bucket-size=9 ! fakesink")
    outs = p.run(n_frames=30, window=6)
    n = sum(o.batch for o in outs)
    assert 12 <= n <= 18
    # a bucket smaller than one frame blocks everything
    p_blocked = gt.parse_launch(
        "videotestsrc pattern=gradient width=16 height=16 "
        "! netsim max-kbps=123 max-bucket-size=8 ! fakesink")
    assert sum(o.batch for o in p_blocked.run(n_frames=6, window=3)) == 0
    # unlimited rate with a bucket: everything passes (refill each frame)
    p2 = gt.parse_launch(
        "videotestsrc pattern=gradient width=16 height=16 "
        "! netsim max-kbps=-1 max-bucket-size=9 ! fakesink")
    assert sum(o.batch for o in p2.run(n_frames=10, window=5)) == 10


def test_netsim_delay_distributions_and_reorder_guard():
    import numpy as np
    for dist in ("uniform", "normal", "gamma"):
        p = gt.parse_launch(
            "videotestsrc pattern=gradient width=16 height=16 "
            f"! netsim delay-probability=1.0 delay-distribution={dist} "
            "min-delay=100 max-delay=200 seed=11 ! fakesink")
        outs = p.run(n_frames=16, window=8)
        pts = np.concatenate([np.asarray(o.pts) for o in outs])
        base = np.arange(16) * (10**9 // 30)
        d_ms = (pts - base) / 1e6
        assert d_ms.min() >= 0
        if dist == "uniform":
            assert d_ms.min() >= 100 and d_ms.max() <= 200
        else:
            assert 80 < np.median(d_ms) < 400
    # allow-reordering=false: output PTS must be non-decreasing
    p = gt.parse_launch(
        "videotestsrc pattern=gradient width=16 height=16 "
        "! netsim delay-probability=0.7 min-delay=0 max-delay=500 "
        "allow-reordering=false seed=5 ! fakesink")
    outs = p.run(n_frames=24, window=8)
    pts = np.concatenate([np.asarray(o.pts) for o in outs])
    assert (np.diff(pts) >= 0).all()


def test_ipcpipeline_state_query_message_forwarding(rng):
    """Full control-plane parity (protocol.txt chunk types 1/2/6/7/8/9):
    master forwards state changes + queries, slave acks and answers;
    slave messages surface on the master side."""
    import threading
    from gstbad_tpu.io.ipcpipeline import (IpcMaster, IpcSlave,
                                           STATE_CHANGE_SUCCESS)

    master = IpcMaster("gstbad-test-ipc", slot_size=1 << 20, n_slots=4)
    seen = {"states": [], "events": []}

    def slave_main():
        slave = IpcSlave(
            "gstbad-test-ipc",
            on_state=lambda t: (seen["states"].append(t),
                                STATE_CHANGE_SUCCESS)[1],
            on_query=lambda q: {"result": True, "position": 42}
            if q["type"] == "position" else {"result": False},
            on_event=lambda e: seen["events"].append(e["type"]))
        slave.post_message({"name": "slave-ready"})
        n = 0
        while True:
            got = slave.pull_buffer(5000)
            if got is None:
                break
            batch, spec = got
            n += batch.batch
        slave.post_message({"name": "slave-done", "frames": n})
        seen["frames"] = n
        slave.close()

    t = threading.Thread(target=slave_main, daemon=True)
    t.start()

    # state change RPC (chunk 7 + ack)
    assert master.set_state("playing") == STATE_CHANGE_SUCCESS
    # query RPC (chunk 6 + query result)
    res = master.query({"type": "position"})
    assert res == {"result": True, "position": 42}
    assert master.query({"type": "duration"}) == {"result": False}

    # buffers flow after the control plane
    from gstbad_tpu.core.frame import FrameBatch
    from gstbad_tpu.core.spec import MediaSpec, VideoFormat
    import jax.numpy as jnp
    frames = rng.integers(0, 256, (3, 8, 8, 4), np.uint8)
    spec = MediaSpec(kind="video", format=VideoFormat.BGRx, width=8, height=8)
    master.push_buffer(FrameBatch.make(jnp.asarray(frames)), spec)
    master.send_eos()
    t.join(timeout=10)
    assert not t.is_alive() and seen["frames"] == 3
    assert seen["states"] == ["playing"]
    assert seen["events"] == ["eos"]

    msgs = master.poll_messages(timeout_ms=200)
    names = [m.get("name") for m in msgs]
    assert "slave-ready" in names and "slave-done" in names
    master.close()


def test_ipcpipeline_elements_end_to_end(rng):
    """ipcpipelinesink ! (ring) ! ipcpipelinesrc in pipelines, both ends in
    one process like the reference's tests/check/pipelines/ipcpipeline.c."""
    frames = rng.integers(0, 256, (4, 8, 12, 4), np.uint8)
    p1 = gt.parse_launch(
        "appsrc width=12 height=8 format=BGRx "
        "! ipcpipelinesink name-prefix=gstbad-test-ipc2 shm-size=1048576")
    p1.negotiate()
    p1.elements[0].push_frames(frames)
    p1.run(window=2)
    sink = p1.elements[-1]
    sink.eos()

    p2 = gt.parse_launch(
        "ipcpipelinesrc name-prefix=gstbad-test-ipc2 timeout-ms=3000 "
        "! solarize ! fakesink")
    outs = p2.run(window=2)
    got = np.concatenate([np.asarray(o.data) for o in outs])
    from gstbad_tpu.golden.gaudieffects import solarize
    assert got.shape[0] == 4
    for i in range(4):
        np.testing.assert_array_equal(got[i], solarize(frames[i]))


def test_ivf_roundtrip(tmp_path, rng):
    from gstbad_tpu.io.ivf import IvfParse, write_ivf
    frames = [(i * 3000, rng.integers(0, 256, (50 + i,), np.uint8)
               .tobytes()) for i in range(5)]
    path = tmp_path / "t.ivf"
    write_ivf(path, b"VP90", 320, 240, 30000, 1001, frames)
    p = IvfParse()
    blob = path.read_bytes()
    got = []
    for i in range(0, len(blob), 23):  # ragged boundaries
        got += p.push(blob[i:i + 23])
    assert p.header.media_type == "video/x-vp9"
    assert (p.header.width, p.header.height) == (320, 240)
    assert (p.header.fps_n, p.header.fps_d) == (30000, 1001)
    assert got == frames
    import pytest as _pytest
    with _pytest.raises(ValueError):
        IvfParse().push(b"XXXX" + bytes(40))


def test_subtitle_encoders():
    from gstbad_tpu.io.subtitles import SrtEnc, WebvttEnc
    srt = SrtEnc()
    out = srt.encode("hello", 0) + srt.encode("world", 61_500 * 10**6,
                                              2 * 10**9)
    assert out.decode() == (
        "1\n00:00:00,000 --> 00:00:01,000\nhello\n\n"
        "2\n00:01:01,500 --> 00:01:03,500\nworld\n\n")
    vtt = WebvttEnc()
    out = vtt.encode("hi", 3_661_002 * 10**6).decode()
    assert out.startswith("WEBVTT\n\n")
    assert "01:01:01.002 --> 01:01:02.002\nhi" in out
    # header emitted once
    assert "WEBVTT" not in vtt.encode("again", 0).decode()


def test_y4m_file_elements_roundtrip(tmp_path, rng):
    """y4mfilesrc ! filter ! y4mfilesink in a launch string (y4mdec
    analog)."""
    planes = {"y": rng.integers(0, 256, (6, 48, 64), np.uint8),
              "u": rng.integers(0, 256, (6, 24, 32), np.uint8),
              "v": rng.integers(0, 256, (6, 24, 32), np.uint8)}
    src = tmp_path / "in.y4m"
    dst = tmp_path / "out.y4m"
    y4m.write_y4m(src, MediaSpec(kind="video", format="I420",
                                 width=64, height=48), planes)
    p = gt.parse_launch(f"y4mfilesrc location={src} "
                        f"! y4mfilesink location={dst}")
    p.run(window=4)
    p.elements[-1].close()
    spec2, planes2 = y4m.read_y4m(str(dst))
    assert spec2.width == 64 and spec2.format == "I420"
    for k in planes:
        np.testing.assert_array_equal(planes[k], planes2[k])


def test_shm_pipeline_two_real_processes(rng, tmp_path):
    """A REAL second process: the child opens the shm ring, runs its own
    pipeline (shmsrc ! burn ! shmsink), and the parent consumes the result
    over a second ring — end-to-end cross-process transport with live
    backpressure, unlike the single-process ipcpipeline-style tests."""
    import subprocess
    import sys

    frames = rng.integers(0, 256, (6, 16, 24, 4), dtype=np.uint8)

    # unique ring names per run: a stale /dev/shm segment from a previous
    # test would otherwise satisfy the readiness poll with an EOS'd ring
    import os
    import uuid
    tag = uuid.uuid4().hex[:8]
    ring_in, ring_out = f"gstbad-2pin-{tag}", f"gstbad-2pout-{tag}"

    child_code = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import gstbad_tpu as gt

p = gt.parse_launch(
    "shmsrc socket-path=RING_IN timeout-ms=10000 "
    "! burn ! shmsink socket-path=RING_OUT shm-size=2097152")
p.run(window=2)
p.get_by_name -- if False else None
p.elements[-1].eos()
print("child done", flush=True)
"""
    child_code = child_code.replace(
        "p.get_by_name -- if False else None\n", "").replace(
        "RING_IN", ring_in).replace("RING_OUT", ring_out)

    # parent owns the INPUT ring (shmsink); child creates the OUTPUT ring
    p1 = gt.parse_launch(
        "appsrc width=24 height=16 format=BGRx "
        f"! shmsink socket-path={ring_in} shm-size=2097152")
    p1.negotiate()
    p1.elements[0].push_frames(frames)

    env = dict(__import__("os").environ, JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo")
    child = subprocess.Popen([sys.executable, "-c", child_code], env=env,
                             stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                             text=True)
    try:
        # interleaved: feed windows while the child is live (ring
        # backpressure applies across the process boundary)
        p1.run(window=2)
        p1.elements[-1].eos()

        # wait for the child to create its output ring
        import time
        deadline = time.monotonic() + 60
        while (not os.path.exists(f"/dev/shm/{ring_out}")
               and time.monotonic() < deadline):
            time.sleep(0.05)

        p3 = gt.parse_launch(
            f"shmsrc socket-path={ring_out} timeout-ms=15000 "
            "! fakesink")
        outs = p3.run(window=2)
        got = np.concatenate([np.asarray(o.data) for o in outs])
        rc = child.wait(timeout=60)
        assert rc == 0, child.stderr.read()
    finally:
        if child.poll() is None:
            child.kill()

    from gstbad_tpu.golden.gaudieffects import burn
    assert got.shape[0] == 6
    for i in range(6):
        np.testing.assert_array_equal(got[i], burn(frames[i]))
