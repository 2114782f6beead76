#!/usr/bin/env python3
"""Benchmark driver — one JSON line on stdout.

Headline metric (BASELINE.md): 1080p frames/sec/chip for the fused
10-element filter graph; vs_baseline = speedup over the single-core CPU
golden (the numpy transcription of the reference C hot loops, the measured
stand-in for the C reference on this host).

Usage: python bench.py [--config ten_element] [--frames N] [--window W]
"""

import argparse
import json
import sys
import time

import numpy as np


def time_pipeline(pipeline, window: int, n_windows: int, warmup: int = 2):
    """Time the fused step function steady-state (data stays on device)."""
    import jax

    pipeline.negotiate()
    step = pipeline.compile(window)
    params = pipeline.params()
    states = pipeline.init_states(window)
    # warmup (compile + cache)
    for _ in range(warmup):
        states, batch, _ = step(params, states, None)
    jax.block_until_ready(batch)
    t0 = time.perf_counter()
    for _ in range(n_windows):
        states, batch, _ = step(params, states, None)
    jax.block_until_ready(batch)
    dt = time.perf_counter() - t0
    return (n_windows * window) / dt


def cpu_baseline_fps(width=1920, height=1080, reps=2):
    """Single-core numpy golden for the 10-element graph, frames/sec."""
    from gstbad_tpu.golden import coloreffects as g_ce
    from gstbad_tpu.golden import gaudieffects as g
    from gstbad_tpu.golden import videofilters as g_vf

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (height, width, 4), dtype=np.uint8)
    t0 = time.perf_counter()
    for _ in range(reps):
        x = g_ce.coloreffects_rgb(img, "sepia", (2, 1, 0))
        x = g.solarize(x)
        x = g.chromium(x)
        x = g.dodge(x)
        x = g.burn(x)
        x = g.exclusion(x)
        x = g.dilate(x)
        x = g_ce.chromahold(x)
        # videoconvert-to-AYUV + zebrastripe approximated by the luma pass
        y = ((66 * x[..., 2].astype(np.int64) + 129 * x[..., 1].astype(np.int64)
              + 25 * x[..., 0].astype(np.int64) + 4096) >> 8).clip(0, 255)
        _ = g_vf.zebrastripe_y(y.astype(np.uint8), 90, 0)
    dt = time.perf_counter() - t0
    return reps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="ten_element")
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--windows", type=int, default=8)
    ap.add_argument("--all", action="store_true",
                    help="print per-config lines to stderr as well")
    ap.add_argument("--init-timeout", type=int, default=600,
                    help="seconds to wait for device init before aborting")
    args = ap.parse_args()

    # The axon relay can wedge inside PJRT init, which holds the GIL — an
    # in-process SIGALRM handler never runs then.  A watchdog SUBPROCESS
    # delivers SIGKILL regardless, so a dead relay fails loudly instead of
    # hanging the driver forever.  It is disarmed after the FIRST graph
    # compiles + executes (the relay is then alive; a long --all sweep
    # must not be killed), and runs in its own session so disarming also
    # reaps the sleep child.
    import os
    import signal as _signal
    import subprocess

    watchdog = subprocess.Popen(
        ["/bin/sh", "-c",
         f"sleep {args.init_timeout} && "
         f"echo 'bench: init/compile exceeded {args.init_timeout}s "
         f"(TPU relay unavailable?)' >&2 && kill -9 {os.getpid()}"],
        start_new_session=True)

    def disarm():
        try:
            os.killpg(os.getpgid(watchdog.pid), _signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass

    try:
        from gstbad_tpu.models import build, BENCHMARKS

        # headline config first: its compile+run proves the relay is
        # alive, then the watchdog is disarmed for any longer sweep
        pipeline = build(args.config)
        fps = time_pipeline(pipeline, args.window, args.windows)
    finally:
        disarm()

    if args.all:
        for name in BENCHMARKS:
            try:
                p = build(name)
                f = time_pipeline(p, args.window, args.windows)
                print(f"{name}: {f:.1f} frames/sec", file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILED {e}", file=sys.stderr)
    baseline = cpu_baseline_fps()
    print(json.dumps({
        "metric": "1080p_frames_per_sec_per_chip_10elem_graph",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline, 2),
    }))


if __name__ == "__main__":
    main()
