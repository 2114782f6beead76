"""Console entry points — tpu-transcode, the gst-transcoder CLI analog
(tools/gst-transcoder.c)."""

import argparse
import sys


def transcode_main(argv=None):
    ap = argparse.ArgumentParser(
        prog="tpu-transcode",
        description="Transcode a y4m file through a gst-launch style "
                    "filter chain on TPU (gst-transcoder analog).")
    ap.add_argument("src")
    ap.add_argument("dest")
    ap.add_argument("--filters", default="",
                    help="gst-launch style filter chain")
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--profile", default="y4m",
                    help="encoding profile: y4m[:FMT] | pnm | gdp | "
                         "hevc[:qp=N|:lossless] (real libx265) | "
                         "av1[:bitrate=N] (real libaom, IVF)")
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU instead of the TPU")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from gstbad_tpu.session import Transcoder

    def progress(pos, total):
        pct = 100.0 * pos / total if total else 0.0
        print(f"\rposition {pos / 1e9:.2f}s / {total / 1e9:.2f}s "
              f"({pct:.0f}%)", end="", file=sys.stderr)

    t = Transcoder(args.src, args.dest, args.filters, window=args.window,
                   profile=args.profile, on_position=progress)
    frames = t.run()
    print(f"\nwrote {frames} frames to {args.dest}", file=sys.stderr)
    return 0
