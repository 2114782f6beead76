"""Real-TPU bit-exactness + timing check: fused headline chain vs unfused.

Runs the full 10-element 1080p graph through the table-fusion path (the
ops/chainfuse.py Pallas kernel) and through element-by-element process(),
asserts elementwise equality ON THE TPU, then times the fused step.
"""
import time

import numpy as np
import jax

import gstbad_tpu as gt

print("devices:", jax.devices(), flush=True)

LAUNCH = ("videotestsrc pattern=bars width=1920 height=1080 format=BGRx ! "
          "coloreffects preset=sepia ! solarize ! chromium ! dodge ! burn "
          "! exclusion ! dilate ! chromahold ! videoconvert format=AYUV "
          "! zebrastripe ! fakesink")

outs = {}
for fuse in (True, False):
    p = gt.parse_launch(LAUNCH)
    p.negotiate()
    t0 = time.time()
    p.compile(8, fuse_luts=fuse)
    res = p.run(n_frames=8, window=8)
    outs[fuse] = np.concatenate([np.asarray(b.data) for b in res])
    print(f"fuse={fuse}: compiled+ran in {time.time() - t0:.1f}s", flush=True)
np.testing.assert_array_equal(outs[True], outs[False])
print("fused chain: BIT-EXACT on TPU (8 frames, 1080p)", flush=True)

# steady-state timing, window 16
import bench  # noqa: E402  (repo root on sys.path when run from /root/repo)
from gstbad_tpu.models import build  # noqa: E402

for w in (16, 32):
    fps = bench.time_pipeline(build("ten_element"), w, 8)
    print(f"headline window={w}: {fps:.1f} fps", flush=True)
