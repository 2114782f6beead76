#!/usr/bin/env python3
"""On-TPU bit-exactness check for the whole-window VAD kernel
(ops/audio.vad_window): must equal folding ops/audio.vad_block over
the blocks on CPU — frame types AND the carried state (power limbs,
ZCR ring, counters).

Usage: python tools/tpu_vad_check.py   (needs the TPU relay)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gstbad_tpu.ops import audio as ops


def main():
    rng = np.random.default_rng(42)
    nb, n = 16, 4800
    thr = jnp.int64(int((10.0 ** -6) * 4294967295))
    hys = jnp.int64(480)
    data = jnp.asarray(np.concatenate([
        rng.integers(-32768, 32767, (nb // 2, n)),
        rng.integers(-500, 500, (nb // 2, n))]).astype(np.int16))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        st = jax.device_put(ops.vad_init_state(), cpu)
        fts = []
        for k in range(nb):
            st, ft = ops.vad_block(st, jax.device_put(data[k], cpu),
                                   thr, hys)
            fts.append(int(ft))
    st2, ft2 = ops.vad_window(ops.vad_init_state(), data, thr, hys,
                              interpret=False)
    assert fts == [int(x) for x in ft2], (fts, list(map(int, ft2)))
    for key in st:
        a, b = np.asarray(st[key]), np.asarray(st2[key])
        assert (a == b).all(), (key, a, b)
    print(f"vad_window on TPU EXACT vs folded CPU oracle "
          f"({nb} blocks x {n} samples, frame types {fts})")


if __name__ == "__main__":
    main()
