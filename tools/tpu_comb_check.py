#!/usr/bin/env python3
"""On-TPU bit-exactness check for the comb chain kernel
(ops/comb.py): the sublane-batched Pallas path must equal the
blocked-scan XLA oracle for small-batch, full-sublane and chunked
(n > _NCHUNK) layouts.  The tools/tpu_chain_check.py pattern.

Usage: python tools/tpu_comb_check.py   (needs the TPU relay)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from gstbad_tpu.ops import comb as comb_ops


def main():
    rng = np.random.default_rng(5)
    cases = ((2, 716, 1280),    # ivtc-style pair batch
             (31, 716, 1280),   # full sublane occupancy
             (40, 236, 320))    # > _NCHUNK: the lax.map chunk path
    for n, h, w in cases:
        y = jnp.asarray(rng.integers(0, 256, (n, h, w), dtype=np.uint8))
        m_p, s_p = comb_ops.comb_mask(y, engine="pallas")
        m_x, s_x = comb_ops.comb_mask(y, engine="xla")
        assert (np.asarray(m_p) == np.asarray(m_x)).all(), (n, h, w)
        assert (np.asarray(s_p) == np.asarray(s_x)).all(), (n, h, w)
        print(f"comb n={n} {h}x{w}: pallas == xla "
              f"(score head {np.asarray(s_p).ravel()[:3]})")
    print("ALL EXACT")


if __name__ == "__main__":
    main()
