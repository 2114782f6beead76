#!/usr/bin/env python3
"""On-TPU bit-exactness check for the fused fieldanalysis metric kernel
and the ivtc score-only comb pair kernel (ops/fieldanalysis.py
_metrics_kernel, ops/comb.py _score_kernel): the compiled Mosaic paths
must equal the XLA oracles that the golden element tests pin.

Usage: python tools/tpu_fieldanalysis_check.py   (needs the TPU relay)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import gstbad_tpu  # noqa: F401,E402
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gstbad_tpu.ops import comb as comb_ops  # noqa: E402
from gstbad_tpu.ops import fieldanalysis as fa_ops  # noqa: E402


def main():
    rng = np.random.default_rng(2)
    B, H, W = 64, 720, 1280
    y = jnp.asarray(rng.integers(0, 256, (B, H, W), np.uint8))
    p = jnp.asarray(rng.integers(0, 256, (B, H, W), np.uint8))
    nf = jnp.int32(16)

    got = jax.jit(lambda a, b: fa_ops.metrics_default(a, b, nf))(y, p)
    jax.block_until_ready(got)

    def ref(yi, pi):
        return (fa_ops.opposite_parity_5_tap(yi, jnp.int32(0), yi, nf),
                fa_ops.same_parity_ssd(yi, jnp.int32(0), pi,
                                       jnp.int32(0), nf),
                fa_ops.same_parity_ssd(yi, jnp.int32(1), pi,
                                       jnp.int32(1), nf),
                fa_ops.opposite_parity_5_tap(yi, jnp.int32(0), pi, nf),
                fa_ops.opposite_parity_5_tap(yi, jnp.int32(1), pi, nf))

    want = jax.jit(jax.vmap(ref))(y, p)
    jax.block_until_ready(want)
    for name, g, w_ in zip(["f", "t", "b", "t_b", "b_t"], got, want):
        assert np.array_equal(np.asarray(g), np.asarray(w_)), \
            (name, np.asarray(g)[:4], np.asarray(w_)[:4])
    print("fieldanalysis metrics kernel: on-chip exact (B=%d)" % B)

    pool = jnp.asarray(rng.integers(0, 256, (24, H, W), np.uint8))
    n = 95
    ti = jnp.asarray(rng.integers(0, 24, n), jnp.int32)
    bi = jnp.asarray(rng.integers(0, 24, n), jnp.int32)
    want_s = np.asarray(jax.jit(
        lambda a, b, c: comb_ops.comb_score_pairs(a, b, c, engine="xla")
    )(pool, ti, bi))
    got_s = np.asarray(jax.jit(
        lambda a, b, c: comb_ops.comb_score_pairs(a, b, c,
                                                  engine="pallas")
    )(pool, ti, bi))
    assert np.array_equal(got_s, want_s), (got_s[:8], want_s[:8])
    print("comb pair-score kernel: on-chip exact (n=%d)" % n)

    B2 = 256
    y2 = jnp.asarray(rng.integers(0, 256, (B2, H, W), np.uint8))
    p2 = jnp.asarray(rng.integers(0, 256, (B2, H, W), np.uint8))
    r = jax.jit(lambda a, b: fa_ops.metrics_default(a, b, nf))
    out = r(y2, p2)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = r(y2, p2)
    jax.block_until_ready(out)
    print("metrics kernel: %.2f ms / 256-frame 720p window"
          % ((time.perf_counter() - t0) / 5 * 1000))


if __name__ == "__main__":
    main()
