"""Interpret-mode exactness of the r5 Pallas metric kernels against their
XLA formulations: the fieldanalysis fused default-metric kernel
(ops/fieldanalysis._metrics_kernel) and the ivtc score-only comb pair
kernel (ops/comb._score_kernel).  The XLA paths are themselves pinned to
golden/ by the element tests, so equality here closes the chain."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gstbad_tpu.ops import comb as comb_ops
from gstbad_tpu.ops import fieldanalysis as fa_ops


@pytest.mark.parametrize("shape", [(4, 48, 64), (3, 50, 66), (5, 8, 4),
                                   (2, 96, 256)])
def test_metrics_default_matches_xla(shape):
    b, h, w = shape
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.integers(0, 256, (b, h, w), np.uint8))
    p = jnp.asarray(rng.integers(0, 256, (b, h, w), np.uint8))
    nf = jnp.int32(16)
    got = fa_ops.metrics_default(y, p, nf, interpret=True)

    def ref(yi, pi):
        return (fa_ops.opposite_parity_5_tap(yi, jnp.int32(0), yi, nf),
                fa_ops.same_parity_ssd(yi, jnp.int32(0), pi,
                                       jnp.int32(0), nf),
                fa_ops.same_parity_ssd(yi, jnp.int32(1), pi,
                                       jnp.int32(1), nf),
                fa_ops.opposite_parity_5_tap(yi, jnp.int32(0), pi, nf),
                fa_ops.opposite_parity_5_tap(yi, jnp.int32(1), pi, nf))

    want = jax.vmap(ref)(y, p)
    for name, g, w_ in zip(["f", "t", "b", "t_b", "b_t"], got, want):
        assert np.array_equal(np.asarray(g), np.asarray(w_)), name


@pytest.mark.parametrize("cfg", [(12, 48, 64, 11), (6, 50, 130, 40),
                                 (5, 24, 320, 5)])
def test_comb_score_pairs_matches_xla(cfg):
    pcount, h, w, n = cfg
    rng = np.random.default_rng(3)
    pool = jnp.asarray(rng.integers(0, 256, (pcount, h, w), np.uint8))
    ti = jnp.asarray(rng.integers(0, pcount, n), jnp.int32)
    bi = jnp.asarray(rng.integers(0, pcount, n), jnp.int32)
    want = np.asarray(comb_ops.comb_score_pairs(pool, ti, bi,
                                                engine="xla"))
    got = np.asarray(comb_ops.comb_score_pairs(pool, ti, bi,
                                               engine="pallas", chunk=32))
    assert np.array_equal(got, want)
