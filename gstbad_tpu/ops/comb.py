"""Comb detection — the ivtc/combdetect run-length comb metric
(gst/ivtc/gstivtc.c:634-680, gstcombdetect.c:215-260) vectorized.

The C walks rows carrying `thisline[]`: outlier cells accumulate
thisline[i] += thisline[i-1] + 1 (clamped at 1000), non-outliers reset to 0,
and cells > 100 score.  Within a row that is a SEGMENTED PREFIX SUM of
(prev_row + 1) over outlier runs, so each row is one cumsum + cummax gather;
rows chain through a lax.scan.  The 1000-clamp is applied to the carried row
only — since every clamped value is > 100 either way, the painted cells and
the score are exactly the C's (clamping below 1000 never alters the > 100
test), while the unclamped in-row sums stay well inside int32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _outlier(s1, s2, s3):
    """src2 < min(src1,src3) - 5 or > max + 5 (int math)."""
    a = s1.astype(jnp.int32)
    b = s2.astype(jnp.int32)
    c = s3.astype(jnp.int32)
    return (b < jnp.minimum(a, c) - 5) | (b > jnp.maximum(a, c) + 5)


def _row_update(p, m):
    """One thisline row update.  p: carried row [W] int32 (clamped <= 1000),
    m: outlier mask [W].  Returns (new_carry, over100_mask)."""
    w = p.shape[0]
    v = jnp.where(m, p + 1, 0)
    s = jnp.cumsum(v)
    idx = jnp.arange(w, dtype=jnp.int32)
    last_false = lax.cummax(jnp.where(~m, idx, jnp.int32(-1)))
    base = jnp.where(last_false >= 0,
                     jnp.take(s, jnp.maximum(last_false, 0)), 0)
    seg = jnp.where(m, s - base, 0)
    return jnp.minimum(seg, 1000), seg > 100


def comb_mask(luma: jnp.ndarray, j_start: int = 2, j_stop_off: int = 2):
    """Per-pixel over-100 mask + score for rows [j_start, H - j_stop_off).

    luma: [H, W] uint8 (a woven frame).  Returns (mask [H, W] bool with
    False outside the scanned band, score int32).
    """
    h, w = luma.shape
    s1 = luma[j_start - 1:h - j_stop_off - 1]
    s2 = luma[j_start:h - j_stop_off]
    s3 = luma[j_start + 1:h - j_stop_off + 1]
    m = _outlier(s1, s2, s3)

    def step(p, mrow):
        p, over = _row_update(p, mrow)
        return p, over

    _, over = lax.scan(step, jnp.zeros(w, jnp.int32), m)
    mask = jnp.zeros((h, w), bool)
    mask = mask.at[j_start:h - j_stop_off].set(over)
    score = jnp.sum(over.astype(jnp.int32))
    return mask, score


def interleave(top: jnp.ndarray, bottom: jnp.ndarray) -> jnp.ndarray:
    """Even rows from `top`, odd rows from `bottom` (GET_LINE_IL)."""
    h = top.shape[-2]
    parity = (jnp.arange(h) % 2)[:, None]
    return jnp.where(parity == 0, top, bottom)


def comb_score(top: jnp.ndarray, bottom: jnp.ndarray) -> jnp.ndarray:
    """get_comb_score (gstivtc.c:634-680) on two field-source luma frames."""
    return comb_mask(interleave(top, bottom))[1]
