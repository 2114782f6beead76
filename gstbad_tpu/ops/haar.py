"""Viola-Jones Haar cascade evaluation on TPU (the engine behind
handdetect, ext/opencv/gsthanddetect.cpp, using the IN-TREE fist.xml /
palm.xml models).

Every rect sum over every sliding window is four SLICES of the integral
image (no gathers): for windows at stride s, the sum of rect (rx, ry,
rw, rh) across all windows is ii[ry+rh:, rx+rw:] - ii[ry:, rx+rw:] -
ii[ry+rh:, rx:] + ii[ry:, rx:] sliced to the window grid.  Tilted
(45-degree) features use the rotated integral (RSAT) with OpenCV's
corner formula.  Stage sums short-circuit logically; here all stages
evaluate vectorized and AND their pass masks (same result).

cv2 5.0 removed objdetect, so OpenCV's exact detectMultiScale stepping
and pruning heuristics cannot be cross-checked in this environment; the
engine implements the published algorithm (image pyramid at scale-factor
steps, stride-2 sweep, full-window variance normalization,
neighbor-count confirmation) — documented divergence, validated against
hand-computed synthetic cascades in tests/test_haar.py.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gstbad_tpu.io.haarcascade import HaarCascade

STRIDE = 2


class _Node(NamedTuple):
    rects: Tuple[Tuple[int, int, int, int, float], ...]
    tilted: bool
    threshold: float
    left_val: float
    right_val: float
    left_node: int      # -1 = leaf
    right_node: int


def _compile(cascade: HaarCascade):
    stages = []
    for st in cascade.stages:
        trees = []
        for tr in st.trees:
            nodes = []
            for n in tr.nodes:
                nodes.append(_Node(
                    tuple(n.rects), n.tilted, n.threshold,
                    0.0 if n.left_val is None else n.left_val,
                    0.0 if n.right_val is None else n.right_val,
                    -1 if n.left_node is None else n.left_node,
                    -1 if n.right_node is None else n.right_node))
            trees.append(nodes)
        stages.append((trees, st.threshold))
    return stages


def integral(x: jnp.ndarray) -> jnp.ndarray:
    """[H, W] -> [H+1, W+1] zero-padded summed-area table (f32)."""
    ii = jnp.cumsum(jnp.cumsum(x.astype(jnp.float32), axis=0), axis=1)
    return jnp.pad(ii, ((1, 0), (1, 0)))


TILT_PAD = 64    # left margin for (x - h) corner lookups


def tilted_integral(x: jnp.ndarray) -> jnp.ndarray:
    """OpenCV RSAT (cv2.integral3's third output), with margins.

    Recurrence (verified cell-for-cell against cv2.integral3):
    t[y+1, x] = t[y, x-1] + t[y, x+1] - t[y-1, x] + I[y, x-1]
                + I[y-1, x-1].
    The image is zero-padded TILT_PAD columns left and (H + TILT_PAD)
    columns right: beyond x >= W + y the true RSAT is exactly zero, so
    zero-extension keeps the recurrence exact everywhere the real
    corner lookups land.  Returns [H+1, Wp+1] f32 where column
    TILT_PAD corresponds to image x = 0."""
    h, w = x.shape
    xf = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (TILT_PAD, h + TILT_PAD)))
    wp = xf.shape[1]

    def step(carry, i_rows):
        prev, prev2 = carry                       # t rows y, y-1 [Wp+1]
        i_row, i_prev_row = i_rows
        left = jnp.concatenate([jnp.zeros(1), prev[:-1]])
        right = jnp.concatenate([prev[1:], jnp.zeros(1)])
        i1 = jnp.concatenate([jnp.zeros(1), i_row])        # I[y, x-1]
        i2 = jnp.concatenate([jnp.zeros(1), i_prev_row])   # I[y-1, x-1]
        new = left + right - prev2 + i1 + i2
        return (new, prev), new

    i_prev = jnp.concatenate([jnp.zeros((1, wp)), xf[:-1]], axis=0)
    (_, _), rows = jax.lax.scan(
        step, (jnp.zeros(wp + 1), jnp.zeros(wp + 1)), (xf, i_prev))
    return jnp.concatenate([jnp.zeros((1, wp + 1)), rows], axis=0)


def _rect_sum(ii: jnp.ndarray, ny: int, nx: int, rx: int, ry: int,
              rw: int, rh: int) -> jnp.ndarray:
    """Sum of rect (rx, ry, rw, rh) for every stride-STRIDE window."""
    def grid(yo, xo):
        return ii[yo:yo + ny * STRIDE:STRIDE, xo:xo + nx * STRIDE:STRIDE]
    return (grid(ry + rh, rx + rw) - grid(ry, rx + rw)
            - grid(ry + rh, rx) + grid(ry, rx))


def _tilted_sum(tii: jnp.ndarray, ny: int, nx: int, rx: int, ry: int,
                rw: int, rh: int) -> jnp.ndarray:
    """OpenCV tilted rect sum (cvhaar's p0 - p1 - p2 + p3 corners):
    t(y, x) - t(y+h, x-h) - t(y+w, x+w) + t(y+w+h, x+w-h), verified
    against cv2.integral3 one-hot coefficient maps.  tii comes from
    tilted_integral (bottom rows may be clipped for corners past H —
    pad row reads at the bottom)."""
    tpad = jnp.pad(tii, ((0, 64), (0, 0)))

    def grid(yo, xo):
        xo = xo + TILT_PAD
        return tpad[yo:yo + ny * STRIDE:STRIDE,
                    xo:xo + nx * STRIDE:STRIDE]
    return (grid(ry, rx) - grid(ry + rh, rx - rh)
            - grid(ry + rw, rx + rw) + grid(ry + rw + rh, rx + rw - rh))


def eval_cascade(gray: jnp.ndarray, cascade: HaarCascade
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the base-scale cascade over all stride-2 windows of
    gray [H, W] u8.  Returns (pass mask [ny, nx], final stage sum)."""
    stages = _compile(cascade)
    ww, wh = cascade.window
    h, w = gray.shape
    ny = max((h - wh) // STRIDE + 1, 0)
    nx = max((w - ww) // STRIDE + 1, 0)
    ii = integral(gray)
    sq = integral(gray.astype(jnp.float32) ** 2)
    any_tilted = any(n.tilted for trees, _ in stages for tr in trees
                     for n in tr)
    tii = tilted_integral(gray) if any_tilted else None
    area = float(ww * wh)
    total = _rect_sum(ii, ny, nx, 0, 0, ww, wh)
    total_sq = _rect_sum(sq, ny, nx, 0, 0, ww, wh)
    mean = total / area
    variance = jnp.maximum(total_sq / area - mean * mean, 0.0)
    vnorm = jnp.where(variance > 0, jnp.sqrt(variance), 1.0)

    passed = jnp.ones((ny, nx), bool)
    score = jnp.zeros((ny, nx), jnp.float32)
    for trees, st_thresh in stages:
        st_sum = jnp.zeros((ny, nx), jnp.float32)
        for nodes in trees:
            # evaluate every node's feature, then walk the (tiny) tree
            fvals = []
            for n in nodes:
                acc = jnp.zeros((ny, nx), jnp.float32)
                for (rx, ry, rw, rh, wgt) in n.rects:
                    s = (_tilted_sum(tii, ny, nx, rx, ry, rw, rh)
                         if n.tilted else
                         _rect_sum(ii, ny, nx, rx, ry, rw, rh))
                    acc = acc + np.float32(wgt) * s
                fvals.append(acc / area)
            # traversal: value[] computed leaf-up is awkward with
            # forward child indices; walk iteratively from node 0
            idx = jnp.zeros((ny, nx), jnp.int32)
            done = jnp.zeros((ny, nx), bool)
            val = jnp.zeros((ny, nx), jnp.float32)
            for _ in range(len(nodes)):
                for k, n in enumerate(nodes):
                    at_k = (idx == k) & ~done
                    go_left = fvals[k] < np.float32(n.threshold) * vnorm
                    leaf_l = n.left_node < 0
                    leaf_r = n.right_node < 0
                    val = jnp.where(
                        at_k & go_left & leaf_l, np.float32(n.left_val),
                        jnp.where(at_k & ~go_left & leaf_r,
                                  np.float32(n.right_val), val))
                    done = done | (at_k & ((go_left & leaf_l)
                                           | (~go_left & leaf_r)))
                    nxt = jnp.where(go_left,
                                    np.int32(max(n.left_node, 0)),
                                    np.int32(max(n.right_node, 0)))
                    idx = jnp.where(at_k & ~done, nxt, idx)
            st_sum = st_sum + val
        passed = passed & (st_sum >= np.float32(st_thresh))
        score = st_sum
    return passed, score


def detect_multi_scale(gray: jnp.ndarray, cascade: HaarCascade,
                       scale_factor: float = 1.1,
                       min_neighbors: int = 2,
                       max_scales: int = 16) -> List[dict]:
    """Image-pyramid sweep; returns one dict per scale with the pass
    mask, confirmation counts (3x3 neighbor passes) and geometry.
    Neighbor-count confirmation replaces cv::groupRectangles
    (documented divergence)."""
    ww, wh = cascade.window
    h, w = gray.shape
    out = []
    factor = 1.0
    for _ in range(max_scales):
        sh, sw = int(h / factor), int(w / factor)
        if sh < wh or sw < ww:
            break
        scaled = jax.image.resize(gray.astype(jnp.float32), (sh, sw),
                                  "linear")
        passed, score = eval_cascade(scaled, cascade)
        counts = jnp.zeros_like(passed, jnp.int32)
        p = passed.astype(jnp.int32)
        pad = jnp.pad(p, 1)
        for dy in range(3):
            for dx in range(3):
                counts = counts + pad[dy:dy + p.shape[0],
                                      dx:dx + p.shape[1]]
        out.append({"passed": passed, "counts": counts, "score": score,
                    "factor": factor,
                    "size": (int(ww * factor), int(wh * factor))})
        factor *= scale_factor
    return out
