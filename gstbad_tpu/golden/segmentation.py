"""Golden segmentation (ext/opencv/gstsegmentation.cpp).

The element keeps a per-pixel fg/bg model over YCrCb frames and writes the
foreground mask into the RGBA alpha channel (gstsegmentation.cpp:354-457):

- method=codebook: the O'Reilly codebook printed inside the reference file
  itself (gstsegmentation.cpp:476-660, CODE_FROM_OREILLY_BOOK).
- method=mog2: cv::BackgroundSubtractorMOG2 (gstsegmentation.cpp:756-775);
  this transcription is validated BIT-EXACT against cv2 (the same library
  the reference calls) in tests/test_segmentation.py.
- method=mog: cv::bgsegm::BackgroundSubtractorMOG
  (gstsegmentation.cpp:738-754).  opencv_contrib's bgsegm module is absent
  from this environment's cv2 build, so there is no oracle; this golden
  implements the published algorithm the reference documents
  (KadewTraKuPong & Bowden 2001, Stauffer-Grimson update) with
  opencv_contrib's default parameters — bit patterns are NOT claimed to
  match opencv_contrib.

Reference quirks reproduced faithfully (see docstrings below): the
codebook's frozen `t` counter (c->t+=1 is commented out in the source, so
the whole stale-entry machinery is dead code), the YCrCb fixed-point
conversion, the MOG2 in-place prune that leaves zeroed entries in the
middle of the mode array, and the learning-interval cadence.
"""

from __future__ import annotations

import numpy as np

# MOG2 parameters (OpenCV modules/video/src/bgfg_gaussmix2.cpp defaults,
# which createBackgroundSubtractorMOG2() uses).
MOG2_K = 5
MOG2_TB = 0.9          # backgroundRatio
MOG2_Tb = 4.0 * 4.0    # varThreshold
MOG2_Tg = 3.0 * 3.0    # varThresholdGen
MOG2_VAR_INIT = 15.0
MOG2_VAR_MIN = 4.0
MOG2_VAR_MAX = 5 * 15.0
MOG2_CT = 0.05
MOG2_TAU = 0.5
MOG2_SHADOW = 127

# Codebook parameters (gstsegmentation.cpp:375-378; fixed in the source).
CB_BOUNDS = (10, 5, 5)
CB_MIN_MOD = (20, 20, 20)
CB_MAX_MOD = (20, 20, 20)
CB_LEARN_FRAMES = 30       # gstsegmentation.cpp:380

# MOG parameters (opencv_contrib modules/bgsegm defaults).
MOG_K = 5
MOG_BACKGROUND_RATIO = 0.7
MOG_VAR_THRESHOLD = 2.5 * 2.5
MOG_NOISE_SIGMA = 30 * 0.5
MOG_INITIAL_WEIGHT = 0.05


def rgb2ycrcb_u8(rgb: np.ndarray) -> np.ndarray:
    """cv::cvtColor(RGB2YCrCb) 8-bit fixed point, bit-exact vs cv2
    (gstsegmentation.cpp:365 converts cvRGB -> cvYUV this way)."""
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    sh = 14
    half = 1 << (sh - 1)
    y = (r * 4899 + g * 9617 + b * 1868 + half) >> sh
    delta = 128 << sh
    cr = ((r - y) * 11682 + delta + half) >> sh
    cb = ((b - y) * 9241 + delta + half) >> sh
    out = np.stack([y, cr, cb], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# MOG2 (bgfg_gaussmix2.cpp MOG2Invoker) — validated bit-exact vs cv2
# ---------------------------------------------------------------------------


def mog2_new_state(h: int, w: int):
    return {
        "weight": np.zeros((h, w, MOG2_K), np.float32),
        "mean": np.zeros((h, w, MOG2_K, 3), np.float32),
        "var": np.zeros((h, w, MOG2_K), np.float32),
        "nmodes": np.zeros((h, w), np.int32),
    }


def _mog2_pixel(data, weight, mean, var, nmodes, alpha_t):
    """One pixel step; mutates weight/mean/var rows in place, returns
    (mask_value, nmodes).  Literal transcription of MOG2Invoker's
    per-pixel loop including the in-place prune (weight zeroed, nmodes
    decremented, entry left in the array) and the bubble-up insertion
    sorts."""
    alpha1 = 1.0 - alpha_t
    prune = -alpha_t * MOG2_CT
    total_weight = 0.0
    fits = False
    background = False
    nm = int(nmodes)
    for mode in range(nm):
        w = alpha1 * weight[mode] + prune
        swap_count = 0
        if not fits:
            v = var[mode]
            d = mean[mode] - data
            dist2 = float(d @ d)
            if total_weight < MOG2_TB and dist2 < MOG2_Tb * v:
                background = True
            if dist2 < MOG2_Tg * v:
                fits = True
                w += alpha_t
                k = alpha_t / w
                mean[mode] = mean[mode] - k * d
                varnew = v + k * (dist2 - v)
                var[mode] = min(max(varnew, MOG2_VAR_MIN), MOG2_VAR_MAX)
                i = mode
                while i > 0:
                    if w < weight[i - 1]:
                        break
                    swap_count += 1
                    weight[[i, i - 1]] = weight[[i - 1, i]]
                    var[[i, i - 1]] = var[[i - 1, i]]
                    mean[[i, i - 1]] = mean[[i - 1, i]]
                    i -= 1
        if w < -prune:
            w = 0.0
            nm -= 1
        weight[mode - swap_count] = w
        total_weight += w
    inv = 1.0 / total_weight if total_weight != 0 else np.inf
    for i in range(nm):
        weight[i] *= inv
    if not fits and alpha_t > 0:
        if nm == MOG2_K:
            mode = MOG2_K - 1
        else:
            mode = nm
            nm += 1
        if nm == 1:
            weight[mode] = 1.0
        else:
            weight[mode] = alpha_t
            for i in range(nm - 1):
                weight[i] *= alpha1
        mean[mode] = data
        var[mode] = MOG2_VAR_INIT
        i = nm - 1
        while i > 0:
            if alpha_t < weight[i - 1]:
                break
            weight[[i, i - 1]] = weight[[i - 1, i]]
            var[[i, i - 1]] = var[[i - 1, i]]
            mean[[i, i - 1]] = mean[[i - 1, i]]
            i -= 1
    if background:
        return 0, nm
    # detectShadowGMM, on the post-update state
    t_w = 0.0
    for m in range(nm):
        numer = float(data @ mean[m])
        denom = float(mean[m] @ mean[m])
        if denom == 0:
            return 255, nm
        if numer <= denom and numer >= MOG2_TAU * denom:
            a = numer / denom
            dd = a * mean[m] - data
            if float(dd @ dd) < MOG2_Tb * var[m] * a * a:
                return MOG2_SHADOW, nm
        t_w += weight[m]
        if t_w > MOG2_TB:
            return 255, nm
    return 255, nm


def mog2_step(ycc: np.ndarray, state, learning_rate: float) -> np.ndarray:
    """One frame through MOG2: ycc [H, W, 3] u8 -> mask [H, W] u8
    {0, 127, 255}.  State mutated in place."""
    h, w3 = ycc.shape[:2]
    mask = np.zeros((h, w3), np.uint8)
    for y in range(h):
        for x in range(w3):
            m, nm = _mog2_pixel(
                ycc[y, x].astype(np.float32),
                state["weight"][y, x], state["mean"][y, x],
                state["var"][y, x], state["nmodes"][y, x], learning_rate)
            mask[y, x] = m
            state["nmodes"][y, x] = nm
    return mask


# ---------------------------------------------------------------------------
# Codebook (gstsegmentation.cpp:476-660, CODE_FROM_OREILLY_BOOK)
# ---------------------------------------------------------------------------


class CodeBookPixel:
    """One pixel's codebook.  `t` is frozen at 0 because the reference
    comments out `c->t += 1` (gstsegmentation.cpp:480), which makes the
    whole stale-entry machinery dead code: negRun = 0 - 0 = 0 forever, so
    `stale` never rises, and clear_stale_entries (t>>1 == 0 threshold,
    strict >) never clears anything.  Reproduced faithfully by omission."""

    __slots__ = ("learn_high", "learn_low", "vmax", "vmin")

    def __init__(self):
        self.learn_high = []   # per entry: [3] ints
        self.learn_low = []
        self.vmax = []
        self.vmin = []

    def update(self, p):
        """update_codebook (gstsegmentation.cpp:476-556)."""
        high = [min(int(p[n]) + CB_BOUNDS[n], 255) for n in range(3)]
        low = [max(int(p[n]) - CB_BOUNDS[n], 0) for n in range(3)]
        n_entries = len(self.vmax)
        i = 0
        for i in range(n_entries):
            if all(self.learn_low[i][n] <= p[n] <= self.learn_high[i][n]
                   for n in range(3)):
                for n in range(3):
                    if self.vmax[i][n] < p[n]:
                        self.vmax[i][n] = int(p[n])
                    elif self.vmin[i][n] > p[n]:
                        self.vmin[i][n] = int(p[n])
                break
        else:
            i = n_entries
        if i == n_entries:
            self.learn_high.append(list(high))
            self.learn_low.append(list(low))
            self.vmax.append([int(v) for v in p])
            self.vmin.append([int(v) for v in p])
        for n in range(3):
            if self.learn_high[i][n] < high[n]:
                self.learn_high[i][n] += 1
            if self.learn_low[i][n] > low[n]:
                self.learn_low[i][n] -= 1

    def diff(self, p) -> int:
        """background_diff (gstsegmentation.cpp:636-660): 0 bg, 255 fg."""
        for i in range(len(self.vmax)):
            if all(self.vmin[i][n] - CB_MIN_MOD[n] <= p[n]
                   <= self.vmax[i][n] + CB_MAX_MOD[n] for n in range(3)):
                return 0
        return 255


def codebook_video(frames_ycc: np.ndarray, learning_rate: float
                   ) -> np.ndarray:
    """Whole codebook pipeline over [T, H, W, 3] YCrCb frames, returning
    raw masks [T, H, W] u8 BEFORE the connected-components cleanup
    (gstsegmentation.cpp:374-408).  framecount is 1-based (incremented
    before processing, gstsegmentation.cpp:361); learning phase while
    framecount < 30 leaves the mask at 0."""
    t_, h, w = frames_ycc.shape[:3]
    books = [[CodeBookPixel() for _ in range(w)] for _ in range(h)]
    learning_interval = int(1.0 / learning_rate)
    masks = np.zeros((t_, h, w), np.uint8)
    for t in range(t_):
        framecount = t + 1
        if framecount < CB_LEARN_FRAMES:
            for y in range(h):
                for x in range(w):
                    books[y][x].update(frames_ycc[t, y, x])
        else:
            if framecount % learning_interval == 0:
                for y in range(h):
                    for x in range(w):
                        books[y][x].update(frames_ycc[t, y, x])
            # framecount % 60 == 0 -> clear_stale_entries: dead code (see
            # CodeBookPixel docstring)
            for y in range(h):
                for x in range(w):
                    masks[t, y, x] = books[y][x].diff(frames_ycc[t, y, x])
    return masks


def morph_open_close(mask: np.ndarray) -> np.ndarray:
    """find_connected_components' mask cleanup
    (gstsegmentation.cpp:693-735): morphologyEx OPEN then CLOSE with the
    default 3x3 rect kernel, one iteration each.  cv2's default morphology
    border (replicate-like: erode pads 255, dilate pads 0).

    The subsequent contour filter is a provable no-op at the hard-coded
    perimScale=10000 (gstsegmentation.cpp:411): q = (h+w)/10000 < 1 for
    any real frame, and after OPEN every surviving component contains a
    3x3 interior, so its contourArea >= 1 >= q.  The approxPolyDP level-1
    boundary smoothing of the redraw is NOT reproduced (documented
    divergence)."""
    def erode(m):
        p = np.pad(m, 1, constant_values=255)
        return np.minimum.reduce([p[a:a + m.shape[0], b:b + m.shape[1]]
                                  for a in range(3) for b in range(3)])

    def dilate(m):
        p = np.pad(m, 1, constant_values=0)
        return np.maximum.reduce([p[a:a + m.shape[0], b:b + m.shape[1]]
                                  for a in range(3) for b in range(3)])

    opened = dilate(erode(mask))
    return erode(dilate(opened))


# ---------------------------------------------------------------------------
# MOG (KadewTraKuPong & Bowden 2001) — algorithm-faithful, no cv2 oracle
# ---------------------------------------------------------------------------


def mog_new_state(h: int, w: int):
    return {
        "weight": np.zeros((h, w, MOG_K), np.float32),
        "mean": np.zeros((h, w, MOG_K, 3), np.float32),
        "var": np.full((h, w, MOG_K), MOG_NOISE_SIGMA * MOG_NOISE_SIGMA,
                       np.float32),
        "nmodes": np.zeros((h, w), np.int32),
    }


def mog_step(ycc: np.ndarray, state, learning_rate: float) -> np.ndarray:
    """One frame of Stauffer-Grimson MOG (vectorized over pixels; this IS
    the spec for ops/segmentation.mog_step — see module docstring for why
    there is no opencv_contrib oracle).

    Per pixel: modes are kept sorted by weight; the first mode (scan
    order) whose squared distance to the pixel is below
    varThreshold * var matches.  Matched: w += a(1-w), others w *= (1-a),
    rho = a / max(w, a), mean/var move by rho; unmatched modes keep
    mean/var.  No match: the weakest mode (last) is replaced with
    mean=pixel, var=noiseSigma^2, weight=initialWeight (or the mode count
    grows).  Weights renormalize, modes re-sort by weight (stable).
    Background = matched mode index within the smallest prefix whose
    cumulative weight > backgroundRatio."""
    a = np.float32(learning_rate)
    data = ycc.astype(np.float32)                       # [H, W, 3]
    w8, m8, v8, nm = (state["weight"], state["mean"], state["var"],
                      state["nmodes"])
    valid = np.arange(MOG_K)[None, None] < nm[..., None]     # [H,W,K]
    d = m8 - data[:, :, None, :]
    dist2 = np.sum(d * d, axis=-1, dtype=np.float32)          # [H,W,K]
    fit = valid & (dist2 < MOG_VAR_THRESHOLD * v8)
    has_fit = fit.any(axis=-1)
    k_m = np.argmax(fit, axis=-1)                             # first fit
    one_hot = (np.arange(MOG_K)[None, None] == k_m[..., None]) & \
        has_fit[..., None]

    w1 = np.where(valid, w8 * (1 - a), w8)
    w1 = np.where(one_hot, w1 + a, w1)
    rho = a / np.maximum(w1, a)
    m1 = np.where(one_hot[..., None],
                  m8 + rho[..., None] * (data[:, :, None, :] - m8), m8)
    v1 = np.where(one_hot, v8 + rho * (dist2 - v8), v8)

    # no match: replace weakest (index nmodes-1 if full else append)
    grow = (~has_fit) & (nm < MOG_K)
    nm1 = nm + grow.astype(np.int32)
    repl_idx = np.where(grow, nm, np.maximum(nm - 1, 0))
    repl_hot = (np.arange(MOG_K)[None, None] == repl_idx[..., None]) & \
        (~has_fit[..., None])
    w1 = np.where(repl_hot, MOG_INITIAL_WEIGHT, w1)
    m1 = np.where(repl_hot[..., None], data[:, :, None, :], m1)
    v1 = np.where(repl_hot, MOG_NOISE_SIGMA * MOG_NOISE_SIGMA, v1)

    valid1 = np.arange(MOG_K)[None, None] < nm1[..., None]
    tot = np.sum(np.where(valid1, w1, 0), axis=-1, keepdims=True)
    w1 = np.where(valid1, w1 / np.maximum(tot, 1e-12), 0)

    # stable sort by descending weight (argsort on -w; ties keep order)
    order = np.argsort(-w1, axis=-1, kind="stable")
    w2 = np.take_along_axis(w1, order, axis=-1)
    v2 = np.take_along_axis(v1, order, axis=-1)
    m2 = np.take_along_axis(m1, order[..., None], axis=-2)
    # where did the matched/new mode land?
    src = np.where(has_fit, k_m, repl_idx)
    pos = np.argmax(order == src[..., None], axis=-1)

    cum = np.cumsum(w2, axis=-1)
    # background modes: indices whose cumulative weight up to AND
    # including them first crosses backgroundRatio
    n_bg = np.sum(np.concatenate(
        [np.zeros_like(cum[..., :1]), cum[..., :-1]], axis=-1)
        < MOG_BACKGROUND_RATIO, axis=-1)
    is_bg = has_fit & (pos < n_bg)
    mask = np.where(is_bg, 0, 255).astype(np.uint8)

    state["weight"], state["mean"], state["var"], state["nmodes"] = \
        w2, m2, v2, nm1
    return mask
