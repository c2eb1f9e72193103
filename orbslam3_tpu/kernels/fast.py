"""Dense FAST-9/16 corner detection + spatially-uniform top-K selection.

TPU-native replacement for the reference's per-cell cv::FAST calls and
quadtree redistribution (`/root/reference/src/ORBextractor.cc`:
`ComputeKeyPointsOctTree` ~line 57-89 region, `DistributeOctTree` at 89).

Re-design rationale (not a translation):
  * The reference iterates 35-px cells on the CPU and calls FAST per cell with
    a high threshold (iniThFAST=20) falling back to a low one (minThFAST=7).
    Here the detector is *dense*: all 16 Bresenham-circle comparisons are
    computed for every pixel at once as rolled image differences (pure VPU
    work), and the "9 contiguous" arc test is a 16-bit bit-trick — no
    per-pixel control flow, no dynamic shapes.
  * The quadtree becomes per-cell top-K + rank-major global selection: take
    the best K corners of every cell, then fill the level quota in rank order
    (every cell's best first, then every cell's 2nd best, ...). This
    reproduces the quadtree's spatial uniformity with fully static shapes.
  * The dual threshold becomes a score bonus: corners that pass the high
    threshold outrank low-threshold ones everywhere, so weak corners are only
    selected where no strong corner exists — same effect as the reference's
    fallback re-detection, in one pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3, circular order (dy, dx) — standard FAST-16.
CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
ARC_LEN = 9  # FAST-9
BORDER = 3

INI_TH = 20.0  # reference iniThFAST (EuRoC.yaml ORBextractor.iniThFAST)
MIN_TH = 7.0   # reference minThFAST
STRONG_BONUS = 1e6  # rank strong-threshold corners above all weak ones


def _circle_neighbors(img: jax.Array) -> jax.Array:
    """(16, H, W) stack of the circle-neighbor values for every pixel."""
    return jnp.stack([jnp.roll(img, (-dy, -dx), axis=(0, 1)) for dy, dx in CIRCLE])


def _contiguous_arc(mask16: jax.Array) -> jax.Array:
    """True where >= ARC_LEN contiguous bits are set in the circular 16-bit
    mask. mask16: (16, H, W) bool -> (H, W) bool.

    Bit trick: pack to uint32, duplicate low 16 bits, AND of ARC_LEN shifted
    copies leaves a set bit iff a contiguous run exists.
    """
    weights = (1 << jnp.arange(16, dtype=jnp.uint32))[:, None, None]
    packed = jnp.sum(jnp.where(mask16, weights, jnp.uint32(0)), axis=0,
                     dtype=jnp.uint32)
    m2 = packed | (packed << 16)
    r = m2
    for k in range(1, ARC_LEN):
        r = r & (m2 >> k)
    return (r & jnp.uint32(0xFFFF)) != 0


def fast_score_map(img: jax.Array, threshold: float) -> jax.Array:
    """(H, W) corner response; 0 where not a corner.

    Score is the thresholded sum-of-absolute-differences over the circle for
    the dominant polarity — the same ranking proxy used by embedded FAST
    implementations; monotone with OpenCV's max-threshold score for ranking
    purposes.
    """
    nb = _circle_neighbors(img)
    diff = nb - img[None]
    bright = diff > threshold
    dark = diff < -threshold
    is_corner = _contiguous_arc(bright) | _contiguous_arc(dark)
    score_b = jnp.sum(jnp.maximum(diff - threshold, 0.0), axis=0)
    score_d = jnp.sum(jnp.maximum(-diff - threshold, 0.0), axis=0)
    score = jnp.maximum(score_b, score_d)
    # kill borders (circle wraps around via roll)
    h, w = img.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = (
        (ys >= BORDER) & (ys < h - BORDER) & (xs >= BORDER) & (xs < w - BORDER)
    )
    return jnp.where(is_corner & interior, score, 0.0)


def nms3(score: jax.Array) -> jax.Array:
    """3x3 non-max suppression (keep strict local maxima)."""
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= mx, score, 0.0)


def detect(img: jax.Array, ini_th: float = INI_TH, min_th: float = MIN_TH) -> jax.Array:
    """Dual-threshold dense FAST + NMS -> response map.

    High-threshold corners get STRONG_BONUS added so per-cell selection
    prefers them (equivalent of the reference's iniThFAST/minThFAST retry).
    """
    score, _ = detect_with_raw(img, ini_th, min_th)
    return score


def detect_with_raw(img: jax.Array, ini_th: float = INI_TH,
                    min_th: float = MIN_TH):
    """detect() plus the pre-NMS/pre-bonus response map, used for sub-pixel
    peak interpolation (the bonus and NMS zeros would corrupt a 3x3
    parabola fit)."""
    weak = fast_score_map(img, min_th)
    strong_mask = fast_score_map(img, ini_th) > 0
    score = weak + jnp.where(strong_mask & (weak > 0), STRONG_BONUS, 0.0)
    return nms3(score), weak


def subpixel_offsets(raw_score: jax.Array, ys: jax.Array, xs: jax.Array):
    """Sub-pixel peak offsets by separable 3x3 quadratic interpolation.

    The reference (like OpenCV ORB) keeps integer keypoint coordinates; at
    octave o that quantization is +-0.5*1.2^o level-0 pixels — a dominant
    noise term for far scene points. A parabola fit through the response at
    the peak and its 4-neighborhood recovers the fractional peak position.
    Returns (dy, dx) in [-0.5, 0.5], zero where the fit is degenerate.
    """
    h, w = raw_score.shape
    flat = raw_score.reshape(-1)

    def grab(dy, dx):
        yy = jnp.clip(ys + dy, 0, h - 1)
        xx = jnp.clip(xs + dx, 0, w - 1)
        return jnp.take(flat, yy * w + xx)

    c = grab(0, 0)
    l, r = grab(0, -1), grab(0, 1)
    u, d = grab(-1, 0), grab(1, 0)

    def fit(lo, hi):
        denom = lo - 2.0 * c + hi
        off = jnp.where(jnp.abs(denom) > 1e-6,
                        0.5 * (lo - hi) / jnp.where(
                            jnp.abs(denom) > 1e-6, denom, 1.0), 0.0)
        # only trust interior maxima (denom < 0 for a peak)
        off = jnp.where(denom < 0, off, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    return fit(u, d), fit(l, r)


@partial(jax.jit, static_argnames=("num", "cell", "per_cell"))
def select_uniform(score: jax.Array, num: int, cell: int = 32, per_cell: int = 4):
    """Spatially-uniform top-`num` selection from a response map.

    Returns (ys, xs, resp, valid) each (num,). Quadtree-equivalent: candidates
    are each cell's top-`per_cell` corners; global order is rank-major
    (cell-best corners first across the whole image, sorted by response
    within a rank), so coverage stays uniform even when one region has all
    the strongest corners.
    """
    h, w = score.shape
    ph = -(-h // cell) * cell
    pw = -(-w // cell) * cell
    s = jnp.pad(score, ((0, ph - h), (0, pw - w)))
    cy, cx = ph // cell, pw // cell
    cells = s.reshape(cy, cell, cx, cell).transpose(0, 2, 1, 3).reshape(
        cy * cx, cell * cell
    )
    top_val, top_idx = jax.lax.top_k(cells, per_cell)  # (C, per_cell)
    # flat image coords of candidates
    ci = jnp.arange(cy * cx)
    base_y = (ci // cx) * cell
    base_x = (ci % cx) * cell
    yy = base_y[:, None] + top_idx // cell
    xx = base_x[:, None] + top_idx % cell
    # rank-major key: primary = rank (ascending), secondary = -response
    valid = top_val > 0
    # key: lower is better. rank * BIG - response ensures rank dominates.
    BIG = 1e9
    key = jnp.arange(per_cell, dtype=jnp.float32)[None, :] * BIG - top_val
    key = jnp.where(valid, key, jnp.inf)
    flat_key = key.reshape(-1)
    order = jnp.argsort(flat_key)[:num]
    sel_y = yy.reshape(-1)[order]
    sel_x = xx.reshape(-1)[order]
    sel_v = top_val.reshape(-1)[order]
    sel_valid = jnp.isfinite(flat_key[order])
    resp = jnp.where(sel_v > STRONG_BONUS / 2, sel_v - STRONG_BONUS, sel_v)
    return sel_y, sel_x, resp, sel_valid
