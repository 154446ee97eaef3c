"""FAST-9/16 corner detection, fully vectorized over the stacked pyramid.

TPU-native replacement for the per-cell OpenCV ``FAST`` calls of the
reference (ref: src/orbslam/ORBextractor.cc:752-819). Instead of looping
30x30 cells on the CPU with a threshold fallback 20->7, we compute a
dense *corner score map* once per level batch — score(p) = the largest
threshold at which p is still a FAST-9 corner, identical to OpenCV's
``cornerScore`` semantics — so any threshold test becomes a compare, and
the dual-threshold cell fallback becomes a mask select.

Everything is elementwise over the (L, H, W) canvas: ideal VPU work.
Internally the score runs in bfloat16 — pixel differences are integers
|d| <= 255, exact in bf16's 8-bit mantissa, and the canvas-sized
intermediates are the frontend's dominant HBM traffic on this part —
as a flat list of (L, H, W) arrays (not a stacked (16, L, H, W) tensor,
whose axis-0 rolls defeat XLA elementwise fusion).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3, 16 points, clockwise from 12 o'clock
# (the standard FAST-16 ring; order only needs to be circular).
CIRCLE_OFFSETS = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
ARC_LEN = 9  # FAST-9: need 9 contiguous pixels


def _shift(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """img shifted so out[p] = img[p + (dy, dx)] (wrap-around only
    touches the canvas border, which detection masks exclude)."""
    return jnp.roll(img, (-dy, -dx), axis=(-2, -1))


def _corner_score_bf16(img: jnp.ndarray) -> jnp.ndarray:
    """Dense FAST-9 corner score in bfloat16.

    score(p) = max over contiguous 9-arcs of
                 max( min(ring - p) over bright arcs,
                      min(p - ring) over dark arcs )
    i.e. the largest t for which p is a FAST-9 corner (OpenCV
    cornerScore semantics, which the reference relies on via
    cv::FAST(..., nonmaxSuppression=true)). Non-corners get <= 0.
    """
    x = img.astype(jnp.bfloat16)
    # bright-arc diffs around the ring; dark arcs are the negation, so
    # one diff list feeds both the min-window (bright) and max-window
    # (dark: min(p - r) over a window = -max(r - p) over it) trees
    d = [_shift(x, dy, dx) - x for dy, dx in CIRCLE_OFFSETS]
    n = len(d)

    def windows9(vals, op):
        """op-reduction over each circular window of 9 consecutive ring
        values, by doubling (2, 4, 8, 9)."""
        w2 = [op(vals[k], vals[(k + 1) % n]) for k in range(n)]
        w4 = [op(w2[k], w2[(k + 2) % n]) for k in range(n)]
        w8 = [op(w4[k], w4[(k + 4) % n]) for k in range(n)]
        return [op(w8[k], vals[(k + 8) % n]) for k in range(n)]

    mn9 = windows9(d, jnp.minimum)  # min(ring - p) per bright window
    mx9 = windows9(d, jnp.maximum)  # max(ring - p) per dark window
    sb = functools.reduce(jnp.maximum, mn9)
    sd = -functools.reduce(jnp.minimum, mx9)
    return jnp.maximum(sb, sd)


def corner_score(img: jnp.ndarray) -> jnp.ndarray:
    """Dense FAST-9 corner score. img: (..., H, W) float. Returns the
    same shape, float32 (see ``_corner_score_bf16`` for semantics)."""
    return _corner_score_bf16(img).astype(jnp.float32)


# 3x3 neighbours split by raster order (earlier rows/cols first): the
# deterministic plateau tie-break below keeps the raster-FIRST pixel of
# each flat plateau, mirroring the reference's sequential cv::FAST.
_NEIGH_EARLIER = ((-1, -1), (-1, 0), (-1, 1), (0, -1))
_NEIGH_LATER = ((0, 1), (1, -1), (1, 0), (1, 1))


def nonmax_suppress_3x3(score: jnp.ndarray) -> jnp.ndarray:
    """True where score is the maximum of its 3x3 neighborhood
    (ref: OpenCV FAST nonmaxSuppression). Plateau ties resolve to the
    raster-first pixel (strict > against earlier neighbours, >= against
    later ones) — the sequential reference naturally picks one; a plain
    vectorized >= would keep whole plateaus of near-duplicate corners."""
    ne = functools.reduce(
        jnp.maximum, [_shift(score, dy, dx) for dy, dx in _NEIGH_EARLIER]
    )
    nl = functools.reduce(
        jnp.maximum, [_shift(score, dy, dx) for dy, dx in _NEIGH_LATER]
    )
    return (score > ne) & (score >= nl)


def detect(
    img: jnp.ndarray,
    valid: jnp.ndarray,
    ini_threshold: float = 20.0,
    min_threshold: float = 7.0,
    cell: int = 32,
) -> jnp.ndarray:
    """Masked FAST detection with the reference's per-cell dual-threshold
    fallback (ref: ORBextractor.cc:793-807: retry a cell at minThFAST
    when iniThFAST found nothing).

    Args:
      img: (..., H, W) stacked pyramid canvas.
      valid: (..., H, W) bool detection region mask.
      cell: fallback granularity in canvas pixels (reference uses 30px
        level cells; 32 aligns with TPU lanes — the oracle for this
        stage is distributional, see SURVEY §7 "FAST + octree
        determinism").

    Returns:
      (..., H, W) bfloat16 score map: -inf where not a corner / not
      valid, else the corner score (an integer-valued diff, exact in
      bf16). NMS already applied.
    """
    score = _corner_score_bf16(img)
    is_nms = nonmax_suppress_3x3(score)
    neg = jnp.bfloat16(-jnp.inf)
    base = jnp.where(valid & is_nms, score, neg)

    hi = jnp.where(base > ini_threshold, base, neg)
    lo = jnp.where(base > min_threshold, base, neg)

    # Per-cell fallback: use hi-threshold corners where the cell has
    # any, else the low-threshold ones.
    *batch, h, w = base.shape
    pad_h = (-h) % cell
    pad_w = (-w) % cell

    def cells(x: jnp.ndarray) -> jnp.ndarray:
        xp = jnp.pad(
            x,
            [(0, 0)] * len(batch) + [(0, pad_h), (0, pad_w)],
            constant_values=-jnp.inf,
        )
        return xp.reshape(
            *batch, (h + pad_h) // cell, cell, (w + pad_w) // cell, cell
        )

    hi_cells = cells(hi)
    cell_has_hi = jnp.max(hi_cells, axis=(-3, -1), keepdims=True) > neg
    merged = jnp.where(cell_has_hi, hi_cells, cells(lo))
    # (nCy, cell, nCx, cell) reshapes straight back to (H, W): element
    # [iy, cy, ix, cx] lands at (iy*cell+cy, ix*cell+cx).
    merged = merged.reshape(*batch, h + pad_h, w + pad_w)
    return merged[..., :h, :w]
