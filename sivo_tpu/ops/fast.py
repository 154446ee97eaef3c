"""FAST-9/16 corner detection, fully vectorized over the stacked pyramid.

TPU-native replacement for the per-cell OpenCV ``FAST`` calls of the
reference (ref: src/orbslam/ORBextractor.cc:752-819). Instead of looping
30x30 cells on the CPU with a threshold fallback 20->7, we compute a
dense *corner score map* once per level batch — score(p) = the largest
threshold at which p is still a FAST-9 corner, identical to OpenCV's
``cornerScore`` semantics — so any threshold test becomes a compare, and
the dual-threshold cell fallback becomes a mask select.

Everything is elementwise over the (L, H, W) canvas: ideal VPU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3, 16 points, clockwise from 12 o'clock
# (the standard FAST-16 ring; order only needs to be circular).
CIRCLE_OFFSETS = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
ARC_LEN = 9  # FAST-9: need 9 contiguous pixels


def _ring(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) -> (16, ..., H, W) circle-neighbor values via rolls
    (wrap-around only touches the canvas border, which detection masks
    exclude)."""
    return jnp.stack(
        [
            jnp.roll(img, (-dy, -dx), axis=(-2, -1))
            for dy, dx in CIRCLE_OFFSETS
        ]
    )


def _min_window9(d: jnp.ndarray) -> jnp.ndarray:
    """Min over each circular window of 9 consecutive ring values."""
    m2 = jnp.minimum(d, jnp.roll(d, -1, axis=0))  # windows of 2
    m4 = jnp.minimum(m2, jnp.roll(m2, -2, axis=0))  # 4
    m8 = jnp.minimum(m4, jnp.roll(m4, -4, axis=0))  # 8
    return jnp.minimum(m8, jnp.roll(d, -8, axis=0))  # 9


def corner_score(img: jnp.ndarray) -> jnp.ndarray:
    """Dense FAST-9 corner score.

    score(p) = max over contiguous 9-arcs of
                 max( min(ring - p) over bright arcs,
                      min(p - ring) over dark arcs )
    i.e. the largest t for which p is a FAST-9 corner (OpenCV
    cornerScore semantics, which the reference relies on via
    cv::FAST(..., nonmaxSuppression=true)). Non-corners get <= 0.

    img: (..., H, W) float. Returns same shape, float.
    """
    ring = _ring(img)
    d_bright = ring - img[None]  # > t for bright arc
    d_dark = -d_bright  # > t for dark arc
    sb = jnp.max(_min_window9(d_bright), axis=0)
    sd = jnp.max(_min_window9(d_dark), axis=0)
    return jnp.maximum(sb, sd)


def nonmax_suppress_3x3(score: jnp.ndarray) -> jnp.ndarray:
    """True where score is the maximum of its 3x3 neighborhood
    (ref: OpenCV FAST nonmaxSuppression). Ties keep both candidates —
    downstream top-k ordering resolves them."""
    neigh = jnp.full_like(score, -jnp.inf)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh = jnp.maximum(
                neigh, jnp.roll(score, (-dy, -dx), axis=(-2, -1))
            )
    return score >= neigh


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
      (..., H, W) float score map: -inf where not a corner / not valid,
      else the corner score. NMS already applied.
    """
    score = corner_score(img)
    # deterministic plateau tie-break: bias by raster position so flat
    # score regions yield exactly one NMS winner (the reference's
    # sequential cv::FAST naturally picks one; a vectorized >= keeps
    # whole plateaus, which creates near-duplicate descriptors)
    h, w = img.shape[-2], img.shape[-1]
    ramp = (
        jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ) * (0.5 / (h * w))
    score = score - ramp
    is_nms = nonmax_suppress_3x3(score)
    neg = jnp.float32(-jnp.inf)
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
