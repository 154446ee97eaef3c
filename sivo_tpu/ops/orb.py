"""ORB keypoint selection, orientation and rBRIEF description.

TPU-native replacement for the reference's extractor internals
(ref: src/orbslam/ORBextractor.cc): the quad-tree spatial distribution
(:544-750) becomes per-cell top-k + per-level budgeted top-k (a
deterministic, one-program equivalent of "keep the best corner per
spatial region"); IC_Angle (:75-100) and computeOrbDescriptor
(:104-150) become batched patch gathers over the stacked pyramid.

The 256-pair rBRIEF sampling pattern is the reference's
``bit_pattern_31_`` table (ref: ORBextractor.cc:153-410) — a behavioral
constant the descriptors must match bit-for-bit; stored as
ops/data/brief_pattern.npy.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sivo_tpu.ops.image import BORDER, PyramidSpec

HALF_PATCH = 15  # ref: ORBextractor.cc:71 HALF_PATCH_SIZE
BRIEF_MARGIN = 18  # max |round(rotated +-13)| over the pattern
BRIEF_PATCH = 2 * BRIEF_MARGIN + 1  # 37

_PATTERN = np.load(
    __file__.rsplit("/", 1)[0] + "/data/brief_pattern.npy"
).astype(np.int32)  # (256, 4): x1 y1 x2 y2


class Keypoints(NamedTuple):
    """Padded SoA keypoint set (fixed capacity N).

    Replaces the reference's vector<cv::KeyPoint> + parallel arrays
    (ref: Frame.h mvKeys/mDescriptors/...).
    """

    xy: jnp.ndarray  # (N, 2) level-0 coords (x=col, y=row), float32
    level: jnp.ndarray  # (N,) int32 pyramid octave
    score: jnp.ndarray  # (N,) float32 FAST corner score
    angle: jnp.ndarray  # (N,) float32 radians
    desc_bits: jnp.ndarray  # (N, 256) float32 0/1 (MXU-matmul form)
    desc_u8: jnp.ndarray  # (N, 32) uint8 packed (parity/serialization)
    valid: jnp.ndarray  # (N,) bool

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]


def ic_angle_mask() -> np.ndarray:
    """(31, 31) circular-patch mask matching the reference's per-row
    umax bounds (ref: ORBextractor.cc:431-447 umax setup, :75-100
    IC_Angle): |u| <= round(sqrt(15^2 - v^2)), symmetrized."""
    v = np.arange(-HALF_PATCH, HALF_PATCH + 1)
    umax = np.round(np.sqrt(np.maximum(225 - v * v, 0))).astype(np.int32)
    m = np.abs(v)[None, :] <= umax[:, None]  # m[row, col]
    m = m & m.T  # enforce the reference's symmetry fix
    return m.astype(np.float32)


def select_keypoints(
    score_map: jnp.ndarray,
    spec: PyramidSpec,
    budgets: tuple[int, ...],
    max_keypoints: int,
    per_cell: int = 4,
    cell: int = 16,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Spatially-uniform per-level keypoint selection.

    The reference's DistributeOctTree subdivides until it has enough
    nodes, then keeps the best corner per node — *coverage first*, score
    second (ref: ORBextractor.cc:544-750). The TPU equivalent: top
    ``per_cell`` corners per fixed cell, then fill each level's budget
    in rounds — every cell's best corner before any cell's second-best —
    which matches the octree's spatial-uniformity (and its
    frame-to-frame *repeatability as a set*, which plain global top-k
    by score lacks).

    Args:
      score_map: (L, Hc, Wc) from fast.detect (-inf = no corner).

    Returns (xy_level (M, 2) float level coords, level (M,), score (M,),
    valid (M,)) with M = max_keypoints, sorted by (level, rank, -score).
    """
    L, hc, wc = score_map.shape
    pad_h = (-hc) % cell
    pad_w = (-wc) % cell
    sp = jnp.pad(
        score_map, ((0, 0), (0, pad_h), (0, pad_w)),
        constant_values=-jnp.inf,
    )
    hcp, wcp = hc + pad_h, wc + pad_w
    ncy, ncx = hcp // cell, wcp // cell
    cells = sp.reshape(L, ncy, cell, ncx, cell)
    cells = jnp.moveaxis(cells, 2, 3).reshape(L, ncy * ncx, cell * cell)
    cv, ci = jax.lax.top_k(cells, per_cell)  # (L, C, per_cell)
    # the big score map may arrive bf16 (fast.detect); the small
    # selected set upcasts for the priority arithmetic below
    cv = cv.astype(jnp.float32)
    # decode candidate canvas coords
    cell_idx = jnp.arange(ncy * ncx)
    cy0 = (cell_idx // ncx) * cell
    cx0 = (cell_idx % ncx) * cell
    y = cy0[None, :, None] + ci // cell
    x = cx0[None, :, None] + ci % cell
    # coverage-first priority: in-cell rank dominates, then score
    rank = jnp.broadcast_to(
        jnp.arange(per_cell)[None, None, :], cv.shape
    ).astype(jnp.float32)
    priority = jnp.where(
        jnp.isfinite(cv), -rank * 1e6 + cv, -jnp.inf
    )

    ncand = ncy * ncx * per_cell
    cv = cv.reshape(L, ncand)
    priority = priority.reshape(L, ncand)
    y = y.reshape(L, ncand)
    x = x.reshape(L, ncand)

    # per-level top-K by coverage-first priority
    kmax = min(int(max(budgets)), ncand)
    lp, li = jax.lax.top_k(priority, kmax)  # (L, kmax)
    lv = jnp.take_along_axis(cv, li, axis=1)
    ly = jnp.take_along_axis(y, li, axis=1)
    lx = jnp.take_along_axis(x, li, axis=1)
    rank = jnp.arange(kmax)[None, :]
    budget_arr = jnp.asarray(budgets)[:, None]
    lvalid = (rank < budget_arr) & jnp.isfinite(lv)

    # flatten levels and compact the valid entries to the front,
    # ordered (level asc, score desc) like the reference's per-level
    # concatenation (ref: ORBextractor.cc:1019-1083)
    flat_v = lv.reshape(-1)
    flat_valid = lvalid.reshape(-1)
    flat_level = jnp.repeat(jnp.arange(L), kmax)
    flat_y = ly.reshape(-1)
    flat_x = lx.reshape(-1)
    # sort key: invalid last; then by level; then by descending score
    big = 1e9
    key = jnp.where(
        flat_valid, flat_level.astype(jnp.float32) * big - flat_v, jnp.inf
    )
    order = jnp.argsort(key)[:max_keypoints]
    sel_valid = jnp.take(flat_valid, order)
    sel_level = jnp.take(flat_level, order)
    sel_score = jnp.where(sel_valid, jnp.take(flat_v, order), 0.0)
    # canvas coords -> level coords
    sel_y = (jnp.take(flat_y, order) - BORDER).astype(jnp.float32)
    sel_x = (jnp.take(flat_x, order) - BORDER).astype(jnp.float32)
    xy_level = jnp.stack([sel_x, sel_y], axis=-1)
    return xy_level, sel_level.astype(jnp.int32), sel_score, sel_valid


def _gather_patches(
    canvas: jnp.ndarray,
    level: jnp.ndarray,
    xy_level: jnp.ndarray,
    half: int,
) -> jnp.ndarray:
    """(N,) levels + (N, 2) integer level coords -> (N, 2h+1, 2h+1)
    patches from the stacked pyramid canvas. Implementation note: a
    vmapped dynamic_slice beats a general fancy-index gather on TPU —
    each patch is a contiguous block transfer, where arbitrary-index
    gathers serialize per element."""
    size = 2 * half + 1

    def one(lvl: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
        y0 = xy[1] + BORDER - half
        x0 = xy[0] + BORDER - half
        return jax.lax.dynamic_slice(
            canvas, (lvl, y0, x0), (1, size, size)
        )[0]

    return jax.vmap(one)(level, xy_level.astype(jnp.int32))


def compute_orientations(
    raw_canvas: jnp.ndarray,
    level: jnp.ndarray,
    xy_level: jnp.ndarray,
) -> jnp.ndarray:
    """Intensity-centroid angle per keypoint, radians
    (ref: ORBextractor.cc:75-100 IC_Angle)."""
    patches = _gather_patches(raw_canvas, level, xy_level, HALF_PATCH)
    mask = jnp.asarray(ic_angle_mask())
    coords = jnp.arange(-HALF_PATCH, HALF_PATCH + 1, dtype=jnp.float32)
    wm = patches * mask[None]
    m01 = jnp.sum(wm * coords[None, :, None], axis=(1, 2))  # sum v*I
    m10 = jnp.sum(wm * coords[None, None, :], axis=(1, 2))  # sum u*I
    return jnp.arctan2(m01, m10)


def compute_descriptors(
    blur_canvas: jnp.ndarray,
    level: jnp.ndarray,
    xy_level: jnp.ndarray,
    angle: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotated BRIEF descriptors
    (ref: ORBextractor.cc:104-150 computeOrbDescriptor).

    Sampling follows the reference exactly: offset row =
    round(x*sin + y*cos), col = round(x*cos - y*sin), bit = I(p1) < I(p2).

    Returns (bits (N, 256) float32 0/1, packed (N, 32) uint8).
    """
    patches = _gather_patches(blur_canvas, level, xy_level, BRIEF_MARGIN)
    n = patches.shape[0]
    flat = patches.reshape(n, BRIEF_PATCH * BRIEF_PATCH)

    pat = jnp.asarray(_PATTERN, jnp.float32)  # (256, 4)
    a = jnp.cos(angle)[:, None]  # (N, 1)
    b = jnp.sin(angle)[:, None]

    def rotate(px: jnp.ndarray, py: jnp.ndarray):
        row = jnp.round(px * b + py * a).astype(jnp.int32) + BRIEF_MARGIN
        col = jnp.round(px * a - py * b).astype(jnp.int32) + BRIEF_MARGIN
        return row * BRIEF_PATCH + col  # (N, 256)

    idx1 = rotate(pat[None, :, 0], pat[None, :, 1])
    idx2 = rotate(pat[None, :, 2], pat[None, :, 3])
    v1 = jnp.take_along_axis(flat, idx1, axis=1)
    v2 = jnp.take_along_axis(flat, idx2, axis=1)
    bits = (v1 < v2).astype(jnp.float32)  # (N, 256)

    # pack LSB-first per byte, matching the reference's
    # ``val |= (t0 < t1) << bit`` loop
    b8 = bits.reshape(n, 32, 8).astype(jnp.int32)
    weights = (2 ** jnp.arange(8, dtype=jnp.int32))[None, None, :]
    packed = jnp.sum(b8 * weights, axis=-1).astype(jnp.uint8)
    return bits, packed


def use_pallas_orb(max_keypoints: int) -> bool:
    from sivo_tpu.ops import pallas_orb

    return max_keypoints % pallas_orb.BK == 0 and pallas_orb.use_pallas()


def extract_select(
    raw_canvas: jnp.ndarray,
    valid_region: jnp.ndarray,
    spec: PyramidSpec,
    budgets: tuple[int, ...],
    max_keypoints: int = 2048,
    ini_th: float = 20.0,
    min_th: float = 7.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Detection half of extract(): FAST + spatially-uniform selection.
    Returns (xy_level, level, score, valid)."""
    from sivo_tpu.ops import fast as fast_ops

    score_map = fast_ops.detect(
        raw_canvas, valid_region, ini_threshold=ini_th, min_threshold=min_th
    )
    return select_keypoints(score_map, spec, budgets, max_keypoints)


def extract_describe(
    raw_canvas: jnp.ndarray,
    blur_canvas: jnp.ndarray,
    spec: PyramidSpec,
    xy_level: jnp.ndarray,
    level: jnp.ndarray,
    score: jnp.ndarray,
    valid: jnp.ndarray,
    prep: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
) -> Keypoints:
    """Description half of extract(): IC-angle + rBRIEF + Keypoints
    assembly. ``prep`` = pallas_orb.prepare() outputs computed in an
    EARLIER program — required for the Mosaic path on the hot path
    (embedded-call penalty, see ops/pallas_orb.prepare); when None the
    path is chosen here (XLA gathers, or an inline prepare for
    standalone/test use)."""
    from sivo_tpu.ops import pallas_orb

    if prep is not None:
        angle, bits, packed = pallas_orb.describe_prepared(*prep)
    elif use_pallas_orb(xy_level.shape[0]):
        angle, bits, packed = pallas_orb.orient_and_describe(
            raw_canvas, blur_canvas, level, xy_level
        )
    else:
        angle = compute_orientations(raw_canvas, level, xy_level)
        bits, packed = compute_descriptors(
            blur_canvas, level, xy_level, angle
        )
    scales = jnp.asarray(spec.scales, jnp.float32)
    xy0 = xy_level * scales[level][:, None]
    zero = jnp.zeros_like(score)
    return Keypoints(
        xy=jnp.where(valid[:, None], xy0, -1.0),
        level=jnp.where(valid, level, 0),
        score=jnp.where(valid, score, zero),
        angle=jnp.where(valid, angle, zero),
        desc_bits=bits * valid[:, None].astype(jnp.float32),
        desc_u8=packed * valid[:, None].astype(jnp.uint8),
        valid=valid,
    )


def extract(
    raw_canvas: jnp.ndarray,
    blur_canvas: jnp.ndarray,
    valid_region: jnp.ndarray,
    spec: PyramidSpec,
    budgets: tuple[int, ...],
    max_keypoints: int = 2048,
    ini_th: float = 20.0,
    min_th: float = 7.0,
) -> Keypoints:
    """Full ORB extraction over the stacked pyramid as one traced
    computation, replacing ORBextractor::operator()
    (ref: ORBextractor.cc:1019-1083). Keypoint xy is reported in
    level-0 pixel coordinates (level coords * scale,
    ref: ORBextractor.cc:1071-1078).

    The frame hot path uses extract_select()/extract_describe() across
    TWO dispatched programs instead (the Mosaic descriptor kernel pays
    ~27 ms when its canvas operands are intermediates of the same
    program — ops/pallas_orb.prepare)."""
    xy_level, level, score, valid = extract_select(
        raw_canvas, valid_region, spec, budgets, max_keypoints,
        ini_th, min_th,
    )
    return extract_describe(
        raw_canvas, blur_canvas, spec, xy_level, level, score, valid
    )
