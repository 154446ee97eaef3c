"""Descriptor matching: masked Hamming matrices replacing ORBmatcher.

TPU-native replacement for the per-keypoint candidate loops of
ORBmatcher (ref: src/orbslam/ORBmatcher.cc). The reference accelerates
CPU search with a 64x48 feature grid (ref: Frame.cc:205-223,
GetFeaturesInArea) — on TPU the whole candidate gating is a broadcast
mask over an (N_src, N_dst) Hamming matrix computed on the MXU, so no
grid is needed.

Constants (ref: ORBmatcher.cc:37-39): TH_HIGH=100, TH_LOW=50,
HISTO_LENGTH=30; rotation-consistency keeps the top-3 histogram bins.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sivo_tpu.ops import pallas_match as pm
from sivo_tpu.ops.stereo import hamming_matrix

TH_HIGH = 100.0
TH_LOW = 50.0
HISTO_LENGTH = 30

_INF = jnp.inf


def _top2_masked(
    a_bits, b_bits, u, v, ur, radius, lvl_lo, lvl_hi, r_valid,
    x, y, c_ur, c_level, c_valid, use_ur: bool,
):
    """Best/second-best masked Hamming per row.

    Routed through the fused Pallas kernel (ops/pallas_match.py) when
    shapes satisfy its tiling; otherwise the materialized-matrix XLA
    path (identical semantics — parity-tested)."""
    n, m = a_bits.shape[0], b_bits.shape[0]
    if pm.use_pallas() and n % pm.TILE_N == 0 and m % 128 == 0:
        row = pm.pack_row_attr(u, v, ur, radius, lvl_lo, lvl_hi,
                               r_valid)
        col = pm.pack_col_attr_t(x, y, c_ur, c_level, c_valid)
        return pm.masked_hamming_top2(
            a_bits, b_bits, row, col, use_ur=use_ur
        )
    ok = (
        (jnp.abs(x[None, :] - u[:, None]) <= radius[:, None])
        & (jnp.abs(y[None, :] - v[:, None]) <= radius[:, None])
        & (c_level[None, :] >= lvl_lo[:, None])
        & (c_level[None, :] <= lvl_hi[:, None])
        & (r_valid > 0.5)[:, None] & (c_valid > 0.5)[None, :]
    )
    if use_ur:
        ok = ok & (
            (c_ur <= 0.0)[None, :]
            | (jnp.abs(ur[:, None] - c_ur[None, :]) <= radius[:, None])
        )
    dist = jnp.where(ok, hamming_matrix(a_bits, b_bits), _INF)
    best_j = jnp.argmin(dist, axis=1).astype(jnp.int32)
    best_d = jnp.take_along_axis(dist, best_j[:, None], axis=1)[:, 0]
    cols = jnp.arange(m)[None, :]
    d2 = jnp.where(cols == best_j[:, None], _INF, dist)
    second_j = jnp.argmin(d2, axis=1).astype(jnp.int32)
    second_d = jnp.take_along_axis(d2, second_j[:, None], axis=1)[:, 0]
    return best_d, second_d, best_j, second_j


class MatchResult(NamedTuple):
    """src -> dst assignment after conflict resolution."""

    dst_for_src: jnp.ndarray  # (Ns,) int32 index into dst, -1 = none
    src_for_dst: jnp.ndarray  # (Nd,) int32 index into src, -1 = none
    n_matches: jnp.ndarray  # () int32


def rotation_consistency_mask(
    angle_src: jnp.ndarray,
    angle_dst: jnp.ndarray,
    matched: jnp.ndarray,
) -> jnp.ndarray:
    """Keep only matches whose angle difference falls in the 3 most
    popular of 30 bins (ref: ORBmatcher.cc:1545-1580
    ComputeThreeMaxima; bin width 360/30 deg).

    angle_*: radians; matched: (N,) bool over src entries (paired with
    their assigned dst angles).
    """
    rot = jnp.degrees(angle_src - angle_dst)
    rot = jnp.where(rot < 0.0, rot + 360.0, rot)
    bins = jnp.clip(
        jnp.round(rot * (HISTO_LENGTH / 360.0)).astype(jnp.int32),
        0,
        HISTO_LENGTH,
    ) % HISTO_LENGTH
    onehot = jax.nn.one_hot(bins, HISTO_LENGTH, dtype=jnp.float32)
    hist = jnp.sum(onehot * matched[:, None], axis=0)  # (30,)
    top3_val, top3_idx = jax.lax.top_k(hist, 3)
    # ref: drop bins 2/3 if below 0.1 * max
    keep_bin = jnp.zeros(HISTO_LENGTH, bool)
    keep_bin = keep_bin.at[top3_idx[0]].set(True)
    keep_bin = keep_bin.at[top3_idx[1]].set(top3_val[1] >= 0.1 * top3_val[0])
    keep_bin = keep_bin.at[top3_idx[2]].set(top3_val[2] >= 0.1 * top3_val[0])
    return matched & keep_bin[bins]


def _resolve(best_d: jnp.ndarray, best_j: jnp.ndarray,
             matched: jnp.ndarray, nd: int) -> MatchResult:
    """Resolve dst-side conflicts: when several src rows picked the same
    dst, keep the smallest distance (the reference's overwrite-on-better
    behavior; ties to the lowest src index like the original argmin).

    Two O(Ns) segment-min scatters — the earlier form built an
    (Ns, Nd+1) column-sparse matrix in HBM just to argmin it."""
    ns = best_d.shape[0]
    col = jnp.where(matched, best_j, nd)  # out-of-range for unmatched
    dval = jnp.where(matched, best_d, jnp.inf)
    dmin = jnp.full(nd + 1, jnp.inf).at[col].min(dval)
    idx = jnp.arange(ns)
    is_min = matched & (dval == dmin[col])
    imin = jnp.full(nd + 1, ns).at[col].min(
        jnp.where(is_min, idx, ns)
    )
    won = is_min & (imin[col] == idx)
    dst_has = jnp.isfinite(dmin[:nd])
    return MatchResult(
        dst_for_src=jnp.where(won, best_j, -1).astype(jnp.int32),
        src_for_dst=jnp.where(
            dst_has, imin[:nd], -1
        ).astype(jnp.int32),
        n_matches=jnp.sum(won).astype(jnp.int32),
    )


def search_by_projection_frame(
    prev_desc: jnp.ndarray,  # (Np, 256) bits of prev-frame kps w/ points
    prev_has_point: jnp.ndarray,  # (Np,) bool
    prev_level: jnp.ndarray,  # (Np,) int32
    prev_angle: jnp.ndarray,  # (Np,) radians
    proj_uvr: jnp.ndarray,  # (Np, 3) map points projected into current
    proj_z: jnp.ndarray,  # (Np,) camera-frame z
    cur_xy: jnp.ndarray,  # (Nc, 2)
    cur_level: jnp.ndarray,
    cur_angle: jnp.ndarray,
    cur_desc: jnp.ndarray,
    cur_ur: jnp.ndarray,  # (Nc,) right-u or -1
    cur_valid: jnp.ndarray,
    scales: jnp.ndarray,  # (L,) scale factors
    th: float,
    forward: jnp.ndarray,  # () bool: tlc.z > baseline
    backward: jnp.ndarray,  # () bool: -tlc.z > baseline
    check_rotation: bool = True,
) -> MatchResult:
    """Motion-model frame-to-frame search
    (ref: ORBmatcher.cc:1278-1417 SearchByProjection(Frame&, Frame&)).
    """
    lvl_p = prev_level.astype(jnp.float32)
    # ref: ORBmatcher.cc:1321-1341 forward/backward octave gating,
    # expressed as a per-row [lo, hi] level window
    big = jnp.float32(1e9)
    lvl_lo = jnp.where(
        forward, lvl_p, jnp.where(backward, -big, lvl_p - 1.0)
    )
    lvl_hi = jnp.where(
        forward, big, jnp.where(backward, lvl_p, lvl_p + 1.0)
    )
    best_d, _, best_j, _ = _top2_masked(
        prev_desc, cur_desc,
        proj_uvr[:, 0], proj_uvr[:, 1], proj_uvr[:, 2],
        th * scales[prev_level], lvl_lo, lvl_hi,
        prev_has_point & (proj_z > 0),
        cur_xy[:, 0], cur_xy[:, 1], cur_ur,
        cur_level.astype(jnp.float32), cur_valid,
        use_ur=True,  # stereo right-u agreement (ref: :1344-1350)
    )
    matched = best_d <= TH_HIGH
    if check_rotation:
        matched = rotation_consistency_mask(
            prev_angle, cur_angle[best_j], matched
        )
    return _resolve(best_d, best_j, matched, cur_desc.shape[0])


def search_by_projection_points(
    pt_desc: jnp.ndarray,  # (Np, 256) distinctive descriptors
    pt_visible: jnp.ndarray,  # (Np,) frustum-check result
    pt_uvr: jnp.ndarray,  # (Np, 3) predicted projection
    pt_level: jnp.ndarray,  # (Np,) predicted octave
    pt_view_cos: jnp.ndarray,  # (Np,)
    cur_xy: jnp.ndarray,
    cur_level: jnp.ndarray,
    cur_desc: jnp.ndarray,
    cur_ur: jnp.ndarray,
    cur_valid: jnp.ndarray,
    scales: jnp.ndarray,
    th: float = 1.0,
    nn_ratio: float = 0.8,
    accept_th: float = TH_HIGH,
) -> MatchResult:
    """Local-map-points-to-frame search
    (ref: ORBmatcher.cc:44-159 SearchByProjection(Frame&, vector<MapPoint*>&)).

    Radius 2.5 if viewCos > 0.998 else 4.0, times th, times
    scale[predicted level] (ref: ORBmatcher.cc:85-134); candidate levels
    [pred-1, pred]; best-vs-second ratio applies only when both are on
    the same level (ref: ORBmatcher.cc:137-152).
    """
    r = jnp.where(pt_view_cos > 0.998, 2.5, 4.0) * th
    lvl_p = pt_level.astype(jnp.float32)
    # best + second-best (per level tracking, ref: ORBmatcher.cc:107-136)
    best_d, second_d, best_j, second_j = _top2_masked(
        pt_desc, cur_desc,
        pt_uvr[:, 0], pt_uvr[:, 1], pt_uvr[:, 2],
        r * scales[pt_level], lvl_p - 1.0, lvl_p, pt_visible,
        cur_xy[:, 0], cur_xy[:, 1], cur_ur,
        cur_level.astype(jnp.float32), cur_valid,
        use_ur=True,
    )
    best_lvl = cur_level[best_j]
    second_lvl = cur_level[second_j]
    ratio_ok = (best_lvl != second_lvl) | (
        best_d <= nn_ratio * second_d
    )
    matched = (best_d <= accept_th) & ratio_ok
    return _resolve(best_d, best_j, matched, cur_desc.shape[0])


def search_by_sim3(
    g12_s: jnp.ndarray,  # () scale
    g12_R: jnp.ndarray,  # (3, 3)
    g12_t: jnp.ndarray,  # (3,)
    pc1: jnp.ndarray,  # (N1, 3) camera-1-frame positions of kp1 points
    has1: jnp.ndarray,  # (N1,) bool kp1 has a map point
    xy1: jnp.ndarray,
    level1: jnp.ndarray,
    desc1: jnp.ndarray,  # (N1, 256) bits
    pc2: jnp.ndarray,  # (N2, 3)
    has2: jnp.ndarray,
    xy2: jnp.ndarray,
    level2: jnp.ndarray,
    desc2: jnp.ndarray,
    scales: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    th: float = 7.5,  # ref: LoopClosing.cc:329
) -> jnp.ndarray:
    """Guided Sim3 correspondence search
    (ref: ORBmatcher.cc:1055-1276 SearchBySim3): project each side's
    points into the other camera through g12 / g12^-1, window-search
    keypoints at the predicted scale, and keep MUTUAL agreements.

    Returns (N1,) int32: matched kp2 index per kp1, -1 if none.
    """

    def project(p):
        z = jnp.maximum(p[..., 2], 1e-9)
        return jnp.stack(
            [fx * p[..., 0] / z + cx, fy * p[..., 1] / z + cy],
            axis=-1,
        )

    def directed(pa, has_a, level_a, desc_a, xy_b, level_b, desc_b,
                 has_b_kp, s, R, t):
        # transform a-side points into b's camera
        pb = s * (pa @ R.T) + t
        ok_z = pb[..., 2] > 0
        uv = project(pb)
        lvl_a = level_a.astype(jnp.float32)
        na = pa.shape[0]
        best_d, _, best, _ = _top2_masked(
            desc_a, desc_b,
            uv[:, 0], uv[:, 1], jnp.zeros(na, jnp.float32),
            th * scales[level_a], lvl_a - 1.0, lvl_a + 1.0,
            has_a & ok_z,
            xy_b[:, 0], xy_b[:, 1],
            jnp.zeros(desc_b.shape[0], jnp.float32),
            level_b.astype(jnp.float32), has_b_kp,
            use_ur=False,
        )
        return jnp.where(best_d <= TH_HIGH, best, -1)

    sinv = 1.0 / g12_s
    Rinv = g12_R.T
    tinv = -sinv * (Rinv @ g12_t)
    m21 = directed(  # kp2 -> kp1 via g12 (p1 = g12(p2))
        pc2, has2, level2, desc2, xy1, level1, desc1, has1,
        g12_s, g12_R, g12_t,
    )
    m12 = directed(  # kp1 -> kp2 via g12^-1
        pc1, has1, level1, desc1, xy2, level2, desc2, has2,
        sinv, Rinv, tinv,
    )
    # mutual agreement (ref: ORBmatcher.cc:1243-1270)
    n1 = pc1.shape[0]
    idx = jnp.arange(n1)
    j = m12
    mutual = (j >= 0) & (
        jnp.take(m21, jnp.clip(j, 0, m21.shape[0] - 1)) == idx
    )
    return jnp.where(mutual, j, -1).astype(jnp.int32)


def search_brute_force(
    src_desc: jnp.ndarray,
    src_valid: jnp.ndarray,
    src_angle: jnp.ndarray,
    dst_desc: jnp.ndarray,
    dst_valid: jnp.ndarray,
    dst_angle: jnp.ndarray,
    nn_ratio: float = 0.7,
    check_rotation: bool = True,
) -> MatchResult:
    """Global descriptor matching with ratio + rotation checks.

    Stands in for SearchByBoW (ref: ORBmatcher.cc:161-284), which
    restricts candidate pairs to shared vocabulary nodes purely as a CPU
    speedup; on the MXU the full matrix is cheaper than building node
    lists, and the accept tests (best < TH_LOW, best < ratio * second,
    rotation consistency) are identical.
    """
    ns, nd = src_desc.shape[0], dst_desc.shape[0]
    zeros = jnp.zeros(ns, jnp.float32)
    big = jnp.float32(1e9)
    best_d, second_d, best_j, _ = _top2_masked(
        src_desc, dst_desc,
        zeros, zeros, zeros, jnp.full(ns, jnp.inf),
        jnp.full(ns, -big), jnp.full(ns, big), src_valid,
        jnp.zeros(nd, jnp.float32), jnp.zeros(nd, jnp.float32),
        jnp.zeros(nd, jnp.float32), jnp.zeros(nd, jnp.float32),
        dst_valid,
        use_ur=False,
    )
    matched = (best_d <= TH_LOW) & (best_d <= nn_ratio * second_d)
    if check_rotation:
        matched = rotation_consistency_mask(
            src_angle, dst_angle[best_j], matched
        )
    return _resolve(best_d, best_j, matched, nd)
