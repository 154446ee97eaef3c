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

from sivo_tpu.ops.stereo import hamming_matrix

TH_HIGH = 100.0
TH_LOW = 50.0
HISTO_LENGTH = 30


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


def _resolve(dist: jnp.ndarray, best_j: jnp.ndarray,
             matched: jnp.ndarray) -> MatchResult:
    """Resolve dst-side conflicts: when several src rows picked the same
    dst, keep the smallest distance (the reference's overwrite-on-better
    behavior)."""
    ns, nd = dist.shape
    best_d = jnp.take_along_axis(dist, best_j[:, None], axis=1)[:, 0]
    # column-sparse matrix of accepted candidates
    col = jnp.where(matched, best_j, nd)  # out-of-range for unmatched
    d_sp = jnp.full((ns, nd + 1), jnp.inf)
    d_sp = d_sp.at[jnp.arange(ns), col].set(
        jnp.where(matched, best_d, jnp.inf)
    )
    d_sp = d_sp[:, :nd]
    src_for_dst = jnp.argmin(d_sp, axis=0)
    dst_has = jnp.isfinite(jnp.min(d_sp, axis=0))
    src_for_dst = jnp.where(dst_has, src_for_dst, -1)
    # src keeps the match only if it won the column
    won = (
        matched
        & (jnp.take(src_for_dst, jnp.clip(best_j, 0, nd - 1))
           == jnp.arange(ns))
    )
    dst_for_src = jnp.where(won, best_j, -1)
    return MatchResult(
        dst_for_src=dst_for_src.astype(jnp.int32),
        src_for_dst=jnp.where(
            dst_has, src_for_dst, -1
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
    u = proj_uvr[:, 0][:, None]
    v = proj_uvr[:, 1][:, None]
    ur = proj_uvr[:, 2][:, None]
    radius = (th * scales[prev_level])[:, None]

    in_window = (
        (jnp.abs(cur_xy[:, 0][None, :] - u) <= radius)
        & (jnp.abs(cur_xy[:, 1][None, :] - v) <= radius)
    )
    lvl_c = cur_level[None, :]
    lvl_p = prev_level[:, None]
    # ref: ORBmatcher.cc:1321-1341 forward/backward octave gating
    oct_fwd = lvl_c >= lvl_p
    oct_bwd = lvl_c <= lvl_p
    oct_near = jnp.abs(lvl_c - lvl_p) <= 1
    oct_ok = jnp.where(
        forward, oct_fwd, jnp.where(backward, oct_bwd, oct_near)
    )
    # stereo right-u agreement (ref: ORBmatcher.cc:1344-1350)
    has_ur = (cur_ur > 0)[None, :]
    ur_ok = ~has_ur | (jnp.abs(ur - cur_ur[None, :]) <= radius)

    ok = (
        in_window
        & oct_ok
        & ur_ok
        & prev_has_point[:, None]
        & cur_valid[None, :]
        & (proj_z > 0)[:, None]
    )
    dist = jnp.where(ok, hamming_matrix(prev_desc, cur_desc), jnp.inf)
    best_j = jnp.argmin(dist, axis=1)
    best_d = jnp.take_along_axis(dist, best_j[:, None], axis=1)[:, 0]
    matched = best_d <= TH_HIGH
    if check_rotation:
        matched = rotation_consistency_mask(
            prev_angle, cur_angle[best_j], matched
        )
    return _resolve(dist, best_j, matched)


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
    radius = (r * scales[pt_level])[:, None]
    u = pt_uvr[:, 0][:, None]
    v = pt_uvr[:, 1][:, None]
    ur = pt_uvr[:, 2][:, None]

    in_window = (
        (jnp.abs(cur_xy[:, 0][None, :] - u) <= radius)
        & (jnp.abs(cur_xy[:, 1][None, :] - v) <= radius)
    )
    lvl_c = cur_level[None, :]
    lvl_p = pt_level[:, None]
    oct_ok = (lvl_c >= lvl_p - 1) & (lvl_c <= lvl_p)
    has_ur = (cur_ur > 0)[None, :]
    er_ok = ~has_ur | (
        jnp.abs(ur - cur_ur[None, :])
        <= (r * scales[pt_level])[:, None]
    )
    ok = (
        in_window & oct_ok & er_ok
        & pt_visible[:, None] & cur_valid[None, :]
    )
    dist = jnp.where(ok, hamming_matrix(pt_desc, cur_desc), jnp.inf)

    # best + second-best (per level tracking, ref: ORBmatcher.cc:107-136)
    neg_d, idx2 = jax.lax.top_k(-dist, 2)
    best_j, second_j = idx2[:, 0], idx2[:, 1]
    best_d, second_d = -neg_d[:, 0], -neg_d[:, 1]
    best_lvl = cur_level[best_j]
    second_lvl = cur_level[second_j]
    ratio_ok = (best_lvl != second_lvl) | (
        best_d <= nn_ratio * second_d
    )
    matched = (best_d <= accept_th) & ratio_ok
    return _resolve(dist, best_j, matched)


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
        radius = (th * scales[level_a])[:, None]
        in_win = (
            (jnp.abs(xy_b[:, 0][None, :] - uv[:, 0:1]) <= radius)
            & (jnp.abs(xy_b[:, 1][None, :] - uv[:, 1:2]) <= radius)
        )
        lvl_ok = (
            jnp.abs(level_b[None, :] - level_a[:, None]) <= 1
        )
        ok = (
            in_win & lvl_ok & has_a[:, None] & ok_z[:, None]
            & has_b_kp[None, :]
        )
        d = jnp.where(ok, hamming_matrix(desc_a, desc_b), jnp.inf)
        best = jnp.argmin(d, axis=1)
        best_d = jnp.take_along_axis(d, best[:, None], axis=1)[:, 0]
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
    ok = src_valid[:, None] & dst_valid[None, :]
    dist = jnp.where(ok, hamming_matrix(src_desc, dst_desc), jnp.inf)
    neg_d, idx2 = jax.lax.top_k(-dist, 2)
    best_j = idx2[:, 0]
    best_d, second_d = -neg_d[:, 0], -neg_d[:, 1]
    matched = (best_d <= TH_LOW) & (best_d <= nn_ratio * second_d)
    if check_rotation:
        matched = rotation_consistency_mask(
            src_angle, dst_angle[best_j], matched
        )
    return _resolve(dist, best_j, matched)
