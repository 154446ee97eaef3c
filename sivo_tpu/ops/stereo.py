"""Stereo descriptor matching with SAD sub-pixel refinement.

TPU-native replacement for Frame::ComputeStereoMatches
(ref: src/orbslam/Frame.cc:444-629). The reference builds per-row
candidate tables and loops keypoints on the CPU; here the whole
left-right association is one masked Hamming *matrix* computed on the
MXU (popcount as a bit matmul: |a XOR b| = |a| + |b| - 2 a.b, exact in
bf16xbf16->f32 for 0/1 vectors), followed by batched SAD windows
gathered from the stacked pyramid.

Behavioral constants (ref: Frame.cc:444-629 and SURVEY appendix A):
row band +-2*scale[octave_R]; octave tolerance +-1; disparity in
[0, fx); descriptor gate (TH_HIGH+TH_LOW)/2 = 75; SAD window w=5 with
slide +-5 and parabola refinement |dR| <= 1; final cull at
1.5*1.4*median SAD.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sivo_tpu.ops.image import BORDER, PyramidSpec
from sivo_tpu.ops.orb import Keypoints

TH_ORB_DIST = 75.0  # (TH_HIGH + TH_LOW) / 2, ref: Frame.cc:448
SAD_W = 5  # ref: Frame.cc:545
SAD_L = 5  # slide range, ref: Frame.cc:552


class StereoMatches(NamedTuple):
    u_right: jnp.ndarray  # (N,) refined right u coord, -1 if unmatched
    depth: jnp.ndarray  # (N,) metric depth, -1 if unmatched
    valid: jnp.ndarray  # (N,) bool


def hamming_matrix(bits_a: jnp.ndarray, bits_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 256) x (M, 256) 0/1 float -> (N, M) Hamming distances via one
    MXU matmul (replaces the reference's per-pair popcount loop,
    ref: ORBmatcher.cc:1582-1597)."""
    a16 = bits_a.astype(jnp.bfloat16)
    b16 = bits_b.astype(jnp.bfloat16)
    dot = jax.lax.dot_general(
        a16,
        b16,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    na = jnp.sum(bits_a, axis=1, keepdims=True)
    nb = jnp.sum(bits_b, axis=1, keepdims=True)
    return na + nb.T - 2.0 * dot


def _sad_windows(
    canvas_l: jnp.ndarray,
    canvas_r: jnp.ndarray,
    level: jnp.ndarray,
    ul_s: jnp.ndarray,
    vl_s: jnp.ndarray,
    ur0_s: jnp.ndarray,
) -> jnp.ndarray:
    """Per-keypoint SAD profile over the +-SAD_L slide
    (ref: Frame.cc:540-570): returns (N, 2*SAD_L+1) distances.

    Fully gathered form: one advanced-indexing gather per image (the
    original vmapped dynamic_slice version was the single hottest op of
    the whole frontend, ~400ms at KITTI geometry)."""
    w = SAD_W
    win = 2 * w + 1
    n_off = 2 * SAD_L + 1
    lvl = lvl_i(level)

    # two contiguous block slices per keypoint (vmapped dynamic_slice;
    # block transfers beat general gathers on TPU)
    def slices(lv, ul, vl, ur0):
        il = jax.lax.dynamic_slice(
            canvas_l, (lv, vl + BORDER - w, ul + BORDER - w),
            (1, win, win),
        )[0]
        strip = jax.lax.dynamic_slice(
            canvas_r,
            (lv, vl + BORDER - w, ur0 + BORDER - w - SAD_L),
            (1, win, win + 2 * SAD_L),
        )[0]
        return il, strip

    il, strip = jax.vmap(slices)(lvl, ul_s, vl_s, ur0_s)
    il = il - il[:, w : w + 1, w : w + 1]  # ref: Frame.cc:549

    # all 11 windows from the strip via STATIC slices (any dynamic
    # gather here serializes on TPU)
    wins = jnp.stack(
        [strip[:, :, o : o + win] for o in range(n_off)], axis=1
    )  # (N, n_off, win, win)
    centers = wins[:, :, w : w + 1, w : w + 1]
    wins = wins - centers
    return jnp.sum(jnp.abs(il[:, None] - wins), axis=(-1, -2))


def lvl_i(level: jnp.ndarray) -> jnp.ndarray:
    return level.astype(jnp.int32)


def match(
    left: Keypoints,
    right: Keypoints,
    blur_canvas_l: jnp.ndarray,
    blur_canvas_r: jnp.ndarray,
    spec: PyramidSpec,
    fx: float,
    bf: float,
) -> StereoMatches:
    """Full stereo association (ref: Frame.cc:444-629)."""
    scales = jnp.asarray(spec.scales, jnp.float32)
    n = left.capacity

    # --- candidate gating + Hamming argmin ------------------------------
    d = hamming_matrix(left.desc_bits, right.desc_bits)  # (N, M)
    yl = left.xy[:, 1][:, None]
    yr = right.xy[:, 1][None, :]
    band = 2.0 * scales[right.level][None, :]  # ref: Frame.cc:466-468
    row_ok = jnp.abs(yr - yl) <= band
    oct_ok = (
        jnp.abs(right.level[None, :] - left.level[:, None]) <= 1
    )  # ref: Frame.cc:517
    ul = left.xy[:, 0][:, None]
    ur = right.xy[:, 0][None, :]
    max_d = fx  # mbf / mb, ref: Frame.cc:459-462
    disp_ok = (ur >= ul - max_d) & (ur <= ul)  # minD = 0
    ok = (
        row_ok
        & oct_ok
        & disp_ok
        & left.valid[:, None]
        & right.valid[None, :]
    )
    d = jnp.where(ok, d, jnp.inf)
    best_j = jnp.argmin(d, axis=1)
    best_dist = jnp.take_along_axis(d, best_j[:, None], axis=1)[:, 0]
    cand = best_dist < TH_ORB_DIST  # ref: Frame.cc:529
    # mutual-best gate (beyond the reference, which accepts one-way
    # best: Frame.cc:509-534): on the full Hamming matrix the reverse
    # argmin is free, and it removes most aliased associations on
    # repetitive structure — a wrong depth here poisons a map point.
    best_i = jnp.argmin(d, axis=0)  # (M,)
    mutual = best_i[best_j] == jnp.arange(n)
    cand = cand & mutual

    # --- SAD sub-pixel refinement at the left keypoint's octave ---------
    inv_scale = 1.0 / scales[left.level]
    ul_s = jnp.round(left.xy[:, 0] * inv_scale).astype(jnp.int32)
    vl_s = jnp.round(left.xy[:, 1] * inv_scale).astype(jnp.int32)
    ur_best = right.xy[best_j, 0]
    ur0_s = jnp.round(ur_best * inv_scale).astype(jnp.int32)

    # clamp gather coordinates so out-of-range candidates stay in-bounds
    # (they are masked out below)
    hs = jnp.asarray(spec.heights)[lvl_i(left.level)]
    ws = jnp.asarray(spec.widths)[lvl_i(left.level)]
    margin = SAD_W + SAD_L
    in_bounds = (
        (ul_s >= 0) & (ul_s < ws) & (vl_s >= 0) & (vl_s < hs)
        & (ur0_s >= margin - BORDER) & (ur0_s < ws)
    )
    ul_c = jnp.clip(ul_s, 0, ws - 1)
    vl_c = jnp.clip(vl_s, 0, hs - 1)
    ur0_c = jnp.clip(ur0_s, 0, ws - 1)

    sad = _sad_windows(
        blur_canvas_l, blur_canvas_r, left.level, ul_c, vl_c, ur0_c
    )  # (N, 11)
    best_inc = jnp.argmin(sad, axis=1)
    best_sad = jnp.take_along_axis(sad, best_inc[:, None], axis=1)[:, 0]
    interior = (best_inc > 0) & (best_inc < 2 * SAD_L)  # ref: Frame.cc:574

    d_m1 = jnp.take_along_axis(
        sad, jnp.maximum(best_inc - 1, 0)[:, None], axis=1
    )[:, 0]
    d_p1 = jnp.take_along_axis(
        sad, jnp.minimum(best_inc + 1, 2 * SAD_L)[:, None], axis=1
    )[:, 0]
    denom = 2.0 * (d_m1 + d_p1 - 2.0 * best_sad)
    delta_r = jnp.where(
        jnp.abs(denom) > 1e-9, (d_m1 - d_p1) / denom, jnp.inf
    )  # ref: Frame.cc:583
    delta_ok = (delta_r >= -1.0) & (delta_r <= 1.0)

    scale_l = scales[left.level]
    best_ur = scale_l * (
        ur0_s.astype(jnp.float32)
        + (best_inc.astype(jnp.float32) - SAD_L)
        + delta_r
    )
    disparity = left.xy[:, 0] - best_ur
    disp_in_range = (disparity >= 0.0) & (disparity < max_d)
    # ref: Frame.cc:607-611 — tiny negative disparities clamp to 0.01
    tiny = disparity <= 0.0
    disparity = jnp.where(tiny, 0.01, disparity)
    best_ur = jnp.where(tiny, left.xy[:, 0] - 0.01, best_ur)

    matched = cand & in_bounds & interior & delta_ok & disp_in_range

    # --- median SAD cull (ref: Frame.cc:617-628) -------------------------
    sad_sorted = jnp.sort(jnp.where(matched, best_sad, jnp.inf))
    cnt = jnp.sum(matched)
    median = sad_sorted[jnp.clip(cnt // 2, 0, n - 1)]
    th_dist = 1.5 * 1.4 * median
    matched = matched & (best_sad <= th_dist)

    depth = jnp.where(matched, bf / disparity, -1.0)
    u_right = jnp.where(matched, best_ur, -1.0)
    return StereoMatches(u_right=u_right, depth=depth, valid=matched)
