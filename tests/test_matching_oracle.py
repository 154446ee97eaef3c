"""Matcher refactor regression: the fused-top2 + segment-min-resolve
implementation must reproduce the original materialized-matrix
semantics (numpy oracle written from ORBmatcher.cc's behavior)."""

import jax.numpy as jnp
import numpy as np

from sivo_tpu.ops import matching
from sivo_tpu.ops.stereo import hamming_matrix


def _problem(seed, n=320, m=256):
    rng = np.random.default_rng(seed)
    pt_desc = (rng.uniform(size=(n, 256)) < 0.5).astype(np.float32)
    cur_desc = (rng.uniform(size=(m, 256)) < 0.5).astype(np.float32)
    # make some rows near-duplicates of columns so real matches exist
    for i in range(0, n, 3):
        j = rng.integers(0, m)
        d = cur_desc[j].copy()
        flips = rng.choice(256, size=rng.integers(0, 30), replace=False)
        d[flips] = 1.0 - d[flips]
        pt_desc[i] = d
    return rng, pt_desc, cur_desc


def test_projection_points_matches_oracle():
    rng, pt_desc, cur_desc = _problem(0)
    n, m = pt_desc.shape[0], cur_desc.shape[0]
    pt_visible = rng.uniform(size=n) < 0.9
    pt_uvr = np.stack(
        [rng.uniform(0, 1024, n), rng.uniform(0, 352, n),
         rng.uniform(0, 1024, n)], axis=1
    ).astype(np.float32)
    pt_level = rng.integers(0, 8, n).astype(np.int32)
    pt_view_cos = rng.uniform(0.9, 1.0, n).astype(np.float32)
    cur_xy = np.stack(
        [rng.uniform(0, 1024, m), rng.uniform(0, 352, m)], axis=1
    ).astype(np.float32)
    cur_level = rng.integers(0, 8, m).astype(np.int32)
    cur_ur = np.where(
        rng.uniform(size=m) < 0.5, rng.uniform(0, 1024, m), -1.0
    ).astype(np.float32)
    cur_valid = rng.uniform(size=m) < 0.9
    scales = (1.2 ** np.arange(8)).astype(np.float32)
    th, nn_ratio = 3.0, 0.8

    # make the planted descriptor duplicates geometrically consistent
    # so a healthy number survives the window/level gates
    for i in range(0, n, 3):
        ham0 = (pt_desc[i] != cur_desc).sum(axis=1)
        j = int(np.argmin(ham0))
        pt_uvr[i, 0] = cur_xy[j, 0] + rng.uniform(-3, 3)
        pt_uvr[i, 1] = cur_xy[j, 1] + rng.uniform(-3, 3)
        pt_uvr[i, 2] = -1.0 if cur_ur[j] <= 0 else cur_ur[j]
        pt_level[i] = min(cur_level[j] + 1, 7)
        pt_visible[i] = True

    res = matching.search_by_projection_points(
        jnp.asarray(pt_desc), jnp.asarray(pt_visible),
        jnp.asarray(pt_uvr), jnp.asarray(pt_level),
        jnp.asarray(pt_view_cos), jnp.asarray(cur_xy),
        jnp.asarray(cur_level), jnp.asarray(cur_desc),
        jnp.asarray(cur_ur), jnp.asarray(cur_valid),
        jnp.asarray(scales), th=th, nn_ratio=nn_ratio,
    )

    # oracle: the pre-refactor materialized-matrix computation
    r = np.where(pt_view_cos > 0.998, 2.5, 4.0) * th
    radius = (r * scales[pt_level])[:, None]
    in_win = (
        (np.abs(cur_xy[:, 0][None, :] - pt_uvr[:, 0][:, None])
         <= radius)
        & (np.abs(cur_xy[:, 1][None, :] - pt_uvr[:, 1][:, None])
           <= radius)
    )
    oct_ok = (
        (cur_level[None, :] >= pt_level[:, None] - 1)
        & (cur_level[None, :] <= pt_level[:, None])
    )
    has_ur = (cur_ur > 0)[None, :]
    er_ok = ~has_ur | (
        np.abs(pt_uvr[:, 2][:, None] - cur_ur[None, :]) <= radius
    )
    ok = in_win & oct_ok & er_ok & pt_visible[:, None] & cur_valid[None, :]
    ham = np.asarray(
        hamming_matrix(jnp.asarray(pt_desc), jnp.asarray(cur_desc))
    )
    dist = np.where(ok, ham, np.inf)
    bj = np.argmin(dist, axis=1)
    bd = dist[np.arange(n), bj]
    d2 = dist.copy()
    d2[np.arange(n), bj] = np.inf
    sj = np.argmin(d2, axis=1)
    sd = d2[np.arange(n), sj]
    ratio_ok = (cur_level[bj] != cur_level[sj]) | (bd <= nn_ratio * sd)
    matched = (bd <= matching.TH_HIGH) & ratio_ok
    # conflict resolution: smallest distance wins each dst column,
    # ties to the lowest src index
    dst_for_src = np.full(n, -1, np.int64)
    src_for_dst = np.full(m, -1, np.int64)
    best_per_dst = np.full(m, np.inf)
    for i in range(n):
        if matched[i]:
            j = bj[i]
            if bd[i] < best_per_dst[j]:
                best_per_dst[j] = bd[i]
                src_for_dst[j] = i
    for j in range(m):
        if src_for_dst[j] >= 0:
            dst_for_src[src_for_dst[j]] = j

    np.testing.assert_array_equal(
        np.asarray(res.dst_for_src), dst_for_src
    )
    np.testing.assert_array_equal(
        np.asarray(res.src_for_dst), src_for_dst
    )
    assert int(res.n_matches) == int((dst_for_src >= 0).sum())
    assert int(res.n_matches) > 10  # the planted duplicates match


def test_brute_force_matches_oracle():
    rng, src_desc, dst_desc = _problem(1, n=256, m=256)
    n = m = 256
    src_valid = rng.uniform(size=n) < 0.95
    dst_valid = rng.uniform(size=m) < 0.95
    res = matching.search_brute_force(
        jnp.asarray(src_desc), jnp.asarray(src_valid),
        jnp.zeros(n), jnp.asarray(dst_desc),
        jnp.asarray(dst_valid), jnp.zeros(m),
        nn_ratio=0.7, check_rotation=False,
    )
    ham = np.asarray(
        hamming_matrix(jnp.asarray(src_desc), jnp.asarray(dst_desc))
    )
    dist = np.where(
        src_valid[:, None] & dst_valid[None, :], ham, np.inf
    )
    bj = np.argmin(dist, axis=1)
    bd = dist[np.arange(n), bj]
    d2 = dist.copy()
    d2[np.arange(n), bj] = np.inf
    sd = d2[np.arange(n), np.argmin(d2, axis=1)]
    matched = (bd <= matching.TH_LOW) & (bd <= 0.7 * sd)
    won = np.zeros(n, bool)
    best_per_dst = np.full(m, np.inf)
    winner = np.full(m, -1, np.int64)
    for i in range(n):
        if matched[i] and bd[i] < best_per_dst[bj[i]]:
            best_per_dst[bj[i]] = bd[i]
            winner[bj[i]] = i
    for j in range(m):
        if winner[j] >= 0:
            won[winner[j]] = True
    np.testing.assert_array_equal(
        np.asarray(res.dst_for_src) >= 0, won
    )
    assert int(res.n_matches) == int(won.sum()) > 5
