"""Host-side construction of padded BAProblem instances from MapState.

The reference builds g2o graphs ad hoc inside each Optimizer entry
point (ref: src/orbslam/Optimizer.cc:39-271 GlobalBundleAdjustment,
:493-926 LocalBundleAdjustment); here one builder produces the padded
fixed-capacity problem either solver consumes. Shapes are padded to the
given caps so repeated solves hit the jit cache.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from sivo_tpu.optim.local_ba import BAProblem


def build_problem(
    m,
    kfs: list[int],
    fixed: np.ndarray,  # (len(kfs),) bool
    k_cap: int,
    pt_cap: int,
    obs_cap: int,
    scale_factor: float,
    o_chunk: int | None = None,
) -> tuple[BAProblem, dict] | None:
    """Assemble a padded BA problem over the given keyframes.

    Returns (problem, ctx) where ctx carries the index mappings needed
    to apply the solution, or None if there is nothing to optimize.
    ``kfs[0]`` is the "newest" slot whose marginal covariance the local
    solver reports. Keyframes beyond ``k_cap`` and observations beyond
    ``obs_cap`` are dropped most-distant-first (callers order ``kfs``
    by importance).
    """
    kfs = list(kfs)[:k_cap]
    fixed = np.asarray(fixed[: len(kfs)], bool)
    pt_ids = m.points_seen_by(np.asarray(kfs, np.int64))
    if len(pt_ids) == 0 or len(kfs) < 2:
        return None
    truncated_pts = max(0, len(pt_ids) - pt_cap)
    if len(pt_ids) > pt_cap:
        pt_ids = pt_ids[-pt_cap:]  # prefer recent points

    obs = m.observations()
    rows = obs[np.isin(obs[:, 0], kfs) & np.isin(obs[:, 1], pt_ids)]
    truncated_obs = max(0, len(rows) - obs_cap)
    if len(rows) > obs_cap:
        rows = rows[-obs_cap:]
    obs_mask = None
    if o_chunk is not None:
        # chunked-Schur layout: rows sorted by point with padding so no
        # point's observation group spans an o_chunk boundary (see
        # local_ba._lm_round_chunked); whole groups are dropped past
        # obs_cap
        pt_slot_tmp = np.zeros(m.max_points, np.int64)
        pt_slot_tmp[pt_ids] = np.arange(len(pt_ids))
        order = np.argsort(pt_slot_tmp[rows[:, 1]], kind="stable")
        rows_s = rows[order]
        pts_sorted = pt_slot_tmp[rows_s[:, 1]]
        _, starts, counts = np.unique(
            pts_sorted, return_index=True, return_counts=True
        )
        out_idx: list[int] = []
        pos = 0
        for st, g in zip(starts, counts):
            g = int(g)
            room = o_chunk - (pos % o_chunk)
            if g > room and g <= o_chunk:
                out_idx += [-1] * room
                pos += room
            if pos + g > obs_cap:
                break
            out_idx += list(range(st, st + g))
            pos += g
        idx = np.asarray(out_idx, np.int64)
        # padding rows forward-fill the preceding real row so the
        # point column stays sorted (they carry zero weight via the
        # valid mask; a stray point id would split a real group)
        last_real = np.maximum.accumulate(
            np.where(idx >= 0, np.arange(len(idx)), 0)
        )
        rows = rows_s[idx[last_real]]
        obs_mask = idx >= 0
        truncated_obs += int(len(rows_s) - obs_mask.sum())
    o = len(rows)
    if o == 0:
        return None

    fixed_pad = np.zeros(k_cap, bool)
    fixed_pad[: len(kfs)] = fixed
    if not fixed_pad.any():
        fixed_pad[len(kfs) - 1] = True  # gauge
    valid_kf = np.zeros(k_cap, bool)
    valid_kf[: len(kfs)] = True
    poses = np.tile(np.eye(4, dtype=np.float32), (k_cap, 1, 1))
    poses[: len(kfs)] = m.kf_pose[kfs]

    pts = np.zeros((pt_cap, 3), np.float32)
    pts[: len(pt_ids)] = m.pt_pos[pt_ids]
    valid_pt = np.zeros(pt_cap, bool)
    valid_pt[: len(pt_ids)] = m.pt_valid[pt_ids]

    kf_slot = np.zeros(m.max_keyframes, np.int32)
    for i, k in enumerate(kfs):
        kf_slot[k] = i
    pt_slot = np.zeros(m.max_points, np.int32)
    pt_slot[pt_ids] = np.arange(len(pt_ids))

    obs_kf = np.zeros(obs_cap, np.int32)
    obs_pt = np.zeros(obs_cap, np.int32)
    obs_uvr = np.zeros((obs_cap, 3), np.float32)
    obs_sigma2 = np.ones(obs_cap, np.float32)
    obs_stereo = np.zeros(obs_cap, bool)
    obs_valid = np.zeros(obs_cap, bool)
    obs_kf[:o] = kf_slot[rows[:, 0]]
    obs_pt[:o] = pt_slot[rows[:, 1]]
    for k in kfs:
        sel = rows[:, 0] == k
        if not sel.any():
            continue
        kp = rows[sel, 2]
        data = m.kf_data[k]
        ur = data.u_right[kp]
        obs_uvr[:o][sel] = np.stack(
            [data.xy[kp, 0], data.xy[kp, 1], np.maximum(ur, 0.0)],
            axis=-1,
        )
        obs_sigma2[:o][sel] = scale_factor ** (
            2.0 * data.level[kp].astype(np.float32)
        )
        obs_stereo[:o][sel] = ur > 0
    obs_valid[:o] = True if obs_mask is None else obs_mask

    prob = BAProblem(
        kf_pose=jnp.asarray(poses),
        kf_fixed=jnp.asarray(fixed_pad),
        kf_valid=jnp.asarray(valid_kf),
        pt_pos=jnp.asarray(pts),
        pt_valid=jnp.asarray(valid_pt),
        obs_kf=jnp.asarray(obs_kf),
        obs_pt=jnp.asarray(obs_pt),
        obs_uvr=jnp.asarray(obs_uvr),
        obs_sigma2=jnp.asarray(obs_sigma2),
        obs_is_stereo=jnp.asarray(obs_stereo),
        obs_valid=jnp.asarray(obs_valid),
    )
    ctx = {
        "kfs": kfs,
        "fixed": fixed_pad,
        "pt_ids": pt_ids,
        "rows": rows,
        "o": o,
        "obs_mask": obs_mask,
        "truncated_obs": truncated_obs,
        "truncated_pts": truncated_pts,
    }
    return prob, ctx


def apply_solution(m, tracker, ctx, out: dict) -> None:
    """Write a fetched BA solution back to the host map and the device
    mirror (ref: Optimizer.cc:240-270 data recovery), erasing outlier
    observations (ref: Optimizer.cc:822-870)."""
    from sivo_tpu.runtime import device_map

    kfs, fixed, pt_ids = ctx["kfs"], ctx["fixed"], ctx["pt_ids"]
    new_poses = np.asarray(out["kf_pose"])
    for i, k in enumerate(kfs):
        if not fixed[i]:
            m.kf_pose[k] = new_poses[i]
    new_pts = np.asarray(out["pt_pos"])[: len(pt_ids)]
    m.pt_pos[pt_ids] = new_pts
    cap_pt = out["pt_pos"].shape[0]
    ids_pad = np.full(cap_pt, -1, np.int32)
    ids_pad[: len(pt_ids)] = pt_ids
    tracker.dmap = device_map.set_positions(
        tracker.dmap,
        jnp.asarray(ids_pad),
        jnp.asarray(np.asarray(out["pt_pos"], np.float32)),
    )
    inl = np.asarray(out["inlier"])[: ctx["o"]]
    mask = ctx.get("obs_mask")
    if mask is not None:
        bad = ctx["rows"][mask & ~inl]
    else:
        bad = ctx["rows"][~inl]
    if len(bad):
        m.erase_observations(bad)
