"""Local mapping: the per-keyframe refinement pipeline.

TPU-native replacement for the LocalMapping thread
(ref: src/orbslam/LocalMapping.cc): point culling, local bundle
adjustment, and observation erasure, run synchronously at keyframe rate
(the reference's thread interleaving becomes JAX async dispatch — the
BA program can execute on-device while the host prepares the next
frame).

Not yet ported from the reference (round-1 gaps, see SURVEY §2):
CreateNewMapPoints epipolar triangulation (stereo KF insertion already
creates depth-verified points), SearchInNeighbors fusion, and
KeyFrameCulling.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from sivo_tpu.config import SystemConfig
from sivo_tpu.geometry.projection import CameraParams
from sivo_tpu.optim import local_ba
from sivo_tpu.runtime import device_map
from sivo_tpu.runtime.map_state import MapState

MAX_BA_KF = 16
MAX_BA_PT = 8192
MAX_BA_OBS = 16384


@dataclass
class LocalMapper:
    cfg: SystemConfig
    map: MapState
    cam: CameraParams

    def process_keyframe(
        self, tracker, kf_idx: int
    ) -> None:
        """Run the mapping pipeline for a freshly inserted keyframe
        (ref: LocalMapping.cc:55-114 Run loop body)."""
        self._cull_points(tracker, kf_idx)
        if self.map.n_keyframes >= 2:
            self._local_ba(tracker, kf_idx)
            self._cull_keyframes(kf_idx)

    def _cull_keyframes(self, kf_idx: int) -> None:
        """KeyFrameCulling (ref: LocalMapping.cc:727-792): a covisible
        keyframe is redundant when >= 90% of its tracked points are
        observed by >= 3 other keyframes at the same or finer scale
        (level <= level + 1). Culled KFs stay in the pose chain for
        trajectory output (kf_valid=False removes them from retrieval).
        """
        m = self.map
        covis = m.covisibility(kf_idx)
        obs = m.observations()
        if len(obs) == 0:
            return
        for k in np.where(covis > 0)[0]:
            if k == 0 or not m.kf_valid[k]:  # never cull the origin
                continue
            mine = obs[obs[:, 0] == k]
            if len(mine) < 10:
                continue
            data = m.kf_data[k]
            n_redundant = 0
            for _, pt, kp in mine:
                lvl = data.level[kp]
                others = obs[(obs[:, 1] == pt) & (obs[:, 0] != k)]
                fine = 0
                for ok_kf, _, ok_kp in others:
                    if m.kf_data[ok_kf].level[ok_kp] <= lvl + 1:
                        fine += 1
                        if fine >= 3:
                            break
                if fine >= 3:
                    n_redundant += 1
            if n_redundant > self.cfg.mapping.kf_cull_redundancy * len(
                mine
            ):
                m.kf_valid[k] = False
                m._obs_dirty = True

    # -- point culling ------------------------------------------------------

    def _cull_points(self, tracker, kf_idx: int) -> None:
        """MapPointCulling (ref: LocalMapping.cc:165-196): kill recent
        points with found/visible ratio < 0.25 or too few observations
        shortly after creation."""
        m = self.map
        counters = jax.device_get(
            {
                "found": tracker.dmap.pt_found,
                "visible": tracker.dmap.pt_visible,
                "obs": tracker.dmap.pt_obs_count,
                "valid": tracker.dmap.pt_valid,
            }
        )
        n = m.n_points
        found = np.asarray(counters["found"])[:n].astype(np.float32)
        visible = np.maximum(
            np.asarray(counters["visible"])[:n].astype(np.float32), 1.0
        )
        obs = np.asarray(counters["obs"])[:n]
        valid = np.asarray(counters["valid"])[:n]
        first = m.pt_first_kf[:n]
        age = kf_idx - first  # in keyframes
        ratio_bad = (found / visible) < self.cfg.mapping.found_ratio_min
        young_bad = (age >= 2) & (
            obs < self.cfg.mapping.min_obs_stereo
        )
        kill = valid & (ratio_bad | ((age >= 1) & young_bad))
        # grace: never kill points born at this keyframe
        kill &= first < kf_idx
        kill_ids = np.where(kill)[0]
        if len(kill_ids) == 0:
            return
        m.pt_valid[kill_ids] = False
        # fixed upload shape to avoid per-length recompiles
        ids = np.full(4096, -1, np.int32)
        ids[: min(len(kill_ids), 4096)] = kill_ids[:4096]
        tracker.dmap = device_map.invalidate_points(
            tracker.dmap, jnp.asarray(ids)
        )

    # -- local bundle adjustment ---------------------------------------------

    def _local_ba(self, tracker, kf_idx: int) -> None:
        """Build the covisible-window problem and solve on device
        (ref: Optimizer.cc:493-926 via LocalMapping.cc:80-88)."""
        m = self.map
        covis = m.covisibility(kf_idx)
        order = np.argsort(-covis)
        local = [kf_idx] + [
            int(k) for k in order if covis[k] > 0
        ][: MAX_BA_KF - 1]
        local_set = set(local)
        pt_ids = m.points_seen_by(np.asarray(local, np.int64))
        if len(pt_ids) == 0:
            return
        if len(pt_ids) > MAX_BA_PT:
            pt_ids = pt_ids[-MAX_BA_PT:]  # prefer recent points
        pt_set = set(pt_ids.tolist())

        # fixed frontier: KFs outside the window observing these points
        obs = m.observations()
        sel_pt = np.isin(obs[:, 1], pt_ids)
        obs = obs[sel_pt]
        frontier = [
            int(k) for k in np.unique(obs[:, 0]) if k not in local_set
        ]
        # always fix at least one camera for gauge
        # (ref: Optimizer.cc:567-575 fixes frontier + KF 0)
        if not frontier:
            if len(local) > 1:
                frontier = [local.pop()]
            else:
                frontier = []
        kfs = local + frontier
        kfs = kfs[:MAX_BA_KF]
        kf_slot = {k: i for i, k in enumerate(kfs)}
        n_fixed_start = len(local)
        fixed = np.zeros(MAX_BA_KF, bool)
        for i, k in enumerate(kfs):
            if i >= n_fixed_start:
                fixed[i] = True
        if not fixed.any():
            fixed[min(len(kfs) - 1, MAX_BA_KF - 1)] = True
        if len(kfs) == 1:
            return  # nothing to adjust against

        valid_kf = np.zeros(MAX_BA_KF, bool)
        valid_kf[: len(kfs)] = True
        poses = np.tile(np.eye(4, dtype=np.float32), (MAX_BA_KF, 1, 1))
        poses[: len(kfs)] = m.kf_pose[kfs]

        pt_slot = {p: i for i, p in enumerate(pt_ids.tolist())}
        pts = np.zeros((MAX_BA_PT, 3), np.float32)
        pts[: len(pt_ids)] = m.pt_pos[pt_ids]
        valid_pt = np.zeros(MAX_BA_PT, bool)
        valid_pt[: len(pt_ids)] = m.pt_valid[pt_ids]

        # observations from KFs in the window
        rows = obs[np.isin(obs[:, 0], kfs)]
        if len(rows) > MAX_BA_OBS:
            rows = rows[-MAX_BA_OBS:]
        o = len(rows)
        obs_kf = np.zeros(MAX_BA_OBS, np.int32)
        obs_pt = np.zeros(MAX_BA_OBS, np.int32)
        obs_uvr = np.zeros((MAX_BA_OBS, 3), np.float32)
        obs_sigma2 = np.ones(MAX_BA_OBS, np.float32)
        obs_stereo = np.zeros(MAX_BA_OBS, bool)
        obs_valid = np.zeros(MAX_BA_OBS, bool)
        sf = self.cfg.orb.scale_factor
        for i, (k, p, kp) in enumerate(rows):
            data = m.kf_data[k]
            obs_kf[i] = kf_slot[int(k)]
            obs_pt[i] = pt_slot[int(p)]
            ur = data.u_right[kp]
            obs_uvr[i] = [data.xy[kp, 0], data.xy[kp, 1], max(ur, 0.0)]
            obs_sigma2[i] = sf ** (2.0 * data.level[kp])
            obs_stereo[i] = ur > 0
            obs_valid[i] = True

        prob = local_ba.BAProblem(
            kf_pose=jnp.asarray(poses),
            kf_fixed=jnp.asarray(fixed),
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
        res = local_ba.local_bundle_adjustment(
            prob, jnp.int32(0), self.cam
        )
        out = jax.device_get(
            {
                "kf_pose": res.kf_pose,
                "pt_pos": res.pt_pos,
                "inlier": res.obs_inlier,
                "cov": res.newest_cov,
            }
        )
        # write back keyframe poses (free ones only)
        new_poses = np.asarray(out["kf_pose"])
        for i, k in enumerate(kfs):
            if not fixed[i]:
                m.kf_pose[k] = new_poses[i]
        m.kf_cov[kf_idx] = np.asarray(out["cov"])
        # write back point positions: host + device mirror
        new_pts = np.asarray(out["pt_pos"])[: len(pt_ids)]
        m.pt_pos[pt_ids] = new_pts
        ids_pad = np.full(MAX_BA_PT, -1, np.int32)
        ids_pad[: len(pt_ids)] = pt_ids
        pts_pad = np.asarray(out["pt_pos"], np.float32)
        tracker.dmap = device_map.set_positions(
            tracker.dmap, jnp.asarray(ids_pad), jnp.asarray(pts_pad)
        )
        # erase outlier observations (ref: Optimizer.cc:822-870)
        inl = np.asarray(out["inlier"])[:o]
        bad = rows[~inl]
        if len(bad):
            self.map.erase_observations(bad)
