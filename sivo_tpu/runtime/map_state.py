"""Map state: fixed-capacity SoA arrays owned by the host orchestrator.

TPU-native replacement for the reference's pointer-graph world
(ref: src/orbslam/Map.cc, MapPoint.cc, KeyFrame.cc — std::set of
heap objects under a global mutex). Keyframes and map points live in
preallocated numpy arrays; covisibility is a sparse count matrix derived
from the observation table; every device program receives padded slices
of these arrays.

Single-threaded by design: the reference's 4-thread mutex web
(SURVEY §2.3) becomes explicit orchestration, with BA overlap coming
from JAX async dispatch rather than std::thread.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class KeyFrameData:
    """Per-keyframe keypoint arrays (the Frame snapshot a KeyFrame keeps,
    ref: KeyFrame.cc:31-103)."""

    frame_id: int
    timestamp: float
    xy: np.ndarray  # (N, 2)
    level: np.ndarray  # (N,)
    angle: np.ndarray  # (N,)
    desc_u8: np.ndarray  # (N, 32)
    desc_bits: np.ndarray | None  # (N, 256) float32, derived on demand
    u_right: np.ndarray  # (N,)
    depth: np.ndarray  # (N,)
    sem_class: np.ndarray  # (N,)
    sem_confidence: np.ndarray  # (N,)
    sem_entropy: np.ndarray  # (N,)
    semantic: np.ndarray  # (N,) bool


class MapState:
    """Global map store (ref: Map.cc + the observation bookkeeping that
    lives inside MapPoint/KeyFrame in the reference)."""

    def __init__(
        self,
        max_keyframes: int = 2048,
        max_points: int = 200_000,
        kp_capacity: int = 2048,
        n_levels: int = 8,
        scale_factor: float = 1.2,
    ):
        self.max_keyframes = max_keyframes
        self.max_points = max_points
        self.kp_capacity = kp_capacity
        self.n_levels = n_levels
        self.scale_factor = scale_factor

        K, P = max_keyframes, max_points
        self.kf_pose = np.zeros((K, 4, 4), np.float32)  # Tcw
        self.kf_cov = np.zeros((K, 6, 6), np.float32)
        self.kf_valid = np.zeros(K, bool)
        self.kf_data: list[KeyFrameData | None] = [None] * K
        # covisibility spanning tree: parent = top covisible KF at
        # first connection (ref: KeyFrame.cc:410-414); -1 for the root
        self.kf_parent = np.full(K, -1, np.int32)
        self.n_keyframes = 0

        self.pt_pos = np.zeros((P, 3), np.float32)
        self.pt_normal = np.zeros((P, 3), np.float32)
        self.pt_min_dist = np.zeros(P, np.float32)
        self.pt_max_dist = np.zeros(P, np.float32)
        self.pt_desc_u8 = np.zeros((P, 32), np.uint8)
        self.pt_class = np.full(P, 255, np.uint8)
        self.pt_valid = np.zeros(P, bool)
        self.pt_ref_kf = np.full(P, -1, np.int32)
        self.pt_first_kf = np.full(P, -1, np.int32)
        # found/visible ratio counters (ref: MapPoint.cc:263-282)
        self.pt_visible = np.zeros(P, np.int32)
        self.pt_found = np.zeros(P, np.int32)
        self.n_points = 0

        # observation table: rows (kf, pt, kp_index) in a growable
        # numpy array with a per-row alive mask — every mutation is
        # vectorized (the round-1 Python-list/tuple-set version was
        # O(obs) *python-level* per BA call and would not survive
        # KITTI 00's ~1500 keyframes)
        self._obs = np.zeros((4096, 3), np.int64)
        self._obs_alive = np.zeros(4096, bool)
        self._obs_n = 0
        self._obs_dirty = True
        self._obs_arr = np.zeros((0, 3), np.int64)
        # liveness epoch: bumped by EVERY pt_valid/kf_valid mutation so
        # the live-filtered observation view (and its by-keyframe sort)
        # can be cached between mutations — at endurance scale the
        # filter alone moves ~150k rows and ran dozens of times per
        # keyframe event (round-4 endurance: map.advance 163 ms mean)
        self._valid_epoch = 0
        self._obs_live_token = None
        self._obs_live = np.zeros((0, 3), np.int64)
        self._obs_bykf = None  # (sorted rows, kf column) or None

    # -- observation-table internals ---------------------------------------

    def _obs_reserve(self, m: int) -> None:
        need = self._obs_n + m
        cap = len(self._obs)
        if need <= cap:
            return
        while cap < need:
            cap *= 2
        obs = np.zeros((cap, 3), np.int64)
        alive = np.zeros(cap, bool)
        obs[: self._obs_n] = self._obs[: self._obs_n]
        alive[: self._obs_n] = self._obs_alive[: self._obs_n]
        self._obs = obs
        self._obs_alive = alive

    def _obs_append(
        self, kf_idx: int, pt_ids: np.ndarray, kp_indices: np.ndarray
    ) -> None:
        m = len(pt_ids)
        if m == 0:
            return
        self._obs_reserve(m)
        n = self._obs_n
        self._obs[n : n + m, 0] = kf_idx
        self._obs[n : n + m, 1] = pt_ids
        self._obs[n : n + m, 2] = kp_indices
        self._obs_alive[n : n + m] = True
        self._obs_n = n + m
        self._obs_dirty = True

    @staticmethod
    def _obs_key(rows: np.ndarray) -> np.ndarray:
        """Encode (kf, pt, kp) rows as single int64 keys (kf < 2^18,
        pt < 2^28, kp < 2^18)."""
        return (
            (rows[:, 0] << 46) | (rows[:, 1] << 18) | rows[:, 2]
        )

    # -- keyframes --------------------------------------------------------

    def add_keyframe(
        self, pose: np.ndarray, cov: np.ndarray, data: KeyFrameData
    ) -> int:
        k = self.n_keyframes
        if k >= self.max_keyframes:
            raise RuntimeError("keyframe capacity exceeded")
        self.kf_pose[k] = pose
        self.kf_cov[k] = cov
        self.kf_valid[k] = True
        self.kf_data[k] = data
        self.n_keyframes += 1
        return k

    def set_kf_pose(self, k: int, pose: np.ndarray) -> None:
        self.kf_pose[k] = pose

    # -- points -----------------------------------------------------------

    def add_points(
        self,
        positions: np.ndarray,  # (M, 3) world
        desc_u8: np.ndarray,
        classes: np.ndarray,
        kf_idx: int,
        kp_indices: np.ndarray,  # (M,) keypoint slots in the KF
        levels: np.ndarray,  # (M,) octave of the creating observation
    ) -> np.ndarray:
        """Create M map points observed by keyframe ``kf_idx``. Returns
        their point ids. Normal/scale data follows MapPoint ctor
        (ref: MapPoint.cc:32-59, UpdateNormalAndDepth 368-411)."""
        m = len(positions)
        if self.n_points + m > self.max_points:
            # callers must pre-truncate to remaining capacity (the
            # mapper does, mapping._tri_apply) — a partial add here
            # would return fewer ids than the caller's aligned index
            # arrays and silently desync the host/device id lockstep
            raise RuntimeError("map point capacity exceeded")
        ids = np.arange(self.n_points, self.n_points + m)
        cam_center = self.kf_camera_center(kf_idx)
        d = positions - cam_center
        dist = np.linalg.norm(d, axis=-1) + 1e-9
        sf = self.scale_factor
        # ref: MapPoint.cc:55-58 — max dist = dist * scale[level],
        # min = max / scale[nlevels-1]
        level_sf = sf ** levels.astype(np.float32)
        max_dist = dist * level_sf
        min_dist = max_dist / (sf ** (self.n_levels - 1))
        self.pt_pos[ids] = positions
        self.pt_normal[ids] = d / dist[:, None]
        self.pt_min_dist[ids] = 0.8 * min_dist
        self.pt_max_dist[ids] = 1.2 * max_dist
        self.pt_desc_u8[ids] = desc_u8
        self.pt_class[ids] = classes
        self.pt_valid[ids] = True
        self.pt_ref_kf[ids] = kf_idx
        self.pt_first_kf[ids] = kf_idx
        self.n_points += m
        self._obs_append(kf_idx, ids, np.asarray(kp_indices))
        return ids

    def mirror_points(
        self,
        pt_ids: np.ndarray,  # (M,) device-assigned ids
        positions: np.ndarray,
        desc_u8: np.ndarray,
        classes: np.ndarray,
        kf_idx: int,
        kp_indices: np.ndarray,
        levels: np.ndarray,
        cam_center: np.ndarray,
    ) -> None:
        """Mirror device-created points into the host store (ids were
        assigned by device_map.add_points)."""
        m = len(pt_ids)
        if m == 0:
            return
        d = positions - cam_center
        dist = np.linalg.norm(d, axis=-1) + 1e-9
        sf = self.scale_factor
        level_sf = sf ** levels.astype(np.float32)
        max_dist = dist * level_sf
        min_dist = max_dist / (sf ** (self.n_levels - 1))
        self.pt_pos[pt_ids] = positions
        self.pt_normal[pt_ids] = d / dist[:, None]
        self.pt_min_dist[pt_ids] = 0.8 * min_dist
        self.pt_max_dist[pt_ids] = 1.2 * max_dist
        self.pt_desc_u8[pt_ids] = desc_u8
        self.pt_class[pt_ids] = classes
        self.pt_valid[pt_ids] = True
        self.pt_ref_kf[pt_ids] = kf_idx
        self.pt_first_kf[pt_ids] = kf_idx
        self.n_points = max(self.n_points, int(pt_ids.max()) + 1)
        self._obs_append(
            kf_idx, np.asarray(pt_ids), np.asarray(kp_indices)
        )

    def add_observations(
        self, kf_idx: int, pt_ids: np.ndarray, kp_indices: np.ndarray
    ) -> None:
        self._obs_append(
            kf_idx, np.asarray(pt_ids), np.asarray(kp_indices)
        )

    def erase_observations(self, rows: np.ndarray) -> None:
        """Remove specific (kf, pt, kp) observation rows (BA outlier
        erasure, ref: Optimizer.cc:822-870). Vectorized via int64 row
        keys — no python-level loop over the table."""
        if len(rows) == 0:
            return
        n = self._obs_n
        keys = self._obs_key(self._obs[:n])
        bad = self._obs_key(np.asarray(rows, np.int64))
        self._obs_alive[:n] &= ~np.isin(keys, bad)
        self._obs_dirty = True

    def replace_point(self, kill: int, keep: int) -> None:
        """Fuse two map points (ref: MapPoint.cc:225-261 Replace):
        rewrite observations of ``kill`` to ``keep`` (dropping ones
        where the keyframe already observes ``keep``) and invalidate
        ``kill``."""
        n = self._obs_n
        obs = self._obs[:n]
        alive = self._obs_alive[:n]
        keep_kfs = obs[alive & (obs[:, 1] == keep), 0]
        kill_rows = np.where(alive & (obs[:, 1] == kill))[0]
        if len(kill_rows):
            ok = ~np.isin(obs[kill_rows, 0], keep_kfs)
            cand = kill_rows[ok]
            # at most one rewritten row per keyframe (first wins)
            _, first = np.unique(obs[cand, 0], return_index=True)
            rewrite = cand[first]
            self._obs[rewrite, 1] = keep
            drop = np.setdiff1d(kill_rows, rewrite, assume_unique=True)
            self._obs_alive[drop] = False
        self.pt_valid[kill] = False
        self._valid_epoch += 1
        self.pt_found[keep] += self.pt_found[kill]
        self.pt_visible[keep] += self.pt_visible[kill]
        self._obs_dirty = True

    def replace_points_batch(
        self, kills: np.ndarray, keeps: np.ndarray
    ) -> None:
        """Vectorized MapPoint::Replace over a set of (kill, keep)
        pairs (ref: MapPoint.cc:225-261) — ONE observation-table pass
        instead of one per merge (fusion after a busy keyframe runs
        hundreds of merges; per-merge full-table scans were the
        dominant map.fuse host cost). Chains (a->b, b->c) are resolved
        transitively; semantics match sequential replace_point calls:
        a keyframe already observing ``keep`` drops its ``kill`` row,
        otherwise exactly one of its kill rows is rewritten."""
        kills = np.asarray(kills, np.int64)
        keeps = np.asarray(keeps, np.int64)
        if len(kills) == 0:
            return
        remap = np.arange(self.max_points, dtype=np.int64)
        remap[kills] = keeps
        for _ in range(4):  # merge chains are short
            nxt = remap[keeps]
            if (nxt == keeps).all():
                break
            keeps = nxt
            remap[kills] = keeps
        n = self._obs_n
        obs = self._obs[:n]
        alive = self._obs_alive[:n]
        pt_new = remap[obs[:, 1]]
        rewritten = alive & (pt_new != obs[:, 1])
        # winner per (kf, final point): pre-existing keep rows first,
        # then the first rewritten row; losers are dropped
        key = obs[:, 0].astype(np.int64) * self.max_points + pt_new
        idx_alive = np.where(alive)[0]
        order = np.lexsort(
            (rewritten[idx_alive], key[idx_alive])
        )
        ka = key[idx_alive][order]
        first = np.ones(len(ka), bool)
        first[1:] = ka[1:] != ka[:-1]
        winner = np.zeros(n, bool)
        winner[idx_alive[order]] = first
        self._obs[:n, 1] = np.where(alive, pt_new, obs[:, 1])
        self._obs_alive[:n] = alive & ~(rewritten & ~winner)
        self.pt_valid[kills] = False
        self._valid_epoch += 1
        np.add.at(self.pt_found, keeps, self.pt_found[kills])
        np.add.at(self.pt_visible, keeps, self.pt_visible[kills])
        self._obs_dirty = True

    def remove_point(self, pt_id: int) -> None:
        """SetBadFlag (ref: MapPoint.cc:201-223) — lazily: observations
        of invalid points are filtered at query time."""
        self.pt_valid[pt_id] = False
        self._valid_epoch += 1

    def set_point_class_or_kill(
        self, pt_ids: np.ndarray, classes: np.ndarray
    ) -> None:
        """Class-flip deletion (ref: MapPoint.cc:104-111 SetSemanticInfo):
        a detection disagreeing with the stored class kills the point."""
        stored = self.pt_class[pt_ids]
        flip = (stored != 255) & (stored != classes)
        self.pt_valid[pt_ids[flip]] = False
        if flip.any():
            self._valid_epoch += 1
        fresh = stored == 255
        self.pt_class[pt_ids[fresh]] = classes[fresh]

    # -- derived ----------------------------------------------------------

    def observations(self) -> np.ndarray:
        """(O, 3) int array (kf, pt, kp), filtered to live points/KFs.
        Cached until the table or any liveness flag changes (mutators
        bump ``_valid_epoch`` / set ``_obs_dirty``); callers must not
        mutate the returned array."""
        if self._obs_dirty:
            n = self._obs_n
            self._obs_arr = self._obs[:n][self._obs_alive[:n]]
            self._obs_dirty = False
            self._obs_live_token = None
        token = (
            len(self._obs_arr), self._valid_epoch, self.n_keyframes
        )
        if token != self._obs_live_token:
            arr = self._obs_arr
            if len(arr):
                live = (
                    self.pt_valid[arr[:, 1]] & self.kf_valid[arr[:, 0]]
                )
                self._obs_live = arr[live]
            else:
                self._obs_live = arr
            self._obs_live_token = token
            self._obs_bykf = None
        return self._obs_live

    def obs_by_kf(self, kf_idx: int) -> np.ndarray:
        """Live observation rows of one keyframe — a searchsorted slice
        of a cached kf-sorted copy (the per-call ``obs[:, 0] == kf``
        mask is O(n_obs) and ran ~15x per keyframe event)."""
        obs = self.observations()
        if self._obs_bykf is None:
            order = np.argsort(obs[:, 0], kind="stable")
            self._obs_bykf = (obs[order], obs[order, 0])
        rows, kfcol = self._obs_bykf
        lo = np.searchsorted(kfcol, kf_idx, side="left")
        hi = np.searchsorted(kfcol, kf_idx, side="right")
        return rows[lo:hi]

    def mark_points_invalid(self, pt_ids) -> None:
        """SetBadFlag over ids, keeping the observation cache honest."""
        self.pt_valid[pt_ids] = False
        self._valid_epoch += 1

    def point_obs_counts(self) -> np.ndarray:
        counts = np.zeros(self.max_points, np.int32)
        obs = self.observations()
        if len(obs):
            np.add.at(counts, obs[:, 1], 1)
        return counts

    def point_obs_counts_weighted(self) -> np.ndarray:
        """Reference-weighted observation counts: a STEREO observation
        counts 2, mono counts 1 (ref: MapPoint.cc:155-161
        AddObservation — nObs += 2 when mvuRight[idx] >= 0). The cull
        thresholds (LocalMapping.cc:186-187, MapPoint.cc:181) are
        calibrated against THIS count; comparing them to a plain
        keyframe count demands twice the re-observations and
        measurably massacres the young map."""
        counts = np.zeros(self.max_points, np.int32)
        obs = self.observations()
        if len(obs) == 0:
            return counts
        if self._obs_bykf is None:
            order = np.argsort(obs[:, 0], kind="stable")
            self._obs_bykf = (obs[order], obs[order, 0])
        so, kfcol = self._obs_bykf
        # contiguous per-KF runs of the cached kf-sorted view: O(n_obs)
        # total (the per-KF full-table masks were O(K * n_obs) — 209 ms
        # mean map.cull_points at endurance scale)
        uk, starts = np.unique(kfcol, return_index=True)
        ends = np.r_[starts[1:], len(so)]
        w = np.ones(len(so), np.int32)
        for k, s, e in zip(uk, starts, ends):
            d = self.kf_data[k]
            if d is None:
                continue
            w[s:e] += (d.u_right[so[s:e, 2]] > 0).astype(np.int32)
        np.add.at(counts, so[:, 1], w)
        return counts

    def covisibility_matrix(self) -> "np.ndarray":
        """(K, K) shared-point counts (ref: KeyFrame.cc:327-415
        UpdateConnections), cached per observation-table version and
        computed as one sparse incidence product."""
        obs = self.observations()
        version = (len(obs), id(self._obs_arr), self.n_keyframes)
        if getattr(self, "_covis_version", None) == version:
            return self._covis_cache
        K = self.n_keyframes
        if len(obs) == 0 or K == 0:
            C = np.zeros((max(K, 1), max(K, 1)), np.int64)
        else:
            import scipy.sparse as sp

            M = sp.csr_matrix(
                (
                    np.ones(len(obs), np.int64),
                    (obs[:, 0], obs[:, 1]),
                ),
                shape=(K, self.max_points),
            )
            C = np.asarray((M @ M.T).todense())
            np.fill_diagonal(C, 0)
        self._covis_cache = C
        self._covis_version = version
        return C

    def covisibility(self, kf_idx: int) -> np.ndarray:
        """(K,) shared-point counts between ``kf_idx`` and every other
        keyframe."""
        C = self.covisibility_matrix()
        if kf_idx >= C.shape[0]:
            return np.zeros(self.n_keyframes, np.int64)
        return C[kf_idx][: self.n_keyframes]

    def update_spanning_tree(self, kf_idx: int) -> None:
        """Set the keyframe's parent to its top covisible predecessor
        (ref: KeyFrame.cc:410-414 — assigned once, at the first
        connection update after insertion)."""
        if self.kf_parent[kf_idx] >= 0 or kf_idx == 0:
            return
        w = self.covisibility(kf_idx)[:kf_idx]
        if len(w) == 0:
            return
        best = int(np.argmax(w))
        # fall back to the previous keyframe when no shared points yet
        self.kf_parent[kf_idx] = best if w[best] > 0 else kf_idx - 1

    def covis_top10(self) -> dict[int, list[int]]:
        """Top-10 covisible neighbors for every keyframe in one
        vectorized pass over the cached covisibility matrix (the
        per-KF argsort loop was O(K^2 log K) per loop detection)."""
        C = self.covisibility_matrix()[: self.n_keyframes,
                                       : self.n_keyframes]
        if C.size == 0:
            return {}
        k10 = min(10, C.shape[1])
        order = np.argpartition(-C, k10 - 1, axis=1)[:, :k10]
        w = np.take_along_axis(C, order, axis=1)
        return {
            k: [int(j) for j, wj in zip(order[k], w[k]) if wj > 0]
            for k in range(C.shape[0])
        }

    def local_keyframes(self, kf_idx: int, max_n: int = 80) -> np.ndarray:
        """Covisible keyframes ordered by weight (ref: Tracking.cc:
        1087-1235 UpdateLocalKeyFrames, capped at 80)."""
        w = self.covisibility(kf_idx)
        order = np.argsort(-w)
        order = order[w[order] > 0][: max_n - 1]
        return np.concatenate([[kf_idx], order]).astype(np.int64)

    def local_point_ids(self, kf_idx: int, cap: int) -> np.ndarray:
        """Live points observed by ``kf_idx``'s covisible neighborhood
        (ref: Tracking.cc:1087-1235 UpdateLocalKeyFrames/Points, local
        KFs capped at 80). When over ``cap``, keeps the points whose
        best observing keyframe is most covisible with ``kf_idx`` (the
        reference has no cap; frustum culling bounds its cost)."""
        kfs = self.local_keyframes(kf_idx, max_n=80)
        obs = self.observations()
        if len(obs) == 0:
            return np.zeros(0, np.int64)
        sub = obs[np.isin(obs[:, 0], kfs)]
        if len(sub) == 0:
            return np.zeros(0, np.int64)
        ids = np.unique(sub[:, 1])
        if len(ids) <= cap:
            return ids
        wkf = np.zeros(self.n_keyframes + 1, np.float64)
        cw = self.covisibility(kf_idx).astype(np.float64)
        wkf[kfs] = cw[kfs] + 1.0
        wkf[kf_idx] = np.inf  # own points always survive
        ptw = np.zeros(self.max_points, np.float64)
        np.maximum.at(ptw, sub[:, 1], wkf[sub[:, 0]])
        order = np.argsort(-ptw[ids], kind="stable")
        return ids[order[:cap]]

    def points_seen_by(self, kf_ids: np.ndarray) -> np.ndarray:
        """Unique live point ids observed by any of the given KFs."""
        obs = self.observations()
        if len(obs) == 0:
            return np.zeros(0, np.int64)
        mask = np.isin(obs[:, 0], kf_ids)
        return np.unique(obs[mask][:, 1])

    def kf_camera_center(self, k: int) -> np.ndarray:
        T = self.kf_pose[k]
        return -T[:3, :3].T @ T[:3, 3]

    def clear(self) -> None:
        """Full reset (ref: Map.cc:103-121 + Tracking.cc:1398-1435)."""
        self.kf_valid[:] = False
        self.pt_valid[:] = False
        self.kf_data = [None] * self.max_keyframes
        self.kf_parent[:] = -1
        self.n_keyframes = 0
        self.n_points = 0
        self._obs_n = 0
        self._obs_alive[:] = False
        self._obs_dirty = True
        self._valid_epoch += 1
