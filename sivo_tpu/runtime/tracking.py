"""Tracking: the per-frame state machine.

TPU-native replacement for the reference Tracking thread
(ref: src/orbslam/Tracking.cc). The host orchestrates; every numeric
stage (projection, matching, pose LM, selection scores) is a fixed-shape
jitted program. Data-dependent policy (keyframe decision, state
transitions) runs on host scalars, as SURVEY §7 prescribes.

State machine (ref: Tracking.h:89-95): NOT_INITIALIZED -> OK <-> LOST.
"""

from __future__ import annotations

import enum
import functools
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sivo_tpu.config import SystemConfig
from sivo_tpu.geometry import se3
from sivo_tpu.geometry.projection import (
    CameraParams,
    frustum_check,
    predict_scale,
    project_stereo,
    unproject_stereo,
)
from sivo_tpu.ops import matching
from sivo_tpu.optim import pose_lm
from sivo_tpu.runtime.frame import Frame
from sivo_tpu.runtime.map_state import KeyFrameData, MapState
from sivo_tpu.select import info as info_ops
from sivo_tpu.utils.precision import hmat

LOCAL_PT_CAP = 16384  # padded local-map size for fixed-shape programs


class TrackingState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


def make_camera(cfg: SystemConfig) -> CameraParams:
    c = cfg.camera
    return CameraParams(
        fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy, bf=c.bf,
        width=c.width, height=c.height,
    )


# ---------------------------------------------------------------------------
# jitted per-frame programs
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cam",))
def _project_prev_points(
    Tcw: jnp.ndarray, points: jnp.ndarray, cam: CameraParams
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """World points -> (uvr, z) in the predicted current camera."""
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    xc = hmat(points, R.T) + t
    return project_stereo(cam, xc), xc[:, 2]


@functools.partial(jax.jit, static_argnames=("cam", "n_levels"))
def _frustum_program(
    Tcw: jnp.ndarray,
    pts: jnp.ndarray,
    normals: jnp.ndarray,
    min_dist: jnp.ndarray,
    max_dist: jnp.ndarray,
    cam: CameraParams,
    scale_factor: float,
    n_levels: int,
):
    visible, uvr, dist, view_cos = frustum_check(
        cam, Tcw, pts, normals, min_dist, max_dist
    )
    level = predict_scale(dist, max_dist / 1.2, scale_factor, n_levels)
    return visible, uvr, level, view_cos


@functools.partial(jax.jit, static_argnames=("cam",))
def _selection_program(
    frame_xy: jnp.ndarray,
    frame_depth: jnp.ndarray,
    frame_level: jnp.ndarray,
    frame_entropy: jnp.ndarray,
    semantic: jnp.ndarray,
    Tcw: jnp.ndarray,
    state_cov: jnp.ndarray,
    cam: CameraParams,
    scale_factor: float,
    th_entropy: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Entropy-reduction selection for keyframe point creation
    (ref: Tracking.cc:935-1025). Returns (selected mask, world points).

    Matches the reference quirk of evaluating the stereo Jacobian at the
    *world* coordinates of the unprojected point (Tracking.cc:966-977).
    """
    Twc = se3.inverse(Tcw)
    xc = unproject_stereo(cam, frame_xy, frame_depth)
    xw = se3.transform(Twc, xc)
    sigma2 = scale_factor ** (2.0 * frame_level.astype(jnp.float32))
    scores = info_ops.entropy_reduction_stereo(
        state_cov, xw, sigma2, frame_entropy,
        cam.fx, cam.fy, cam.bf / cam.fx,
    )
    selected = semantic & (frame_depth > 0) & (scores > th_entropy)
    return selected, xw


def _frame_uvr(frame: Frame) -> jnp.ndarray:
    return jnp.concatenate(
        [frame.xy, frame.u_right[:, None]], axis=-1
    )


def _sigma2(frame: Frame, scale_factor: float) -> jnp.ndarray:
    return scale_factor ** (2.0 * frame.level.astype(jnp.float32))


# ---------------------------------------------------------------------------


@dataclass
class FrameRecord:
    """Host-side record of a tracked frame."""

    frame: Frame
    pose: np.ndarray  # (4, 4) Tcw
    cov: np.ndarray  # (6, 6)
    pt_ids: np.ndarray  # (N,) int64 map point per keypoint, -1 none
    timestamp: float
    frame_id: int
    ref_kf: int = -1
    # trajectory bookkeeping (ref: Tracking.cc:434-450)
    lost: bool = False


@dataclass
class Tracker:
    cfg: SystemConfig
    map: MapState
    cam: CameraParams = field(init=False)
    state: TrackingState = TrackingState.NO_IMAGES_YET
    velocity: Optional[np.ndarray] = None  # (4, 4) Tcl
    last: Optional[FrameRecord] = None
    last_kf_id: int = -1
    last_kf_frame_id: int = -1
    frame_count: int = 0
    trajectory: list = field(default_factory=list)  # FrameRecords

    def __post_init__(self):
        self.cam = make_camera(self.cfg)
        self._scales = self.cfg.orb.scale_factor ** np.arange(
            self.cfg.orb.n_levels, dtype=np.float32
        )
        self._scales_j = jnp.asarray(self._scales)

    # -- public API ---------------------------------------------------------

    def track(self, frame: Frame, timestamp: float) -> Optional[np.ndarray]:
        """Process one frame; returns Tcw or None if lost
        (ref: Tracking.cc:229-451 Track())."""
        fid = self.frame_count
        self.frame_count += 1

        if self.state in (
            TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED
        ):
            self._stereo_initialization(frame, timestamp, fid)
            return (
                self.last.pose if self.state == TrackingState.OK else None
            )

        ok = False
        rec = None
        if self.state == TrackingState.OK:
            if self.velocity is not None:
                ok, rec = self._track_with_motion_model(frame, timestamp, fid)
            if not ok:
                ok, rec = self._track_reference_keyframe(
                    frame, timestamp, fid
                )
        if ok:
            ok = self._track_local_map(rec)
        if not ok:
            self.state = TrackingState.LOST
            rec = FrameRecord(
                frame=frame,
                pose=self.last.pose.copy(),
                cov=self.last.cov.copy(),
                pt_ids=np.full(frame.capacity, -1, np.int64),
                timestamp=timestamp,
                frame_id=fid,
                ref_kf=self.last_kf_id,
                lost=True,
            )
            self.trajectory.append(rec)
            self.last = rec
            self.velocity = None
            return None

        self.state = TrackingState.OK
        # velocity = Tcw_cur * Twc_last (ref: Tracking.cc:352-360)
        self.velocity = rec.pose @ np.linalg.inv(self.last.pose)
        if self._need_new_keyframe(rec):
            self._create_new_keyframe(rec)
        self.trajectory.append(rec)
        self.last = rec
        return rec.pose

    # -- initialization -----------------------------------------------------

    def _stereo_initialization(
        self, frame: Frame, timestamp: float, fid: int
    ) -> None:
        """ref: Tracking.cc:453-579."""
        n_sem = int(jax.device_get(jnp.sum(frame.semantic)))
        if n_sem <= self.cfg.tracking.min_init_keypoints:
            self.state = TrackingState.NOT_INITIALIZED
            return
        pose = np.eye(4, dtype=np.float32)
        cov = np.eye(6, dtype=np.float32) * self.cfg.tracking.init_covariance
        selected, xw = _selection_program(
            frame.xy, frame.depth, frame.level, frame.sem_entropy,
            frame.semantic,
            jnp.asarray(pose), jnp.asarray(cov), self.cam,
            self.cfg.orb.scale_factor,
            0.0,  # init gate: entropy_reduction > 0 (ref: Tracking.cc:533)
        )
        sel = np.asarray(jax.device_get(selected))
        xw_np = np.asarray(jax.device_get(xw))
        rec = FrameRecord(
            frame=frame, pose=pose, cov=cov,
            pt_ids=np.full(frame.capacity, -1, np.int64),
            timestamp=timestamp, frame_id=fid,
        )
        self._insert_keyframe(rec, sel, xw_np)
        self.state = TrackingState.OK
        self.trajectory.append(rec)
        self.last = rec

    # -- trackers -----------------------------------------------------------

    def _optimize(
        self, frame: Frame, pt_ids: np.ndarray, T_init: np.ndarray
    ) -> tuple[pose_lm.PoseResult, np.ndarray]:
        """Run pose LM on the current matches; returns (result,
        updated pt_ids with outliers cleared)."""
        has = pt_ids >= 0
        pts = np.zeros((frame.capacity, 3), np.float32)
        pts[has] = self.map.pt_pos[pt_ids[has]]
        obs = pose_lm.PoseObservations(
            points=jnp.asarray(pts),
            uvr=_frame_uvr(frame),
            sigma2=_sigma2(frame, self.cfg.orb.scale_factor),
            is_stereo=frame.u_right > 0,
            valid=jnp.asarray(has),
        )
        res = pose_lm.optimize_pose(jnp.asarray(T_init), obs, self.cam)
        inl = np.asarray(jax.device_get(res.inliers))
        out = pt_ids.copy()
        out[~inl] = -1
        return res, out

    def _track_with_motion_model(
        self, frame: Frame, timestamp: float, fid: int
    ) -> tuple[bool, Optional[FrameRecord]]:
        """ref: Tracking.cc:704-779."""
        cfg = self.cfg.tracking
        T_pred = (self.velocity @ self.last.pose).astype(np.float32)
        cov_pred = np.asarray(
            info_ops.propagate_covariance_motion(
                jnp.asarray(self.last.cov), jnp.asarray(self.velocity),
                cfg.motion_process_noise,
            )
        )

        prev = self.last
        prev_has = prev.pt_ids >= 0
        prev_pts = np.zeros((prev.frame.capacity, 3), np.float32)
        prev_pts[prev_has] = self.map.pt_pos[prev.pt_ids[prev_has]]
        proj_uvr, proj_z = _project_prev_points(
            jnp.asarray(T_pred), jnp.asarray(prev_pts), self.cam
        )
        # forward/backward from relative translation z
        # (ref: ORBmatcher.cc:1300-1310)
        tlc_z = float((self.velocity @ self.last.pose @
                       np.linalg.inv(T_pred))[2, 3]) if False else 0.0
        baseline = self.cam.bf / self.cam.fx
        tz = float(self.velocity[2, 3])
        forward = tz > baseline
        backward = -tz > baseline

        def run_match(th: float) -> matching.MatchResult:
            return matching.search_by_projection_frame(
                prev.frame.desc_bits,
                jnp.asarray(prev_has),
                prev.frame.level,
                prev.frame.angle,
                proj_uvr,
                proj_z,
                frame.xy, frame.level, frame.angle, frame.desc_bits,
                frame.u_right, frame.semantic,
                self._scales_j,
                th,
                jnp.asarray(forward), jnp.asarray(backward),
            )

        m = run_match(float(cfg.motion_search_th))
        n = int(jax.device_get(m.n_matches))
        if n < cfg.min_motion_matches:
            m = run_match(2.0 * cfg.motion_search_th)
            n = int(jax.device_get(m.n_matches))
        if n < cfg.min_motion_matches:
            return False, None

        src_for_dst = np.asarray(jax.device_get(m.src_for_dst))
        pt_ids = np.full(frame.capacity, -1, np.int64)
        hit = src_for_dst >= 0
        pt_ids[hit] = prev.pt_ids[src_for_dst[hit]]

        res, pt_ids = self._optimize(frame, pt_ids, T_pred)
        n_in = int(jax.device_get(res.n_inliers))
        if n_in < cfg.min_matches_map:
            return False, None
        rec = FrameRecord(
            frame=frame,
            pose=np.asarray(jax.device_get(res.pose)),
            cov=np.asarray(jax.device_get(res.covariance)),
            pt_ids=pt_ids,
            timestamp=timestamp,
            frame_id=fid,
            ref_kf=self.last_kf_id,
        )
        # motion-propagated covariance is the prior; LM marginal is the
        # posterior the reference stores (Optimizer.cc:482-487)
        del cov_pred
        return True, rec

    def _track_reference_keyframe(
        self, frame: Frame, timestamp: float, fid: int
    ) -> tuple[bool, Optional[FrameRecord]]:
        """ref: Tracking.cc:597-639 (BoW-gated matching replaced by MXU
        brute-force with the same accept tests, see
        matching.search_brute_force)."""
        if self.last_kf_id < 0:
            return False, None
        kf = self.map.kf_data[self.last_kf_id]
        # keypoints of the ref KF that have live map points
        kf_pt_ids = self._kf_point_ids(self.last_kf_id)
        m = matching.search_brute_force(
            jnp.asarray(kf.desc_bits),
            jnp.asarray(kf_pt_ids >= 0),
            jnp.asarray(kf.angle),
            frame.desc_bits, frame.semantic, frame.angle,
            nn_ratio=0.7,
        )
        n = int(jax.device_get(m.n_matches))
        if n < 15:  # ref: Tracking.cc:609
            return False, None
        src_for_dst = np.asarray(jax.device_get(m.src_for_dst))
        pt_ids = np.full(frame.capacity, -1, np.int64)
        hit = src_for_dst >= 0
        pt_ids[hit] = kf_pt_ids[src_for_dst[hit]]
        res, pt_ids = self._optimize(frame, pt_ids, self.last.pose)
        n_in = int(jax.device_get(res.n_inliers))
        if n_in < self.cfg.tracking.min_matches_map:
            return False, None
        rec = FrameRecord(
            frame=frame,
            pose=np.asarray(jax.device_get(res.pose)),
            cov=np.asarray(jax.device_get(res.covariance)),
            pt_ids=pt_ids,
            timestamp=timestamp,
            frame_id=fid,
            ref_kf=self.last_kf_id,
        )
        return True, rec

    def _track_local_map(self, rec: FrameRecord) -> bool:
        """ref: Tracking.cc:781-823 TrackLocalMap."""
        cfg = self.cfg.tracking
        local_kfs = self._local_keyframes(rec)
        local_pts = self.map.points_seen_by(local_kfs)
        if len(local_pts) == 0:
            return False
        # exclude points already matched in this frame
        cur = set(rec.pt_ids[rec.pt_ids >= 0].tolist())
        cand = np.array(
            [p for p in local_pts if p not in cur], np.int64
        )
        if len(cand) > LOCAL_PT_CAP:
            cand = cand[:LOCAL_PT_CAP]
        padded = np.zeros(LOCAL_PT_CAP, np.int64)
        padded[: len(cand)] = cand
        alive = np.zeros(LOCAL_PT_CAP, bool)
        alive[: len(cand)] = True

        visible, uvr, level, view_cos = _frustum_program(
            jnp.asarray(rec.pose),
            jnp.asarray(self.map.pt_pos[padded]),
            jnp.asarray(self.map.pt_normal[padded]),
            jnp.asarray(self.map.pt_min_dist[padded]),
            jnp.asarray(self.map.pt_max_dist[padded]),
            self.cam, self.cfg.orb.scale_factor, self.cfg.orb.n_levels,
        )
        visible = visible & jnp.asarray(alive)
        m = matching.search_by_projection_points(
            jnp.asarray(self.map.pt_desc_bits[padded]),
            visible, uvr, level, view_cos,
            rec.frame.xy, rec.frame.level, rec.frame.desc_bits,
            rec.frame.u_right, rec.frame.semantic
            & jnp.asarray(rec.pt_ids < 0),
            self._scales_j, th=1.0, nn_ratio=0.8,
        )
        src_for_dst = np.asarray(jax.device_get(m.src_for_dst))
        hit = src_for_dst >= 0
        pt_ids = rec.pt_ids.copy()
        pt_ids[hit] = padded[src_for_dst[hit]]

        # visible counter (ref: MapPoint IncreaseVisible via
        # SearchLocalPoints, Tracking.cc:1033-1085)
        vis_ids = padded[np.asarray(jax.device_get(visible))]
        self.map.pt_visible[vis_ids] += 1

        res, pt_ids = self._optimize(rec.frame, pt_ids, rec.pose)
        n_in = int(jax.device_get(res.n_inliers))
        if n_in < cfg.min_local_map_inliers:
            return False
        rec.pose = np.asarray(jax.device_get(res.pose))
        rec.cov = np.asarray(jax.device_get(res.covariance))
        rec.pt_ids = pt_ids
        found_ids = pt_ids[pt_ids >= 0]
        self.map.pt_found[found_ids] += 1
        self.map.pt_visible[found_ids] += 1
        return True

    # -- keyframe policy ----------------------------------------------------

    def _kf_point_ids(self, kf_idx: int) -> np.ndarray:
        """(N,) map point id per keypoint slot of a KF."""
        out = np.full(self.map.kp_capacity, -1, np.int64)
        obs = self.map.observations()
        if len(obs):
            mine = obs[obs[:, 0] == kf_idx]
            out[mine[:, 2]] = mine[:, 1]
        return out

    def _local_keyframes(self, rec: FrameRecord) -> np.ndarray:
        """KFs observing current points + covisible neighbors
        (ref: Tracking.cc:1087-1235), capped at 80."""
        obs = self.map.observations()
        votes = np.zeros(self.map.n_keyframes, np.int64)
        cur_pts = rec.pt_ids[rec.pt_ids >= 0]
        if len(obs) and len(cur_pts):
            mask = np.isin(obs[:, 1], cur_pts)
            np.add.at(votes, obs[mask][:, 0], 1)
        seeds = np.where(votes > 0)[0]
        if len(seeds) == 0:
            seeds = np.array([self.last_kf_id], np.int64)
        best = seeds[np.argmax(votes[seeds])] if len(seeds) else 0
        rec.ref_kf = int(best)
        out = set(seeds.tolist())
        for k in list(out)[:10]:
            w = self.map.covisibility(k)
            top = np.argsort(-w)[:10]
            out.update(top[w[top] > 0].tolist())
        arr = np.array(sorted(out), np.int64)
        return arr[: self.cfg.tracking.max_local_keyframes]

    def _need_new_keyframe(self, rec: FrameRecord) -> bool:
        """ref: Tracking.cc:825-919 with the SIVO-modified close-point
        rule (30/70, Tracking.cc:872-874)."""
        cfg = self.cfg.tracking
        n_kfs = self.map.n_keyframes
        min_obs = 3 if n_kfs > 2 else 2
        # tracked-in-ref-KF count with >= min_obs observations
        counts = self.map.point_obs_counts()
        ref_ids = self._kf_point_ids(rec.ref_kf)
        ref_live = ref_ids[ref_ids >= 0]
        n_ref = int(
            (counts[ref_live] >= min_obs).sum()
        ) if len(ref_live) else 0

        depth = np.asarray(jax.device_get(rec.frame.depth))
        sem = np.asarray(jax.device_get(rec.frame.semantic))
        close = (
            (depth > 0)
            & (depth < cfg.th_depth * self.cam.baseline)
            & sem
        )
        tracked = rec.pt_ids >= 0
        n_close_tracked = int((close & tracked).sum())
        n_close_free = int((close & ~tracked).sum())
        need_close = (
            n_close_tracked < cfg.close_tracked_max
            and n_close_free > cfg.close_nontracked_min
        )
        n_tracked = int(tracked.sum())
        max_frames = int(self.cfg.camera.fps)
        th_ref = 0.75 if n_kfs > 2 else 0.4
        c1a = rec.frame_id >= self.last_kf_frame_id + max_frames
        c1b = rec.frame_id >= self.last_kf_frame_id + cfg.min_frames_between_kf
        c1c = n_tracked < n_ref * 0.25 or need_close
        c2 = (
            n_tracked < n_ref * th_ref or need_close
        ) and n_tracked > 15
        return bool((c1a or c1b or c1c) and c2)

    def _create_new_keyframe(self, rec: FrameRecord) -> None:
        """ref: Tracking.cc:921-1031 CreateNewKeyFrame."""
        selected, xw = _selection_program(
            rec.frame.xy, rec.frame.depth, rec.frame.level,
            rec.frame.sem_entropy, rec.frame.semantic,
            jnp.asarray(rec.pose), jnp.asarray(rec.cov),
            self.cam, self.cfg.orb.scale_factor,
            self.cfg.semantic.th_entropy_reduction,
        )
        sel = np.array(jax.device_get(selected))
        # only keypoints without an existing tracked point
        sel &= rec.pt_ids < 0
        self._insert_keyframe(rec, sel, np.asarray(jax.device_get(xw)))

    def _insert_keyframe(
        self, rec: FrameRecord, new_pt_mask: np.ndarray, xw: np.ndarray
    ) -> None:
        f = rec.frame
        get = jax.device_get
        data = KeyFrameData(
            frame_id=rec.frame_id,
            timestamp=rec.timestamp,
            xy=np.asarray(get(f.xy)),
            level=np.asarray(get(f.level)),
            angle=np.asarray(get(f.angle)),
            desc_u8=np.asarray(get(f.desc_u8)),
            desc_bits=np.asarray(get(f.desc_bits)),
            u_right=np.asarray(get(f.u_right)),
            depth=np.asarray(get(f.depth)),
            sem_class=np.asarray(get(f.sem_class)),
            sem_confidence=np.asarray(get(f.sem_confidence)),
            sem_entropy=np.asarray(get(f.sem_entropy)),
            semantic=np.asarray(get(f.semantic)),
        )
        kf_idx = self.map.add_keyframe(rec.pose, rec.cov, data)
        # observations of already-tracked points
        tracked_kps = np.where(rec.pt_ids >= 0)[0]
        if len(tracked_kps):
            tracked_ids = rec.pt_ids[tracked_kps]
            self.map.add_observations(kf_idx, tracked_ids, tracked_kps)
            # class-flip check (ref: MapPoint.cc:104-111)
            self.map.set_point_class_or_kill(
                tracked_ids, data.sem_class[tracked_kps]
            )
        # new points from entropy-gated stereo unprojection
        kp_idx = np.where(new_pt_mask)[0]
        if len(kp_idx):
            ids = self.map.add_points(
                xw[kp_idx],
                data.desc_u8[kp_idx],
                data.desc_bits[kp_idx],
                data.sem_class[kp_idx],
                kf_idx,
                kp_idx,
                data.level[kp_idx],
            )
            rec.pt_ids = rec.pt_ids.copy()
            rec.pt_ids[kp_idx] = ids
        self.last_kf_id = kf_idx
        self.last_kf_frame_id = rec.frame_id
        rec.ref_kf = kf_idx
