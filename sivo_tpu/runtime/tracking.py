"""Tracking: the host-side per-frame orchestrator.

TPU-native replacement for the reference Tracking thread
(ref: src/orbslam/Tracking.cc). All numerics run in ONE fused device
program per frame (runtime/track_step.py); the host fetches a single
~256-byte summary, runs the data-dependent policy (state machine,
keyframe decision — SURVEY §7: "host-side policy on small
device-computed scalars"), and performs keyframe bookkeeping at KF
rate, not frame rate.

State machine (ref: Tracking.h:89-95): NOT_INITIALIZED -> OK <-> LOST.
"""

from __future__ import annotations

import enum
import functools
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sivo_tpu.config import SystemConfig
from sivo_tpu.geometry.projection import CameraParams, unproject_stereo
from sivo_tpu.runtime import device_map, track_step as ts
from sivo_tpu.runtime.frame import Frame
from sivo_tpu.runtime.map_state import KeyFrameData, MapState
from sivo_tpu.select import info as info_ops


class TrackingState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


@jax.jit
def _chain_pose(pose: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    from sivo_tpu.utils.precision import hmat

    return hmat(pose, delta)


@jax.jit
def _merge_local_ids(
    new_ids: jnp.ndarray, prev_ids: jnp.ndarray
) -> jnp.ndarray:
    """Prepend a fresh keyframe's point ids to the local-map id list
    (stable compaction of -1 padding; duplicates with the previous list
    are harmless — they lose the dst-conflict resolution in matching).
    The exact covisible set replaces this once host bookkeeping lands."""
    cat = jnp.concatenate([new_ids, prev_ids])
    order = jnp.argsort(
        jnp.where(cat >= 0, 0, 1), stable=True
    )
    return cat[order][: prev_ids.shape[0]]


def make_camera(cfg: SystemConfig) -> CameraParams:
    c = cfg.camera
    return CameraParams(
        fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy, bf=c.bf,
        width=c.width, height=c.height,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cam", "scale_factor", "init_cov", "sequential_sel"),
)
def _init_selection(
    frame: Frame,
    cam: CameraParams,
    scale_factor: float,
    init_cov: float = 1e-6,
    sequential_sel: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Initialization-time entropy selection at the identity pose with
    the configured initial covariance and gate 0 bits
    (ref: Tracking.cc:453-579). Returns (sel_mask, xw, n_semantic)."""
    cov = jnp.eye(6, dtype=jnp.float32) * init_cov
    xc = unproject_stereo(cam, frame.xy, frame.depth)
    xw = xc  # pose = identity
    sigma2 = scale_factor ** (2.0 * frame.level.astype(jnp.float32))
    candidate = frame.semantic & (frame.depth > 0)
    if sequential_sel:
        sel, _, _ = info_ops.sequential_selection_stereo(
            cov, xc, sigma2, frame.sem_entropy, candidate,
            jnp.float32(0.0), cam.fx, cam.fy, cam.bf / cam.fx,
        )
    else:
        scores = info_ops.entropy_reduction_stereo(
            cov, xw, sigma2, frame.sem_entropy,
            cam.fx, cam.fy, cam.bf / cam.fx,
        )
        sel = candidate & (scores > 0.0)
    return sel, xw, jnp.sum(frame.semantic)


@dataclass
class FrameRecord:
    """Host-side per-frame trajectory record
    (ref: Tracking.cc:434-450 bookkeeping lists)."""

    pose: np.ndarray  # (4, 4) Tcw at track time
    rel_pose: np.ndarray  # (4, 4) Tcr w.r.t. reference KF
    ref_kf: int
    timestamp: float
    frame_id: int
    lost: bool = False


@dataclass(eq=False)  # identity comparison (fields hold device arrays)
class Ticket:
    """An in-flight tracked frame: the device program is dispatched and
    its ~256-byte summary is being copied back by the fetch worker while
    the host moves on (the pipelined replacement for the reference's
    synchronous Track() return)."""

    frame: Frame
    result: ts.StepResult
    timestamp: float
    frame_id: int
    summary_future: object  # Future[np.ndarray]
    # world corrections (BA / loop closure) applied AFTER this frame's
    # program was dispatched: its summary pose is in the old world
    # frame and must be re-chained at retire (Tcw_new = Tcw_old @ corr)
    correction: Optional[np.ndarray] = None


@dataclass
class Tracker:
    cfg: SystemConfig
    map: MapState
    state: TrackingState = TrackingState.NO_IMAGES_YET
    frame_count: int = 0
    last_kf_id: int = -1
    last_kf_frame_id: int = -1
    trajectory: list = field(default_factory=list)
    # localization mode: track against the frozen map, never insert
    # keyframes (ref: Tracking.cc mbOnlyTracking via
    # System::ActivateLocalizationMode, System.cc:220-243)
    only_tracking: bool = False

    def __post_init__(self):
        self.cam = make_camera(self.cfg)
        n = self.cfg.orb.max_keypoints
        self.carry: Optional[ts.TrackCarry] = None
        self.dmap = device_map.make_device_map(self.map.max_points)
        # device-resident keyframe arrays: written once at insertion,
        # gathered by the mapping/loop pipelines (never re-uploaded)
        from sivo_tpu.runtime import kf_store as kfs_mod

        self.kf_store = kfs_mod.make_kf_store(
            self.map.max_keyframes, n
        )
        # device-resident reference-KF data for the fallback path
        self._ref_desc_bits = jnp.zeros((n, 256), jnp.float32)
        self._ref_angle = jnp.zeros(n, jnp.float32)
        self._ref_pt_idx = jnp.full(n, -1, jnp.int32)
        # covisible local-map point ids (ref: Tracking.cc:1087-1235):
        # device-extended at KF insertion, host-refreshed when the
        # keyframe's bookkeeping lands (finish_kf_host) and after
        # triangulation adds points
        self._local_ids_dev = jnp.full(ts.LOCAL_CAND, -1, jnp.int32)
        self.local_cap_binds = 0  # cap-bind counter (truncation events)
        # cached device bools (every fresh upload pays relay RTT)
        self._bool_dev = {
            False: jnp.asarray(False), True: jnp.asarray(True)
        }
        self.last_pose = np.eye(4, dtype=np.float32)
        self.last_cov = np.eye(6, dtype=np.float32) * 1e-6
        # FIFO of dispatched-but-unretired frames. Depth >1 lets the
        # ~110ms relay round-trip of the summary fetch hide under
        # MULTIPLE frames of host+device work (one frame of overlap
        # is not enough when the RTT exceeds the frame period); the
        # cost is the same number of frames of lag on the keyframe
        # decision and lost-detection, which the reference's
        # asynchronous LocalMapping already tolerates
        # (ref: LocalMapping.cc:116-120).
        self._inflight: list = []
        self.kf_created: Optional[int] = None  # set by retire()
        # keyframes whose host bookkeeping fetch is still in flight
        self._kf_host_pending: dict[int, tuple] = {}
        # set by System: the mapper, for keyframe-decision backpressure
        self.mapper = None
        # per-run constant device scalars (every upload pays relay RTT)
        self._th_entropy_dev = jnp.float32(
            self.cfg.semantic.th_entropy_reduction
        )
        self._min_obs_dev = {
            2: jnp.int32(2), 3: jnp.int32(3)
        }

    # -- public API ---------------------------------------------------------

    def track(self, frame: Frame, timestamp: float) -> Optional[np.ndarray]:
        """Synchronous per-frame API (ref: Tracking.cc:229-451 Track()):
        dispatch + retire in one call. The pipelined path (System)
        calls dispatch/retire directly so the summary fetch of frame i
        overlaps the host+device work of frame i+1."""
        if self.state in (
            TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED
        ):
            return self.track_init(frame, timestamp)
        return self.retire(self.dispatch(frame, timestamp))

    def track_init(
        self, frame: Frame, timestamp: float
    ) -> Optional[np.ndarray]:
        """Initialization frames (synchronous; ref: Tracking.cc:241)."""
        fid = self.frame_count
        self.frame_count += 1
        ok = self._stereo_initialization(frame, timestamp, fid)
        return self.last_pose if ok else None

    def dispatch(self, frame: Frame, timestamp: float) -> Ticket:
        """Enqueue the fused tracking program for this frame and start
        the async summary copy. Requires an initialized tracker."""
        fid = self.frame_count
        self.frame_count += 1
        # anchor cadence: every 2nd frame, plus the frame right after a
        # keyframe insertion (fresh reference data), plus whenever the
        # (pipeline-lagged) summary shows rotation deviation building —
        # the velocity runaway grows ~x1.55/frame from well under a
        # degree, and an anchor engaged at 1-2 deg is still inside the
        # anchor LM's convergence basin (at 4+ deg it no longer is:
        # measured rdev 4.6->16.6 deg THROUGH the fallback when the
        # anchor was strictly every-2nd). The device additionally
        # forces the anchor whenever the motion path fails its gates.
        s = getattr(self, "last_summary", None)
        rot_building = s is not None and (
            float(s[ts.S_ROT_DEV]) > 0.012  # ~0.7 deg
        )
        run_anchor = (
            (fid % 2 == 0)
            or (fid - self.last_kf_frame_id <= 1)
            or rot_building
        )
        result = ts.track_step(
            self.carry,
            self.dmap,
            frame,
            self._th_entropy_dev,
            self._ref_pt_idx,
            self._min_obs_dev[3 if self.map.n_keyframes > 2 else 2],
            self._ref_desc_bits,
            self._ref_angle,
            self._local_ids_dev,
            self._bool_dev[run_anchor],
            self.cam,
            self.cfg.orb.scale_factor,
            self.cfg.orb.n_levels,
            float(self.cfg.tracking.motion_search_th),
            float(self.cfg.tracking.max_accel_m),
            bool(self.cfg.semantic.sequential_selection),
            int(self.cfg.semantic.seq_min_select),
        )
        self.dmap = result.dmap
        self.carry = result.carry
        from sivo_tpu.utils.fetch import device_get_async

        tk = Ticket(
            frame=frame,
            result=result,
            timestamp=timestamp,
            frame_id=fid,
            summary_future=device_get_async(result.summary),
        )
        self._inflight.append(tk)
        return tk

    @property
    def inflight_count(self) -> int:
        return len(self._inflight)

    def take_inflight(self) -> Optional[Ticket]:
        """Pop the OLDEST in-flight ticket (FIFO)."""
        if not self._inflight:
            return None
        return self._inflight.pop(0)

    def apply_world_correction(
        self, ref_pose_old: np.ndarray, ref_pose_new: np.ndarray
    ) -> None:
        """Re-anchor the carry pose after BA / loop correction moved the
        map (ref: Tracking.cc:641-646 UpdateLastFrame — the reference
        re-chains mLastFrame through its reference keyframe's corrected
        pose before every motion-model step; without this the motion
        model absorbs each map correction as phantom velocity, which
        compounds multiplicatively on straightaways).

        carry.pose_new = carry.pose · Tref_old⁻¹ · Tref_new
        (the camera-to-refKF relative pose is what the correction
        preserves; velocity Tcl is invariant under this right-
        multiplication so it needs no update)."""
        delta = (
            np.linalg.inv(ref_pose_old.astype(np.float64))
            @ ref_pose_new.astype(np.float64)
        )
        if np.allclose(delta, np.eye(4), atol=1e-9):
            return
        import os
        if os.environ.get("SIVO_DEBUG_CORR"):
            print(f"    [world-corr] |dt|={np.linalg.norm(delta[:3,3]):.4f}")
        if self.carry is not None:
            delta_f = jnp.asarray(delta.astype(np.float32))
            self.carry = self.carry._replace(
                pose=_chain_pose(self.carry.pose, delta_f)
            )
        self.last_pose = (
            self.last_pose.astype(np.float64) @ delta
        ).astype(np.float32)
        # frames already dispatched computed their summary in the OLD
        # world frame — re-chain them at retire time
        for tk in self._inflight:
            tk.correction = (
                delta if tk.correction is None
                else tk.correction @ delta
            )

    def retire(self, ticket: Optional[Ticket]) -> Optional[np.ndarray]:
        """Consume a ticket's summary and run the host policy: state
        machine, trajectory record, keyframe decision + insertion.
        Returns the frame's pose, or None if tracking failed (the caller
        may then attempt relocalization with ticket.frame)."""
        if ticket is None:
            return None
        if ticket in self._inflight:
            self._inflight.remove(ticket)
        # frames dispatched after this ticket mean the device carry has
        # moved on: a keyframe created from it must not rewrite the
        # carry's point indices (they index a DIFFERENT frame's
        # keypoints) — its new points reach the tracker through the
        # next frame's local-map frustum stage instead
        stale = len(self._inflight) > 0
        self.kf_created = None
        timer = getattr(self, "timer", None)
        if timer is not None:
            # split the dominant retire cost: relay wait for the
            # summary fetch vs the host policy that follows
            with timer.stage("track.retire.wait"):
                summary = ticket.summary_future.result()
        else:
            summary = ticket.summary_future.result()
        self.last_summary = summary  # debug/introspection
        # the frame this summary belongs to — consumers (crisis log)
        # must not assume it is the latest dispatched frame, which is
        # up to pipeline_depth ahead (ADVICE r4)
        self.last_summary_fid = ticket.frame_id
        fid, timestamp = ticket.frame_id, ticket.timestamp
        import os

        if os.environ.get("SIVO_DEBUG_FRAME"):
            print(
                f"  [frame f={fid}] ok={summary[ts.S_OK]:.0f} "
                f"fb={summary[ts.S_USED_FALLBACK]:.0f} "
                f"mot_n={summary[ts.S_MOT_N]:.0f} "
                f"mot_inl={summary[ts.S_MOT_INL]:.0f} "
                f"dev={summary[ts.S_MOT_DEV]:.2f} "
                f"nm={summary[ts.S_N_MATCHES_MOTION]:.0f} "
                f"inl1={summary[ts.S_N_INLIERS1]:.0f} "
                f"inl2={summary[ts.S_N_INLIERS2]:.0f} "
                f"trk={summary[ts.S_N_TRACKED]:.0f} "
                f"sel={summary[ts.S_N_SELECTED]:.0f} "
                f"rdev={np.degrees(summary[ts.S_ROT_DEV]):.1f} "
                f"rd1={np.degrees(summary[ts.S_ROT_DEV_S1]):.1f}",
                flush=True,
            )

        # accept-index histogram for sequential selection (VERDICT r4
        # #9): 16 bins over the SEL_CAP walk — measures where greedy
        # accepts actually stop, grounding the keep-512 argument
        last_acc = float(summary[ts.S_SEL_LAST_ACCEPT])
        if last_acc >= 0:
            if not hasattr(self, "sel_last_accept_hist"):
                self.sel_last_accept_hist = [0] * 16
            b = min(int(last_acc) * 16 // info_ops.SEL_CAP, 15)
            self.sel_last_accept_hist[b] += 1
        if summary[ts.S_SEL_CAP_BIND] > 0.5:
            self.sel_cap_binds = getattr(self, "sel_cap_binds", 0) + 1
            # truncation audit (round-3 weak #7): how many candidates
            # the SEL_CAP walk never reached, and the best static-cov
            # score among them — if that stays below the entropy gate,
            # the cap truncates nothing of value.
            over = int(summary[ts.S_N_CANDIDATES]) - info_ops.SEL_CAP
            self.sel_trunc_cands = (
                getattr(self, "sel_trunc_cands", 0) + max(over, 0)
            )
            best = float(summary[ts.S_SEL_TRUNC_BEST])
            if np.isfinite(best):
                self.sel_trunc_best = max(
                    getattr(self, "sel_trunc_best", -np.inf), best
                )
                self.sel_trunc_best_sum = (
                    getattr(self, "sel_trunc_best_sum", 0.0) + best
                )
        if summary[ts.S_OK] < 0.5:
            # raw loss event (pre-relocalization): a later successful
            # reloc rewrites the trajectory record but not this counter
            self.raw_lost = getattr(self, "raw_lost", 0) + 1
            if not hasattr(self, "raw_lost_frames"):
                self.raw_lost_frames = []
            self.raw_lost_frames.append(int(fid))
            self.state = TrackingState.LOST
            self.trajectory.append(
                FrameRecord(
                    pose=self.last_pose.copy(),
                    rel_pose=self._rel_pose(self.last_pose),
                    ref_kf=self.last_kf_id,
                    timestamp=timestamp,
                    frame_id=fid,
                    lost=True,
                )
            )
            return None

        self.state = TrackingState.OK
        pose = summary[ts.S_POSE].reshape(4, 4).astype(np.float32)
        if ticket.correction is not None:
            pose = (
                pose.astype(np.float64) @ ticket.correction
            ).astype(np.float32)
        # per-frame rotation rate for the turn-aware keyframe cadence
        dR = pose[:3, :3] @ self.last_pose[:3, :3].T
        self._rot_rate = float(
            np.arccos(np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0))
        )
        self.last_pose = pose
        self.last_cov = summary[ts.S_COV].reshape(6, 6).astype(np.float32)

        want_kf = self._need_new_keyframe(summary, fid)
        if want_kf and self.map.n_keyframes >= self.map.max_keyframes:
            # hard keyframe capacity: SKIP the insertion instead of
            # crashing — tracking continues against the existing map
            # and the next compaction (which recycles culled slots)
            # restores headroom; the decision deliberately re-fires
            # each frame so a keyframe lands the moment a slot frees.
            # The reference has no cap (heap-allocated KeyFrames,
            # Map.cc:103-121); a fixed-capacity store must shed here.
            # kf_cap_skips counts distinct shed EVENTS (deduped while
            # the request re-fires back-to-back), per ADVICE r4.
            if getattr(self, "_kf_cap_skip_prev_fid", -2) != fid - 1:
                self.kf_cap_skips = getattr(self, "kf_cap_skips", 0) + 1
            self._kf_cap_skip_prev_fid = fid
            self.kf_created = None
        elif want_kf:
            self._create_new_keyframe(
                ticket.frame, ticket.result, timestamp, fid,
                stale=stale, correction=ticket.correction,
            )
            # reserve the device's mints on the host counter NOW, in
            # dispatch order: the device map assigned ids for this
            # keyframe's S_N_SELECTED new points in the program just
            # dispatched, but the host mirror lands only at
            # finish_kf_host — a triangulation apply in between would
            # otherwise mint host ids the device has already given to
            # these points (id-lockstep corruption, found in review).
            # mirror_points' max() later makes this idempotent.
            n_sel = int(summary[ts.S_N_SELECTED])
            self.map.n_points = min(
                self.map.n_points + n_sel, self.map.max_points
            )
            self.kf_created = self.last_kf_id
            if self.mapper is None:
                # standalone tracker (no mapping pipeline to admit the
                # keyframe): complete host bookkeeping now
                self.finish_kf_host(self.last_kf_id)
        self.trajectory.append(
            FrameRecord(
                pose=pose,
                rel_pose=self._rel_pose(pose),
                ref_kf=self.last_kf_id,
                timestamp=timestamp,
                frame_id=fid,
            )
        )
        return pose

    # -- initialization -----------------------------------------------------

    def _stereo_initialization(
        self, frame: Frame, timestamp: float, fid: int
    ) -> bool:
        """ref: Tracking.cc:453-579."""
        # init is always batch-scored: the reference's initialization
        # evaluates every candidate against the same 1e-6 prior
        # (Tracking.cc:453-579) and the map needs its full initial
        # breadth; the sequential shrink is a keyframe-creation
        # semantic (Tracking.cc:921-1031)
        sel, xw, n_sem = _init_selection(
            frame, self.cam, self.cfg.orb.scale_factor,
            self.cfg.tracking.init_covariance,
            sequential_sel=False,
        )
        if int(jax.device_get(n_sem)) <= (
            self.cfg.tracking.min_init_keypoints
        ):
            self.state = TrackingState.NOT_INITIALIZED
            return False
        pose = np.eye(4, dtype=np.float32)
        cov = np.eye(6, dtype=np.float32) * self.cfg.tracking.init_covariance
        self.last_pose, self.last_cov = pose, cov
        n = frame.capacity
        self.carry = ts.TrackCarry(
            pose=jnp.asarray(pose),
            cov=jnp.asarray(cov),
            velocity=jnp.eye(4),
            has_velocity=jnp.asarray(False),
            pt_idx=jnp.full(n, -1, jnp.int32),
            desc_bits=frame.desc_bits,
            level=frame.level,
            angle=frame.angle,
            valid=frame.valid,
        )
        self._insert_keyframe_device(
            frame, sel, xw, jnp.full(n, -1, jnp.int32), timestamp, fid,
            pose, cov,
        )
        if self.mapper is None:
            self.finish_kf_host(self.last_kf_id)
        self.state = TrackingState.OK
        self.trajectory.append(
            FrameRecord(
                pose=pose,
                rel_pose=np.eye(4, dtype=np.float32),
                ref_kf=self.last_kf_id,
                timestamp=timestamp,
                frame_id=fid,
            )
        )
        self.kf_created = self.last_kf_id
        return True

    # -- keyframe policy ----------------------------------------------------

    def _rel_pose(self, pose: np.ndarray) -> np.ndarray:
        """Tcr = Tcw * Twr w.r.t. the current reference keyframe
        (ref: Tracking.cc:437-443)."""
        if self.last_kf_id < 0:
            return pose.copy()
        Trw = self.map.kf_pose[self.last_kf_id]
        return (
            pose.astype(np.float64) @ np.linalg.inv(Trw.astype(np.float64))
        ).astype(np.float32)

    def _need_new_keyframe(self, summary: np.ndarray, fid: int) -> bool:
        """ref: Tracking.cc:825-919 with the SIVO 30/70 close-point rule
        (Tracking.cc:872-874)."""
        if self.only_tracking:  # ref: Tracking.cc:826-828
            return False
        cfg = self.cfg.tracking
        n_tracked = summary[ts.S_N_TRACKED]
        n_ref = summary[ts.S_N_REF]
        need_close = (
            summary[ts.S_N_CLOSE_TRACKED] < cfg.close_tracked_max
            and summary[ts.S_N_CLOSE_FREE] > cfg.close_nontracked_min
        )
        max_frames = int(self.cfg.camera.fps)
        # ref: Tracking.cc:877-881 — 0.25 below 2 KFs
        th_ref = cfg.th_ref_ratio if self.map.n_keyframes >= 2 else 0.25
        mapper_idle = self.mapper is None or not self.mapper.busy
        queue_len = 0 if self.mapper is None else self.mapper.queue_len
        c1a = fid >= self.last_kf_frame_id + max_frames
        # ref: Tracking.cc:888-889 — c1b requires an idle mapper. The
        # reference's mapper clears a keyframe in 1-2 frames, so "idle"
        # is usually available; this mapper is a multi-frame pipeline
        # (each stage's relay fetch rides under a frame of tracking),
        # and gating on busy starves keyframe admission exactly when a
        # fast turn is draining the tracked set (measured: 8 busy
        # frames after one dense keyframe, tracked 548 -> 38, lost).
        # The pipelined-world equivalent of "idle" is an empty
        # admission queue — mid-flight pipeline stages don't block a
        # new keyframe, the queue<3 backpressure below still bounds
        # pile-up.
        c1b = (
            fid >= self.last_kf_frame_id + cfg.min_frames_between_kf
            and queue_len == 0
        )
        c1c = n_tracked < n_ref * 0.25 or need_close
        c2 = (n_tracked < n_ref * th_ref or need_close) and n_tracked > 15
        # cadence guarantee beyond the reference: when the close-point
        # rule starves (dense maps keep close_tracked above the SIVO 30
        # threshold) force a refresh every max_frames — between-KF
        # feature drift otherwise compounds through the velocity loop.
        # In the reference's sparse-map regime c2 fires first, so this
        # clause is inert there.
        c_cadence = c1a and n_tracked > 15
        # young-map bootstrap (beyond the reference, whose CPU mapper
        # turns keyframes around in 1-2 frames): until 3 keyframes
        # exist, n_ref-based gates are blind (fresh points lack the
        # min_obs observations) while attrition drains the init map —
        # measured as sessions dying before the first cadence keyframe
        # at frame 10. Insert every 3 frames until the covisibility
        # machinery has data.
        c_young = (
            self.map.n_keyframes < 3
            and fid >= self.last_kf_frame_id + 3
            and n_tracked > 15
        )
        # turn-aware cadence (beyond the reference): a sustained yaw
        # sweep rotates the whole FOV out within ~2 seconds, shedding
        # ~25% of tracked points per frame, while the n_ref-ratio
        # gates stay quiet until the map has already starved
        # (measured: no keyframe for 7 mid-corner frames, tracked
        # 723 -> 107). Above ~1.7 deg/frame, restock every 3 frames.
        c_turn = (
            getattr(self, "_rot_rate", 0.0) > 0.03
            and fid >= self.last_kf_frame_id + 3
            and n_tracked > 15
        )
        decision = bool(
            ((c1a or c1b or c1c) and c2) or c_cadence or c_young
            or c_turn
        )
        # backpressure (ref: Tracking.cc:901-916): a busy mapper admits
        # a keyframe only while its queue is short — this is what
        # throttles the reference's close-starved regime (the SIVO 30/70
        # rule otherwise requests a keyframe EVERY frame and mapping
        # becomes frame-rate work)
        if decision and not mapper_idle:
            decision = queue_len < 3
        import os
        if os.environ.get("SIVO_DEBUG_KF"):
            print(
                f"    [kf? f={fid}] tracked={n_tracked:.0f} "
                f"ref={n_ref:.0f} close_t={summary[ts.S_N_CLOSE_TRACKED]:.0f} "
                f"close_f={summary[ts.S_N_CLOSE_FREE]:.0f} "
                f"need_close={need_close} c1a={c1a} c1b={c1b} "
                f"c1c={c1c} c2={c2} cad={c_cadence} q={queue_len} "
                f"idle={mapper_idle} -> {decision}"
            )
        return decision

    def _create_new_keyframe(
        self,
        frame: Frame,
        result: ts.StepResult,
        timestamp: float,
        fid: int,
        stale: bool = False,
        correction: Optional[np.ndarray] = None,
    ) -> None:
        """ref: Tracking.cc:921-1031 CreateNewKeyFrame."""
        xw = result.xw
        if correction is not None:
            # this frame's program ran in the PRE-correction world
            # frame: Tcw_new = Tcw_old @ delta, so world points move by
            # delta^-1 — without this, every point minted here lands
            # metres off after a loop correction
            delta_inv = jnp.asarray(
                np.linalg.inv(correction.astype(np.float64)).astype(
                    np.float32
                )
            )
            from sivo_tpu.geometry import se3

            xw = se3.transform(delta_inv, xw)
        self._insert_keyframe_device(
            frame, result.sel_mask, xw, result.pt_idx,
            timestamp, fid, self.last_pose, self.last_cov,
        )
        if not stale:
            # the carry's pt_idx must include the freshly created
            # points (only valid while the carry still refers to THIS
            # frame's keypoints — in the deep pipeline newer frames
            # have been dispatched and the new points are picked up by
            # the local-map stage instead)
            self.carry = self.carry._replace(pt_idx=self._kf_new_pt_idx)

    def _insert_keyframe_device(
        self,
        frame: Frame,
        sel_mask: jnp.ndarray,
        xw: jnp.ndarray,
        pt_idx: jnp.ndarray,
        timestamp: float,
        fid: int,
        pose: np.ndarray,
        cov: np.ndarray,
    ) -> None:
        """Device map update + host bookkeeping (KF rate, not frame
        rate)."""
        # observation bookkeeping + class-flip kills on device
        sem_class_dev = frame.sem_class
        self.dmap = device_map.observe_points(
            self.dmap, pt_idx, sem_class_dev, frame.desc_u8
        )
        cam_center = -pose[:3, :3].T @ pose[:3, 3]
        self.dmap, new_ids = device_map.add_points(
            self.dmap,
            sel_mask,
            xw,
            frame.desc_u8,
            frame.sem_class,
            frame.level,
            jnp.asarray(cam_center),
            self.cfg.orb.scale_factor,
            self.cfg.orb.n_levels,
        )
        combined_idx = jnp.where(new_ids >= 0, new_ids, pt_idx)
        self._kf_new_pt_idx = combined_idx

        # device keyframe store write (slot known before host add)
        from sivo_tpu.runtime import kf_store as kfs_mod

        kf_slot = self.map.n_keyframes
        self.kf_store = kfs_mod.insert(
            self.kf_store,
            jnp.int32(kf_slot),
            frame.xy, frame.level, frame.angle, frame.desc_u8,
            frame.u_right,
            frame.semantic, frame.sem_class, frame.sem_confidence,
            frame.sem_entropy,
        )

        # host bookkeeping: ONE packed ASYNC transfer (per-buffer
        # fetches cost ~100ms each through the relay; the blocking
        # wait happens in finish_kf_host when the mapper admits the
        # keyframe, by which point the copy has ridden under 1-2
        # frames of tracking)
        from sivo_tpu.utils.fetch import fetch_packed_async

        host_future = fetch_packed_async(
            {
                "xy": frame.xy,
                "level": frame.level,
                "angle": frame.angle,
                "desc_u8": frame.desc_u8,
                "u_right": frame.u_right,
                "depth": frame.depth,
                "sem_class": frame.sem_class,
                "sem_confidence": frame.sem_confidence,
                "sem_entropy": frame.sem_entropy,
                "semantic": frame.semantic,
                "pt_idx": combined_idx,
                "new_ids": new_ids,
                "sel": sel_mask,
                "xw": xw,
            }
        )
        kf_idx = self.map.add_keyframe(pose, cov, None)
        assert kf_idx == kf_slot
        self._kf_host_pending[kf_idx] = (
            host_future, fid, timestamp, pose.copy(),
        )
        self.last_kf_id = kf_idx
        self.last_kf_frame_id = fid
        # refresh the device-side reference-KF arrays
        self._ref_desc_bits = frame.desc_bits
        self._ref_angle = frame.angle
        self._ref_pt_idx = combined_idx
        # local map: the new keyframe's points lead until the exact
        # covisible set is recomputed at host-bookkeeping time
        self._local_ids_dev = _merge_local_ids(
            combined_idx, self._local_ids_dev
        )

    def finish_kf_host(self, kf_idx: int) -> None:
        """Complete a keyframe's host bookkeeping from the async fetch:
        keypoint snapshot (ref: KeyFrame ctor, KeyFrame.cc:31-103),
        point mirroring, observations, spanning tree. Called by the
        mapper at admission (the fetch has typically landed by then)."""
        pending = self._kf_host_pending.pop(kf_idx, None)
        if pending is None:
            return
        host_future, fid, timestamp, pose = pending
        host = host_future.result()
        data = KeyFrameData(
            frame_id=fid,
            timestamp=timestamp,
            xy=np.asarray(host["xy"]),
            level=np.asarray(host["level"]),
            angle=np.asarray(host["angle"]),
            desc_u8=np.asarray(host["desc_u8"]),
            desc_bits=None,  # host bits derived on demand
            u_right=np.asarray(host["u_right"]),
            depth=np.asarray(host["depth"]),
            sem_class=np.asarray(host["sem_class"]),
            sem_confidence=np.asarray(host["sem_confidence"]),
            sem_entropy=np.asarray(host["sem_entropy"]),
            semantic=np.asarray(host["semantic"]),
        )
        self.map.kf_data[kf_idx] = data
        pt_ids_np = np.asarray(host["pt_idx"]).astype(np.int64)
        new_ids_np = np.asarray(host["new_ids"]).astype(np.int64)
        # LOUD capacity overflow: the device add_points program drops
        # writes past capacity (selected keypoint, no id assigned)
        dropped = int(
            (np.asarray(host["sel"]) & (new_ids_np < 0)).sum()
        )
        if dropped:
            self.points_dropped = (
                getattr(self, "points_dropped", 0) + dropped
            )
            print(
                f"[map] WARNING: device point capacity full — dropped "
                f"{dropped} new points at kf {kf_idx}",
                flush=True,
            )
        # mirror new points into the host store
        kp_new = np.where(new_ids_np >= 0)[0]
        if len(kp_new):
            self.map.mirror_points(
                new_ids_np[kp_new],
                np.asarray(host["xw"])[kp_new],
                data.desc_u8[kp_new],
                data.sem_class[kp_new],
                kf_idx,
                kp_new,
                data.level[kp_new],
                cam_center=-pose[:3, :3].T @ pose[:3, 3],
            )
        # observations of previously-tracked points
        kp_obs = np.where((pt_ids_np >= 0) & (new_ids_np < 0))[0]
        if len(kp_obs):
            self.map.add_observations(
                kf_idx, pt_ids_np[kp_obs], kp_obs
            )
        self.map.update_spanning_tree(kf_idx)
        if kf_idx == self.last_kf_id:
            self.refresh_local_map(kf_idx)

    def refresh_local_map(self, kf_idx: int) -> None:
        """Recompute + upload the covisible local-map point ids around
        ``kf_idx`` (ref: Tracking.cc:1087-1235 UpdateLocalMap)."""
        ids = self.map.local_point_ids(kf_idx, ts.LOCAL_CAND)
        if len(ids) == ts.LOCAL_CAND:
            self.local_cap_binds += 1
        pad = np.full(ts.LOCAL_CAND, -1, np.int32)
        pad[: len(ids)] = ids
        self._local_ids_dev = jnp.asarray(pad)

    def refresh_local_map_latest(self) -> None:
        """Refresh around the newest keyframe whose host bookkeeping is
        complete (mapper hooks call this after creating points)."""
        k = self.last_kf_id
        if k >= 0 and self.map.kf_data[k] is not None:
            self.refresh_local_map(k)
