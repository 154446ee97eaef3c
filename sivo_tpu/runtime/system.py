"""System: the top-level session orchestrator.

TPU-native replacement for SIVO::System (ref: src/orbslam/System.cc):
owns the SegNet, frontend statics, map, tracker and local mapper, and
exposes the per-frame ``track_stereo`` API plus shutdown outputs
(trajectory file, keyframes_points counts). The reference's four
threads collapse into host orchestration + device program pipelining.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

import functools

from sivo_tpu.config import SystemConfig
from sivo_tpu.io import trajectory as traj_io
from sivo_tpu.models import segnet as segnet_mod
from sivo_tpu.runtime import compact as compact_mod
from sivo_tpu.runtime import frame as frame_mod
from sivo_tpu.runtime.map_state import MapState
from sivo_tpu.runtime.mapping import LocalMapper
from sivo_tpu.runtime.tracking import Tracker, TrackingState


@jax.jit
def _reloc_bf_program(store, i, has_i, desc_bits, sem, angle):
    """Fused relocalization brute-force match: candidate-KF descriptors
    gathered from the device store vs the lost frame's
    (ref: Tracking.cc:1255 SearchByBoW). One program — the previous
    eager matching call ran ~9 separate relay dispatches per candidate
    on the LOST path, exactly where latency hurts most."""
    from sivo_tpu.ops import matching
    from sivo_tpu.runtime import device_map

    bits_i = device_map.unpack_bits(store.desc_u8[i])
    m = matching.search_brute_force(
        bits_i, has_i, store.angle[i],
        desc_bits, sem, angle,
        nn_ratio=0.75,  # ref: Tracking.cc:1255
    )
    return m.src_for_dst


@dataclass
class System:
    cfg: SystemConfig
    segnet_variant: str = "basic"
    segnet_params: Any = None
    vocabulary: Any = None  # place.vocabulary.Vocabulary for loop closing
    use_viewer: bool = False  # placeholder parity with the reference API
    max_keyframes: int = 2048
    max_points: int = 131072
    # frames kept in flight by the pipelined path (track_frame
    # pipeline=True): each summary fetch gets `depth` frame periods to
    # ride the ~110ms relay RTT; KF decisions/lost detection lag by the
    # same amount (the reference's async LocalMapping tolerates this)
    pipeline_depth: int = 2

    def __post_init__(self):
        self.statics = frame_mod.make_statics(self.cfg)
        self.model = segnet_mod.SegNet(
            variant=self.segnet_variant,
            num_classes=self.cfg.semantic.num_classes,
            dtype=jnp.dtype(self.cfg.semantic.cnn_dtype),
        )
        if self.segnet_params is None:
            self.segnet_params = segnet_mod.init_params(
                self.model,
                jax.random.key(0),
                self.cfg.camera.height,
                self.cfg.camera.width,
            )
        self.map = MapState(
            max_keyframes=self.max_keyframes,
            max_points=self.max_points,
            kp_capacity=self.cfg.orb.max_keypoints,
            n_levels=self.cfg.orb.n_levels,
            scale_factor=self.cfg.orb.scale_factor,
        )
        from sivo_tpu.utils.profiling import StageTimer

        self.timer = StageTimer()
        self.tracker = Tracker(cfg=self.cfg, map=self.map)
        self.tracker.timer = self.timer
        self.mapper = LocalMapper(
            cfg=self.cfg, map=self.map, cam=self.tracker.cam,
            timer=self.timer,
        )
        self.tracker.mapper = self.mapper  # KF-decision backpressure
        self.mapper.on_kf_culled = self._on_kf_culled
        self.mapper.kf_protected = self._protected_kfs
        self.loop_closer = None
        if self.vocabulary is not None:
            from sivo_tpu.runtime.loopclosing import LoopCloser

            self.loop_closer = LoopCloser(
                cfg=self.cfg,
                map=self.map,
                cam=self.tracker.cam,
                voc=self.vocabulary,
            )
            self._wire_loop_closer()
        self._rng = jax.random.key(42)
        self._frame_no = 0

    def _wire_loop_closer(self) -> None:
        self.loop_closer.timer = self.timer
        self.mapper.on_kf_culled = self._on_kf_culled
        self.mapper.kf_protected = self._protected_kfs

    def _protected_kfs(self) -> set:
        """Keyframes the culler must not erase: loop-edge holders
        (ref: KeyFrame.cc:459-476) and the tracker's CURRENT reference
        keyframe — culling it would freeze the pose every subsequent
        frame record chains through while corrections keep moving the
        live map (the reference's culler only sees covisible neighbors
        of the newest keyframe, which the tracking reference is)."""
        prot = {self.tracker.last_kf_id}
        if self.loop_closer is not None:
            prot |= {
                k
                for i, j, _ in self.loop_closer.loop_edges
                for k in (i, j)
            }
        return prot

    def _on_kf_culled(self, k: int) -> None:
        """A culled keyframe's pose freezes while BA / loop corrections
        keep moving live keyframes — re-express trajectory records
        referencing it through its nearest live ancestor NOW, while the
        poses are still mutually consistent (the reference freezes mTcp
        at SetBadFlag time and walks the chain at save time,
        KeyFrame.cc:552-563 + System.cc:303-311; measured here:
        aggressive culling under sparse sequential selection left
        stale-ref records that re-chained 0.057 m drift into 0.45 m)."""
        m = self.map
        a = k
        hops = 0
        while a > 0 and not m.kf_valid[a] and hops <= m.n_keyframes:
            p = int(m.kf_parent[a])
            a = p if 0 <= p < a else a - 1
            hops += 1
        if not (m.kf_valid[a] or a == 0):
            a = 0
        delta = m.kf_pose[k].astype(np.float64) @ np.linalg.inv(
            m.kf_pose[a].astype(np.float64)
        )
        for r in self.tracker.trajectory:
            if r.ref_kf == k:
                r.rel_pose = (
                    r.rel_pose.astype(np.float64) @ delta
                ).astype(np.float32)
                r.ref_kf = int(a)
        if self.loop_closer is not None:
            self.loop_closer.on_keyframe_culled(k)

    def attach_vocabulary(self, voc) -> None:
        """Enable loop closing + relocalization with a vocabulary built
        after construction (e.g. trained on this session's own
        descriptors — the reference instead loads a pre-trained file,
        System.cc:75-82)."""
        from sivo_tpu.runtime.loopclosing import LoopCloser

        self.vocabulary = voc
        self.loop_closer = LoopCloser(
            cfg=self.cfg, map=self.map, cam=self.tracker.cam, voc=voc,
        )
        self._wire_loop_closer()

    # -- per-frame API --------------------------------------------------------

    def track_stereo(
        self,
        img_left_color: np.ndarray,  # (H, W, 3) BGR 0..255
        img_right_gray: np.ndarray,  # (H, W)
        timestamp: float,
        sem_override: tuple | None = None,
    ) -> Optional[np.ndarray]:
        """ref: System.cc:172-218 TrackStereo (synchronous API: the
        returned pose is THIS frame's)."""
        self._rng, key = jax.random.split(self._rng)
        f = frame_mod.build_frame(
            self.model,
            self.segnet_params,
            self.statics,
            jnp.asarray(img_left_color),  # uint8 ok; promoted on device
            jnp.asarray(img_right_gray),
            key,
            sem_override=sem_override,
        )
        return self.track_frame(f, timestamp)

    def track_frame(
        self, f, timestamp: float, pipeline: bool = False,
        pre_retire=None,
    ) -> Optional[np.ndarray]:
        """Track a pre-built Frame.

        ``pipeline=True`` (the CLI/bench hot loop) runs
        ``pipeline_depth`` frames deep: the current frame's program is
        dispatched and the frame from `depth` calls ago is retired and
        its pose returned — that summary fetch has been in flight for
        `depth` frame periods, so the ~110ms relay round-trip is fully
        hidden. Keyframe-rate work (mapping, BA, loop closing) advances
        as an async pipeline between dispatch and retire — the
        deterministic equivalent of the reference's
        LocalMapping/LoopClosing threads (SURVEY §2.3 item 1).

        ``pipeline=False`` keeps the reference's synchronous semantics
        (returns this frame's pose).
        """
        from sivo_tpu.runtime.tracking import TrackingState

        with self.timer.stage("track"):
            if self.tracker.state in (
                TrackingState.NO_IMAGES_YET,
                TrackingState.NOT_INITIALIZED,
            ):
                while self.tracker.inflight_count:
                    self._retire_one()
                pose = self.tracker.track_init(f, timestamp)
                if self.tracker.kf_created is not None:
                    self._on_keyframe(self.tracker.kf_created)
                return pose
            if compact_mod.should_compact(self):
                self._compact()
            with self.timer.stage("track.dispatch"):
                self.tracker.dispatch(f, timestamp)
            self._advance_mapping()
            # device-queue ordering: callers prefetching the NEXT
            # frame's frontend must enqueue it AFTER this frame's
            # tracking program — a frontend dispatched first delays the
            # tracking summary (the host-policy gate) by its full ~66 ms
            # device time (measured r4: wait median 74 ms at depth 3,
            # ~the frontend cost + relay jitter). The hook runs here so
            # its host-side work also overlaps the retire wait below.
            if pre_retire is not None:
                pre_retire()
            if pipeline:
                # retire only once the queue exceeds the pipeline
                # depth: the oldest summary has then had `depth` full
                # frame periods for its ~110ms relay round-trip to
                # land, so the wait here is ~0.
                # CRISIS MODE: when the tracked count is collapsing,
                # the depth-2 lag is fatal — a keyframe decided now
                # reaches the device map two frames late, after the
                # map has starved (measured: tracked 177 -> 0 with the
                # restock landing one frame after the loss). Below the
                # threshold, retire synchronously: each frame costs a
                # relay round-trip, but keyframes land immediately.
                # The absolute floor OR a fast decay (the decay fires
                # ~2 frames before the floor, exactly the pipeline lag
                # being bridged). Localization mode never inserts
                # keyframes, so there is nothing for a synchronous
                # retire to deliver sooner — stay deep.
                from sivo_tpu.runtime import track_step as ts

                s = getattr(self.tracker, "last_summary", None)
                trk = float(s[ts.S_N_TRACKED]) if s is not None else 0.0
                prev_trk = getattr(self, "_prev_tracked", 0.0)
                self._prev_tracked = trk
                # crisis applies in localization mode too: keyframe
                # delivery is moot there, but synchronous retire also
                # FRESHENS the velocity/pose feedback — with depth-3
                # lag the constant-velocity prediction compounds 3
                # frames of yaw error mid-corner, which is exactly
                # where replay runs lose tracking (measured: 2x 5-frame
                # loss bursts at the corners of the localization
                # replay, none elsewhere)
                # absolute floor scales with the selection regime:
                # sequential SIVO selection tracks ~1/5 the points of
                # batch mode by design (the paper's sparsity), so the
                # batch-tuned 256 floor would keep it in permanent
                # crisis (measured: 175/190 crisis frames)
                floor = (
                    96
                    if self.cfg.semantic.sequential_selection
                    else 256
                )
                # localization mode: only the COLLAPSE trigger — the
                # absolute floor reflects map-supply health, which a
                # frozen map cannot change; staying under it through a
                # sparse stretch would pin the replay synchronous
                # (measured: tracking_only 4.2 -> 2.9 FPS) without
                # preventing any loss the collapse trigger misses
                collapse = prev_trk > 0 and trk < 0.78 * prev_trk
                # trk < 32: a sustained loss has prev_trk == 0, so the
                # collapse trigger fires only on the transition frame;
                # staying synchronous through the lost stretch gives
                # relocalization per-frame feedback instead of
                # pipeline-depth-stale poses
                crisis = s is not None and (
                    collapse
                    or trk < 32
                    or (trk < floor and not self.tracker.only_tracking)
                )
                if crisis:
                    self.crisis_frames = (
                        getattr(self, "crisis_frames", 0) + 1
                    )
                    # diagnosis trail (verdict r3 #6): which trigger,
                    # at which frame, from what supply level
                    cause = (
                        "collapse" if collapse
                        else ("lost" if trk < 32 else "floor")
                    )
                    if not hasattr(self, "crisis_log"):
                        self.crisis_log = []
                    if len(self.crisis_log) < 256:
                        # attribute the entry to the frame whose
                        # summary triggered it (retired up to
                        # pipeline_depth before the frame just
                        # dispatched, ADVICE r4)
                        self.crisis_log.append(
                            (getattr(self.tracker, "last_summary_fid",
                                     self.tracker.frame_count - 1),
                             cause, int(trk), int(prev_trk))
                        )
                depth = 0 if crisis else self.pipeline_depth
                pose_prev = None
                while self.tracker.inflight_count > depth:
                    pose_prev = self._retire_one()
                return pose_prev
            return self._retire_one()

    def _retire_one(self) -> Optional[np.ndarray]:
        """Retire the in-flight frame (if any): summary-driven policy,
        keyframe admission to the mapping pipeline, relocalization."""
        tk = self.tracker.take_inflight()
        if tk is None:
            return None
        # reloc gate (ref: Tracking.cc:271-272): the reference
        # relocalizes only frames that ENTER Track() already LOST — the
        # frame that just failed is recorded lost and tracking retries
        # normally first. Relocalizing on every failed frame silently
        # stitches map revisits, masking loop-closure events.
        was_lost = self.tracker.state == TrackingState.LOST
        with self.timer.stage("track.retire"):
            pose = self.tracker.retire(tk)
        if (
            self.tracker.kf_created is not None
            and not self.tracker.only_tracking
        ):
            self._on_keyframe(self.tracker.kf_created)
        if pose is None and was_lost:
            pose = self._relocalize(tk.frame, tk.timestamp)
        return pose

    def _on_keyframe(self, kf_idx: int) -> None:
        with self.timer.stage("mapping"):
            done = self.mapper.on_keyframe(self.tracker, kf_idx)
        self._run_loop_closer(done)

    def _advance_mapping(self, block: bool = False) -> None:
        with self.timer.stage("map.advance"):
            done = self.mapper.advance(self.tracker, block=block)
        self._run_loop_closer(done)

    def _run_loop_closer(self, kf_indices, block: bool = False) -> None:
        """Loop closing for keyframes whose mapping completed: dispatch
        the BoW quantization now, run detection when its fetch lands
        (ref: LocalMapping.cc:90 InsertKeyFrame -> the asynchronous
        LoopClosing::Run queue)."""
        if self.loop_closer is None:
            return
        with self.timer.stage("loop_closing"):
            for kf_idx in kf_indices:
                self.loop_closer.begin_keyframe(self.tracker, kf_idx)
            self.loop_closer.poll(self.tracker, block=block)

    def flush(self) -> Optional[np.ndarray]:
        """Complete all in-flight work: retire the pipelined frames and
        drain the mapping pipeline (call before reading the map or
        shutting down). Returns the last retired pose, if any."""
        pose = None
        while self.tracker.inflight_count:
            p = self._retire_one()
            pose = p if p is not None else pose
        done = self.mapper.drain(self.tracker)
        self._run_loop_closer(done, block=True)
        # keyframes whose host bookkeeping fetch never got admitted by
        # the mapper would leave map.kf_data[idx] = None — a latent
        # AttributeError for any later consumer (save_map, ba_build)
        for kf_idx in list(self.tracker._kf_host_pending):
            self.tracker.finish_kf_host(kf_idx)
        return pose

    def _compact(self) -> None:
        """Reclaim culled point/keyframe slots (the reference frees
        heap objects outright, MapPoint.cc:201-223 / Map.cc:103-121;
        our SoA world slides live entries down instead — see
        runtime/compact.py). Requires drained pipelines, so it flushes
        first; triggered at most every few hundred keyframes."""
        with self.timer.stage("compact"):
            self.flush()
            lc = self.loop_closer
            if lc is not None:
                # an in-flight GBA holds pre-compaction ids
                lc.finish_gba(self.tracker)
            self.peak_point_slots = max(
                getattr(self, "peak_point_slots", 0),
                self.map.n_points,
            )
            self.peak_kf_slots = max(
                getattr(self, "peak_kf_slots", 0),
                self.map.n_keyframes,
            )
            stats = compact_mod.compact_map(self)
        self.compactions = getattr(self, "compactions", 0) + 1
        self.compact_freed = stats

    def activate_localization_mode(self) -> None:
        """Track against the frozen map without inserting keyframes
        (ref: System.cc:220-231 ActivateLocalizationMode). Combine with
        io.serialization.load_map for map reuse — a capability the
        reference only offers in-memory (README.md:130-135)."""
        self.flush()
        self.tracker.only_tracking = True

    def deactivate_localization_mode(self) -> None:
        """ref: System.cc:233-243."""
        self.tracker.only_tracking = False

    def seed_localization_pose(
        self, pose_tcw: np.ndarray, ref_kf: int
    ) -> None:
        """Re-seed tracking at a known pose + reference keyframe.

        For localization replays that JUMP in time (the bench re-runs
        a window of past frames against the frozen map): tracking from
        the final pose against a far-away image is a kidnapped-robot
        scenario with no reference analog — the reference's
        localization mode always continues from the current pose
        (System.cc:220-231). Clears the velocity model and re-anchors
        the reference keyframe + local map, like relocalization does."""
        from sivo_tpu.runtime import device_map as dm_mod

        tr = self.tracker
        ref_kf = int(ref_kf)
        if not self.map.kf_valid[ref_kf]:
            valid = np.where(
                self.map.kf_valid[: self.map.n_keyframes]
            )[0]
            c = -pose_tcw[:3, :3].T @ pose_tcw[:3, 3]
            centers = np.stack(
                [self.map.kf_camera_center(int(k)) for k in valid]
            )
            ref_kf = int(
                valid[np.argmin(((centers - c) ** 2).sum(1))]
            )
        tr.last_kf_id = ref_kf
        tr._ref_desc_bits = dm_mod.unpack_bits(
            tr.kf_store.desc_u8[ref_kf]
        )
        tr._ref_angle = tr.kf_store.angle[ref_kf]
        pts = self.mapper._kf_point_ids(ref_kf)
        tr._ref_pt_idx = jnp.asarray(pts.astype(np.int32))
        tr.refresh_local_map(ref_kf)
        tr.carry = tr.carry._replace(
            pose=jnp.asarray(pose_tcw.astype(np.float32)),
            has_velocity=jnp.asarray(False),
        )

    def _relocalize(self, f, timestamp: float) -> Optional[np.ndarray]:
        """Relocalization from the keyframe database
        (ref: Tracking.cc:1237-1396): BoW candidates -> brute-force
        matching -> batched EPnP RANSAC -> pose acceptance; full system
        reset when lost with <= 5 keyframes (ref: Tracking.cc:417-425).
        """
        from sivo_tpu.runtime.tracking import TrackingState

        if self.map.n_keyframes <= 5:
            # the reference resets the whole session in this state
            self.reset()
            return None
        if self.loop_closer is None:
            return None
        self.reloc_attempts = getattr(self, "reloc_attempts", 0) + 1
        import os

        dbg = os.environ.get("SIVO_DEBUG_RELOC")

        import jax.numpy as jnp
        from sivo_tpu.place import pnp as pnp_mod
        from sivo_tpu.place import vocabulary as voc_mod
        from sivo_tpu.optim import pose_lm

        lc = self.loop_closer
        words, _ = voc_mod.transform(
            lc.voc,
            f.desc_bits,
            f.semantic,
        )
        bow = voc_mod.bow_vector(lc.voc, words)
        cands = lc.db.detect_relocalization_candidates(
            bow, lc._covis_groups()
        )
        if dbg:
            print(f"  [reloc] candidates={cands[:5]}", flush=True)
        for cand in cands[:5]:
            d = self.map.kf_data[cand]
            pts = lc._kf_point_ids(cand)
            src = np.asarray(jax.device_get(_reloc_bf_program(
                self.tracker.kf_store,
                jnp.int32(cand),
                jnp.asarray(pts >= 0),
                f.desc_bits, f.semantic, f.angle,
            )))
            hit = src >= 0
            if dbg:
                print(
                    f"  [reloc] cand={cand} matches={int(hit.sum())}",
                    flush=True,
                )
            if hit.sum() < 15:  # ref: Tracking.cc:1283
                continue
            pt_ids = np.full(f.capacity, -1, np.int64)
            pt_ids[hit] = pts[src[hit]]
            has = pt_ids >= 0
            pw = np.zeros((f.capacity, 3), np.float32)
            pw[has] = self.map.pt_pos[pt_ids[has]]
            sf = self.cfg.orb.scale_factor
            lvl = np.asarray(jax.device_get(f.level))
            res = pnp_mod.ransac_pnp(
                jnp.asarray(pw),
                f.xy,
                jnp.asarray(sf ** (2.0 * lvl.astype(np.float32))),
                jnp.asarray(has),
                jax.random.key(self.tracker.frame_count),
                self.tracker.cam,
            )
            if not bool(jax.device_get(res.ok)):
                if dbg:
                    print("  [reloc] pnp rejected", flush=True)
                continue
            # projection round (ref: Tracking.cc:1342-1385): grow the
            # match set by projecting the candidate's covisible local
            # map at the PnP pose — brute-force matches alone rarely
            # reach the 50-inlier accept (measured 124 failed attempts
            # in one run without this)
            from sivo_tpu.runtime import track_step as ts_mod

            ids = self.map.local_point_ids(cand, ts_mod.LOCAL_CAND)
            pad = np.full(ts_mod.LOCAL_CAND, -1, np.int32)
            pad[: len(ids)] = ids
            tr = self.tracker
            proj_idx = np.asarray(
                jax.device_get(
                    self._reloc_project_program(
                        tr.dmap, jnp.asarray(pad), res.pose,
                        f.xy, f.level, f.desc_bits, f.u_right,
                        f.semantic,
                        jnp.float32(10.0),  # ref window th=10
                        tr.cam, self.cfg.orb.scale_factor,
                        self.cfg.orb.n_levels,
                    )
                )
            )
            merged = pt_ids.copy()
            fill = (merged < 0) & (proj_idx >= 0)
            merged[fill] = proj_idx[fill]
            pt_ids = merged
            has = pt_ids >= 0
            pw = np.zeros((f.capacity, 3), np.float32)
            pw[has] = self.map.pt_pos[pt_ids[has]]
            if dbg:
                print(
                    f"  [reloc] +projection matches={int(has.sum())}",
                    flush=True,
                )
            # final polish with stereo observations + accept at >= 50
            # inliers (ref: Tracking.cc:1342-1385)
            obs = pose_lm.PoseObservations(
                points=jnp.asarray(pw),
                uvr=jnp.concatenate(
                    [f.xy, f.u_right[:, None]], axis=-1
                ),
                sigma2=jnp.asarray(
                    sf ** (2.0 * lvl.astype(np.float32))
                ),
                is_stereo=f.u_right > 0,
                valid=jnp.asarray(has),
            )
            final = pose_lm.optimize_pose(
                res.pose, obs, self.tracker.cam
            )
            n_in = int(jax.device_get(final.n_inliers))
            if dbg:
                print(f"  [reloc] polish inliers={n_in}", flush=True)
            if 15 <= n_in < 50:
                # fine round (ref: Tracking.cc:1360-1385): a second,
                # NARROW projection pass (window th=3) around the
                # polished pose — the coarse th=10 window mismatches
                # on repetitive texture exactly when the PnP pose is
                # already close; the tight window recovers the true
                # correspondences and a final optimization re-counts.
                proj2 = np.asarray(
                    jax.device_get(
                        self._reloc_project_program(
                            tr.dmap, jnp.asarray(pad), final.pose,
                            f.xy, f.level, f.desc_bits, f.u_right,
                            f.semantic,
                            jnp.float32(3.0),  # ref fine window th=3
                            tr.cam, self.cfg.orb.scale_factor,
                            self.cfg.orb.n_levels,
                        )
                    )
                )
                merged2 = pt_ids.copy()
                fill2 = (merged2 < 0) & (proj2 >= 0)
                merged2[fill2] = proj2[fill2]
                pt_ids = merged2
                has = pt_ids >= 0
                pw = np.zeros((f.capacity, 3), np.float32)
                pw[has] = self.map.pt_pos[pt_ids[has]]
                obs = obs._replace(
                    points=jnp.asarray(pw),
                    valid=jnp.asarray(has),
                )
                final = pose_lm.optimize_pose(
                    final.pose, obs, self.tracker.cam
                )
                n_in = int(jax.device_get(final.n_inliers))
                if dbg:
                    print(
                        f"  [reloc] fine-round inliers={n_in}",
                        flush=True,
                    )
            if n_in < 50:
                continue
            # success: rebuild the tracker carry at the new pose
            self.reloc_successes = getattr(self, "reloc_successes", 0) + 1
            pose = np.asarray(jax.device_get(final.pose))
            cov = np.asarray(jax.device_get(final.covariance))
            inl = np.asarray(jax.device_get(final.inliers))
            pt_ids[~inl] = -1
            tr = self.tracker
            tr.last_pose = pose
            tr.last_cov = cov
            tr.state = TrackingState.OK
            # re-anchor the reference keyframe + local map at the
            # reloc site (the pre-loss reference KF may be far away,
            # leaving the brute-force anchor and the covisible local
            # map matching against the wrong neighborhood)
            tr.last_kf_id = cand
            tr._ref_desc_bits = lc._kf_bits(cand, tr)
            tr._ref_angle = tr.kf_store.angle[cand]
            tr._ref_pt_idx = jnp.asarray(pts.astype(np.int32))
            tr.refresh_local_map(cand)
            tr.carry = tr.carry._replace(
                pose=jnp.asarray(pose),
                cov=jnp.asarray(cov),
                has_velocity=jnp.asarray(False),
                pt_idx=jnp.asarray(pt_ids.astype(np.int32)),
                desc_bits=f.desc_bits,
                level=f.level,
                angle=f.angle,
                valid=f.valid,
            )
            if tr.trajectory:
                tr.trajectory[-1].pose = pose
                tr.trajectory[-1].rel_pose = tr._rel_pose(pose)
                tr.trajectory[-1].lost = False
            return pose
        return None

    @staticmethod
    @functools.partial(
        jax.jit, static_argnames=("cam", "scale_factor", "n_levels")
    )
    def _reloc_project_program(
        dmap,
        local_ids,  # (LOCAL_CAND,) int32
        pose,  # (4, 4) PnP estimate
        frame_xy, frame_level, frame_desc_bits, frame_u_right,
        frame_sem,
        th,  # () search radius multiplier
        cam, scale_factor: float, n_levels: int,
    ):
        """Relocalization projection round (ref: Tracking.cc:1342-1385
        — SearchByProjection around the PnP pose to grow the match set
        toward the 50-inlier accept; brute-force matches alone rarely
        reach it). Returns (N,) point id per keypoint or -1."""
        from sivo_tpu.geometry.projection import (
            frustum_check, predict_scale,
        )
        from sivo_tpu.ops import matching
        from sivo_tpu.runtime.device_map import unpack_bits

        scales = scale_factor ** jnp.arange(
            n_levels, dtype=jnp.float32
        )
        cand = jnp.clip(local_ids, 0, dmap.capacity - 1)
        visible, uvr, dist, view_cos = frustum_check(
            cam, pose, dmap.pt_pos[cand], dmap.pt_normal[cand],
            dmap.pt_min_dist[cand], dmap.pt_max_dist[cand],
        )
        cand_visible = (
            visible & (local_ids >= 0) & dmap.pt_valid[cand]
        )
        lvl = predict_scale(
            dist, dmap.pt_max_dist[cand] / 1.2, scale_factor, n_levels
        )
        mres = matching.search_by_projection_points(
            unpack_bits(dmap.pt_desc_u8[cand]), cand_visible, uvr,
            lvl, view_cos,
            frame_xy, frame_level, frame_desc_bits, frame_u_right,
            frame_sem, scales, th=th, nn_ratio=0.8,
        )
        hit = mres.src_for_dst >= 0
        return jnp.where(
            hit,
            cand[
                jnp.clip(mres.src_for_dst, 0, cand.shape[0] - 1)
            ].astype(jnp.int32),
            -1,
        )

    def reset(self) -> None:
        """Full session reset (ref: Tracking.cc:1398-1435 +
        System::Reset)."""
        from sivo_tpu.runtime.tracking import Tracker, TrackingState

        self.n_resets = getattr(self, "n_resets", 0) + 1
        self.map.clear()
        old_count = self.tracker.frame_count
        old_raw_lost = getattr(self.tracker, "raw_lost", 0)
        old_raw_lost_frames = getattr(self.tracker, "raw_lost_frames", [])
        self.tracker = Tracker(cfg=self.cfg, map=self.map)
        # frame ids stay sequence-global across resets so trajectory
        # records align with ground truth by frame_id (a fresh counter
        # would silently compare the post-reset segment against the
        # START of ground truth)
        self.tracker.frame_count = old_count
        self.tracker.raw_lost = old_raw_lost
        self.tracker.raw_lost_frames = old_raw_lost_frames
        self.tracker.timer = self.timer
        self.mapper = LocalMapper(
            cfg=self.cfg, map=self.map, cam=self.tracker.cam,
            timer=self.timer,
        )
        self.tracker.mapper = self.mapper
        if self.loop_closer is not None:
            from sivo_tpu.runtime.loopclosing import LoopCloser

            self.loop_closer = LoopCloser(
                cfg=self.cfg, map=self.map,
                cam=self.tracker.cam, voc=self.vocabulary,
            )
            self._wire_loop_closer()

    # -- shutdown / outputs ----------------------------------------------------

    @property
    def state(self) -> TrackingState:
        return self.tracker.state

    def n_lost(self) -> int:
        return sum(1 for r in self.tracker.trajectory if r.lost)

    def frame_poses(self) -> np.ndarray:
        """Final per-frame poses re-chained through (BA-corrected)
        reference keyframes (ref: System.cc:303-321)."""
        self.flush()
        recs = self.tracker.trajectory
        if not recs:
            return np.zeros((0, 4, 4), np.float32)
        rel = [r.rel_pose for r in recs]
        refs = [max(r.ref_kf, 0) for r in recs]
        return traj_io.chained_frame_poses(
            rel, refs, self.map.kf_pose[: self.map.n_keyframes]
        )

    def save_trajectory_kitti(self, path: str) -> None:
        """ref: System.cc:274-336."""
        traj_io.save_trajectory_kitti(path, self.frame_poses())

    def shutdown(self, counts_path: str = "keyframes_points.txt") -> None:
        """ref: System.cc:245-272."""
        self.flush()
        n_pts = int(self.map.pt_valid[: self.map.n_points].sum())
        traj_io.save_keyframes_points(
            counts_path, self.map.n_keyframes, n_pts
        )
