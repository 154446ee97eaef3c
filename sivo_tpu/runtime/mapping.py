"""Local mapping: the per-keyframe refinement pipeline.

TPU-native replacement for the LocalMapping thread
(ref: src/orbslam/LocalMapping.cc): point culling, local bundle
adjustment, and observation erasure, run synchronously at keyframe rate
(the reference's thread interleaving becomes JAX async dispatch — the
BA program can execute on-device while the host prepares the next
frame).

Pipeline per keyframe (ref: LocalMapping.cc:55-114): point culling,
epipolar triangulation of new points (CreateNewMapPoints + the SIVO
CheckSemantics gate), SearchInNeighbors duplicate-point fusion
(ref: LocalMapping.cc:547-637), local BA, keyframe culling.
"""

from __future__ import annotations

import functools

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from sivo_tpu.config import SystemConfig
from sivo_tpu.geometry.projection import CameraParams
from sivo_tpu.optim import local_ba
from sivo_tpu.runtime import device_map
from sivo_tpu.runtime.map_state import MapState

import os as _os

# Local-BA window caps. The reference's window is data-sized
# (Optimizer.cc:496-559, uncapped); fixed shapes need caps, and the r4
# endurance run showed ba_kfs/ba_obs binding on ~10% of keyframes at
# 448-KF scale. Env-overridable for cap A/B runs (VERDICT r4 #7).
MAX_BA_KF = int(_os.environ.get("SIVO_MAX_BA_KF", "16"))
MAX_BA_PT = int(
    _os.environ.get("SIVO_MAX_BA_PT", "4096")
)  # covisible-window points (recent-first beyond this)
MAX_BA_OBS = int(_os.environ.get("SIVO_MAX_BA_OBS", "8192"))
FUSE_NEIGHBORS = 10


def _fuse_program_impl(
    pt_pos, pt_normal, pt_mind, pt_maxd, pt_desc_u8, pt_alive,
    nb_pose,  # (B, 4, 4)
    nb_xy, nb_level, nb_desc_u8, nb_ur, nb_sem,  # (B, N, ...)
    cam, scale_factor: float, n_levels: int,
):
    """All fusion neighbors in ONE program (ref: ORBmatcher Fuse per
    neighbor, LocalMapping.cc:547-637). Returns (B, N_kp) src index."""
    from sivo_tpu.geometry.projection import frustum_check, predict_scale
    from sivo_tpu.ops import matching
    from sivo_tpu.runtime.device_map import unpack_bits

    scales = scale_factor ** jnp.arange(n_levels, dtype=jnp.float32)
    pt_bits = unpack_bits(pt_desc_u8)

    def one(pose, xy, level, desc_u8, ur, sem):
        visible, uvr, dist, view_cos = frustum_check(
            cam, pose, pt_pos, pt_normal, pt_mind, pt_maxd
        )
        lvl = predict_scale(
            dist, pt_maxd / 1.2, scale_factor, n_levels
        )
        res = matching.search_by_projection_points(
            pt_bits, visible & pt_alive, uvr, lvl, view_cos,
            xy, level, unpack_bits(desc_u8), ur, sem,
            scales, th=3.0, nn_ratio=1.0,
            accept_th=matching.TH_LOW,
        )
        return res.src_for_dst

    return jax.vmap(one)(
        nb_pose, nb_xy, nb_level, nb_desc_u8, nb_ur, nb_sem
    )


@functools.partial(jax.jit, static_argnames=("window",))
def _cull_window_program(found, visible, valid, lo, window: int):
    """Slice the recent-point counter window in one dispatch."""
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, lo, window)
    return sl(found), sl(visible), sl(valid)


@functools.partial(
    jax.jit, static_argnames=("cam", "scale_factor", "n_levels")
)
def _tri_gather_program(
    store,  # DeviceKFStore
    kf_slot,  # () int32 the new keyframe
    T1w,  # (4, 4)
    host_free1,  # (N,) bool — kp1 has no map point (host obs table)
    cov1,  # (6, 6)
    nb_idx,  # (B,) int32 neighbor slots
    t2,  # (B, 4, 4)
    host_free2,  # (B, N) bool
    nb_valid,  # (B,) bool
    th_confidence, th_entropy,
    cam, scale_factor: float, n_levels: int,
):
    """Batched epipolar triangulation with keyframe arrays gathered
    from the device store (ref: LocalMapping.cc:198-472; see
    ops.triangulation.triangulate_neighbors for the math)."""
    from sivo_tpu.ops import triangulation as tri
    from sivo_tpu.runtime import kf_store as kfs_mod

    g1 = jax.tree.map(lambda f: f[kf_slot], store)
    g2 = kfs_mod.gather(store, nb_idx)
    return tri.triangulate_neighbors(
        T1w, g1.xy, g1.level, g1.desc_u8,
        host_free1 & g1.semantic, g1.u_right,
        g1.sem_class, g1.sem_confidence, g1.sem_entropy, cov1,
        t2, g2.xy, g2.level, g2.desc_u8,
        host_free2 & g2.semantic, g2.sem_class, nb_valid,
        th_confidence, th_entropy, cam, scale_factor, n_levels,
    )


@functools.partial(
    jax.jit, static_argnames=("cam", "scale_factor", "n_levels")
)
def _fuse_gather_program(
    dmap,  # DeviceMap (point mirror)
    store,  # DeviceKFStore (keyframe mirror)
    pt_ids,  # (P_CAP,) int32 candidate point ids
    pt_alive,  # (P_CAP,) bool host-side liveness of the candidates
    nb_idx,  # (B,) int32 neighbor keyframe slots
    nb_pose,  # (B, 4, 4) poses (host truth: BA rewrites them)
    nb_live,  # (B,) bool padding mask
    cam, scale_factor: float, n_levels: int,
):
    """Fusion with all big inputs gathered on device (see
    ``_fuse_program`` for the matching semantics; this variant ships
    only indices + poses through the relay)."""
    from sivo_tpu.runtime import kf_store as kfs_mod

    g = kfs_mod.gather(store, nb_idx)
    sem = g.semantic & nb_live[:, None]
    return _fuse_program_impl(
        dmap.pt_pos[pt_ids],
        dmap.pt_normal[pt_ids],
        dmap.pt_min_dist[pt_ids],
        dmap.pt_max_dist[pt_ids],
        dmap.pt_desc_u8[pt_ids],
        pt_alive & dmap.pt_valid[pt_ids],
        nb_pose, g.xy, g.level, g.desc_u8, g.u_right, sem,
        cam, scale_factor, n_levels,
    )


@dataclass
class LocalMapper:
    """Two-stage pipelined mapper.

    The reference runs this on its own thread (LocalMapping::Run,
    LocalMapping.cc:55-114) so BA overlaps tracking. Here the same
    overlap is deterministic: each keyframe advances through two
    pipeline stages — phase 1 (cull counters + triangulation + fusion,
    one packed async fetch) and BA (dispatched after phase 1 applies,
    fetched asynchronously) — and ``advance()`` is called once per
    tracked frame, applying whichever stage's fetch has landed. The
    device solve and the relay round trips ride under the next frames'
    tracking instead of stalling the frame loop.
    """

    cfg: SystemConfig
    map: MapState
    cam: CameraParams
    timer: object = None  # optional StageTimer

    def __post_init__(self):
        self._phase1 = None
        self._ba = None
        # pending keyframes not yet admitted to phase 1 (the
        # reference's mlNewKeyFrames queue, LocalMapping.cc:116-125);
        # the tracker's keyframe decision reads queue_len for
        # backpressure (ref: Tracking.cc:905-911 KeyframesInQueue)
        self._queue: list[int] = []
        # notification hook: culled keyframes must leave the loop
        # closer's inverted file (ref: KeyFrameDatabase.cc:49-65 erase
        # via KeyFrame::SetBadFlag)
        self.on_kf_culled = None
        # () -> set[int]: keyframes that must not be culled (loop-edge
        # holders, ref: KeyFrame.cc:459-476)
        self.kf_protected = None
        # cap-bind counters: incremented whenever a fixed capacity
        # truncates real work (surfaced in the bench JSON detail)
        self.cap_binds: dict[str, int] = {}

    @property
    def queue_len(self) -> int:
        return len(self._queue)

    def _stage(self, name: str):
        import contextlib

        if self.timer is None:
            return contextlib.nullcontext()
        return self.timer.stage(name)

    @property
    def busy(self) -> bool:
        return (
            self._phase1 is not None
            or self._ba is not None
            or bool(self._queue)
        )

    def process_keyframe(self, tracker, kf_idx: int) -> list[int]:
        """Synchronous mapping for one keyframe (tests / simple
        drivers): enqueue + drain."""
        done = self.on_keyframe(tracker, kf_idx)
        return done + self.drain(tracker)

    def on_keyframe(self, tracker, kf_idx: int) -> list[int]:
        """Enqueue a freshly inserted keyframe (the reference's
        InsertKeyFrame, LocalMapping.cc:116-120 — never blocks the
        tracking thread). Admission happens on the NEXT frame's
        ``advance``: admitting here would block on the keyframe's own
        host-bookkeeping fetch (dispatched at insertion moments ago,
        ~full relay RTT unspent); one frame later it has landed."""
        self._queue.append(kf_idx)
        return []

    def _admit(self, tracker) -> None:
        """Move the oldest queued keyframe into phase 1. The keyframe's
        host bookkeeping (the async keypoint fetch started at insertion)
        is completed first — phase 1 neighbor selection needs the
        observation table."""
        from sivo_tpu.utils.fetch import fetch_packed_async

        # if the keyframe's insertion fetch hasn't landed yet, give it
        # one more frame instead of blocking ~an RTT here — unless a
        # second keyframe is already queued (backpressure: the
        # reference's mapper also prioritizes draining its queue,
        # LocalMapping.cc:80-88)
        pending = tracker._kf_host_pending.get(self._queue[0])
        if (
            pending is not None
            and not pending[0].done()
            and len(self._queue) == 1
            and not getattr(self, "_admit_waited", False)
        ):
            self._admit_waited = True
            return
        self._admit_waited = False
        kf_idx = self._queue.pop(0)
        with self._stage("map.finish_host"):
            tracker.finish_kf_host(kf_idx)
        with self._stage("map.phase1_dispatch"):
            outs = {}
            ctx_cull = self._cull_dispatch(tracker, outs)
            ctx_tri = ctx_fuse = None
            if self.map.n_keyframes >= 2:
                ctx_tri = self._tri_dispatch(tracker, kf_idx, outs)
                ctx_fuse = self._fuse_dispatch(tracker, kf_idx, outs)
            future = fetch_packed_async(outs)
            # relay-channel accounting: every fetched float32 element
            # costs shared down-link time the per-frame summary then
            # queues behind
            self.fetch_bytes = getattr(self, "fetch_bytes", 0) + sum(
                int(np.prod(a.shape)) * 4 for a in outs.values()
            )
        self._phase1 = {
            "kf": kf_idx,
            "ctx_cull": ctx_cull,
            "ctx_tri": ctx_tri,
            "ctx_fuse": ctx_fuse,
            "future": future,
        }

    def advance(self, tracker, block: bool = False) -> list[int]:
        """Apply pipeline stages whose fetches have landed; called once
        per tracked frame. Returns keyframe indices whose mapping
        completed (ready for loop closing)."""
        done: list[int] = []
        if self._ba is not None and (block or self._ba["future"].done()):
            ba = self._ba
            self._ba = None
            with self._stage("map.ba_apply"):
                self._ba_apply(tracker, ba)
            with self._stage("map.cull_kfs"):
                self._cull_keyframes(ba["kf"])
            done.append(ba["kf"])
        if (
            self._phase1 is not None
            and self._ba is None
            and (block or self._phase1["future"].done())
        ):
            p = self._phase1
            self._phase1 = None
            fetched = p["future"].result()
            kf_idx = p["kf"]
            with self._stage("map.cull_points"):
                self._cull_apply(tracker, kf_idx, p["ctx_cull"], fetched)
            if p["ctx_tri"] is not None:
                with self._stage("map.triangulate"):
                    self._tri_apply(tracker, kf_idx, p["ctx_tri"], fetched)
            if p["ctx_fuse"] is not None:
                with self._stage("map.fuse"):
                    self._fuse_apply(
                        tracker, kf_idx, p["ctx_fuse"], fetched
                    )
            # triangulation/fusion changed the local point set: push
            # the covisible id list the tracker matches against
            tracker.refresh_local_map_latest()
            # local BA runs when no newer keyframe is waiting — the
            # reference's interleave (LocalMapping.cc:80-88: BA only if
            # !CheckNewKeyFrames()). The reference's mapper thread
            # drains its queue in milliseconds, so its BA still runs
            # for most keyframes; OUR phase-1 round-trips ride the
            # ~110 ms relay, so corner-entry keyframe bursts keep the
            # queue non-empty for a dozen keyframes straight and BA
            # starves exactly where drift accrues fastest (measured:
            # 11 BA solves over 45 KFs, y-drift bursts at every corner).
            # Floor the cadence: never more than 2 keyframes without a
            # solve — the 16-KF window still covers every keyframe.
            self._kfs_since_ba = getattr(self, "_kfs_since_ba", 0) + 1
            if self.map.n_keyframes >= 2 and (
                not self._queue or self._kfs_since_ba >= 2
            ):
                with self._stage("map.ba_dispatch"):
                    self._ba = self._ba_dispatch(tracker, kf_idx)
                self._kfs_since_ba = 0
            if self._ba is None:
                done.append(kf_idx)
        if self._phase1 is None and self._queue:
            self._admit(tracker)
            if block and self._phase1 is not None:
                done += self.advance(tracker, block=True)
        return done

    def drain(self, tracker) -> list[int]:
        """Run the pipeline to completion (flush / backpressure)."""
        done: list[int] = []
        while self.busy:
            done += self.advance(tracker, block=True)
        return done

    # -- fusion ---------------------------------------------------------------

    def _fuse_dispatch(self, tracker, kf_idx: int, outs: dict):
        """SearchInNeighbors device phase (ref: LocalMapping.cc:547-637
        + ORBmatcher Fuse :787-930), both directions: the new
        keyframe's map points projected into its covisible neighbors
        (forward), and the neighbors' points projected into the new
        keyframe (reverse, ref: LocalMapping.cc:586-627
        vpFuseCandidates -> Fuse(mpCurrentKeyFrame, ...))."""
        m = self.map
        covis = m.covisibility(kf_idx)
        order = np.argsort(-covis)
        neighbors = [int(k) for k in order if covis[k] > 0][:10]
        if not neighbors:
            return
        my_pts = self._kf_point_ids(kf_idx)
        pt_ids = np.unique(my_pts[my_pts >= 0])
        if len(pt_ids) == 0:
            return
        P_CAP = 2048
        if len(pt_ids) > P_CAP:
            self.cap_binds["fuse_pts"] = (
                self.cap_binds.get("fuse_pts", 0) + 1
            )
        pt_ids = pt_ids[:P_CAP]
        pad = np.zeros(P_CAP, np.int64)
        pad[: len(pt_ids)] = pt_ids
        alive = np.zeros(P_CAP, bool)
        alive[: len(pt_ids)] = m.pt_valid[pad[: len(pt_ids)]]

        B = FUSE_NEIGHBORS
        neighbors = neighbors[:B]
        # point data: gathered from the device map mirror; neighbor KF
        # data: gathered from the device keyframe store — the only
        # uploads are the index vectors and B poses (round 1 shipped
        # ~1 MB of host arrays per keyframe through the relay here)
        nb_pad = np.zeros(B, np.int32)
        nb_pad[: len(neighbors)] = neighbors
        nb_pose = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        nb_pose[: len(neighbors)] = m.kf_pose[neighbors]
        # mask out padding slots (semantic=False kills all their kps)
        nb_live = np.zeros(B, bool)
        nb_live[: len(neighbors)] = True
        src_all = _fuse_gather_program(
            tracker.dmap,
            tracker.kf_store,
            jnp.asarray(pad.astype(np.int32)),
            jnp.asarray(alive),
            jnp.asarray(nb_pad),
            jnp.asarray(nb_pose),
            jnp.asarray(nb_live),
            tracker.cam, self.cfg.orb.scale_factor,
            self.cfg.orb.n_levels,
        )
        outs["fuse_src"] = src_all

        # reverse direction: fuse candidates are the neighbors' points
        # not already observed by the new keyframe, newest-first (the
        # reference iterates all of them; recency keeps the freshest
        # geometry under the cap)
        nb_pts = m.points_seen_by(np.asarray(neighbors, np.int64))
        nb_pts = nb_pts[m.pt_valid[nb_pts]]
        mine_set = np.zeros(m.max_points, bool)
        mine_set[pt_ids] = True
        nb_pts = nb_pts[~mine_set[nb_pts]]
        pad_rev = None
        if len(nb_pts) > 0:
            if len(nb_pts) > P_CAP:
                self.cap_binds["fuse_rev_pts"] = (
                    self.cap_binds.get("fuse_rev_pts", 0) + 1
                )
                nb_pts = nb_pts[-P_CAP:]
            pad_rev = np.zeros(P_CAP, np.int64)
            pad_rev[: len(nb_pts)] = nb_pts
            alive_rev = np.zeros(P_CAP, bool)
            alive_rev[: len(nb_pts)] = True
            # single-target variant (B=1): 1/10th the matching FLOPs
            # of reusing the B=10 program shape
            outs["fuse_rev_src"] = _fuse_gather_program(
                tracker.dmap,
                tracker.kf_store,
                jnp.asarray(pad_rev.astype(np.int32)),
                jnp.asarray(alive_rev),
                jnp.asarray(np.asarray([kf_idx], np.int32)),
                jnp.asarray(m.kf_pose[kf_idx][None]),
                jnp.asarray(np.ones(1, bool)),
                tracker.cam, self.cfg.orb.scale_factor,
                self.cfg.orb.n_levels,
            )
        return {"neighbors": neighbors, "pad": pad, "pad_rev": pad_rev}

    def _fuse_apply(
        self, tracker, kf_idx: int, ctx: dict, fetched_all: dict
    ) -> None:
        """Fusion host phase: add cross observations, merge duplicates
        (ref: MapPoint::Replace)."""
        m = self.map
        neighbors = ctx["neighbors"]
        pad = ctx["pad"]
        fetched = list(fetched_all["fuse_src"])

        replaced: dict[int, int] = {}
        merge_pairs: list[tuple[int, int]] = []  # (kill, keep)
        obs_counts = m.point_obs_counts()
        max_merges = 50  # bound the Replace rewrites per KF target

        def fuse_into(target_kf: int, src: np.ndarray, pad_ids_):
            """Merge projected candidates into one target keyframe."""
            tgt_pts = self._kf_point_ids(target_kf)
            hit_kp = np.where(src >= 0)[0]
            if len(hit_kp) == 0:
                return
            pid = pad_ids_[src[hit_kp]].astype(np.int64)
            ok = m.pt_valid[pid]
            hit_kp, pid = hit_kp[ok], pid[ok]
            existing = tgt_pts[hit_kp]
            # free keypoints -> new cross observations (vectorized)
            free = existing < 0
            if free.any():
                m.add_observations(target_kf, pid[free], hit_kp[free])
                pad_ids = np.full(4096, -1, np.int32)
                nsel = min(int(free.sum()), 4096)
                pad_ids[:nsel] = pid[free][:4096]
                tracker.dmap = device_map.add_obs_counts(
                    tracker.dmap, jnp.asarray(pad_ids)
                )
            # conflicts -> merge (rare; bounded python loop)
            conf = (~free) & (existing != pid) & m.pt_valid[
                np.maximum(existing, 0)
            ]
            if int(conf.sum()) > max_merges:
                self.cap_binds["fuse_merges"] = (
                    self.cap_binds.get("fuse_merges", 0) + 1
                )
            for kp_i, p_i, e_i in zip(
                hit_kp[conf][:max_merges],
                pid[conf][:max_merges],
                existing[conf][:max_merges],
            ):
                p_i = replaced.get(int(p_i), int(p_i))
                e_i = replaced.get(int(e_i), int(e_i))
                if p_i == e_i or not (
                    m.pt_valid[p_i] and m.pt_valid[e_i]
                ):
                    continue
                # keep the more-observed (ref: MapPoint.cc:225-261);
                # the table rewrite is DEFERRED to one batched
                # replace_points_batch — the replaced dict keeps the
                # per-pair decisions chain- and cycle-safe meanwhile
                keep, kill = (
                    (e_i, p_i)
                    if obs_counts[e_i] >= obs_counts[p_i]
                    else (p_i, e_i)
                )
                merge_pairs.append((kill, keep))
                m.pt_valid[kill] = False  # visible to later pairs
                m._valid_epoch += 1
                replaced[kill] = keep

        for nb, src_for_dst in zip(neighbors, fetched):
            fuse_into(nb, np.asarray(src_for_dst), pad)
        # reverse direction: neighbors' points into the new keyframe
        # (ref: LocalMapping.cc:586-627)
        if ctx.get("pad_rev") is not None and "fuse_rev_src" in fetched_all:
            fuse_into(
                kf_idx,
                np.asarray(fetched_all["fuse_rev_src"])[0],
                ctx["pad_rev"],
            )
        if merge_pairs:
            m.replace_points_batch(
                np.array([p[0] for p in merge_pairs], np.int64),
                np.array([p[1] for p in merge_pairs], np.int64),
            )
        if replaced:
            import os
            if os.environ.get("SIVO_DEBUG_CULL"):
                print(f"    [fuse kf={kf_idx}] replaced={len(replaced)}")
            from sivo_tpu.runtime import device_map as dm

            kill_ids = np.full(4096, -1, np.int32)
            kk = list(replaced.keys())[:4096]
            kill_ids[: len(kk)] = kk
            tracker.dmap = dm.invalidate_points(
                tracker.dmap, jnp.asarray(kill_ids)
            )

    # -- triangulation --------------------------------------------------------

    def _kf_point_ids(self, kf_idx: int) -> np.ndarray:
        out = np.full(self.map.kp_capacity, -1, np.int64)
        mine = self.map.obs_by_kf(kf_idx)
        if len(mine):
            out[mine[:, 2]] = mine[:, 1]
        return out

    def _tri_dispatch(self, tracker, kf_idx: int, outs: dict):
        """CreateNewMapPoints device phase (ref: LocalMapping.cc:
        198-472): batched epipolar triangulation dispatch against the
        top covisible neighbors, gated by CheckSemantics."""
        import os
        if os.environ.get("SIVO_NO_TRI"):  # ablation hook
            return None
        m = self.map
        covis = m.covisibility(kf_idx)
        order = np.argsort(-covis)
        neighbors = [
            int(k) for k in order if covis[k] > 0
        ][: self.cfg.mapping.n_triangulate_neighbors]
        if not neighbors:
            return
        d1 = m.kf_data[kf_idx]
        pts1 = self._kf_point_ids(kf_idx)
        baseline = self.cam.bf / self.cam.fx
        c1 = m.kf_camera_center(kf_idx)
        # stereo rule: skip neighbors closer than one baseline
        # (ref: LocalMapping.cc:236-244)
        neighbors = [
            nb for nb in neighbors
            if np.linalg.norm(m.kf_camera_center(nb) - c1) >= baseline
        ]
        if not neighbors:
            return
        # all neighbors in one batched program + one fetch; keyframe
        # arrays come from the device store (gathered by slot), only
        # the "keypoint has no map point yet" masks — host observation-
        # table knowledge — plus poses/indices are uploaded
        B = self.cfg.mapping.n_triangulate_neighbors
        N = m.kp_capacity
        t2 = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        free2 = np.zeros((B, N), bool)  # kp has no map point yet
        nb_pad = np.zeros(B, np.int32)
        nb_valid = np.zeros(B, bool)
        for i, nb in enumerate(neighbors[:B]):
            pts2 = self._kf_point_ids(nb)
            t2[i] = m.kf_pose[nb]
            free2[i] = pts2 < 0
            nb_pad[i] = nb
            nb_valid[i] = True
        if not hasattr(self, "_th_dev"):
            self._th_dev = (
                jnp.float32(self.cfg.semantic.th_confidence),
                jnp.float32(self.cfg.semantic.th_entropy_reduction),
            )
        res = _tri_gather_program(
            tracker.kf_store,
            jnp.int32(kf_idx),
            jnp.asarray(m.kf_pose[kf_idx]),
            jnp.asarray(pts1 < 0),  # kp1 free as far as host knows
            jnp.asarray(m.kf_cov[kf_idx]),
            jnp.asarray(nb_pad),
            jnp.asarray(t2),
            jnp.asarray(free2),
            jnp.asarray(nb_valid),
            self._th_dev[0], self._th_dev[1],
            self.cam,
            self.cfg.orb.scale_factor,
            self.cfg.orb.n_levels,
        )
        outs["tri_xw"] = res.xw
        outs["tri_kp2"] = res.kp2
        outs["tri_acc"] = res.accepted
        return {"d1": d1, "c1": c1, "neighbors": neighbors[:B]}

    def _tri_apply(
        self, tracker, kf_idx: int, ctx: dict, fetched: dict
    ) -> None:
        """Triangulation host phase: create accepted points on host and
        device."""
        from sivo_tpu.runtime import device_map

        m = self.map
        d1 = ctx["d1"]
        c1 = ctx["c1"]
        neighbors = ctx["neighbors"]
        N = m.kp_capacity
        out = {
            "xw": fetched["tri_xw"],
            "kp2": fetched["tri_kp2"],
            "acc": fetched["tri_acc"],
        }
        acc = np.asarray(out["acc"])  # (B, N)
        # first accepting neighbor wins each kp1 slot
        first_nb = np.argmax(acc, axis=0)
        any_acc = acc.any(axis=0)
        kp1_idx = np.where(any_acc)[0]
        if len(kp1_idx) == 0:
            return
        # host-capacity truncation BEFORE minting: host and device maps
        # must mint the SAME points in creation order (the id-lockstep
        # contract), so the cut happens on the candidate list, not
        # inside either store. In-flight triangulations can land
        # between the compaction trigger and the compaction itself
        # (measured: a 12-lap endurance run died at frame ~1780 on the
        # old capacity raise).
        avail = m.max_points - m.n_points
        if len(kp1_idx) > avail:
            self.cap_binds["tri_capacity"] = (
                self.cap_binds.get("tri_capacity", 0)
                + len(kp1_idx) - avail
            )
            kp1_idx = kp1_idx[:avail]
            if len(kp1_idx) == 0:
                return
        nb_of = first_nb[kp1_idx]
        xw = np.asarray(out["xw"])[nb_of, kp1_idx]
        kp2_idx = np.asarray(out["kp2"])[nb_of, kp1_idx]
        ids = m.add_points(
            xw.astype(np.float32),
            d1.desc_u8[kp1_idx],
            d1.sem_class[kp1_idx],
            kf_idx,
            kp1_idx,
            d1.level[kp1_idx],
        )
        for i, nb in enumerate(neighbors):
            sel = nb_of == i
            if sel.any():
                m.add_observations(nb, ids[sel], kp2_idx[sel])
        # mirror the cross-observation counts to the device (the KF
        # policy's n_ref reads dmap.pt_obs_count)
        pad_ids = np.full(4096, -1, np.int32)
        pad_ids[: min(len(ids), 4096)] = ids[:4096]
        tracker.dmap = device_map.add_obs_counts(
            tracker.dmap, jnp.asarray(pad_ids)
        )
        # mirror into the device map (one donation program)
        sel_full = np.zeros(N, bool)
        sel_full[kp1_idx] = True
        xw_full = np.zeros((N, 3), np.float32)
        xw_full[kp1_idx] = xw
        tracker.dmap, _ = device_map.add_points(
            tracker.dmap,
            jnp.asarray(sel_full),
            jnp.asarray(xw_full),
            jnp.asarray(d1.desc_u8),
            jnp.asarray(d1.sem_class),
            jnp.asarray(d1.level),
            jnp.asarray(c1.astype(np.float32)),
            self.cfg.orb.scale_factor,
            self.cfg.orb.n_levels,
        )

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
        # vectorized: per-observation levels via one stacked gather,
        # then per-point counts of same-or-finer observations via a
        # sorted combined (point, level) key — the former per-KF mask
        # pass + per-observation python loop was ~130 ms/keyframe at
        # 30k observations
        level_stack = np.stack(
            [
                m.kf_data[k].level
                if m.kf_data[k] is not None
                else np.zeros(m.kp_capacity, np.int32)
                for k in range(m.n_keyframes)
            ]
        )
        obs_level = level_stack[obs[:, 0], obs[:, 2]]
        # combined key: levels are < 8, so pt*16 + level is collision-
        # free; counting all obs then subtracting the keyframe's own
        # observation (exactly one per (kf, pt) pair) equals the
        # reference's "other observations" count
        lvl_clip = np.minimum(obs_level, 15)
        key_all_sorted = np.sort(obs[:, 1] * 16 + lvl_clip)
        protected = self.kf_protected() if self.kf_protected else set()
        for k in np.where(covis > 0)[0]:
            if k == 0 or not m.kf_valid[k]:  # never cull the origin
                continue
            if int(k) in protected:
                # keyframes holding loop edges are never erased
                # (ref: KeyFrame.cc:459-476 SetErase/mspLoopEdges)
                continue
            mine = m.obs_by_kf(int(k))
            if len(mine) < 10:
                continue
            my_level = level_stack[mine[:, 0], mine[:, 2]]
            # for each of my points: # other obs with level <= mine+1
            hi = np.searchsorted(
                key_all_sorted,
                mine[:, 1] * 16 + np.minimum(my_level + 1, 15),
                side="right",
            )
            lo = np.searchsorted(
                key_all_sorted, mine[:, 1] * 16, side="left"
            )
            fine_count = hi - lo - 1  # minus my own observation
            n_redundant = int((fine_count >= 3).sum())
            if n_redundant > self.cfg.mapping.kf_cull_redundancy * len(
                mine
            ):
                import os
                if os.environ.get("SIVO_DEBUG_CULL"):
                    print(
                        f"    [cull_kf] culled kf={k} "
                        f"({n_redundant}/{len(mine)} redundant)",
                        flush=True,
                    )
                m.kf_valid[k] = False
                m._obs_dirty = True
                if self.on_kf_culled is not None:
                    self.on_kf_culled(int(k))

    # -- point culling ------------------------------------------------------

    CULL_WINDOW = 8192  # recent-point id window fetched per keyframe

    def _cull_dispatch(self, tracker, outs: dict):
        """MapPointCulling device phase: the counters to fetch.

        Culling only examines RECENT points (age <= 3 keyframes,
        see _cull_apply) and point ids are assigned in creation order,
        so the candidates live in a contiguous id range ending at
        n_points — fetch one fixed window instead of the full
        131k-point counter arrays (the full fetch was ~2 MB/keyframe
        through the relay)."""
        lo = max(0, self.map.n_points - self.CULL_WINDOW)
        dm = tracker.dmap
        f, v, ok = _cull_window_program(
            dm.pt_found, dm.pt_visible, dm.pt_valid,
            jnp.int32(lo), self.CULL_WINDOW,
        )
        outs["cull_found"] = f
        outs["cull_visible"] = v
        outs["cull_valid"] = ok
        return {"lo": lo}

    def _cull_apply(
        self, tracker, kf_idx: int, ctx: dict, fetched: dict
    ) -> None:
        """MapPointCulling (ref: LocalMapping.cc:165-196). Scope is the
        reference's RECENT-point list only: the ratio and observation
        tests apply while age <= 3 keyframes, after which a point
        graduates and is never auto-culled here (an unscoped ratio test
        was measured destroying 70% of the live map within two
        keyframes — marginally-visible graduated points accumulate
        visible>>found and die).

        Observation counts come from the host observation table, which
        (unlike the device counter) includes triangulation cross-
        observations and fusion — the reference's Observations() does
        too."""
        m = self.map
        lo = ctx["lo"]
        n = min(m.n_points, lo + self.CULL_WINDOW)
        w = n - lo
        if w <= 0:
            return
        found = np.asarray(fetched["cull_found"])[:w].astype(np.float32)
        visible = np.maximum(
            np.asarray(fetched["cull_visible"])[:w].astype(np.float32),
            1.0,
        )
        obs = m.point_obs_counts_weighted()[lo:n]
        valid = np.asarray(fetched["cull_valid"])[:w]
        first = m.pt_first_kf[lo:n]
        age = kf_idx - first  # in keyframes
        in_list = (first < kf_idx) & (age <= 3)
        ratio_bad = (found / visible) < self.cfg.mapping.found_ratio_min
        # reference-exact threshold (LocalMapping.cc:186-187, cnThObs=3
        # for stereo) against the reference-WEIGHTED count (stereo
        # observation = 2): a stereo point observed by >= 2 keyframes
        # survives. Survivable with bidirectional SearchInNeighbors
        # fusion accruing cross observations.
        obs_bad = (age >= 2) & (obs <= self.cfg.mapping.min_obs_stereo)
        kill = valid & in_list & (ratio_bad | obs_bad)
        kill_ids = np.where(kill)[0] + lo
        import os
        if os.environ.get("SIVO_DEBUG_CULL"):
            print(f"    [cull kf={kf_idx}] kills={len(kill_ids)} "
                  f"(ratio={int((valid&in_list&ratio_bad).sum())}, "
                  f"obs={int((valid&in_list&obs_bad).sum())}) of n={n}")
        if len(kill_ids) == 0:
            return
        m.mark_points_invalid(kill_ids)
        # fixed upload shape to avoid per-length recompiles
        ids = np.full(4096, -1, np.int32)
        ids[: min(len(kill_ids), 4096)] = kill_ids[:4096]
        tracker.dmap = device_map.invalidate_points(
            tracker.dmap, jnp.asarray(ids)
        )

    # -- local bundle adjustment ---------------------------------------------

    def _ba_dispatch(self, tracker, kf_idx: int) -> dict | None:
        """Build the covisible-window problem and dispatch the device
        solve (ref: Optimizer.cc:493-926 via LocalMapping.cc:80-88);
        the write-back happens in ``_ba_apply`` when the async fetch
        lands, typically one tracked frame later — the same staleness
        the reference's mapping thread exhibits."""
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
            self.cap_binds["ba_pts"] = self.cap_binds.get("ba_pts", 0) + 1
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
        if len(kfs) > MAX_BA_KF:
            self.cap_binds["ba_kfs"] = (
                self.cap_binds.get("ba_kfs", 0) + 1
            )
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

        # observations from KFs in the window (vectorized per KF — a
        # Python loop over 16k rows costs ~100ms at keyframe rate)
        rows = obs[np.isin(obs[:, 0], kfs)]
        if len(rows) > MAX_BA_OBS:
            self.cap_binds["ba_obs"] = (
                self.cap_binds.get("ba_obs", 0) + 1
            )
            rows = rows[-MAX_BA_OBS:]
        o = len(rows)
        obs_kf = np.zeros(MAX_BA_OBS, np.int32)
        obs_pt = np.zeros(MAX_BA_OBS, np.int32)
        obs_uvr = np.zeros((MAX_BA_OBS, 3), np.float32)
        obs_sigma2 = np.ones(MAX_BA_OBS, np.float32)
        obs_stereo = np.zeros(MAX_BA_OBS, bool)
        obs_valid = np.zeros(MAX_BA_OBS, bool)
        sf = self.cfg.orb.scale_factor
        kf_slot_arr = np.zeros(self.map.max_keyframes, np.int32)
        for k, i in kf_slot.items():
            kf_slot_arr[k] = i
        pt_slot_arr = np.zeros(self.map.max_points, np.int32)
        pt_slot_arr[pt_ids] = np.arange(len(pt_ids))
        obs_kf[:o] = kf_slot_arr[rows[:, 0]]
        obs_pt[:o] = pt_slot_arr[rows[:, 1]]
        for k in kfs:
            sel = rows[:, 0] == k
            if not sel.any():
                continue
            kp = rows[sel, 2]
            data = m.kf_data[k]
            ur = data.u_right[kp]
            obs_uvr[:o][sel] = np.stack(
                [data.xy[kp, 0], data.xy[kp, 1],
                 np.maximum(ur, 0.0)], axis=-1,
            )
            obs_sigma2[:o][sel] = sf ** (
                2.0 * data.level[kp].astype(np.float32)
            )
            obs_stereo[:o][sel] = ur > 0
        obs_valid[:o] = True

        with self._stage("map.ba_upload"):
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
        if not hasattr(self, "_zero_dev"):
            self._zero_dev = jnp.int32(0)
        with self._stage("map.ba_solve_call"):
            res = local_ba.local_bundle_adjustment(
                prob, self._zero_dev, self.cam
            )
        from sivo_tpu.utils.fetch import fetch_packed_async

        with self._stage("map.ba_fetch_start"):
            future = fetch_packed_async(
                {
                    "kf_pose": res.kf_pose,
                    "pt_pos": res.pt_pos,
                    "inlier": res.obs_inlier,
                    "cov": res.newest_cov,
                }
            )
        return {
            "kf": kf_idx,
            "kfs": kfs,
            "fixed": fixed,
            "pt_ids": pt_ids,
            "rows": rows,
            "o": o,
            "future": future,
            # pre-BA pose of the newest window KF (slot 0) for the
            # tracker re-anchoring in _ba_apply
            "newest_pose_before": poses[0].copy(),
        }

    def _ba_apply(self, tracker, ba: dict) -> None:
        """Write back the BA solution (host map + device mirror) and
        erase outlier observations (ref: Optimizer.cc:822-912)."""
        m = self.map
        out = ba["future"].result()
        kfs, fixed, pt_ids = ba["kfs"], ba["fixed"], ba["pt_ids"]
        rows, o = ba["rows"], ba["o"]
        # write back keyframe poses (free ones only)
        new_poses = np.asarray(out["kf_pose"])
        for i, k in enumerate(kfs):
            if not fixed[i]:
                m.kf_pose[k] = new_poses[i]
        m.kf_cov[ba["kf"]] = np.asarray(out["cov"])
        # re-anchor the tracker on the corrected newest KF
        # (ref: Tracking.cc:641-646 UpdateLastFrame)
        if not fixed[0]:
            tracker.apply_world_correction(
                ba["newest_pose_before"], new_poses[0]
            )
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
