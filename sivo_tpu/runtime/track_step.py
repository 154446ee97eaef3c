"""The fused per-frame tracking program: ONE device dispatch per frame.

Fuses the reference's entire Track() numeric path
(ref: src/orbslam/Tracking.cc:229-451 — motion-model matching, pose
optimization, local-map search, second pose optimization, keyframe
counters, and the SIVO entropy-reduction selection) into a single
jitted program. The host receives one compact summary (~100 floats)
and makes policy decisions; everything big stays on device.

Rationale: the accelerator sits behind a ~30ms round-trip link; the
reference's design (CPU threads sharing a pointer graph) translated
naively costs 15+ round trips per frame. One fused program + one fetch
keeps the 10 FPS budget.

Local-map candidates are a host-fed id list of the reference
keyframe's covisible-neighborhood points (ref: Tracking.cc:1087-1235
UpdateLocalKeyFrames/UpdateLocalPoints), refreshed at keyframe rate.
Round 2 used the frustum-visible WHOLE map instead; besides scanning
the full point capacity every frame, that silently re-attached the
tracker to spatially-near but covisibility-disconnected old points on
map revisits — stitching loops without any place-recognition event,
which masked loop closure entirely.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

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
from sivo_tpu.runtime.device_map import DeviceMap, unpack_bits
from sivo_tpu.runtime.frame import Frame
from sivo_tpu.select import info as info_ops
from sivo_tpu.utils.precision import hmat

LOCAL_CAND = 2048  # local-map candidate capacity (host-fed covisible
#                    point ids; the [cand, kp] match matrices dominate
#                    the per-frame HBM traffic — measured 6.4 ms at
#                    [4096, 2048] vs 4.0 ms at [2048, 2048])


class TrackCarry(NamedTuple):
    """Device-resident tracking state between frames."""

    pose: jnp.ndarray  # (4, 4) last frame Tcw
    cov: jnp.ndarray  # (6, 6)
    velocity: jnp.ndarray  # (4, 4) Tcl
    has_velocity: jnp.ndarray  # () bool
    pt_idx: jnp.ndarray  # (N,) int32 last frame's map point per keypoint
    desc_bits: jnp.ndarray  # (N, 256) last frame descriptors
    level: jnp.ndarray  # (N,)
    angle: jnp.ndarray  # (N,)
    valid: jnp.ndarray  # (N,)


class StepResult(NamedTuple):
    carry: TrackCarry  # next-frame input (already updated)
    dmap: DeviceMap  # updated counters
    summary: jnp.ndarray  # (64,) float32 — the ONE per-frame fetch
    sel_mask: jnp.ndarray  # (N,) entropy-gated new-point mask (KF use)
    xw: jnp.ndarray  # (N, 3) unprojected world points (KF use)
    pt_idx: jnp.ndarray  # (N,) int32 final assignment (KF use)


# summary vector layout
S_POSE = slice(0, 16)
S_COV = slice(16, 52)
S_OK = 52  # 1.0 if frame tracked
S_N_TRACKED = 53
S_N_CLOSE_TRACKED = 54
S_N_CLOSE_FREE = 55
S_N_MATCHES_MOTION = 56
S_N_INLIERS1 = 57
S_N_INLIERS2 = 58
S_N_SELECTED = 59
S_N_SEMANTIC = 60
S_N_REF = 61  # ref-KF points with >= min_obs observations
S_USED_FALLBACK = 62  # 1.0 if the ref-KF brute-force stage ran
# motion-stage diagnostics (always from the motion path, even when the
# fallback produced the frame's pose)
S_MOT_N = 63
S_MOT_INL = 64
S_MOT_DEV = 65  # metres between stage-1 optimum and the prediction
S_ROT_DEV = 66  # radians between stage-1 optimum and the prediction
S_ROT_DEV_S1 = 67  # same for the TAKEN stage-1 branch (motion/fallback)
S_SEL_CAP_BIND = 68  # 1.0 when selection candidates exceeded SEL_CAP
S_N_CANDIDATES = 69  # selection candidates this frame (pre-cap)
S_SEL_TRUNC_BEST = 70  # best initial-cov score among candidates the
#                        SEL_CAP index-order walk never reached (bits;
#                        -inf when nothing truncated) — round-3 weak #7:
#                        the cap bound 2/3 of frames unmeasured
S_SEL_LAST_ACCEPT = 71  # walk index (0..SEL_CAP-1) of the LAST greedy
#                         accept in sequential mode; -1 = none. The
#                         measured ground for the "self-limits before
#                         slot 512" SEL_CAP argument (VERDICT r4 #9).
SUMMARY_LEN = 72


def _match_motion(
    carry: TrackCarry,
    dmap: DeviceMap,
    frame: Frame,
    T_pred: jnp.ndarray,
    cam: CameraParams,
    scales: jnp.ndarray,
    th: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Frame-to-frame motion search (ref: ORBmatcher.cc:1278).
    Returns (pt_idx (N,) int32, n_matches)."""
    prev_has = (
        carry.pt_idx >= 0
    ) & dmap.pt_valid[jnp.clip(carry.pt_idx, 0, dmap.capacity - 1)]
    prev_pts = dmap.pt_pos[jnp.clip(carry.pt_idx, 0, dmap.capacity - 1)]
    R, t = T_pred[:3, :3], T_pred[:3, 3]
    xc = hmat(prev_pts, R.T) + t
    proj_uvr = project_stereo(cam, xc)
    tz = carry.velocity[2, 3]
    baseline = cam.bf / cam.fx
    res = matching.search_by_projection_frame(
        carry.desc_bits,
        prev_has,
        carry.level,
        carry.angle,
        proj_uvr,
        xc[:, 2],
        frame.xy,
        frame.level,
        frame.angle,
        frame.desc_bits,
        frame.u_right,
        frame.semantic,
        scales,
        th,
        tz > baseline,
        -tz > baseline,
    )
    hit = res.src_for_dst >= 0
    pt_idx = jnp.where(
        hit,
        carry.pt_idx[jnp.clip(res.src_for_dst, 0, len(carry.pt_idx) - 1)],
        -1,
    ).astype(jnp.int32)
    return pt_idx, res.n_matches


def _optimize(
    frame: Frame,
    pt_idx: jnp.ndarray,
    dmap: DeviceMap,
    T_init: jnp.ndarray,
    cam: CameraParams,
    scale_factor: float,
) -> tuple[pose_lm.PoseResult, jnp.ndarray]:
    has = (pt_idx >= 0) & dmap.pt_valid[
        jnp.clip(pt_idx, 0, dmap.capacity - 1)
    ]
    pts = dmap.pt_pos[jnp.clip(pt_idx, 0, dmap.capacity - 1)]
    uvr = jnp.concatenate([frame.xy, frame.u_right[:, None]], axis=-1)
    sigma2 = scale_factor ** (2.0 * frame.level.astype(jnp.float32))
    obs = pose_lm.PoseObservations(
        points=pts,
        uvr=uvr,
        sigma2=sigma2,
        is_stereo=frame.u_right > 0,
        valid=has,
    )
    res = pose_lm.optimize_pose_impl(T_init, obs, cam)
    pt_out = jnp.where(res.inliers, pt_idx, -1).astype(jnp.int32)
    return res, pt_out


@functools.partial(
    jax.jit,
    static_argnames=(
        "cam", "scale_factor", "n_levels", "sequential_sel",
        "seq_min_select",
    ),
    donate_argnums=(1,),
)
def track_step(
    carry: TrackCarry,
    dmap: DeviceMap,
    frame: Frame,
    th_entropy: jnp.ndarray,  # () current entropy-reduction gate
    ref_pt_idx: jnp.ndarray,  # (N,) int32 ref-KF keypoint -> point id
    min_obs: jnp.ndarray,  # () int32 keyframe-policy obs threshold
    ref_desc_bits: jnp.ndarray,  # (N, 256) reference-KF descriptors
    ref_angle: jnp.ndarray,  # (N,) reference-KF keypoint angles
    local_ids: jnp.ndarray,  # (LOCAL_CAND,) int32 covisible point ids
    run_anchor: jnp.ndarray,  # () bool host anchor-cadence flag
    cam: CameraParams,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    motion_th: float = 7.0,
    max_accel: float = 0.5,
    sequential_sel: bool = True,
    seq_min_select: int = 32,
) -> StepResult:
    """Full per-frame numeric tracking (see module docstring).

    Stage 1 is the motion-model search; when it fails (or there is no
    velocity estimate yet) the reference-keyframe brute-force fallback
    (ref: Tracking.cc:262-270 TrackReferenceKeyFrame) runs INSIDE the
    same program under ``lax.cond`` — the round-trip that a host-side
    fallback dispatch would cost (~110ms through the relay) dwarfs the
    conditional's device cost.
    """
    scales = scale_factor ** jnp.arange(n_levels, dtype=jnp.float32)

    # ---- prediction (ref: Tracking.cc:711-722) --------------------------
    T_pred = jnp.where(
        carry.has_velocity, hmat(carry.velocity, carry.pose), carry.pose
    )
    cov_pred = jnp.where(
        carry.has_velocity,
        info_ops.propagate_covariance_motion(carry.cov, carry.velocity),
        carry.cov,
    )

    # ---- motion-model matching, widened retry (Tracking.cc:729-748) -----
    pt_idx_a, n_a = _match_motion(
        carry, dmap, frame, T_pred, cam, scales, motion_th
    )
    # 8x widened retry (the reference widens 2x, Tracking.cc:740-745):
    # a corner ENTRY is an instantaneous ~4 deg/frame yaw step the
    # constant-velocity prediction knows nothing about — at KITTI focal
    # lengths that is ~51 px of flow (0.071 rad * 721 px), outside the
    # round-3 3x window (21 px); the endurance run lost tracking at the
    # first 1-5 frames of corners on nearly every lap (lap-phases
    # 99-103/139-143, BENCH_endurance_r04). 8x (56 px at base scale)
    # covers the step; alias risk is held by the pose-LM chi2 rounds,
    # the accel/rotation sanity gates, and the anchor arbiter below.
    # Runs under lax.cond — the second [N, N] match costs ~5 ms of HBM
    # traffic and healthy frames never need it.
    use_wide = n_a < 20
    pt_idx_m, n_matches = jax.lax.cond(
        use_wide,
        lambda: _match_motion(
            carry, dmap, frame, T_pred, cam, scales, 8.0 * motion_th
        ),
        lambda: (pt_idx_a, n_a),
    )
    n_matches_mot = n_matches  # pre-arbiter (summary diagnostics)

    # ---- pose optimization #1 -------------------------------------------
    res1, pt_idx_m = _optimize(
        frame, pt_idx_m, dmap, T_pred, cam, scale_factor
    )

    def _center(T):
        return -hmat(T[:3, :3].T, T[:3, 3][:, None])[:, 0]

    # Acceleration sanity bound (beyond the reference): window-searched
    # matching on self-similar structure can lock onto a consistent
    # false offset and "confirm" an implausible motion with real
    # inliers. Any stage-1 result implying more than ``accel_bound``
    # metres of deviation from the constant-velocity prediction is
    # re-derived by the prediction-FREE reference-KF brute force
    # instead (which can still confirm a genuine hard brake).
    # The bound scales with current speed — pose-estimate noise grows
    # with motion (especially in turns, where stereo depth error maps
    # into along-track deviation) and a fixed bound equal to one frame
    # of travel rejects LEGITIMATE stage-1 results, routing healthy
    # frames to the weaker fallback until tracking dies. Saturating at
    # 2x max_accel keeps the anti-runaway property: a velocity estimate
    # growing multiplicatively outruns the linear-then-flat slack.
    speed = jnp.linalg.norm(carry.velocity[:3, 3])
    accel_bound = max_accel + 0.6 * jnp.minimum(speed, 2.0 * max_accel)
    accel_dev = jnp.linalg.norm(_center(res1.pose) - _center(T_pred))

    def _rot_dev(A, B):
        """Geodesic angle between two poses' rotations (radians)."""
        R = hmat(A[:3, :3], B[:3, :3].T)
        c = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
        return jnp.arccos(c)

    # Rotation sanity bound, the angular twin of accel_bound: on a
    # near-planar view (one wall/facade filling the frame) the pose
    # optimum has a rotation-vs-translation ambiguity and a windowed
    # or brute-force match set can "confirm" a solution tens of
    # degrees off (measured: a -20 deg yaw alias accepted with 61
    # inliers at a corner entry, anchoring the whole session wrong).
    # KITTI-at-10fps yaw tops out near 0.07 rad/frame and the
    # constant-velocity prediction lags a corner entry by one yaw
    # step, so 0.12 rad separates every legitimate result from the
    # aliases. Applied only when a velocity prediction exists — after
    # a loss the frozen-pose "prediction" says nothing about rotation.
    MAX_ROT_DEV = 0.12
    MAX_FRAME_ROT = 0.09  # rad/frame: above any KITTI-at-10fps yaw rate
    rot_dev1 = _rot_dev(res1.pose, T_pred)
    ok_motion = (
        carry.has_velocity
        & (n_matches >= 20)
        & (res1.n_inliers >= 10)
        & (accel_dev <= accel_bound)
        & (rot_dev1 <= MAX_ROT_DEV)
    )

    # ---- reference-KF global anchor (ref: Tracking.cc:597-639) -----------
    # Brute-force (window-FREE) matching against the reference
    # keyframe plus its OWN pose optimization. Window searches centre
    # on predicted projections, so their match sets inherit any
    # prediction error; on self-similar texture the windowed LM then
    # recovers only part of the error and the velocity's rotation runs
    # away multiplicatively (measured x1.55/frame). Folding the global
    # matches into a MIXED optimization cannot fix this: once the
    # drift residual exceeds a few pixels, the robust (Huber) loss
    # soft-rejects the honest minority as outliers regardless of
    # weighting. The anchor therefore gets its own LM over its
    # all-coherent match set (a coherent set converges under Huber
    # from any nearby start), and an ARBITER below prefers it whenever
    # the window path's rotation disagrees — the reference's
    # TrackReferenceKeyFrame, run as a continuous absolute anchor
    # rather than a failure fallback.
    # Cost control: the anchor (brute force + LM ≈ 10 ms) runs under
    # lax.cond — always when the motion path failed its sanity gates,
    # at the host's cadence flag otherwise (every 2nd frame): a
    # runaway grows ~1.55x/frame, so one unanchored frame stays well
    # inside the arbiter's catch range.
    need_anchor = run_anchor | ~ok_motion

    def _anchor_path():
        ref_has = (
            ref_pt_idx >= 0
        ) & dmap.pt_valid[jnp.clip(ref_pt_idx, 0, dmap.capacity - 1)]
        bfm = matching.search_brute_force(
            ref_desc_bits, ref_has, ref_angle,
            frame.desc_bits, frame.semantic, frame.angle,
            nn_ratio=0.7,  # ref: Tracking.cc:603
        )
        bf_hit = bfm.src_for_dst >= 0
        pt_idx_bf = jnp.where(
            bf_hit,
            ref_pt_idx[
                jnp.clip(bfm.src_for_dst, 0, len(ref_pt_idx) - 1)
            ],
            -1,
        ).astype(jnp.int32)
        # Prediction-FREE coarse pose: batched EPnP RANSAC over the
        # brute-force matches. The pose LM's chi2 rounds drop honest
        # matches once the start error exceeds ~2 deg (20+px
        # residuals), so an LM seeded from a corrupt velocity
        # prediction converges INTO the alias it was meant to veto
        # (measured: rdev 3 -> 16.6 deg THROUGH fallback frames).
        # EPnP over descriptor matches has no basin: it is this
        # frame's relocalization-grade estimate at tracking rate.
        from sivo_tpu.place import pnp as pnp_mod

        has_bf = pt_idx_bf >= 0
        pw = dmap.pt_pos[jnp.clip(pt_idx_bf, 0, dmap.capacity - 1)]
        sigma2_kp = scale_factor ** (
            2.0 * frame.level.astype(jnp.float32)
        )
        # data-derived fold (no per-frame key upload through the relay)
        seed = (
            jnp.sum(frame.xy, dtype=jnp.float32) * 7.0
        ).astype(jnp.int32)
        key = jax.random.fold_in(jax.random.key(17), seed)
        pres = pnp_mod.ransac_pnp(
            pw, frame.xy, sigma2_kp, has_bf, key, cam
        )
        # planar-degenerate EPnP (single-beta case) can return a
        # metre-shifted pose; with a live velocity the prediction is a
        # better seed than a kinematically impossible PnP solution
        pnp_sane = pres.ok & (
            ~carry.has_velocity
            | (
                jnp.linalg.norm(
                    _center(pres.pose) - _center(T_pred)
                )
                <= 3.0 * accel_bound
            )
        )
        T0 = jnp.where(pnp_sane, pres.pose, T_pred)
        resf, ptf = _optimize(
            frame, pt_idx_bf, dmap, T0, cam, scale_factor
        )
        okf = (bfm.n_matches >= 15) & (resf.n_inliers >= 20)
        return (
            resf.pose, resf.n_inliers, resf.covariance, ptf,
            pt_idx_bf, bfm.n_matches, okf,
        )

    def _no_anchor():
        none = jnp.full_like(ref_pt_idx, -1)
        return (
            T_pred, jnp.int32(0), jnp.eye(6), none, none,
            jnp.int32(0), jnp.asarray(False),
        )

    (
        posef, n_inlf, covf, ptf, pt_idx_bf, bf_n, okf
    ) = jax.lax.cond(need_anchor, _anchor_path, _no_anchor)
    rot_devf = _rot_dev(posef, T_pred)
    # Kinematic sanity on the anchor itself: EPnP on a near-planar
    # view (one wall filling the corner frame) is degenerate in our
    # single-beta case and can return a metre-scale-shifted pose whose
    # reprojections still pass (plane homography ambiguity) — measured
    # as a 3 m/frame VERTICAL dive accepted with 150 anchor inliers at
    # corner entry. With a live velocity the true pose is within one
    # frame of motion; without one (post-loss) the anchor must be free
    # to jump.
    anchor_sane = ~carry.has_velocity | (
        (
            jnp.linalg.norm(_center(posef) - _center(carry.pose))
            <= 2.0 * accel_bound
        )
        & (
            _rot_dev(posef, carry.pose)
            <= 2.0 * (MAX_FRAME_ROT + MAX_ROT_DEV)
        )
    )
    okf = okf & anchor_sane

    # ---- arbiter ---------------------------------------------------------
    # When both paths are healthy and AGREE in rotation, the window
    # path wins (more matches, better-conditioned translation). On
    # disagreement the anchor wins — the window path is the one that
    # can drift. 0.035 rad (2 deg) catches the runaway while its
    # window residuals are still small enough for stage 2/3 to refine.
    AGREE_ROT = 0.035
    agree = _rot_dev(res1.pose, posef) <= AGREE_ROT
    use_motion = ok_motion & (agree | ~okf)
    ok1 = use_motion | okf
    T_s1 = jnp.where(use_motion, res1.pose, posef)
    pt_idx_m = jnp.where(use_motion, pt_idx_m, ptf)
    n_matches = jnp.where(use_motion, n_matches, bf_n)
    n_inl1 = jnp.where(use_motion, res1.n_inliers, n_inlf)
    rot_dev_s1 = jnp.where(use_motion, rot_dev1, rot_devf)
    used_fallback = ~use_motion
    T1 = jnp.where(ok1, T_s1, T_pred)

    # ---- local map: frustum over the covisible-neighborhood ids ---------
    # (ref: Tracking.cc:1033-1235 SearchLocalPoints over UpdateLocalMap)
    cand = jnp.clip(local_ids, 0, dmap.capacity - 1)
    cand_pos = dmap.pt_pos[cand]
    cand_maxd = dmap.pt_max_dist[cand]
    visible, cand_uvr, cand_dist, cand_view_cos = frustum_check(
        cam, T1, cand_pos, dmap.pt_normal[cand],
        dmap.pt_min_dist[cand], cand_maxd,
    )
    cand_visible = (
        visible & (local_ids >= 0) & dmap.pt_valid[cand]
    )
    cand_bits = unpack_bits(dmap.pt_desc_u8[cand])
    cand_level = predict_scale(
        cand_dist, cand_maxd / 1.2, scale_factor, n_levels,
    )
    # exclude keypoints already matched by the motion model
    free_kp = frame.semantic & (pt_idx_m < 0)
    # rotation-adaptive radius (the reference uses th=1 except after
    # relocalization, Tracking.cc:795-800): a stereo-created point's
    # depth error ε reprojects ~fx·ε·sinθ/Z px off once the viewing
    # direction has swept θ — at 4 deg/frame yaw the error leaves the
    # base 4px window within ~3 frames, matches die, and the found-
    # ratio cull then eats the freshly minted points (measured:
    # tracked 287 -> 115 over 3 mid-corner frames). th grows with the
    # current rotation rate, capped at the reference's post-reloc 3.
    rot_rate = jnp.arccos(jnp.clip(
        (jnp.trace(carry.velocity[:3, :3]) - 1.0) * 0.5, -1.0, 1.0
    ))
    th_local = jnp.minimum(1.0 + 25.0 * rot_rate, 3.0)
    # stage-1 failure widens the window to the reference's post-reloc
    # 3.0 (Tracking.cc:795-800 "recently relocalized" semantics): at a
    # corner ENTRY the carried velocity has no rotation yet, so the
    # rotation-adaptive radius above stays at 1.0 exactly when the
    # prediction is 4 deg off and the local map is the only rescue.
    th_local = jnp.where(ok1, th_local, 3.0)
    mres = matching.search_by_projection_points(
        cand_bits,
        cand_visible,
        cand_uvr,
        cand_level,
        cand_view_cos,
        frame.xy, frame.level, frame.desc_bits, frame.u_right,
        free_kp,
        scales, th=th_local, nn_ratio=0.8,
    )
    hit = mres.src_for_dst >= 0
    pt_idx_c = jnp.where(
        hit & (pt_idx_m < 0),
        cand[jnp.clip(mres.src_for_dst, 0, LOCAL_CAND - 1)].astype(
            jnp.int32
        ),
        pt_idx_m,
    )

    # ---- pose optimization #2 (TrackLocalMap) ----------------------------
    res2, pt_idx_f2 = _optimize(
        frame, pt_idx_c, dmap, T1, cam, scale_factor
    )

    # ---- re-search at the refined pose + final optimization --------------
    # Anti-runaway pass: the windows above are centred on the
    # PREDICTED projections, so their candidate sets are biased toward
    # the prediction and LM recovers less than half of any prediction
    # rotation error — a 1.5x/frame multiplicative divergence of the
    # velocity's rotation (measured: stage-1-vs-prediction rotation
    # 0.4 -> 5.5 deg over 8 straight-line frames, ending in an alias
    # or reset). Re-searching the SAME candidates with a tight radius
    # around the post-LM projections and re-optimizing pulls the match
    # set toward the data instead of the prediction, which breaks the
    # feedback (the reference gets the same effect from per-round
    # chi-square reclassification over BoW-grid matches it re-derives
    # per round, Optimizer.cc:389-441).
    xc2 = hmat(cand_pos, res2.pose[:3, :3].T) + res2.pose[:3, 3]
    uvr2 = project_stereo(cam, xc2)
    mres2 = matching.search_by_projection_points(
        cand_bits,
        cand_visible,
        uvr2,
        cand_level,
        cand_view_cos,
        frame.xy, frame.level, frame.desc_bits, frame.u_right,
        frame.semantic,
        scales, th=1.0, nn_ratio=0.8,
    )
    hit2 = mres2.src_for_dst >= 0
    pt_idx_r = jnp.where(
        hit2,
        cand[jnp.clip(mres2.src_for_dst, 0, LOCAL_CAND - 1)].astype(
            jnp.int32
        ),
        -1,
    )
    # merge priority: the global reference-KF anchor first (fully
    # prediction-independent), then the tight re-search, then stage-2
    # inlier assignments; LM's chi-square rounds arbitrate conflicts
    pt_idx_merged = jnp.where(
        pt_idx_bf >= 0,
        pt_idx_bf,
        jnp.where(pt_idx_r >= 0, pt_idx_r, pt_idx_f2),
    )
    res3, pt_idx_f = _optimize(
        frame, pt_idx_merged, dmap, res2.pose, cam, scale_factor
    )

    # success normally requires the stage-1 result too
    # (ref: Tracking.cc:266+813-822), but when both stage-1 paths were
    # REJECTED — which happens when the velocity's rotation has run
    # away and EVERY data-driven result "deviates" from the corrupt
    # prediction — the re-searched local-map result is accepted as a
    # RESCUE under a stricter inlier bar and a NON-CIRCULAR kinematic
    # bound: rotation vs the LAST POSE, capped by the physical
    # per-frame maximum plus margin (comparing the rescue against
    # T_pred would re-reject every good result for exactly the reason
    # stage 1 failed). Accepting the rescue also REPLACES the runaway
    # velocity with the data-driven one, resetting the feedback loop.
    # Anchor rotation veto on the FINAL result: the merged LM is
    # majority window matches, and on self-similar texture those can
    # re-introduce the prediction alias even from an anchored stage 1.
    # When the prediction-free anchor is healthy and the final
    # rotation moved more than 2x the agreement bound away from it,
    # the anchor's own solution stands (its EPnP seed owes nothing to
    # the velocity, so it cannot participate in the feedback loop).
    anchor_override = okf & (
        _rot_dev(res3.pose, posef) > 2.0 * AGREE_ROT
    )
    T_sel = jnp.where(anchor_override, posef, res3.pose)
    inl_sel = jnp.where(anchor_override, n_inlf, res3.n_inliers)
    cov_sel = jnp.where(anchor_override, covf, res3.covariance)
    pt_idx_f = jnp.where(anchor_override, ptf, pt_idx_f)
    refine_ok = (
        jnp.linalg.norm(_center(T_sel) - _center(T1))
        <= 2.0 * accel_bound
    ) & (_rot_dev(T_sel, T1) <= MAX_ROT_DEV)
    rescue = (
        carry.has_velocity
        & (inl_sel >= 50)
        & (
            _rot_dev(T_sel, carry.pose)
            <= MAX_FRAME_ROT + MAX_ROT_DEV
        )
        & (
            jnp.linalg.norm(_center(T_sel) - _center(carry.pose))
            <= 2.0 * accel_bound
        )
    )
    min_inl = jnp.where(anchor_override, 20, 30)

    # Defense in depth: re-orthonormalize the selected rotation every
    # frame. The EPnP/Sim3 SVDs are precision-guarded, but ANY residual
    # non-orthonormality in a pose is PRESERVED by all exp-update
    # products and compounds multiplicatively through the velocity
    # chain (measured pre-guard: det(R) 1.0 -> 1.5 over one
    # anchor-heavy burst). One Gram-Schmidt per frame caps the defect
    # at f32 round-off forever.
    def _renorm(T):
        R = T[:3, :3]
        r0 = R[0] / jnp.maximum(jnp.linalg.norm(R[0]), 1e-12)
        r2 = jnp.cross(r0, R[1])
        r2 = r2 / jnp.maximum(jnp.linalg.norm(r2), 1e-12)
        r1 = jnp.cross(r2, r0)
        return T.at[:3, :3].set(jnp.stack([r0, r1, r2]))

    T_sel = _renorm(T_sel)
    # Lost-state recovery: with no velocity the stage-1 gates cannot
    # pass unless the anchor clears its >=15-match bar against a
    # possibly-rotated-away reference view — measured: a corner-apex
    # loss left 120 frames at 8-14 anchor matches while the LOCAL-MAP
    # stage kept finding 80-130 inliers around the frozen pose. Those
    # inliers are map-consistent evidence of the true pose; accept
    # them under a stricter bar. (The reference has only
    # relocalization here, Tracking.cc:271-278; this is the same
    # machinery at tracking rate.)
    lost_rescue = ~carry.has_velocity & (inl_sel >= 60)
    ok = (ok1 & (inl_sel >= min_inl) & refine_ok) | rescue | lost_rescue
    T_final = jnp.where(ok, T_sel, carry.pose)
    cov_final = jnp.where(ok, cov_sel, cov_pred)
    pt_idx_f = jnp.where(ok, pt_idx_f, -1)

    # ---- found/visible counters (MapPoint.cc:263-282) --------------------
    # Counted only on TRACKED frames: the reference's IncreaseVisible
    # runs inside SearchLocalPoints during successful tracking — a
    # LOST frame never reaches it. Counting "visible" at a frozen
    # lost-pose with zero founds craters every nearby point's found
    # ratio, and the first post-relocalization keyframe's cull then
    # mass-deletes the map the system needs to recover into
    # (measured: brute-force matches to the reference KF dropping to
    # ZERO after a loss streak — its points had all been culled).
    vis_add = jnp.where(
        ok,
        jnp.zeros(dmap.capacity + 1, jnp.int32).at[
            jnp.where(cand_visible, cand, dmap.capacity)
        ].add(1)[:-1],
        0,
    )
    found_add = jnp.zeros(dmap.capacity + 1, jnp.int32).at[
        jnp.where(pt_idx_f >= 0, pt_idx_f, dmap.capacity)
    ].add(1)[:-1]
    # NOTE: tracked points' stored descriptors are deliberately NOT
    # refreshed here. A per-frame overwrite (round 1) is a drifting
    # template update: an alias-shifted match replaces the descriptor
    # with the shifted view's, so the next frame prefers a further-
    # shifted patch — measured as multiplicative velocity runaway on
    # repetitive texture. The reference only re-derives descriptors
    # from KEYFRAME observations (MapPoint.cc:284-347), i.e. at KF
    # rate; device_map.observe_points does the same at KF insertion.
    dmap = dmap._replace(
        pt_visible=dmap.pt_visible + vis_add,
        pt_found=dmap.pt_found + found_add,
    )

    # ---- keyframe policy counters (Tracking.cc:852-874) ------------------
    close = (
        (frame.depth > 0)
        & (frame.depth < 40.0 * cam.bf / cam.fx)
        & frame.semantic
    )
    tracked = pt_idx_f >= 0
    n_tracked = jnp.sum(tracked)
    n_close_tracked = jnp.sum(close & tracked)
    n_close_free = jnp.sum(close & ~tracked)

    # ---- entropy-reduction selection (Tracking.cc:935-1025) --------------
    Twc = se3.inverse(T_final)
    xc_kp = unproject_stereo(cam, frame.xy, frame.depth)
    xw = se3.transform(Twc, xc_kp)
    sigma2 = scale_factor ** (2.0 * frame.level.astype(jnp.float32))
    # Deliberate divergence: the reference scores candidates with the
    # Jacobian at WORLD coordinates (Tracking.cc:966-977), so MI decays
    # with distance travelled from the origin and creation starves on
    # any long path; the camera-frame position is the physically
    # correct (translation-invariant) evaluation point.
    candidate = frame.semantic & (frame.depth > 0) & (pt_idx_f < 0)
    # static-covariance scores (used by the batch mode directly, by the
    # sequential mode's supply floor, and by the SEL_CAP truncation
    # audit below)
    scores0 = info_ops.entropy_reduction_stereo(
        cov_pred, xc_kp, sigma2, frame.sem_entropy,
        cam.fx, cam.fy, cam.bf / cam.fx,
    )
    if sequential_sel:
        # paper semantics: greedy selection, covariance shrinks after
        # every accepted feature so selection self-limits.
        # Prior-scale divergence: the post-LM marginal (cov_final,
        # what the reference scores against) is already collapsed by
        # this frame's ~50 inliers — ONE sequential update drives MI
        # below any threshold and creation starves (measured: 5 pts/KF,
        # tracking lost). The motion-PROPAGATED covariance (process
        # noise 0.01·I per frame, sivo_helpers.cpp:242-266) is the
        # uncertainty the new keyframe's features must resolve, and
        # self-limits at a useful budget (~tens of points/KF).
        sel_mask, _, sel_last_accept = (
            info_ops.sequential_selection_stereo(
                cov_pred, xc_kp, sigma2, frame.sem_entropy, candidate,
                th_entropy, cam.fx, cam.fy, cam.bf / cam.fx,
                min_select=seq_min_select,
            )
        )
        # supply floor, unconditionally: the scan's internal floor
        # accepts only POSITIVE-information candidates, and once the
        # covariance has collapsed every score is <= 0 — measured:
        # ~40 points/keyframe regardless of seq_min_select, and the
        # sparse map starved through corners (three runs lost 2/51/65
        # frames on relay-timing luck alone). Top up to the floor by
        # initial-covariance score rank, exactly the batch-mode floor.
        rank0 = jnp.where(
            sel_mask, jnp.inf,
            jnp.where(candidate, scores0, -jnp.inf),
        )
        kth0 = jax.lax.top_k(rank0, seq_min_select)[0][-1]
        sel_mask = sel_mask | (
            candidate & (rank0 >= kth0) & jnp.isfinite(rank0)
        )
    else:
        # reference-binary semantics: ONE static covariance for every
        # score (no between-pick shrink, sivo_helpers.cpp:221-240 is
        # dead code there). Scored against the motion-PROPAGATED
        # covariance, same evaluation point as the sequential mode:
        # the reference scores against the post-LM marginal but with
        # Jacobians at WORLD coordinates (Tracking.cc:966-977), whose
        # entries grow with distance from the origin — the selection
        # only stays alive through that coordinate artifact. In this
        # translation-invariant formulation the post-LM marginal
        # (collapsed by this frame's ~500 inliers) drives every MI
        # score below any threshold and creation starves (measured:
        # 163 points in 138 frames, 91 frames lost).
        scores = scores0
        sel_mask = candidate & (scores > th_entropy)
        # supply floor (robustness beyond the reference): keep at least
        # `seq_min_select` of the BEST-scoring candidates so fast yaw
        # (which rotates the whole FOV out in ~2s) cannot starve the
        # map between keyframes; inert when the threshold already
        # passes that many.
        rank = jnp.where(candidate, scores, -jnp.inf)
        kth = jax.lax.top_k(rank, seq_min_select)[0][-1]
        sel_mask = sel_mask | (
            candidate & (rank >= kth) & jnp.isfinite(rank)
        )

    # ---- velocity + next carry (Tracking.cc:352-360) ----------------------
    # EMA-filtered constant-velocity model (the reference stores the
    # raw frame-to-frame motion): per-frame orientation noise fed
    # straight back as a rate prediction excites an ALTERNATING pitch
    # oscillation whose amplitude grows x1.55/frame (measured:
    # per-frame estimated rotation 0.2 -> 5 deg over 8 straight-line
    # frames with yaw and absolute pose error flat — the noise
    # alternates sign, so only the |per-frame rotation| shows it).
    # Averaging in the tangent space halves the Nyquist-frequency
    # component per frame (loop gain < 1 -> damped) while a constant
    # turn rate passes through within ~2 frames.
    velocity_meas = hmat(T_final, se3.inverse(carry.pose))
    vel_d = hmat(velocity_meas, se3.inverse(carry.velocity))
    velocity_ema = hmat(se3.exp(0.5 * se3.log(vel_d)), carry.velocity)
    # rescue and FALLBACK frames REPLACE the carry velocity with the
    # data-driven measurement instead of EMA-blending half of it back:
    # both fire precisely when the carried velocity is suspect (the
    # reference's velocity is always the raw measurement,
    # Tracking.cc:352-360 — the EMA is our smoothing for the healthy
    # windowed path only)
    velocity = jnp.where(
        carry.has_velocity & ~rescue & ~used_fallback & ~anchor_override,
        velocity_ema,
        velocity_meas,
    )
    # An anchor correction (stage-1 fallback or final override) is a
    # pose JUMP relative to the prediction's drifted frame of
    # reference: a velocity measured across it replays the correction
    # as a rate next frame, setting up a window-drift/anchor-correct
    # limit cycle (measured: rdev alternating 2.3 <-> 3.3 deg with fb
    # toggling every frame, never converging even in a constant-rate
    # turn). Dropping the velocity for one frame re-derives it from
    # two anchored poses — but only when there WAS a velocity to
    # corrupt: post-init/post-loss fallback frames must still seed one.
    jumped = carry.has_velocity & (used_fallback | anchor_override)
    new_carry = TrackCarry(
        pose=T_final,
        cov=cov_final,
        velocity=jnp.where(ok, velocity, jnp.eye(4)),
        has_velocity=ok & ~jumped,
        pt_idx=pt_idx_f,
        desc_bits=frame.desc_bits,
        level=frame.level,
        angle=frame.angle,
        valid=frame.valid,
    )

    summary = jnp.zeros(SUMMARY_LEN, jnp.float32)
    summary = summary.at[S_POSE].set(T_final.reshape(-1))
    summary = summary.at[S_COV].set(cov_final.reshape(-1))
    summary = summary.at[S_OK].set(ok.astype(jnp.float32))
    summary = summary.at[S_N_TRACKED].set(n_tracked.astype(jnp.float32))
    summary = summary.at[S_N_CLOSE_TRACKED].set(
        n_close_tracked.astype(jnp.float32)
    )
    summary = summary.at[S_N_CLOSE_FREE].set(
        n_close_free.astype(jnp.float32)
    )
    summary = summary.at[S_N_MATCHES_MOTION].set(
        n_matches.astype(jnp.float32)
    )
    summary = summary.at[S_N_INLIERS1].set(n_inl1.astype(jnp.float32))
    summary = summary.at[S_N_INLIERS2].set(
        inl_sel.astype(jnp.float32)
    )
    summary = summary.at[S_USED_FALLBACK].set(
        (used_fallback | anchor_override).astype(jnp.float32)
    )
    summary = summary.at[S_MOT_N].set(
        n_matches_mot.astype(jnp.float32)
    )
    summary = summary.at[S_MOT_INL].set(res1.n_inliers.astype(jnp.float32))
    summary = summary.at[S_MOT_DEV].set(accel_dev)
    n_cand = jnp.sum(candidate)
    summary = summary.at[S_N_CANDIDATES].set(
        n_cand.astype(jnp.float32)
    )
    if sequential_sel:
        # truncation audit (SEQ mode only — batch selection scores ALL
        # candidates, nothing truncates): the sequential walk compacts
        # candidates in keypoint-index order into SEL_CAP slots; report
        # the best static-covariance score among the unreached ones so
        # the cap's cost is measured, not shrugged at.
        summary = summary.at[S_SEL_CAP_BIND].set(
            (n_cand > info_ops.SEL_CAP).astype(jnp.float32)
        )
        cand_rank = jnp.cumsum(candidate.astype(jnp.int32))
        truncated = candidate & (cand_rank > info_ops.SEL_CAP)
        summary = summary.at[S_SEL_TRUNC_BEST].set(
            jnp.max(jnp.where(truncated, scores0, -jnp.inf))
        )
        summary = summary.at[S_SEL_LAST_ACCEPT].set(sel_last_accept)
    summary = summary.at[S_ROT_DEV].set(rot_dev1)
    summary = summary.at[S_ROT_DEV_S1].set(rot_dev_s1)
    summary = summary.at[S_N_SELECTED].set(
        jnp.sum(sel_mask).astype(jnp.float32)
    )
    summary = summary.at[S_N_SEMANTIC].set(
        jnp.sum(frame.semantic).astype(jnp.float32)
    )
    # ref-KF tracked count for the keyframe decision
    # (ref: Tracking.cc:845-851 TrackedMapPoints(minObs))
    ref_ok = (ref_pt_idx >= 0) & dmap.pt_valid[
        jnp.clip(ref_pt_idx, 0, dmap.capacity - 1)
    ]
    ref_obs = dmap.pt_obs_count[jnp.clip(ref_pt_idx, 0, dmap.capacity - 1)]
    n_ref = jnp.sum(ref_ok & (ref_obs >= min_obs))
    summary = summary.at[S_N_REF].set(n_ref.astype(jnp.float32))
    return StepResult(
        carry=new_carry,
        dmap=dmap,
        summary=summary,
        sel_mask=sel_mask,
        xw=xw,
        pt_idx=pt_idx_f,
    )
