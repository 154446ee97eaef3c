"""Loop closing integration test with an injected drifted map.

A camera does an out-and-back pass; keyframes are built from real
rendered frames (our extractor), with artificial drift added to later
keyframe poses/points. The loop closer must detect the revisit via BoW,
compute the corrective Sim3, and reduce the final keyframes' error via
the essential graph — without depending on the VO staying alive.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sivo_tpu.config import CameraConfig, SystemConfig
from sivo_tpu.geometry import se3
from sivo_tpu.io import synthetic
from sivo_tpu.ops import image as image_ops
from sivo_tpu.ops import orb as orb_ops
from sivo_tpu.ops import stereo as stereo_ops
from sivo_tpu.place import vocabulary as voc_mod
from sivo_tpu.runtime import device_map
from sivo_tpu.runtime.loopclosing import LoopCloser
from sivo_tpu.runtime.map_state import KeyFrameData, MapState
from sivo_tpu.runtime.tracking import Tracker, make_camera

CAM = CameraConfig(
    fx=180.0, fy=180.0, cx=160.0, cy=96.0,
    width=320, height=192, bf=180.0 * 0.54, fps=10.0,
)


@pytest.fixture(scope="module")
def loop_setup():
    cfg = dataclasses.replace(SystemConfig(), camera=CAM)
    cfg = dataclasses.replace(
        cfg,
        orb=dataclasses.replace(cfg.orb, n_features=600,
                                max_keypoints=1024),
    )
    world = synthetic.make_world(CAM, seed=0)
    # out-and-back: 7 poses forward, 7 back to the start
    fwd = synthetic.forward_trajectory(n_frames=7, speed=0.8,
                                       yaw_rate=0.0)
    back = fwd[::-1][1:]
    gt = np.concatenate([fwd, back])
    left, right, _ = synthetic.render_sequence(world, gt)

    spec = image_ops.make_pyramid_spec(
        CAM.height, CAM.width, cfg.orb.n_levels, cfg.orb.scale_factor
    )
    budgets = image_ops.per_level_budgets(cfg.orb.n_features, spec)
    validm = image_ops.level_valid_mask(spec, margin=16)

    # drift: later keyframes progressively offset
    n = len(gt)
    drift = np.zeros((n, 6), np.float32)
    for i in range(n):
        drift[i, 0] = 0.04 * i  # x drift, 0.52m by the loop end
    kf_poses = np.stack(
        [
            np.asarray(se3.exp(jnp.asarray(drift[i]))) @ gt[i]
            for i in range(n)
        ]
    )

    m = MapState(max_keyframes=64, max_points=20000, kp_capacity=1024)
    cam = make_camera(cfg)
    tracker = Tracker(cfg=cfg, map=m)

    all_desc = []
    prev_ids = None
    for i in range(n):
        raw_l, blur_l = image_ops.build_pyramid(
            jnp.asarray(left[i]), spec
        )
        raw_r, blur_r = image_ops.build_pyramid(
            jnp.asarray(right[i]), spec
        )
        kl = orb_ops.extract(raw_l, blur_l, validm, spec, budgets, 1024)
        kr = orb_ops.extract(raw_r, blur_r, validm, spec, budgets, 1024)
        sm = stereo_ops.match(
            kl, kr, blur_l, blur_r, spec, CAM.fx, CAM.bf
        )
        host = jax.device_get(
            {
                "xy": kl.xy, "level": kl.level, "angle": kl.angle,
                "desc": kl.desc_u8, "valid": kl.valid,
                "ur": sm.u_right, "depth": sm.depth,
            }
        )
        nkp = 1024
        data = KeyFrameData(
            frame_id=i, timestamp=i * 0.1,
            xy=np.array(host["xy"]),
            level=np.array(host["level"]),
            angle=np.array(host["angle"]),
            desc_u8=np.array(host["desc"]),
            desc_bits=None,
            u_right=np.array(host["ur"]),
            depth=np.array(host["depth"]),
            sem_class=np.zeros(nkp, np.uint8),
            sem_confidence=np.ones(nkp, np.float32),
            sem_entropy=np.zeros(nkp, np.float32),
            semantic=np.asarray(host["valid"]),
        )
        kf = m.add_keyframe(
            kf_poses[i], np.eye(6, dtype=np.float32) * 1e-4, data
        )
        # stereo-unproject points at the DRIFTED pose
        ok = (data.depth > 0) & data.semantic
        kp_idx = np.where(ok)[0][:400]
        T = kf_poses[i].astype(np.float64)
        Tinv = np.linalg.inv(T)
        z = data.depth[kp_idx]
        x = (data.xy[kp_idx, 0] - CAM.cx) * z / CAM.fx
        y = (data.xy[kp_idx, 1] - CAM.cy) * z / CAM.fy
        pc = np.stack([x, y, z], -1)
        pw = pc @ Tinv[:3, :3].T + Tinv[:3, 3]
        ids = m.add_points(
            pw.astype(np.float32), data.desc_u8[kp_idx],
            data.sem_class[kp_idx], kf, kp_idx,
            data.level[kp_idx],
        )
        # maintain the device mirrors the runtime keeps in lockstep
        # (SearchAndFuse gathers point data from the device map and
        # keyframe arrays from the device store)
        from sivo_tpu.runtime import kf_store as kfs_mod

        tracker.kf_store = kfs_mod.insert(
            tracker.kf_store, jnp.int32(kf),
            jnp.asarray(data.xy), jnp.asarray(data.level),
            jnp.asarray(data.angle),
            jnp.asarray(data.desc_u8), jnp.asarray(data.u_right),
            jnp.asarray(data.semantic), jnp.asarray(data.sem_class),
            jnp.asarray(data.sem_confidence),
            jnp.asarray(data.sem_entropy),
        )
        nkp_cap = 1024
        sel_full = np.zeros(nkp_cap, bool)
        sel_full[kp_idx] = True
        xw_full = np.zeros((nkp_cap, 3), np.float32)
        xw_full[kp_idx] = pw.astype(np.float32)
        cam_center = (-T[:3, :3].T @ T[:3, 3]).astype(np.float32)
        tracker.dmap, dev_ids = device_map.add_points(
            tracker.dmap, jnp.asarray(sel_full), jnp.asarray(xw_full),
            jnp.asarray(data.desc_u8), jnp.asarray(data.sem_class),
            jnp.asarray(data.level), jnp.asarray(cam_center),
            cfg.orb.scale_factor, cfg.orb.n_levels,
        )
        got = np.asarray(jax.device_get(dev_ids))[kp_idx]
        np.testing.assert_array_equal(got, ids)  # ids in lockstep
        # covisibility: each KF also observes some of the previous
        # KF's points (as real tracking would). The observations must
        # be geometrically consistent with the (drifted) poses — the
        # loop closer's post-correction global BA consumes them.
        if i > 0 and prev_ids is not None:
            share = prev_ids[:150]
            free_slots = np.arange(850, 850 + len(share))
            pw_s = m.pt_pos[share].astype(np.float64)
            pc_s = pw_s @ T[:3, :3].T + T[:3, 3]
            zs = np.maximum(pc_s[:, 2], 0.1)
            us = CAM.fx * pc_s[:, 0] / zs + CAM.cx
            vs = CAM.fy * pc_s[:, 1] / zs + CAM.cy
            data.xy[free_slots, 0] = us
            data.xy[free_slots, 1] = vs
            data.u_right[free_slots] = us - CAM.bf / zs
            data.depth[free_slots] = zs
            data.level[free_slots] = 0
            m.add_observations(kf, share, free_slots)
        prev_ids = ids
        all_desc.append(data.desc_u8[data.semantic])

    voc = voc_mod.train(
        np.concatenate(all_desc), k=8, depth=3, seed=0
    )
    return cfg, cam, m, tracker, voc, gt, kf_poses


def test_loop_detected_and_corrected(loop_setup):
    cfg, cam, m, tracker, voc, gt, kf_poses = loop_setup
    lc = LoopCloser(cfg=cfg, map=m, cam=cam, voc=voc)
    closed_at = None
    for k in range(m.n_keyframes):
        if lc.process_keyframe(tracker, k):
            closed_at = k
            break
    assert closed_at is not None, "no loop closed"

    def err(pose, k):
        return np.linalg.norm(
            (pose @ np.linalg.inv(gt[k]))[:3, 3]
        )

    # injected drift grows linearly; after the essential-graph
    # correction the tail of the trajectory must flatten substantially
    before = np.array(
        [err(kf_poses[k], k) for k in range(m.n_keyframes)]
    )
    after = np.array(
        [err(m.kf_pose[k], k) for k in range(m.n_keyframes)]
    )
    late = slice(closed_at - 3, m.n_keyframes)
    assert after[late].mean() < 0.5 * before[late].mean(), (
        before, after,
    )
    assert after.max() < 0.5 * before.max()


def test_bow_revisit_scores(loop_setup):
    cfg, cam, m, tracker, voc, gt, kf_poses = loop_setup
    lc = LoopCloser(cfg=cfg, map=m, cam=cam, voc=voc)
    b0 = lc._bow(0)
    b_last = lc._bow(m.n_keyframes - 1)  # same place as KF 0
    b_mid = lc._bow(6)  # farthest away
    from sivo_tpu.place.vocabulary import l1_score

    s_same = l1_score(b0, b_last)
    s_far = l1_score(b0, b_mid)
    assert s_same > s_far, (s_same, s_far)
