"""End-to-end tracking-only VO on a synthetic stereo sequence with
exact ground truth (the BASELINE.json configs[2] slice: tracking +
entropy feature selection + motion-only LM, no loop closure)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sivo_tpu.config import CameraConfig, SystemConfig
from sivo_tpu.io import synthetic, trajectory
from sivo_tpu.runtime import frame as frame_mod
from sivo_tpu.runtime.map_state import MapState
from sivo_tpu.runtime.tracking import Tracker, TrackingState

# small geometry for CPU test speed; divisible by 32
CAM = CameraConfig(
    fx=180.0, fy=180.0, cx=160.0, cy=96.0,
    width=320, height=192, bf=180.0 * 0.54, fps=10.0,
)


def make_cfg():
    cfg = SystemConfig()
    cfg = dataclasses.replace(cfg, camera=CAM)
    cfg = dataclasses.replace(
        cfg,
        orb=dataclasses.replace(
            cfg.orb, n_features=600, max_keypoints=1024
        ),
        tracking=dataclasses.replace(
            cfg.tracking, min_init_keypoints=150,
        ),
        # ThEntropyReduction=4 bits is tuned for KITTI fx=721; the MI
        # scale goes with fx^2 * cov, so the small test camera needs a
        # proportionally lower gate (it is a per-sequence YAML config
        # in the reference too)
        semantic=dataclasses.replace(
            cfg.semantic, th_entropy_reduction=0.02
        ),
    )
    return cfg


@pytest.fixture(scope="module")
def vo_run():
    cfg = make_cfg()
    statics = frame_mod.make_statics(cfg)
    world = synthetic.make_world(CAM, seed=0)
    gt = synthetic.forward_trajectory(n_frames=14, speed=0.5)
    left, right, _ = synthetic.render_sequence(world, gt)
    classes, conf, ent = synthetic.constant_semantics(
        CAM.height, CAM.width
    )

    m = MapState(
        max_keyframes=64, max_points=20000,
        kp_capacity=cfg.orb.max_keypoints,
    )
    tracker = Tracker(cfg=cfg, map=m)
    est = []
    for i in range(len(gt)):
        f = frame_mod.build_frame_nosegnet(
            statics,
            jnp.asarray(left[i]),
            jnp.asarray(right[i]),
            jnp.asarray(classes),
            jnp.asarray(conf),
            jnp.asarray(ent),
        )
        pose = tracker.track(f, timestamp=i * 0.1)
        est.append(pose)
    return cfg, tracker, gt, est


def test_initializes_and_tracks(vo_run):
    cfg, tracker, gt, est = vo_run
    assert tracker.state == TrackingState.OK
    assert est[0] is not None  # initialized on first frame
    n_lost = sum(1 for p in est if p is None)
    assert n_lost == 0, f"{n_lost} frames lost"


def test_trajectory_accuracy(vo_run):
    cfg, tracker, gt, est = vo_run
    est_arr = np.stack([p for p in est if p is not None])
    ate = synthetic.ate_rmse(est_arr, gt[: len(est_arr)])
    # ~7m traveled; pose-only VO against the initial map (the SIVO
    # information gate needs KITTI-scale optics to self-regulate —
    # see bench.py for the full-geometry regression on TPU)
    assert ate < 0.3, f"ATE {ate:.3f} m"


def test_keyframes_and_points_created(vo_run):
    cfg, tracker, gt, est = vo_run
    # the SIVO keyframe policy is deliberately sparse; within this short
    # healthy window at least the init KF + its entropy-gated points
    # must exist (KF cadence is exercised at KITTI geometry in bench.py)
    assert tracker.map.n_keyframes >= 1
    # sequential (paper-semantics) selection self-limits: the Kalman
    # shrink after each accepted feature drops later MI scores, so the
    # map is deliberately sparser than batch scoring would produce
    assert tracker.map.n_points > 100
    # all created points are static-class
    live = tracker.map.pt_valid[: tracker.map.n_points]
    cls = tracker.map.pt_class[: tracker.map.n_points][live]
    assert (cls <= 8).all()


def test_covariance_stays_bounded(vo_run):
    cfg, tracker, gt, est = vo_run
    cov = tracker.last_cov
    assert np.isfinite(cov).all()
    # marginal pose covariance should be small with hundreds of points
    assert np.trace(cov) < 1.0, np.trace(cov)
    assert (np.linalg.eigvalsh(cov) > 0).all()


def test_trajectory_writer_format(vo_run, tmp_path):
    cfg, tracker, gt, est = vo_run
    est_arr = np.stack([p for p in est if p is not None])
    path = tmp_path / "CameraTrajectory.txt"
    trajectory.save_trajectory_kitti(str(path), est_arr)
    lines = path.read_text().splitlines()
    assert len(lines) == len(est_arr)
    vals = np.array([[float(v) for v in l.split()] for l in lines])
    assert vals.shape == (len(est_arr), 12)
    # first pose ~ identity (initialized at origin)
    np.testing.assert_allclose(
        vals[0], [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], atol=1e-6
    )
    # fixed-point formatting with 9 decimals (reference std::fixed)
    assert "." in lines[0].split()[0]
    assert len(lines[0].split()[0].split(".")[1]) == 9
