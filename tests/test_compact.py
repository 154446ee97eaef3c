"""Map compaction: bounded-lifetime slot recycling
(ref: MapPoint.cc:201-223 / KeyFrame.cc:459-573 / Map.cc:103-121 —
the reference frees culled objects; we slide live slots down in
creation order, see sivo_tpu/runtime/compact.py)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sivo_tpu.config import CameraConfig, SystemConfig
from sivo_tpu.io import synthetic
from sivo_tpu.runtime import compact as compact_mod
from sivo_tpu.runtime import frame as frame_mod
from sivo_tpu.runtime.system import System

CAM = CameraConfig(
    fx=180.0, fy=180.0, cx=160.0, cy=96.0,
    width=320, height=192, bf=180.0 * 0.54, fps=10.0,
)


def make_cfg():
    cfg = dataclasses.replace(SystemConfig(), camera=CAM)
    return dataclasses.replace(
        cfg,
        orb=dataclasses.replace(
            cfg.orb, n_features=600, max_keypoints=1024
        ),
        tracking=dataclasses.replace(
            cfg.tracking, min_init_keypoints=150
        ),
        semantic=dataclasses.replace(
            cfg.semantic, th_entropy_reduction=0.02
        ),
    )


@pytest.fixture(scope="module")
def tracked_system():
    world = synthetic.make_world(CAM, seed=0)
    gt = synthetic.forward_trajectory(n_frames=10, speed=0.4)
    left, right, _ = synthetic.render_sequence(world, gt)
    classes, conf, ent = synthetic.constant_semantics(
        CAM.height, CAM.width
    )
    cfg = make_cfg()
    statics = frame_mod.make_statics(cfg)
    frames = [
        frame_mod.build_frame_nosegnet(
            statics,
            jnp.asarray(left[i]), jnp.asarray(right[i]),
            jnp.asarray(classes), jnp.asarray(conf), jnp.asarray(ent),
        )
        for i in range(len(gt))
    ]
    system = System(cfg=cfg, max_keyframes=64, max_points=20000)
    for i in range(6):
        system.track_frame(frames[i], i * 0.1)
    system.flush()
    return system, frames, gt


def test_compaction_preserves_tracking_and_geometry(tracked_system):
    system, frames, gt = tracked_system
    m = system.map
    tr = system.tracker
    assert m.n_keyframes >= 2 and m.n_points > 100

    # cull ~30% of the points and (if possible) one mid keyframe
    rng = np.random.default_rng(0)
    live = np.where(m.pt_valid[: m.n_points])[0]
    kill = rng.choice(live, size=len(live) // 3, replace=False)
    m.pt_valid[kill] = False
    from sivo_tpu.runtime import device_map

    pad = np.full(4096, -1, np.int32)
    pad[: len(kill)] = kill
    tr.dmap = device_map.invalidate_points(tr.dmap, jnp.asarray(pad))

    killed_kf = None
    if m.n_keyframes >= 4:
        killed_kf = 1
        m.kf_valid[killed_kf] = False
        m._obs_dirty = True

    n_pt_before = int(m.pt_valid[: m.n_points].sum())
    n_kf_before = int(m.kf_valid[: m.n_keyframes].sum())
    poses_before = system.frame_poses().copy()
    obs_before = len(m.observations())

    stats = compact_mod.compact_map(system)
    assert stats["points_freed"] >= len(kill)
    if killed_kf is not None:
        assert stats["keyframes_freed"] >= 1

    # live counts preserved, stores contiguous
    assert m.n_points == n_pt_before
    assert m.pt_valid[: m.n_points].all()
    assert m.n_keyframes == n_kf_before
    assert m.kf_valid[: m.n_keyframes].all()
    assert all(
        m.kf_data[k] is not None for k in range(m.n_keyframes)
    )
    # observation table: no dangling ids
    obs = m.observations()
    assert len(obs) <= obs_before
    assert (obs[:, 0] < m.n_keyframes).all() and (obs[:, 0] >= 0).all()
    assert (obs[:, 1] < m.n_points).all() and (obs[:, 1] >= 0).all()
    # device mirror in lockstep
    dm_valid = np.asarray(tr.dmap.pt_valid)
    assert int(np.asarray(tr.dmap.n_points)) == m.n_points
    np.testing.assert_array_equal(
        dm_valid[: m.n_points], m.pt_valid[: m.n_points]
    )
    assert not dm_valid[m.n_points :].any()
    # spanning tree stays time-ordered
    for k in range(1, m.n_keyframes):
        assert -1 <= m.kf_parent[k] < k

    # trajectory re-chaining survives (same world-frame poses)
    poses_after = system.frame_poses()
    assert poses_after.shape == poses_before.shape
    np.testing.assert_allclose(
        poses_after[:, :3, 3], poses_before[:, :3, 3], atol=5e-2
    )

    # tracking continues over the compacted map
    ok = 0
    for i in range(6, 10):
        if system.track_frame(frames[i], i * 0.1) is not None:
            ok += 1
    system.flush()
    assert ok >= 3
    assert not any(r.lost for r in tr.trajectory[-3:])


def test_should_compact_thresholds():
    class M:
        pass

    class S:
        pass

    s = S()
    m = M()
    s.map = m
    m.max_points, m.max_keyframes = 100, 10
    m.n_points, m.n_keyframes = 50, 5
    m.pt_valid = np.ones(100, bool)
    m.kf_valid = np.ones(10, bool)
    assert not compact_mod.should_compact(s)
    m.n_points = 90
    m.pt_valid[:30] = False  # 1/3 dead
    assert compact_mod.should_compact(s)
