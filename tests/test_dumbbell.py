"""Dumbbell endurance fixture: figure-8 plan geometry + world sanity.

The endurance bench (SIVO_BENCH_LAPS>1) drives make_dumbbell_world via
figure8_trajectory; these invariants keep that fixture drivable: exact
lap periodicity (render reuse), closed-loop return to the start (the
second revisit), all-path clearance from every plane (no pillar
blackout, the round-2 corner lesson), and in-bounds coverage.
"""

import numpy as np

from sivo_tpu.config import SystemConfig
from sivo_tpu.io import synthetic


def _path_positions(n):
    gt = synthetic.figure8_trajectory(n)
    return np.stack(
        [np.linalg.inv(T.astype(np.float64))[:3, 3] for T in gt]
    )


def test_figure8_exact_periodicity():
    lap = synthetic.figure8_lap_frames()
    pos = _path_positions(2 * lap)
    dev = np.linalg.norm(pos[:lap] - pos[lap:], axis=1)
    assert dev.max() < 1e-6, dev.max()


def test_figure8_visits_both_rings_and_returns():
    lap = synthetic.figure8_lap_frames()
    pos = _path_positions(lap + 1)
    # ring 1 occupies x ~ [-9.5, 9.5]; ring 2 x ~ [18.5, 37.5]
    assert pos[:, 0].min() < -9.0
    assert pos[:, 0].max() > 37.0
    # the lap closes: frame `lap` is back at frame 0
    assert np.linalg.norm(pos[lap] - pos[0]) < 1e-6
    # planar drive
    assert np.abs(pos[:, 1]).max() < 1e-9


def test_dumbbell_world_drivable():
    cfg = SystemConfig()
    world = synthetic.make_dumbbell_world(cfg.camera, seed=0)
    lap = synthetic.figure8_lap_frames()
    pos = _path_positions(lap)
    pxz = pos[:, [0, 2]]
    # no vertical plane (wall/pillar) closer than 1.2 m to the path —
    # a plane ON the path produces a featureless close-up blackout
    for pl in world.planes:
        if abs(float(pl.e2[1])) < 1e-9:
            continue  # ground
        a = pl.p0[[0, 2]]
        b = (pl.p0 + pl.e1)[[0, 2]]
        # min distance from path samples to the segment ab
        ab = b - a
        t = np.clip(
            ((pxz - a) @ ab) / max(float(ab @ ab), 1e-12), 0.0, 1.0
        )
        near = a + t[:, None] * ab
        d = np.linalg.norm(pxz - near, axis=1)
        assert d.min() > 1.2, (d.min(), a, b)
    # every path sample sees SOME off-plane structure within 8 m
    # (pillar coverage — the planar-ambiguity guard)
    pillars = [
        pl for pl in world.planes
        if abs(float(pl.e2[1])) > 1e-9
        and float(np.linalg.norm(pl.e1)) < 2.0
    ]
    assert len(pillars) > 40
    pc = np.stack(
        [(pl.p0 + 0.5 * pl.e1)[[0, 2]] for pl in pillars]
    )
    dmin = np.min(
        np.linalg.norm(pxz[:, None, :] - pc[None, :, :], axis=-1),
        axis=1,
    )
    assert dmin.max() < 8.0, dmin.max()
