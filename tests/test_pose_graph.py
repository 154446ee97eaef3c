"""Sim3 pose-graph tests: AD-safety of the geometry, loop-drift
correction, gauge behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from sivo_tpu.geometry import se3, sim3
from sivo_tpu.optim import pose_graph


def test_so3_log_ad_safe_at_identity():
    J = jax.jacfwd(se3.so3_log)(jnp.eye(3))
    assert np.isfinite(np.asarray(J)).all()
    J2 = jax.jacfwd(se3.log)(jnp.eye(4))
    assert np.isfinite(np.asarray(J2)).all()


def test_sim3_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(5):
        xi = jnp.asarray(rng.normal(0, 0.3, 7), jnp.float32)
        g = sim3.exp(xi)
        xi2 = sim3.log(g)
        np.testing.assert_allclose(xi, xi2, atol=1e-4)
        gi = sim3.inverse(g)
        comp = sim3.compose(g, gi)
        np.testing.assert_allclose(comp.s, 1.0, atol=1e-5)
        np.testing.assert_allclose(comp.R, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(comp.t, 0.0, atol=1e-5)


def test_horn_alignment_with_scale():
    rng = np.random.default_rng(1)
    p2 = rng.normal(0, 2, (16, 3)).astype(np.float32)
    g_true = sim3.Sim3(
        s=jnp.asarray(1.3),
        R=se3.exp(jnp.asarray([0, 0, 0, 0.2, -0.1, 0.3],
                              jnp.float32))[:3, :3],
        t=jnp.asarray([1.0, -2.0, 0.5]),
    )
    p1 = np.asarray(sim3.apply(g_true, jnp.asarray(p2)))
    g = sim3.horn_alignment(
        jnp.asarray(p1), jnp.asarray(p2), fix_scale=False
    )
    np.testing.assert_allclose(float(g.s), 1.3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g.R), g_true.R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g.t), g_true.t, atol=1e-3)
    # fixed-scale variant pins s = 1 (stereo mode, ref: Sim3Solver)
    g_fix = sim3.horn_alignment(
        jnp.asarray(p1), jnp.asarray(p2), fix_scale=True
    )
    assert float(g_fix.s) == 1.0


def _make_loop_problem(n_kf=12, drift=0.05, seed=0):
    """Simulated loop: KFs around a circle; odometry edges carry the
    TRUE relative poses, but integrated vertex estimates accumulate
    drift; one loop edge closes first-to-last."""
    rng = np.random.default_rng(seed)
    # true poses (Tcw): camera moving on a circle
    true = []
    for k in range(n_kf):
        ang = 2 * np.pi * k / n_kf
        xi = np.array(
            [np.cos(ang) * 5, 0, np.sin(ang) * 5, 0, ang, 0],
            np.float32,
        )
        true.append(np.asarray(se3.exp(jnp.asarray(xi))))
    true = np.stack(true)
    # drifted estimates: integrate odometry with noise
    est = [true[0]]
    for k in range(1, n_kf):
        rel_true = true[k] @ np.linalg.inv(true[k - 1])
        noise = np.asarray(
            se3.exp(jnp.asarray(
                rng.normal(0, drift, 6).astype(np.float32)))
        )
        est.append(noise @ rel_true @ est[-1])
    est = np.stack(est)

    edges_i, edges_j, meas = [], [], []
    for k in range(1, n_kf):  # spanning tree (odometry), true rel
        edges_i.append(k)
        edges_j.append(k - 1)
        meas.append(true[k] @ np.linalg.inv(true[k - 1]))
    # loop edge last -> first with TRUE relative pose
    edges_i.append(n_kf - 1)
    edges_j.append(0)
    meas.append(true[n_kf - 1] @ np.linalg.inv(true[0]))

    E = len(edges_i)
    fixed = np.zeros(n_kf, bool)
    fixed[0] = True
    prob = pose_graph.PoseGraphProblem(
        s=jnp.ones(n_kf),
        R=jnp.asarray(est[:, :3, :3]),
        t=jnp.asarray(est[:, :3, 3]),
        fixed=jnp.asarray(fixed),
        valid=jnp.ones(n_kf, bool),
        edge_i=jnp.asarray(edges_i, jnp.int32),
        edge_j=jnp.asarray(edges_j, jnp.int32),
        meas_s=jnp.ones(E),
        meas_R=jnp.asarray(np.stack(meas)[:, :3, :3]),
        meas_t=jnp.asarray(np.stack(meas)[:, :3, 3]),
        edge_valid=jnp.ones(E, bool),
    )
    return prob, true, est


def test_pose_graph_corrects_loop_drift():
    prob, true, est = _make_loop_problem()
    s, R, t = pose_graph.optimize_essential_graph(prob, iterations=20)

    def errs(poses_R, poses_t):
        out = []
        for k in range(len(true)):
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = poses_R[k]
            T[:3, 3] = poses_t[k]
            d = np.asarray(se3.log(jnp.asarray(
                np.linalg.inv(true[k]) @ T)))
            out.append(np.linalg.norm(d))
        return np.array(out)

    before = errs(est[:, :3, :3], est[:, :3, 3])
    after = errs(np.asarray(R), np.asarray(t))
    assert after.max() < 0.35 * before.max(), (before.max(), after.max())
    assert after.mean() < 0.35 * before.mean()
    # gauge: fixed vertex untouched
    np.testing.assert_allclose(
        np.asarray(R[0]), est[0][:3, :3], atol=1e-6
    )
    # scales stay ~1 (all measurements are rigid)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=0.05)
