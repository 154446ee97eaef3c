"""Pose optimization tests: recovery of a known pose under noise and
outliers, chi2 classification, and marginal covariance parity with a
directly-computed Gauss-Newton Hessian inverse (what g2o's
computeMarginals returns for a single-vertex graph)."""

import jax
import jax.numpy as jnp
import numpy as np

from sivo_tpu.geometry import se3
from sivo_tpu.geometry.projection import CameraParams, project_stereo
from sivo_tpu.optim import pose_lm

CAM = CameraParams(
    fx=721.5377, fy=721.5377, cx=500.5593, cy=161.354,
    bf=387.5744, width=1024, height=352,
)


def make_scene(n=256, seed=0, noise=0.3, outlier_frac=0.0):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [
            rng.uniform(-15, 15, n),
            rng.uniform(-3, 3, n),
            rng.uniform(5, 40, n),
        ],
        axis=-1,
    ).astype(np.float32)
    xi_true = np.array([0.3, -0.1, 0.5, 0.02, -0.04, 0.01], np.float32)
    T_true = np.asarray(se3.exp(jnp.asarray(xi_true)))
    xc = pts @ T_true[:3, :3].T + T_true[:3, 3]
    uvr = np.array(project_stereo(CAM, jnp.asarray(xc)))
    uvr += rng.normal(0, noise, uvr.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        uvr[:n_out] += rng.uniform(20, 60, (n_out, 3)) * rng.choice(
            [-1, 1], (n_out, 3)
        )
    obs = pose_lm.PoseObservations(
        points=jnp.asarray(pts),
        uvr=jnp.asarray(uvr.astype(np.float32)),
        sigma2=jnp.ones(n, jnp.float32),
        is_stereo=jnp.ones(n, bool),
        valid=jnp.ones(n, bool),
    )
    return T_true, obs, n_out


def test_recovers_pose_from_identity_init():
    T_true, obs, _ = make_scene(noise=0.1)
    res = pose_lm.optimize_pose(jnp.eye(4), obs, CAM)
    err = np.asarray(
        se3.log(se3.inverse(jnp.asarray(T_true)) @ res.pose)
    )
    assert np.abs(err[:3]).max() < 5e-3, err
    assert np.abs(err[3:]).max() < 5e-4, err
    assert int(res.n_inliers) > 250


def test_outlier_rejection():
    T_true, obs, n_out = make_scene(noise=0.1, outlier_frac=0.25)
    res = pose_lm.optimize_pose(jnp.eye(4), obs, CAM)
    inl = np.asarray(res.inliers)
    # all outliers rejected, most inliers kept
    assert inl[:n_out].sum() <= 2, inl[:n_out].sum()
    assert inl[n_out:].mean() > 0.95
    err = np.asarray(
        se3.log(se3.inverse(jnp.asarray(T_true)) @ res.pose)
    )
    assert np.abs(err[:3]).max() < 1e-2, err


def test_mono_observations():
    T_true, obs, _ = make_scene(noise=0.1)
    # make half the observations mono
    is_stereo = jnp.asarray(np.arange(256) % 2 == 0)
    obs = obs._replace(is_stereo=is_stereo)
    res = pose_lm.optimize_pose(jnp.eye(4), obs, CAM)
    err = np.asarray(
        se3.log(se3.inverse(jnp.asarray(T_true)) @ res.pose)
    )
    assert np.abs(err[:3]).max() < 5e-3, err


def test_covariance_matches_hessian_inverse():
    T_true, obs, _ = make_scene(noise=0.05)
    res = pose_lm.optimize_pose(jnp.eye(4), obs, CAM)
    # numpy GN Hessian at the returned estimate over returned inliers
    T = np.asarray(res.pose, np.float64)
    pts = np.asarray(obs.points, np.float64)
    xc = pts @ T[:3, :3].T + T[:3, 3]
    x, y, z = xc[:, 0], xc[:, 1], xc[:, 2]
    fx, fy, bf = CAM.fx, CAM.fy, CAM.bf
    jproj = np.zeros((len(pts), 3, 3))
    jproj[:, 0] = np.stack([fx / z, 0 * z, -fx * x / z**2], -1)
    jproj[:, 1] = np.stack([0 * z, fy / z, -fy * y / z**2], -1)
    jproj[:, 2] = np.stack(
        [fx / z, 0 * z, (-fx * x + bf) / z**2], -1
    )
    def hat(v):
        return np.array(
            [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]]
        )
    dxc = np.concatenate(
        [np.tile(np.eye(3), (len(pts), 1, 1)),
         -np.stack([hat(p) for p in xc])],
        axis=-1,
    )
    J = jproj @ dxc  # (N, 3, 6)
    inl = np.asarray(res.inliers)
    H = np.einsum("nij,nik->jk", J[inl], J[inl])
    expect = np.linalg.inv(H)
    got = np.asarray(res.covariance, np.float64)
    np.testing.assert_allclose(got, expect, rtol=5e-2, atol=1e-10)
    # covariance is tiny & symmetric positive definite
    assert (np.linalg.eigvalsh(got) > 0).all()


def test_pose_covariance_feeds_selection():
    # end-to-end sanity: optimized covariance plugged into the MI
    # criterion produces finite positive scores
    from sivo_tpu.select import info

    T_true, obs, _ = make_scene(noise=0.2)
    res = pose_lm.optimize_pose(jnp.eye(4), obs, CAM)
    scores = info.entropy_reduction_stereo(
        res.covariance,
        obs.points,
        jnp.ones(256),
        jnp.zeros(256),
        CAM.fx, CAM.fy, CAM.baseline,
    )
    s = np.asarray(scores)
    assert np.isfinite(s).all()
    assert (s > 0).all()  # MI vs zero entropy must be positive
