"""Numeric parity tests for the information-theory selection math
against directly-coded Eigen-equivalent numpy (the reference's
sivo_helpers.cpp formulas transcribed independently in numpy float64)."""

import jax.numpy as jnp
import numpy as np

from sivo_tpu.geometry import se3
from sivo_tpu.select import info

FX, FY, B = 721.5377, 721.5377, 387.5744 / 721.5377


def ref_stereo_jacobian(fx, fy, b, X, Y, Z):
    # independent float64 transcription of sivo_helpers.cpp:64-88
    J = np.zeros((3, 6))
    J[0] = [
        fx / Z, 0, -fx * X / Z**2,
        -fx * X * Y / Z**2, fx * (1 + X**2 / Z**2), -fx * Y / Z,
    ]
    J[1] = [
        0, fy / Z, -fy * Y / Z**2,
        -fy * (1 + Y**2 / Z**2), fy * X * Y / Z**2, fy * X / Z,
    ]
    J[2] = [
        fx / Z, 0, -fx * (X - b) / Z**2,
        -fx * (X - b) * Y / Z**2, fx * (1 + X * (X - b) / Z**2),
        -fx * Y / Z,
    ]
    return J


def test_stereo_jacobian_matches_reference():
    pts = np.array([[1.3, -0.4, 8.0], [-2.0, 1.0, 25.0], [0.0, 0.0, 3.0]])
    J = info.stereo_jacobian_pose(FX, FY, B, jnp.asarray(pts, jnp.float32))
    for i, (X, Y, Z) in enumerate(pts):
        np.testing.assert_allclose(
            np.asarray(J[i]), ref_stereo_jacobian(FX, FY, B, X, Y, Z),
            rtol=1e-5,
        )


def test_mono_jacobian_matches_reference():
    X, Y, Z = 1.5, -2.0, 10.0
    J = info.mono_jacobian_pose(FX, FY, jnp.array([X, Y, Z]))
    expect = ref_stereo_jacobian(FX, FY, B, X, Y, Z)[:2]
    np.testing.assert_allclose(np.asarray(J), expect, rtol=1e-5)


def test_point_jacobians():
    X, Y, Z = 1.5, -2.0, 10.0
    R = np.asarray(se3.exp(jnp.array([0.1, 0.2, -0.1, 0.05, -0.02, 0.3])))[
        :3, :3
    ]
    Jm = info.mono_jacobian_point(FX, FY, jnp.array([X, Y, Z]), jnp.asarray(R))
    proj = np.array(
        [[FX / Z, 0, -FX * X / Z**2], [0, FY / Z, -FY * Y / Z**2]]
    )
    np.testing.assert_allclose(np.asarray(Jm), proj @ R, rtol=1e-4)
    Js = info.stereo_jacobian_point(
        FX, FY, B, jnp.array([X, Y, Z]), jnp.asarray(R)
    )
    proj3 = np.vstack([proj, [FX / Z, 0, -FX * (X - B) / Z**2]])
    np.testing.assert_allclose(np.asarray(Js), proj3 @ R, rtol=1e-4)


def test_joint_covariance_blocks():
    # ref: sivo_helpers.cpp:160-180
    rng = np.random.default_rng(0)
    A = rng.normal(size=(6, 6))
    S = (A @ A.T + 6 * np.eye(6)) * 1e-4
    J = ref_stereo_jacobian(FX, FY, B, 1.0, 0.5, 12.0)
    N = 2.25 * np.eye(3)
    out = np.asarray(
        info.joint_covariance(
            jnp.asarray(S, jnp.float32),
            jnp.asarray(J, jnp.float32),
            jnp.asarray(N, jnp.float32),
        )
    )
    np.testing.assert_allclose(out[:6, :6], S, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(out[:6, 6:], S @ J.T, rtol=1e-3)
    np.testing.assert_allclose(out[6:, :6], J @ S, rtol=1e-3)
    np.testing.assert_allclose(out[6:, 6:], J @ S @ J.T + N, rtol=1e-3)


def test_mutual_information_matches_determinant_form():
    # MI via 9x9 determinants (the reference's form,
    # sivo_helpers.cpp:182-219) == our fused form.
    rng = np.random.default_rng(1)
    A = rng.normal(size=(6, 6))
    S = (A @ A.T + 6 * np.eye(6)) * 1e-3
    J = ref_stereo_jacobian(FX, FY, B, 1.0, 0.5, 12.0)
    N = 2.25 * np.eye(3)
    joint = np.block([[S, S @ J.T], [J @ S, J @ S @ J.T + N]])
    expect = 0.5 * np.log2(
        np.linalg.det(S) * np.linalg.det(J @ S @ J.T + N)
        / np.linalg.det(joint)
    )
    got_joint = float(
        info.mutual_information(jnp.asarray(joint, jnp.float64))
    )
    got_fused = float(
        info.stereo_mutual_information(
            jnp.asarray(S, jnp.float32),
            jnp.asarray(J, jnp.float32),
            jnp.asarray(N, jnp.float32),
        )
    )
    assert abs(got_joint - expect) < 1e-3
    assert abs(got_fused - expect) < 1e-2


def test_motion_covariance_propagation():
    # ref: sivo_helpers.cpp:242-266
    T = np.asarray(
        se3.exp(jnp.array([0.5, 0.0, 0.1, 0.01, 0.2, -0.05]))
    ).astype(np.float64)
    P = np.eye(6) * 0.02
    R, t = T[:3, :3], T[:3, 3]
    tx = np.array(
        [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]]
    )
    Ad = np.zeros((6, 6))
    Ad[:3, :3] = R
    Ad[:3, 3:] = tx @ R
    Ad[3:, 3:] = R
    F = np.eye(6) + Ad
    expect = F @ P @ F.T + 0.01 * np.eye(6)
    got = info.propagate_covariance_motion(
        jnp.asarray(P, jnp.float32), jnp.asarray(T, jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-6)


def test_kalman_update_shrinks_covariance():
    S = jnp.eye(6) * 0.1
    J = jnp.asarray(
        ref_stereo_jacobian(FX, FY, B, 1.0, 0.5, 12.0), jnp.float32
    )
    N = jnp.eye(3) * 2.25
    out = info.kalman_update_stereo(S, J, N)
    # posterior trace must not exceed prior trace
    assert float(jnp.trace(out)) < float(jnp.trace(S)) + 1e-6
    # still symmetric PSD-ish
    np.testing.assert_allclose(out, out.T, atol=1e-5)


def test_entropy_reduction_batched():
    n = 64
    rng = np.random.default_rng(2)
    pts = rng.uniform([-10, -5, 4], [10, 5, 40], size=(n, 3))
    sigma2 = np.ones(n) * 1.44
    ent = rng.uniform(0.1, 3.0, size=n)
    S = np.eye(6) * 0.05
    scores = info.entropy_reduction_stereo(
        jnp.asarray(S, jnp.float32),
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(sigma2, jnp.float32),
        jnp.asarray(ent, jnp.float32),
        FX, FY, B,
    )
    assert scores.shape == (n,)
    # spot-check one element against the scalar path
    J = ref_stereo_jacobian(FX, FY, B, *pts[7])
    joint = np.block(
        [[S, S @ J.T], [J @ S, J @ S @ J.T + 1.44 * np.eye(3)]]
    )
    mi = 0.5 * np.log2(
        np.linalg.det(S)
        * np.linalg.det(J @ S @ J.T + 1.44 * np.eye(3))
        / np.linalg.det(joint)
    )
    np.testing.assert_allclose(float(scores[7]), mi - ent[7], rtol=2e-2)


def _oracle_sequential(S0, pts, sigma2, ent, cand, th):
    """Float64 oracle: the reference's CreateNewKeyFrame loop
    (Tracking.cc:921-1031) with the paper's Kalman shrink
    (sivo_helpers.cpp:221-240) applied after every accepted feature."""
    S = S0.astype(np.float64).copy()
    sel = np.zeros(len(pts), bool)
    for i in range(len(pts)):
        if not cand[i]:
            continue
        J = ref_stereo_jacobian(FX, FY, B, *pts[i])
        R = sigma2[i] * np.eye(3)
        innov = J @ S @ J.T + R
        mi = 0.5 * np.log2(np.linalg.det(innov) / np.linalg.det(R))
        if mi - ent[i] > th:
            sel[i] = True
            K = S @ J.T @ np.linalg.inv(innov)
            S = (np.eye(6) - K @ J) @ S
            S = 0.5 * (S + S.T)
    return sel, S


def test_sequential_selection_matches_oracle():
    n = 96
    rng = np.random.default_rng(11)
    pts = rng.uniform([-10, -5, 4], [10, 5, 40], size=(n, 3))
    sigma2 = 1.2 ** (2.0 * rng.integers(0, 8, size=n))
    ent = rng.uniform(0.0, 2.0, size=n)
    cand = rng.random(n) < 0.8
    S0 = np.eye(6) * 0.05
    th = 0.5
    sel_ref, S_ref = _oracle_sequential(S0, pts, sigma2, ent, cand, th)
    # the oracle must be self-limiting: late candidates rejected that
    # an unshrunk covariance would accept
    batch_sel = np.zeros(n, bool)
    for i in range(n):
        if not cand[i]:
            continue
        J = ref_stereo_jacobian(FX, FY, B, *pts[i])
        R = sigma2[i] * np.eye(3)
        innov = J @ S0 @ J.T + R
        mi = 0.5 * np.log2(np.linalg.det(innov) / np.linalg.det(R))
        batch_sel[i] = mi - ent[i] > th
    assert sel_ref.sum() < batch_sel.sum()

    sel, S_f, _ = info.sequential_selection_stereo(
        jnp.asarray(S0, jnp.float32),
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(sigma2, jnp.float32),
        jnp.asarray(ent, jnp.float32),
        jnp.asarray(cand),
        jnp.float32(th),
        FX, FY, B,
        min_select=0,  # pure paper semantics for the oracle
        order_by_depth=False,  # oracle walks index order
    )
    sel = np.asarray(sel)
    # float32 vs float64 can flip knife-edge candidates; demand > 95%
    # agreement and matching totals within 2
    agree = (sel == sel_ref).mean()
    assert agree > 0.95, (agree, sel.sum(), sel_ref.sum())
    assert abs(int(sel.sum()) - int(sel_ref.sum())) <= 2
    np.testing.assert_allclose(
        np.asarray(S_f), S_ref, rtol=0.15, atol=1e-6
    )
