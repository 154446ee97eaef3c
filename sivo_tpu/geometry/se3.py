"""Batched SE(3) utilities.

Replaces the reference's scattered cv::Mat / Eigen / g2o::SE3Quat pose
math (ref: src/orbslam/Converter.cc, g2o se3quat) with one functional,
vmappable module. All functions accept leading batch dimensions.

Conventions:
  * Poses are 4x4 row-major homogeneous matrices ``Tcw`` (world->camera),
    matching the reference's ``mTcw`` (ref: src/orbslam/Frame.h:219).
  * Twists are 6-vectors ``[rho (trans), phi (rot)]``; ``exp`` is the
    standard SE(3) exponential; optimizer updates are left-multiplicative
    ``T <- exp(xi) @ T``.
"""

from __future__ import annotations

import jax.numpy as jnp

from sivo_tpu.utils.precision import hmat

_EPS = 1e-8


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix from (..., 3) vector
    (ref: sivo_helpers.cpp:33-41)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation from (..., 3) axis-angle."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    K = hat(phi)
    K2 = hmat(K, K)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    # Taylor-stable coefficients
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(
        theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0
    )
    return eye + a * K + b * K2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle from (..., 3, 3) rotation.

    AD-safe near the identity (the pose-graph optimizer autodiffs
    through this at near-zero residuals): branches are computed with
    *safe* inputs so neither produces NaN gradients (jnp.where alone
    does not stop NaN propagation through the untaken branch).
    Angles near pi are not handled (not needed by callers).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )  # = 2 sin(theta) * axis
    s2 = 0.25 * jnp.sum(w * w, axis=-1)  # sin^2 theta
    small = s2 < 1e-12
    s2_safe = jnp.where(small, 1.0, s2)
    sin_safe = jnp.sqrt(s2_safe)
    theta_big = jnp.arctan2(sin_safe, cos_t)
    scale_big = theta_big / (2.0 * sin_safe)
    # theta/(2 sin theta) ~= 1/2 (1 + theta^2/6), theta^2 ~= s2 here
    scale_small = 0.5 + s2 / 12.0
    scale = jnp.where(small, scale_small, scale_big)
    return w * scale[..., None]


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential: (..., 6) twist [rho, phi] -> (..., 4, 4)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    K = hat(phi)
    K2 = hmat(K, K)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    R = so3_exp(phi)
    # left Jacobian V
    b = jnp.where(
        theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0
    )
    c = jnp.where(
        theta2 > _EPS,
        (theta - jnp.sin(theta)) / (theta2 * theta),
        1.0 / 6.0 - theta2 / 120.0,
    )
    V = eye + b * K + c * K2
    t = hmat(V, rho[..., None])[..., 0]
    return make_pose(R, t)


def log(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) logarithm: (..., 4, 4) -> (..., 6) twist [rho, phi].
    AD-safe near the identity (safe-input branches, see so3_log)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    phi = so3_log(R)
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    small = theta2 < 1e-12
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    K = hat(phi)
    K2 = hmat(K, K)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    half_theta = 0.5 * theta
    # V^{-1} = I - K/2 + (1/theta^2)(1 - theta sin / (2(1-cos))) K^2
    cot_big = (
        1.0
        - half_theta * jnp.cos(half_theta)
        / jnp.maximum(jnp.sin(half_theta), 1e-12)
    ) / theta2_safe
    cot_term = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, cot_big)
    Vinv = eye - 0.5 * K + cot_term * K2
    rho = hmat(Vinv, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def make_pose(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) + (..., 3) -> (..., 4, 4)."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    return T.at[..., 3, 3].set(1.0)


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of (..., 4, 4) rigid transform."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_pose(Rt, -hmat(Rt, t[..., None])[..., 0])


def transform(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., 3)."""
    return hmat(T[..., :3, :3], p[..., None])[..., 0] + T[..., :3, 3]


def adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) adjoint in the [trans, rot] twist ordering used by the
    reference's covariance math (ref: sivo_helpers.cpp:242-266):
    ``Ad = [[R, t^ R], [0, R]]``."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tx = hat(t)
    batch = R.shape[:-2]
    A = jnp.zeros(batch + (6, 6), dtype=T.dtype)
    A = A.at[..., :3, :3].set(R)
    A = A.at[..., :3, 3:].set(hmat(tx, R))
    return A.at[..., 3:, 3:].set(R)
