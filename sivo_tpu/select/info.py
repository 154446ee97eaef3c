"""Information-theoretic feature selection math, fully batched.

Re-implements the reference's static helper class ``SIVO::SIVO``
(ref: src/sivo_helpers/sivo_helpers.cpp, 268 LoC of per-point Eigen) as
vectorized jnp ops over all keypoints at once. The selection criterion
(mutual information between the 6-DoF pose state and a candidate stereo
measurement, minus the pixel's classification entropy) is evaluated for
every keypoint in a single fused computation — the reference loops over
features one at a time (ref: Tracking.cc:935-1025).

Twist/covariance ordering is [translation, rotation], matching the
reference's Jacobian column layout (ref: sivo_helpers.cpp:43-88).
"""

from __future__ import annotations

import jax.numpy as jnp

from sivo_tpu.geometry import se3
from sivo_tpu.utils.precision import hmat

_LOG2E = 1.4426950408889634  # log2(e)


def mono_jacobian_pose(
    fx: float, fy: float, p: jnp.ndarray
) -> jnp.ndarray:
    """(..., 3) point -> (..., 2, 6) d(projection)/d(pose twist)
    (ref: sivo_helpers.cpp:43-62). Columns: [t_x t_y t_z r_x r_y r_z].

    Note the reference evaluates this at the *world* coordinates of the
    point (ref: Tracking.cc:966-977 passes wX,wY,wZ); we keep the same
    behavior — callers pass whatever the reference passes.
    """
    X, Y, Z = p[..., 0], p[..., 1], p[..., 2]
    Z = jnp.where(jnp.abs(Z) > 1e-12, Z, 1e-12)
    iz = 1.0 / Z
    iz2 = iz * iz
    zero = jnp.zeros_like(X)
    row0 = jnp.stack(
        [
            fx * iz,
            zero,
            -fx * X * iz2,
            -fx * X * Y * iz2,
            fx * (1.0 + X * X * iz2),
            -fx * Y * iz,
        ],
        axis=-1,
    )
    row1 = jnp.stack(
        [
            zero,
            fy * iz,
            -fy * Y * iz2,
            -fy * (1.0 + Y * Y * iz2),
            fy * X * Y * iz2,
            fy * X * iz,
        ],
        axis=-1,
    )
    return jnp.stack([row0, row1], axis=-2)


def stereo_jacobian_pose(
    fx: float, fy: float, b: float, p: jnp.ndarray
) -> jnp.ndarray:
    """(..., 3) point -> (..., 3, 6) Jacobian of the stereo measurement
    (uL, vL, uR) w.r.t. the pose twist (ref: sivo_helpers.cpp:64-88)."""
    X, Y, Z = p[..., 0], p[..., 1], p[..., 2]
    Z = jnp.where(jnp.abs(Z) > 1e-12, Z, 1e-12)
    iz = 1.0 / Z
    iz2 = iz * iz
    zero = jnp.zeros_like(X)
    mono = mono_jacobian_pose(fx, fy, jnp.stack([X, Y, Z], axis=-1))
    Xb = X - b
    row2 = jnp.stack(
        [
            fx * iz,
            zero,
            -fx * Xb * iz2,
            -fx * Xb * Y * iz2,
            fx * (1.0 + X * Xb * iz2),
            -fx * Y * iz,
        ],
        axis=-1,
    )
    return jnp.concatenate([mono, row2[..., None, :]], axis=-2)


def mono_jacobian_point(
    fx: float, fy: float, p: jnp.ndarray, Ccw: jnp.ndarray
) -> jnp.ndarray:
    """(..., 3) point + (3, 3) world->cam rotation -> (..., 2, 3)
    d(projection)/d(world point) (ref: sivo_helpers.cpp:90-113)."""
    X, Y, Z = p[..., 0], p[..., 1], p[..., 2]
    Z = jnp.where(jnp.abs(Z) > 1e-12, Z, 1e-12)
    iz = 1.0 / Z
    iz2 = iz * iz
    zero = jnp.zeros_like(X)
    row0 = jnp.stack([fx * iz, zero, -fx * X * iz2], axis=-1)
    row1 = jnp.stack([zero, fy * iz, -fy * Y * iz2], axis=-1)
    proj = jnp.stack([row0, row1], axis=-2)
    return hmat(proj, Ccw)


def stereo_jacobian_point(
    fx: float, fy: float, b: float, p: jnp.ndarray, Ccw: jnp.ndarray
) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) (ref: sivo_helpers.cpp:115-136)."""
    X, Y, Z = p[..., 0], p[..., 1], p[..., 2]
    Z = jnp.where(jnp.abs(Z) > 1e-12, Z, 1e-12)
    iz = 1.0 / Z
    iz2 = iz * iz
    zero = jnp.zeros_like(X)
    row0 = jnp.stack([fx * iz, zero, -fx * X * iz2], axis=-1)
    row1 = jnp.stack([zero, fy * iz, -fy * Y * iz2], axis=-1)
    row2 = jnp.stack([fx * iz, zero, -fx * (X - b) * iz2], axis=-1)
    proj = jnp.stack([row0, row1, row2], axis=-2)
    return hmat(proj, Ccw)


def joint_covariance(
    state_cov: jnp.ndarray, jac: jnp.ndarray, meas_noise: jnp.ndarray
) -> jnp.ndarray:
    """Joint state+measurement covariance (ref: sivo_helpers.cpp:138-180).

    Args:
      state_cov: (6, 6) pose covariance (or batched (..., 6, 6)).
      jac: (..., M, 6) measurement Jacobian (M = 2 mono / 3 stereo).
      meas_noise: (..., M, M) measurement noise.

    Returns: (..., 6+M, 6+M).
    """
    m = jac.shape[-2]
    sj = hmat(state_cov, jnp.swapaxes(jac, -1, -2))  # (..., 6, M)
    js = hmat(jac, state_cov)  # (..., M, 6)
    meas_cov = hmat(jac, sj) + meas_noise  # (..., M, M)
    batch = jnp.broadcast_shapes(
        state_cov.shape[:-2], jac.shape[:-2], meas_noise.shape[:-2]
    )
    out = jnp.zeros(batch + (6 + m, 6 + m), dtype=jac.dtype)
    out = out.at[..., :6, :6].set(jnp.broadcast_to(state_cov, batch + (6, 6)))
    out = out.at[..., :6, 6:].set(jnp.broadcast_to(sj, batch + (6, m)))
    out = out.at[..., 6:, :6].set(jnp.broadcast_to(js, batch + (m, 6)))
    out = out.at[..., 6:, 6:].set(jnp.broadcast_to(meas_cov, batch + (m, m)))
    return out


def mutual_information(joint_cov: jnp.ndarray) -> jnp.ndarray:
    """MI in bits between pose state (first 6 dims) and measurement
    (rest): ``0.5 * log2(det(S) * det(M) / det(J))``
    (ref: sivo_helpers.cpp:182-219).

    Uses slogdet for numerical robustness (the reference multiplies raw
    determinants, which under/overflows in float32 — same value in exact
    arithmetic).
    """
    s = joint_cov[..., :6, :6]
    m = joint_cov[..., 6:, 6:]
    _, ld_s = jnp.linalg.slogdet(s)
    _, ld_m = jnp.linalg.slogdet(m)
    _, ld_j = jnp.linalg.slogdet(joint_cov)
    return 0.5 * (ld_s + ld_m - ld_j) * _LOG2E


def stereo_mutual_information(
    state_cov: jnp.ndarray, jac: jnp.ndarray, meas_noise: jnp.ndarray
) -> jnp.ndarray:
    """Fused MI without materializing the 9x9 joint matrix.

    det(J) = det(S) * det(M + H S H^T - H S S^{-1} S H^T) = det(S) * det(N)
    where N is the measurement noise — i.e. MI reduces to
    ``0.5 * log2(det(H S H^T + N) / det(N))``. Algebraically identical to
    the reference's 9x9 determinant ratio but 27x less work per point.
    """
    hsh = hmat(hmat(jac, state_cov), jnp.swapaxes(jac, -1, -2))
    _, ld_num = jnp.linalg.slogdet(hsh + meas_noise)
    _, ld_den = jnp.linalg.slogdet(meas_noise)
    return 0.5 * (ld_num - ld_den) * _LOG2E


def kalman_update_stereo(
    prev_cov: jnp.ndarray, jac: jnp.ndarray, meas_noise: jnp.ndarray
) -> jnp.ndarray:
    """Covariance-only Kalman update (ref: sivo_helpers.cpp:221-240)."""
    S = hmat(hmat(jac, prev_cov), jnp.swapaxes(jac, -1, -2)) + meas_noise
    K = hmat(hmat(prev_cov, jnp.swapaxes(jac, -1, -2)), jnp.linalg.inv(S))
    eye = jnp.eye(6, dtype=prev_cov.dtype)
    return hmat(eye - hmat(K, jac), prev_cov)


def propagate_covariance_motion(
    prev_cov: jnp.ndarray,
    motion: jnp.ndarray,
    process_noise: float = 0.01,
) -> jnp.ndarray:
    """Constant-velocity covariance propagation
    (ref: sivo_helpers.cpp:242-266): ``F = I + Ad(T)``,
    ``P' = F P F^T + q*I``."""
    F = jnp.eye(6, dtype=prev_cov.dtype) + se3.adjoint(motion)
    return hmat(hmat(F, prev_cov), F.T) + process_noise * jnp.eye(
        6, dtype=prev_cov.dtype
    )


def entropy_reduction_stereo(
    state_cov: jnp.ndarray,
    points: jnp.ndarray,
    sigma2: jnp.ndarray,
    classification_entropy: jnp.ndarray,
    fx: float,
    fy: float,
    baseline: float,
) -> jnp.ndarray:
    """The SIVO selection score for every candidate at once.

    score_i = MI(state; stereo obs of point_i) - H(class posterior at
    pixel_i), compared against ThEntropyReduction by callers
    (ref: Tracking.cc:994-1002, LocalMapping.cc:474-545).

    Args:
      state_cov: (6, 6) current pose covariance.
      points: (N, 3) candidate positions. Runtime callers pass
        CAMERA-frame coordinates — a deliberate divergence from the
        reference, which passes world coordinates (Tracking.cc:966) and
        therefore starves selection as the camera travels away from the
        origin (MI ~ 1/z_world^2). Camera-frame evaluation is
        translation-invariant and scores close points as more
        informative, the paper's intent.
      sigma2: (N,) per-keypoint measurement noise (level sigma^2).
      classification_entropy: (N,) per-pixel entropy in bits.

    Returns: (N,) scores in bits.
    """
    jac = stereo_jacobian_pose(fx, fy, baseline, points)
    noise = sigma2[..., None, None] * jnp.eye(3, dtype=points.dtype)
    mi = stereo_mutual_information(state_cov, jac, noise)
    return mi - classification_entropy
