"""Motion-only pose optimization: batched Levenberg-Marquardt.

TPU-native replacement for Optimizer::PoseOptimization
(ref: src/orbslam/Optimizer.cc:273-491), which builds a g2o graph with
one SE3 vertex + mono/stereo projection edges and runs 4 rounds x 10 LM
iterations on Cholmod, re-classifying chi-squared outliers each round
and finally recovering the 6x6 marginal pose covariance via
``computeMarginals`` (Optimizer.cc:482-487).

Here the whole solve is ONE jitted program with static shapes: all
residuals/Jacobians are computed for the full padded observation set at
once; rounds and iterations are lax.scan's; the normal equations are a
6x6 solve. The marginal covariance is the inverse of the final
Gauss-Newton Hessian over inliers — exactly what g2o's computeMarginals
returns for a single-vertex graph.

Behavioral constants (ref: Optimizer.cc:273-491 and SURVEY appendix A):
Huber delta sqrt(5.991) mono / sqrt(7.815) stereo; chi2 outlier tests at
5.991 / 7.815 per round; robust kernel dropped after round 3 (g2o
``it == 2`` check); information = 1/sigma2[octave] * I.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sivo_tpu.geometry import se3
from sivo_tpu.geometry.projection import CameraParams, project_stereo
from sivo_tpu.utils.precision import hmat

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
DELTA_MONO = 2.447651936  # sqrt(5.991)
DELTA_STEREO = 2.795531791  # sqrt(7.815)


class PoseObservations(NamedTuple):
    """Padded observation set for one frame."""

    points: jnp.ndarray  # (N, 3) world positions of matched map points
    uvr: jnp.ndarray  # (N, 3) measured (uL, vL, uR); uR ignored if mono
    sigma2: jnp.ndarray  # (N,) per-observation noise (level sigma^2)
    is_stereo: jnp.ndarray  # (N,) bool
    valid: jnp.ndarray  # (N,) bool — has a matched map point


class PoseResult(NamedTuple):
    pose: jnp.ndarray  # (4, 4) optimized Tcw
    covariance: jnp.ndarray  # (6, 6) marginal covariance (ref SetCovariance)
    inliers: jnp.ndarray  # (N,) bool final inlier classification
    n_inliers: jnp.ndarray  # () int32
    chi2: jnp.ndarray  # () final total chi2 over inliers


def _residuals_jacobians(
    Tcw: jnp.ndarray, obs: PoseObservations, cam: CameraParams
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(N, 3) residuals and (N, 3, 6) Jacobians w.r.t. the left-mult
    twist [trans, rot] on Tcw. Mono observations use rows 0:2 only."""
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    xc = hmat(obs.points, R.T) + t  # (N, 3) camera-frame
    pred = project_stereo(cam, xc)
    r = pred - obs.uvr  # (N, 3)

    x, y, z = xc[..., 0], xc[..., 1], xc[..., 2]
    z = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    iz = 1.0 / z
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    # d(proj)/d(xc): rows (uL, vL, uR)
    j_proj = jnp.stack(
        [
            jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2], axis=-1),
            jnp.stack([zero, cam.fy * iz, -cam.fy * y * iz2], axis=-1),
            jnp.stack(
                [
                    cam.fx * iz,
                    zero,
                    (-cam.fx * x + cam.bf) * iz2,
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )  # (N, 3, 3)
    # d(xc)/d(twist) for xc' = exp(xi) (Tcw X): [ I | -xc^ ]
    dxc = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3), xc.shape[:-1] + (3, 3)),
            -se3.hat(xc),
        ],
        axis=-1,
    )  # (N, 3, 6)
    return r, hmat(j_proj, dxc)


def _chi2(r: jnp.ndarray, obs: PoseObservations) -> jnp.ndarray:
    """Per-observation chi2 = r^T Omega r with Omega = I/sigma2 (mono:
    first two rows only)."""
    w = 1.0 / obs.sigma2
    r2_mono = jnp.sum(r[..., :2] ** 2, axis=-1)
    r2_stereo = jnp.sum(r ** 2, axis=-1)
    return jnp.where(obs.is_stereo, r2_stereo, r2_mono) * w


def _normal_equations(
    r: jnp.ndarray,
    J: jnp.ndarray,
    obs: PoseObservations,
    active: jnp.ndarray,
    use_huber: bool,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build H (6,6), b (6,), and total robust chi2 over active obs."""
    chi2 = _chi2(r, obs)
    if use_huber:
        delta = jnp.where(obs.is_stereo, DELTA_STEREO, DELTA_MONO)
        s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        w_huber = jnp.where(s <= delta, 1.0, delta / s)
        rho = jnp.where(
            s <= delta, chi2, 2.0 * delta * s - delta * delta
        )
    else:
        w_huber = jnp.ones_like(chi2)
        rho = chi2
    # zero out the uR row for mono observations
    row_mask = jnp.concatenate(
        [
            jnp.ones(r.shape[:-1] + (2,), r.dtype),
            obs.is_stereo[..., None].astype(r.dtype),
        ],
        axis=-1,
    )
    w = (active.astype(r.dtype) * w_huber / obs.sigma2)[..., None] * row_mask
    Jw = J * w[..., None]  # (N, 3, 6)
    H = jnp.einsum(
        "nij,nik->jk", Jw, J, precision=jax.lax.Precision.HIGHEST
    )
    b = -jnp.einsum(
        "nij,ni->j", Jw, r, precision=jax.lax.Precision.HIGHEST
    )
    total = jnp.sum(jnp.where(active, rho, 0.0))
    return H, b, total


def _lm_iterations(
    T0: jnp.ndarray,
    obs: PoseObservations,
    cam: CameraParams,
    active: jnp.ndarray,
    use_huber: bool,
    n_iters: int,
) -> jnp.ndarray:
    """One g2o-style LM round (ref: g2o OptimizationAlgorithmLevenberg):
    lambda_init = 1e-5 * max diag(H); accept/reject steps by chi2."""

    def chi2_at(T: jnp.ndarray) -> jnp.ndarray:
        r, _ = _residuals_jacobians(T, obs, cam)
        _, _, c = _normal_equations(r, _dummy_j(r), obs, active, use_huber)
        return c

    def _dummy_j(r):
        return jnp.zeros(r.shape + (6,), r.dtype)

    r0, J0 = _residuals_jacobians(T0, obs, cam)
    H0, _, _ = _normal_equations(r0, J0, obs, active, use_huber)
    lam0 = 1e-5 * jnp.max(jnp.diagonal(H0))

    def step(carry, _):
        T, lam, best_chi2 = carry
        r, J = _residuals_jacobians(T, obs, cam)
        H, b, _ = _normal_equations(r, J, obs, active, use_huber)
        Hl = H + lam * jnp.eye(6, dtype=H.dtype)
        with jax.default_matmul_precision("highest"):
            # keep the 6x6 factorization off the TPU's bf16 matmul
            # default — per-frame pose updates are centimetre-scale
            dx = jnp.linalg.solve(Hl, b)
        T_new = hmat(se3.exp(dx), T)
        new_chi2 = chi2_at(T_new)
        improved = new_chi2 < best_chi2
        T = jnp.where(improved, T_new, T)
        lam = jnp.where(improved, lam * 0.5, lam * 4.0)
        best_chi2 = jnp.minimum(new_chi2, best_chi2)
        return (T, lam, best_chi2), None

    (T, _, _), _ = jax.lax.scan(
        step, (T0, lam0, chi2_at(T0)), None, length=n_iters
    )
    return T


def optimize_pose_impl(
    T_init: jnp.ndarray,
    obs: PoseObservations,
    cam: CameraParams,
    rounds: int = 4,
    iterations: int = 10,
) -> PoseResult:
    """Full PoseOptimization (ref: Optimizer.cc:273-491).

    Each round: LM from the CURRENT estimate over current inliers
    (Huber in rounds 1-2, none after, matching g2o's ``it == 2`` robust
    kernel removal at Optimizer.cc:455-459), then re-classify every
    valid observation by chi2 (outliers can come back, ref
    Optimizer.cc:427-466).
    """
    inliers0 = obs.valid

    def round_body(carry, round_idx):
        T, inliers = carry
        use_huber_round = round_idx < 2

        def run(use_huber):
            return _lm_iterations(T, obs, cam, inliers, use_huber,
                                  iterations)

        T_new = jax.lax.cond(
            use_huber_round, lambda: run(True), lambda: run(False)
        )
        r, _ = _residuals_jacobians(T_new, obs, cam)
        chi2 = _chi2(r, obs)
        th = jnp.where(obs.is_stereo, CHI2_STEREO, CHI2_MONO)
        new_inliers = obs.valid & (chi2 <= th)
        return (T_new, new_inliers), None

    (T, inliers), _ = jax.lax.scan(
        round_body, (T_init, inliers0), jnp.arange(rounds)
    )

    # marginal covariance = inv(H) at the final estimate over inliers,
    # no robust kernel — g2o computeMarginals on the pose block
    # (ref: Optimizer.cc:482-487)
    r, J = _residuals_jacobians(T, obs, cam)
    H, _, chi2_total = _normal_equations(r, J, obs, inliers, False)
    # guard: if too few inliers the Hessian is singular; regularize
    n_in = jnp.sum(inliers)
    H_safe = H + jnp.where(n_in >= 3, 0.0, 1.0) * jnp.eye(6, dtype=H.dtype)
    cov = jnp.linalg.inv(H_safe)
    return PoseResult(
        pose=T,
        covariance=cov,
        inliers=inliers,
        n_inliers=n_in.astype(jnp.int32),
        chi2=chi2_total,
    )


optimize_pose = jax.jit(
    optimize_pose_impl, static_argnames=("cam", "rounds", "iterations")
)
