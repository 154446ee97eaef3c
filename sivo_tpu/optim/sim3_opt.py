"""Sim3 refinement between two keyframes (loop closure).

TPU-native replacement for Optimizer::OptimizeSim3
(ref: src/orbslam/Optimizer.cc:1236-1449): one Sim3 vertex, a pair of
projection edges per matched point (forward: KF2's points through S12
into KF1's image; backward: KF1's points through S12^-1 into KF2's),
Huber(sqrt(10)), inlier recheck. Implemented as batched Gauss-Newton
with autodiff Jacobians over a 7-dof perturbation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sivo_tpu.geometry import sim3
from sivo_tpu.geometry.projection import CameraParams, project

CHI2_TH = 10.0  # ref: LoopClosing.cc:334-337 th2=10
DELTA = 3.16227766017  # sqrt(10), ref: Optimizer.cc:1320 deltaHuber


class Sim3Result(NamedTuple):
    g12: sim3.Sim3
    inliers: jnp.ndarray  # (N,) bool matched-pair inliers
    n_inliers: jnp.ndarray  # () int32


def _residuals(
    xi: jnp.ndarray,
    g0: sim3.Sim3,
    pc1: jnp.ndarray,  # (N, 3) matched points in camera-1 frame
    pc2: jnp.ndarray,  # (N, 3) matched points in camera-2 frame
    uv1: jnp.ndarray,  # (N, 2) observations in image 1
    uv2: jnp.ndarray,  # (N, 2) observations in image 2
    cam: CameraParams,
) -> jnp.ndarray:
    """(N, 4): [proj1(S12 pc2) - uv1, proj2(S12^-1 pc1) - uv2]."""
    g = sim3.compose(sim3.exp(xi), g0)
    p1 = sim3.apply(g, pc2)
    p2 = sim3.apply(sim3.inverse(g), pc1)
    r1 = project(cam, p1) - uv1
    r2 = project(cam, p2) - uv2
    return jnp.concatenate([r1, r2], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("cam", "fix_scale", "iterations")
)
def optimize_sim3(
    g_init: sim3.Sim3,
    pc1: jnp.ndarray,
    pc2: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    sigma2_1: jnp.ndarray,  # (N,)
    sigma2_2: jnp.ndarray,  # (N,)
    valid: jnp.ndarray,  # (N,)
    cam: CameraParams,
    fix_scale: bool = True,
    iterations: int = 10,
) -> Sim3Result:
    n = pc1.shape[0]
    jac_fn = jax.jacfwd(_residuals, argnums=0)

    def chi2_parts(xi, g0):
        r = _residuals(xi, g0, pc1, pc2, uv1, uv2, cam)
        c1 = jnp.sum(r[:, :2] ** 2, axis=-1) / sigma2_1
        c2 = jnp.sum(r[:, 2:] ** 2, axis=-1) / sigma2_2
        return r, c1, c2

    def step(carry, _):
        g_s, g_R, g_t, active = carry
        g0 = sim3.Sim3(s=g_s, R=g_R, t=g_t)
        zero = jnp.zeros(7)
        r, c1, c2 = chi2_parts(zero, g0)
        J = jac_fn(zero, g0, pc1, pc2, uv1, uv2, cam)  # (N, 4, 7)
        # huber weights per sub-edge
        s1 = jnp.sqrt(jnp.maximum(c1, 1e-12))
        s2 = jnp.sqrt(jnp.maximum(c2, 1e-12))
        w1 = jnp.where(s1 <= DELTA, 1.0, DELTA / s1) / sigma2_1
        w2 = jnp.where(s2 <= DELTA, 1.0, DELTA / s2) / sigma2_2
        a = active.astype(jnp.float32)
        w = jnp.stack([w1 * a, w1 * a, w2 * a, w2 * a], axis=-1)
        Jw = J * w[..., None]
        H = jnp.einsum("nij,nik->jk", Jw, J,
                       precision=jax.lax.Precision.HIGHEST)
        b = -jnp.einsum("nij,ni->j", Jw, r,
                        precision=jax.lax.Precision.HIGHEST)
        if fix_scale:  # stereo: lock the scale coordinate
            H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
            b = b.at[6].set(0.0)
        dx = jnp.linalg.solve(H + 1e-6 * jnp.eye(7), b)
        g_new = sim3.compose(sim3.exp(dx), g0)
        return (g_new.s, g_new.R, g_new.t, active), None

    active0 = valid
    (s, R, t, _), _ = jax.lax.scan(
        step,
        (g_init.s, g_init.R, g_init.t, active0),
        None,
        length=iterations,
    )
    g = sim3.Sim3(s=s, R=R, t=t)
    _, c1, c2 = chi2_parts(jnp.zeros(7), g)
    inliers = valid & (c1 <= CHI2_TH) & (c2 <= CHI2_TH)
    return Sim3Result(
        g12=g,
        inliers=inliers,
        n_inliers=jnp.sum(inliers).astype(jnp.int32),
    )


def ransac_sim3(
    pc1: jnp.ndarray,
    pc2: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    sigma2_1: jnp.ndarray,
    sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,
    rng: jnp.ndarray,
    cam: CameraParams,
    fix_scale: bool = True,
    n_hypotheses: int = 128,
    min_inliers: int = 20,
) -> Sim3Result:
    """Batched Sim3 RANSAC (replaces Sim3Solver::iterate,
    ref: Sim3Solver.cc:115-213): all 3-point Horn hypotheses at once,
    reprojection inlier check in both cameras (ref: CheckInliers)."""
    n = pc1.shape[0]
    g = jax.random.gumbel(rng, (n_hypotheses, n))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, sets = jax.lax.top_k(g, 3)
    hyp = sim3.horn_alignment(
        pc1[sets], pc2[sets], fix_scale=fix_scale
    )  # batched (H,)

    p1h = jax.vmap(lambda gg: sim3.apply(gg, pc2))(hyp)  # (H, N, 3)
    p2h = jax.vmap(lambda gg: sim3.apply(sim3.inverse(gg), pc1))(hyp)
    e1 = jnp.sum(
        (project(cam, p1h) - uv1[None]) ** 2, axis=-1
    ) / sigma2_1[None]
    e2 = jnp.sum(
        (project(cam, p2h) - uv2[None]) ** 2, axis=-1
    ) / sigma2_2[None]
    inl = (e1 < 9.21) & (e2 < 9.21) & valid[None]  # ref: Sim3Solver
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    g_best = sim3.Sim3(
        s=hyp.s[best], R=hyp.R[best], t=hyp.t[best]
    )
    res = optimize_sim3(
        g_best, pc1, pc2, uv1, uv2, sigma2_1, sigma2_2,
        inl[best], cam, fix_scale=fix_scale,
    )
    ok_count = jnp.maximum(res.n_inliers, counts[best])
    return Sim3Result(
        g12=res.g12, inliers=res.inliers,
        n_inliers=res.n_inliers,
    )
