"""Sim(3) utilities and the Horn closed-form similarity solver.

Replaces g2o's Sim3 type and Sim3Solver (ref:
src/orbslam/Sim3Solver.cc, Horn 1987 closed-form quaternion method at
:224-330) with batched array math: RANSAC hypotheses become a batch
axis (every minimal 3-point set solved at once).

Representation: (s, R, t) with action x -> s R x + t. Stereo SLAM
fixes s = 1 in the solver (ref: Sim3Solver fixed-scale flag; stereo
loop closure uses SE3-like Sim3s) but the full similarity path is kept
for parity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sivo_tpu.geometry import se3
from sivo_tpu.utils.precision import hmat


class Sim3(NamedTuple):
    s: jnp.ndarray  # (...,)
    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)


def identity() -> Sim3:
    return Sim3(
        s=jnp.ones(()), R=jnp.eye(3), t=jnp.zeros(3)
    )


def from_se3(T: jnp.ndarray) -> Sim3:
    return Sim3(
        s=jnp.ones(T.shape[:-2]), R=T[..., :3, :3], t=T[..., :3, 3]
    )


def to_se3(g: Sim3) -> jnp.ndarray:
    """Project to SE3: [sR -> R, t -> t/s] (ref: LoopClosing.cc:
    CorrectLoop converts corrected Sim3 back with translation/scale)."""
    return se3.make_pose(g.R, g.t / g.s[..., None])


def apply(g: Sim3, x: jnp.ndarray) -> jnp.ndarray:
    return (
        g.s[..., None] * (g.R @ x[..., None])[..., 0] + g.t
    )


def compose(a: Sim3, b: Sim3) -> Sim3:
    """a after b: x -> a(b(x))."""
    return Sim3(
        s=a.s * b.s,
        R=hmat(a.R, b.R),
        t=a.s[..., None] * (a.R @ b.t[..., None])[..., 0] + a.t,
    )


def inverse(g: Sim3) -> Sim3:
    Rt = jnp.swapaxes(g.R, -1, -2)
    inv_s = 1.0 / g.s
    return Sim3(
        s=inv_s,
        R=Rt,
        t=-(inv_s[..., None]) * (Rt @ g.t[..., None])[..., 0],
    )


def horn_alignment(
    p1: jnp.ndarray,  # (..., M, 3) points in frame 1
    p2: jnp.ndarray,  # (..., M, 3) corresponding points in frame 2
    fix_scale: bool = True,
) -> Sim3:
    """Closed-form similarity p2 -> p1 (ref: Sim3Solver.cc:224-330,
    Horn 1987): returns g with p1 ~= g(p2). Batched over leading dims.

    Rotation via the SVD form of the absolute-orientation problem
    (equivalent to Horn's quaternion eigenvector method); scale is
    Horn's symmetric ratio unless fixed (stereo, ref: Sim3Solver
    mbFixScale).
    """
    c1 = jnp.mean(p1, axis=-2, keepdims=True)
    c2 = jnp.mean(p2, axis=-2, keepdims=True)
    q1 = p1 - c1
    q2 = p2 - c2
    H = hmat(jnp.swapaxes(q2, -1, -2), q1)  # (..., 3, 3)
    # bf16-default SVD iterations yield non-orthonormal U/V -> a scaled
    # R that poisons every downstream pose product (see pnp._kabsch)
    with jax.default_matmul_precision("highest"):
        U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(
        hmat(jnp.swapaxes(Vt, -1, -2), jnp.swapaxes(U, -1, -2))
    )
    D = jnp.zeros_like(H)
    D = D.at[..., 0, 0].set(1.0)
    D = D.at[..., 1, 1].set(1.0)
    D = D.at[..., 2, 2].set(det)
    R = hmat(jnp.swapaxes(Vt, -1, -2),
             hmat(D, jnp.swapaxes(U, -1, -2)))  # p2 -> p1
    if fix_scale:
        s = jnp.ones(R.shape[:-2])
    else:
        # Horn symmetric scale: sqrt(sum|q1|^2 / sum|q2|^2)
        s = jnp.sqrt(
            jnp.sum(q1 * q1, axis=(-1, -2))
            / jnp.maximum(jnp.sum(q2 * q2, axis=(-1, -2)), 1e-12)
        )
    t = c1[..., 0, :] - s[..., None] * (R @ c2[..., 0, :, None])[..., 0]
    return Sim3(s=s, R=R, t=t)


def log(g: Sim3) -> jnp.ndarray:
    """(..., 7) [rho, phi, log s] — minimal coordinates for the pose
    graph (first-order Vs approximation is adequate at loop-closure
    magnitudes; exact exp/log pair below)."""
    phi = se3.so3_log(g.R)
    sigma = jnp.log(g.s)
    # translation part via the SE3 V-inverse on t/s is a first-order
    # approximation of the Sim3 left Jacobian; it pairs with exp below
    T = se3.make_pose(g.R, g.t)
    rho = se3.log(T)[..., :3]
    return jnp.concatenate(
        [rho, phi, sigma[..., None]], axis=-1
    )


def exp(xi: jnp.ndarray) -> Sim3:
    """Inverse of log above."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    T = se3.exp(jnp.concatenate([rho, phi], axis=-1))
    return Sim3(s=jnp.exp(sigma), R=T[..., :3, :3], t=T[..., :3, 3])
