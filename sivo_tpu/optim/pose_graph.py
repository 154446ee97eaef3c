"""Sim3 pose-graph (essential graph) optimization.

TPU-native replacement for Optimizer::OptimizeEssentialGraph
(ref: src/orbslam/Optimizer.cc:928-1234): Sim3 vertices for every
keyframe, edges from the loop closure + spanning tree + strong
covisibility (weight >= 100), 20 LM iterations with lambda_init=1e-16
(i.e. effectively Gauss-Newton), loop keyframe fixed.

JAX-native twist: edge Jacobians come from vmapped autodiff of the
residual (no hand-derived Sim3 adjoints), the normal equations assemble
by scatter-add into a dense (7K, 7K) system, and one Cholesky solve
updates all keyframes — at ORB-SLAM2 scales (<= ~1-2k KFs) dense beats
sparse on this hardware.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sivo_tpu.geometry import sim3
from sivo_tpu.utils.precision import hmat


class PoseGraphProblem(NamedTuple):
    # vertices (K,...): current keyframe Sim3 world->camera
    s: jnp.ndarray  # (K,)
    R: jnp.ndarray  # (K, 3, 3)
    t: jnp.ndarray  # (K, 3)
    fixed: jnp.ndarray  # (K,) bool
    valid: jnp.ndarray  # (K,) bool
    # edges (E,...): measurement = relative Sim3  S_ij = S_i * S_j^-1
    edge_i: jnp.ndarray  # (E,) int32
    edge_j: jnp.ndarray  # (E,) int32
    meas_s: jnp.ndarray  # (E,)
    meas_R: jnp.ndarray  # (E, 3, 3)
    meas_t: jnp.ndarray  # (E, 3)
    edge_valid: jnp.ndarray  # (E,) bool


def _edge_residual(
    xi_i: jnp.ndarray,
    xi_j: jnp.ndarray,
    Si: sim3.Sim3,
    Sj: sim3.Sim3,
    Sm: sim3.Sim3,
) -> jnp.ndarray:
    """r = log( Sm^-1 * (exp(xi_i) Si) * (exp(xi_j) Sj)^-1 ), the g2o
    EdgeSim3 error with left-multiplicative vertex perturbations."""
    Pi = sim3.compose(sim3.exp(xi_i), Si)
    Pj = sim3.compose(sim3.exp(xi_j), Sj)
    rel = sim3.compose(Pi, sim3.inverse(Pj))
    err = sim3.compose(sim3.inverse(Sm), rel)
    return sim3.log(err)


# autodiff Jacobians w.r.t. both endpoint perturbations
_res_jac = jax.vmap(
    jax.jacfwd(_edge_residual, argnums=(0, 1)),
    in_axes=(0, 0, 0, 0, 0),
)
_res_val = jax.vmap(_edge_residual, in_axes=(0, 0, 0, 0, 0))


@functools.partial(jax.jit, static_argnames=("iterations",))
def optimize_essential_graph(
    prob: PoseGraphProblem, iterations: int = 20
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns optimized (s (K,), R (K,3,3), t (K,3))."""
    K = prob.s.shape[0]
    E = prob.edge_i.shape[0]
    zero7 = jnp.zeros((E, 7))
    free = prob.valid & ~prob.fixed

    def gather(v, idx):
        return jax.tree.map(lambda x: x[idx], v)

    def step(state, _):
        s, R, t = state
        Sv = sim3.Sim3(s=s, R=R, t=t)
        Si = gather(Sv, prob.edge_i)
        Sj = gather(Sv, prob.edge_j)
        Sm = sim3.Sim3(s=prob.meas_s, R=prob.meas_R, t=prob.meas_t)
        r = _res_val(zero7, zero7, Si, Sj, Sm)  # (E, 7)
        Ji, Jj = _res_jac(zero7, zero7, Si, Sj, Sm)  # (E, 7, 7) each
        w = prob.edge_valid.astype(jnp.float32)[:, None, None]
        Ji = Ji * w
        Jj = Jj * w

        # assemble H (K,7,K,7) and b (K,7) by scatter-add
        H = jnp.zeros((K, 7, K, 7))
        Hii = jnp.einsum("eij,eik->ejk", Ji, Ji,
                         precision=jax.lax.Precision.HIGHEST)
        Hjj = jnp.einsum("eij,eik->ejk", Jj, Jj,
                         precision=jax.lax.Precision.HIGHEST)
        Hij = jnp.einsum("eij,eik->ejk", Ji, Jj,
                         precision=jax.lax.Precision.HIGHEST)
        H = H.at[prob.edge_i, :, prob.edge_i, :].add(Hii)
        H = H.at[prob.edge_j, :, prob.edge_j, :].add(Hjj)
        H = H.at[prob.edge_i, :, prob.edge_j, :].add(Hij)
        H = H.at[prob.edge_j, :, prob.edge_i, :].add(
            jnp.swapaxes(Hij, -1, -2)
        )
        rw = r * prob.edge_valid.astype(jnp.float32)[:, None]
        b = jnp.zeros((K, 7))
        b = b.at[prob.edge_i].add(
            -jnp.einsum("eij,ei->ej", Ji, rw,
                        precision=jax.lax.Precision.HIGHEST)
        )
        b = b.at[prob.edge_j].add(
            -jnp.einsum("eij,ei->ej", Jj, rw,
                        precision=jax.lax.Precision.HIGHEST)
        )

        H2 = H.reshape(7 * K, 7 * K)
        free7 = jnp.repeat(free, 7)
        mask2d = free7[:, None] & free7[None, :]
        H2 = jnp.where(mask2d, H2, 0.0)
        H2 = H2 + jnp.diag(
            jnp.where(free7, 1e-6, 1.0)
        )  # tiny damping (ref lambda_init 1e-16) + gauge rows
        b2 = jnp.where(free7, b.reshape(-1), 0.0)
        # the dense (7K, 7K) factorization must NOT run at the TPU's
        # default bf16 matmul precision: this system's conditioning
        # (chains of near-identity Sim3s) amplifies half-precision
        # round-off into metre-scale vertex error
        with jax.default_matmul_precision("highest"):
            dx = jnp.linalg.solve(H2, b2).reshape(K, 7)
        dS = sim3.exp(dx)
        Sv_new = sim3.compose(dS, Sv)
        keep = free[:, None]
        s_n = jnp.where(free, Sv_new.s, s)
        R_n = jnp.where(keep[..., None], Sv_new.R, R)
        t_n = jnp.where(keep, Sv_new.t, t)
        return (s_n, R_n, t_n), jnp.sum(rw * rw)

    (s, R, t), _ = jax.lax.scan(
        step, (prob.s, prob.R, prob.t), None, length=iterations
    )
    return s, R, t
