"""Multi-chip bundle adjustment: point blocks sharded over a mesh.

The reference has no distributed compute at all (SURVEY §2.3); the one
axis of its problem that scales beyond a chip is the BA factor graph.
This module shards the POINT dimension of the local/global BA problem
across a ``jax.sharding.Mesh``: every device owns a slice of the points
and their observations, builds its partial camera Hessian and partial
Schur complement locally, and a single ``psum`` over the ICI produces
the reduced camera system, which each device solves redundantly (it is
tiny: 6K x 6K) before back-substituting its own point updates — the
"points partitioned per core, Schur reduction as a psum" design of
SURVEY §5.7.

Cameras are replicated; the per-iteration communication is ONE psum of
(6K)^2 + 6K floats regardless of the point count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from sivo_tpu.geometry import se3
from sivo_tpu.geometry.projection import CameraParams
from sivo_tpu.optim.local_ba import (
    BAProblem,
    BAResult,
    CHI2_MONO,
    CHI2_STEREO,
    DELTA_MONO,
    DELTA_STEREO,
    _chi2,
    _residuals,
)
from sivo_tpu.utils.precision import hmat


def partition_problem(prob: BAProblem, n_shards: int) -> BAProblem:
    """Reorder observations by point id so each shard's obs reference
    only its own point slice (points are already position-indexed;
    observations sort by obs_pt). Padding keeps shapes divisible."""
    import numpy as np

    P_total = prob.pt_pos.shape[0]
    O_total = prob.obs_kf.shape[0]
    assert P_total % n_shards == 0, "pad pt capacity to n_shards"
    assert O_total % n_shards == 0, "pad obs capacity to n_shards"
    P_loc = P_total // n_shards
    O_loc = O_total // n_shards

    obs_pt = np.asarray(prob.obs_pt)
    obs_ok = np.asarray(prob.obs_valid)
    # slot indices: shard s's observations occupy [s*O_loc, (s+1)*O_loc)
    perm = np.zeros(O_total, np.int64)  # destination slot -> source obs
    valid_out = np.zeros(O_total, bool)
    for s in range(n_shards):
        src = np.where(
            obs_ok
            & (obs_pt >= s * P_loc)
            & (obs_pt < (s + 1) * P_loc)
        )[0]
        n = min(len(src), O_loc)  # overflow beyond O_loc is dropped
        dst = s * O_loc
        perm[dst : dst + n] = src[:n]
        valid_out[dst : dst + n] = True

    def take_obs(x):
        return jnp.asarray(np.asarray(x)[perm])

    return prob._replace(
        obs_kf=take_obs(prob.obs_kf),
        obs_pt=take_obs(prob.obs_pt),
        obs_uvr=take_obs(prob.obs_uvr),
        obs_sigma2=take_obs(prob.obs_sigma2),
        obs_is_stereo=take_obs(prob.obs_is_stereo),
        obs_valid=jnp.asarray(valid_out),
    )


@functools.partial(
    jax.jit, static_argnames=("cam", "mesh", "iterations", "use_huber")
)
def sharded_bundle_adjustment(
    prob: BAProblem,
    cam: CameraParams,
    mesh: Mesh,
    iterations: int = 10,
    use_huber: bool = False,
) -> BAResult:
    """BA with points/observations sharded along mesh axis 'ba'.

    ``prob`` must be pre-partitioned with ``partition_problem`` (each
    shard's observations index only its point slice).
    """
    K = prob.kf_pose.shape[0]
    n_shards = mesh.shape["ba"]
    P_total = prob.pt_pos.shape[0]
    P_loc = P_total // n_shards
    free_kf = prob.kf_valid & ~prob.kf_fixed

    spec_obs = P("ba")
    in_specs = BAProblem(
        kf_pose=P(), kf_fixed=P(), kf_valid=P(),
        pt_pos=P("ba"), pt_valid=P("ba"),
        obs_kf=spec_obs, obs_pt=spec_obs, obs_uvr=spec_obs,
        obs_sigma2=spec_obs, obs_is_stereo=spec_obs,
        obs_valid=spec_obs,
    )

    def local(prob_l: BAProblem) -> BAResult:
        shard = jax.lax.axis_index("ba")
        pt_base = shard * P_loc
        # local problem: local point indices
        prob_l = prob_l._replace(
            obs_pt=(prob_l.obs_pt - pt_base).astype(jnp.int32)
        )

        def step(carry, _):
            kp, pp, lam, best = carry
            r, Jc, Jp, _ = _residuals(
                kp, pp,
                prob_l._replace(kf_pose=kp, pt_pos=pp),
                cam,
            )
            chi2 = _chi2(r, prob_l)
            if use_huber:
                delta = jnp.where(
                    prob_l.obs_is_stereo, DELTA_STEREO, DELTA_MONO
                )
                s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
                wh = jnp.where(s <= delta, 1.0, delta / s)
            else:
                wh = jnp.ones_like(chi2)
            row_mask = jnp.concatenate(
                [
                    jnp.ones((r.shape[0], 2), r.dtype),
                    prob_l.obs_is_stereo[:, None].astype(r.dtype),
                ],
                axis=-1,
            )
            active = prob_l.obs_valid
            w = (
                active.astype(r.dtype) * wh / prob_l.obs_sigma2
            )[:, None] * row_mask
            Jc_w = Jc * w[..., None]
            Jp_w = Jp * w[..., None]
            hi = jax.lax.Precision.HIGHEST
            # partial camera Hessian/gradient -> psum
            Hcc = jnp.zeros((K, 6, 6)).at[prob_l.obs_kf].add(
                jnp.einsum("oij,oik->ojk", Jc_w, Jc, precision=hi)
            )
            bc = jnp.zeros((K, 6)).at[prob_l.obs_kf].add(
                -jnp.einsum("oij,oi->oj", Jc_w, r, precision=hi)
            )
            Hpp = jnp.zeros((P_loc, 3, 3)).at[prob_l.obs_pt].add(
                jnp.einsum("oij,oik->ojk", Jp_w, Jp, precision=hi)
            )
            bp = jnp.zeros((P_loc, 3)).at[prob_l.obs_pt].add(
                -jnp.einsum("oij,oi->oj", Jp_w, r, precision=hi)
            )
            Hcp = jnp.einsum("oij,oik->ojk", Jc_w, Jp, precision=hi)
            E = jnp.zeros((P_loc, K, 6, 3)).at[
                prob_l.obs_pt, prob_l.obs_kf
            ].add(Hcp)
            has_pt = (
                jnp.zeros(P_loc).at[prob_l.obs_pt].add(
                    active.astype(jnp.float32)
                )
                > 0
            ) & prob_l.pt_valid
            Hpp_d = Hpp + (lam + 1e-9) * jnp.eye(3)[None]
            Hpp_d = jnp.where(
                has_pt[:, None, None], Hpp_d, jnp.eye(3)[None]
            )
            Hpp_inv = jnp.linalg.inv(Hpp_d)
            G = jnp.einsum("pkil,plm->pkim", E, Hpp_inv, precision=hi)
            G2 = G.reshape(P_loc, K * 6, 3)
            E2 = E.reshape(P_loc, K * 6, 3)
            S_part = jnp.einsum("pal,pbl->ab", G2, E2, precision=hi)
            b_part = jnp.einsum("pal,pl->a", G2, bp, precision=hi)

            # ONE collective: the reduced camera system over ICI
            Hcc = jax.lax.psum(Hcc, "ba")
            bc = jax.lax.psum(bc, "ba")
            S_red = jax.lax.psum(S_part, "ba")
            b_sub = jax.lax.psum(b_part, "ba")

            idx = jnp.arange(K)
            S = (-S_red).reshape(K, 6, K, 6)
            S = S.at[idx, :, idx, :].add(Hcc + lam * jnp.eye(6)[None])
            S = S.reshape(K * 6, K * 6)
            free6 = jnp.repeat(free_kf, 6)
            S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
            S = S + jnp.diag(jnp.where(free6, 0.0, 1.0))
            b_red = jnp.where(free6, bc.reshape(-1) - b_sub, 0.0)
            dc = jnp.linalg.solve(S, b_red).reshape(K, 6)

            Etd = jnp.einsum("pkil,ki->pl", E, dc, precision=hi)
            dp = jnp.einsum("plm,pm->pl", Hpp_inv, bp - Etd,
                            precision=hi)
            dp = jnp.where(has_pt[:, None], dp, 0.0)

            kp_new = jnp.where(
                free_kf[:, None, None], hmat(se3.exp(dc), kp), kp
            )
            pp_new = pp + dp
            # chi2 for LM accept (global)
            r2, _, _, _ = _residuals(
                kp_new, pp_new,
                prob_l._replace(kf_pose=kp_new, pt_pos=pp_new),
                cam,
            )
            new_chi2 = jax.lax.psum(
                jnp.sum(jnp.where(active, _chi2(r2, prob_l), 0.0)),
                "ba",
            )
            improved = new_chi2 < best
            kp = jnp.where(improved, kp_new, kp)
            pp = jnp.where(improved, pp_new, pp)
            lam = jnp.where(improved, lam * 0.5, lam * 4.0)
            best = jnp.minimum(new_chi2, best)
            return (kp, pp, lam, best), S

        r0, _, _, _ = _residuals(
            prob_l.kf_pose, prob_l.pt_pos, prob_l, cam
        )
        chi0 = jax.lax.psum(
            jnp.sum(
                jnp.where(prob_l.obs_valid, _chi2(r0, prob_l), 0.0)
            ),
            "ba",
        )
        (kp, pp, lam, _), S_hist = jax.lax.scan(
            step,
            (prob_l.kf_pose, prob_l.pt_pos, jnp.float32(1e-4), chi0),
            None,
            length=iterations,
        )
        # final classification + newest-KF covariance
        r, _, _, z = _residuals(
            kp, pp, prob_l._replace(kf_pose=kp, pt_pos=pp), cam
        )
        chi2 = _chi2(r, prob_l)
        th = jnp.where(prob_l.obs_is_stereo, CHI2_STEREO, CHI2_MONO)
        inlier = prob_l.obs_valid & (chi2 <= th) & (z > 0)
        S_last = S_hist[-1]
        cov = jnp.linalg.inv(S_last + 1e-9 * jnp.eye(K * 6))[:6, :6]
        total = jax.lax.psum(
            jnp.sum(jnp.where(inlier, chi2, 0.0)), "ba"
        )
        return BAResult(
            kf_pose=kp, pt_pos=pp, obs_inlier=inlier,
            newest_cov=cov, chi2=total,
        )

    out_specs = BAResult(
        kf_pose=P(), pt_pos=P("ba"), obs_inlier=P("ba"),
        newest_cov=P(), chi2=P(),
    )
    return shard_map(
        local, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs,
    )(prob)
