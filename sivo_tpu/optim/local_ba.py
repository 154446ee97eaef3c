"""Local bundle adjustment: batched LM with Schur complement on points.

TPU-native replacement for Optimizer::LocalBundleAdjustment
(ref: src/orbslam/Optimizer.cc:493-926), which builds a g2o graph over
the covisible keyframe neighborhood (+ fixed frontier KFs), marginalizes
the point blocks, and solves the reduced camera system with Cholmod,
finally recovering the newest keyframe's 6x6 marginal covariance
(Optimizer.cc:876-912).

Here the whole two-stage solve (5 robust iterations, outlier demotion,
10 more — ref: Optimizer.cc:763-820) is one jitted program with fixed
caps: the point Hessian blocks invert in batch (3x3), the Schur
reduction is one big MXU contraction over points, and the reduced
camera system (6K x 6K, K <= 32) solves densely — at ORB-SLAM2 scales
dense beats sparse on this hardware (SURVEY §7 "hard parts").

The newest-KF marginal covariance is the corresponding 6x6 block of
S^-1 (the reduced system's inverse), matching g2o's computeMarginals
after point marginalization.
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
DELTA_MONO = 2.447651936
DELTA_STEREO = 2.795531791


class BAProblem(NamedTuple):
    """Padded local BA problem."""

    kf_pose: jnp.ndarray  # (K, 4, 4) Tcw
    kf_fixed: jnp.ndarray  # (K,) bool — frontier KFs held constant
    kf_valid: jnp.ndarray  # (K,) bool
    pt_pos: jnp.ndarray  # (P, 3)
    pt_valid: jnp.ndarray  # (P,) bool
    obs_kf: jnp.ndarray  # (O,) int32 index into kf arrays
    obs_pt: jnp.ndarray  # (O,) int32 index into pt arrays
    obs_uvr: jnp.ndarray  # (O, 3) measured (uL, vL, uR)
    obs_sigma2: jnp.ndarray  # (O,)
    obs_is_stereo: jnp.ndarray  # (O,) bool
    obs_valid: jnp.ndarray  # (O,) bool


class BAResult(NamedTuple):
    kf_pose: jnp.ndarray  # (K, 4, 4) optimized
    pt_pos: jnp.ndarray  # (P, 3) optimized
    obs_inlier: jnp.ndarray  # (O,) final classification (for erasure,
    #                            ref: Optimizer.cc:822-870)
    newest_cov: jnp.ndarray  # (6, 6) marginal of kf index `newest`
    chi2: jnp.ndarray  # () final total


def _residuals(
    kf_pose: jnp.ndarray,
    pt_pos: jnp.ndarray,
    prob: BAProblem,
    cam: CameraParams,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-observation residuals r (O,3), camera Jacobians Jc (O,3,6),
    point Jacobians Jp (O,3,3), camera-frame z (O,)."""
    T = kf_pose[prob.obs_kf]  # (O, 4, 4)
    X = pt_pos[prob.obs_pt]  # (O, 3)
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    xc = (R @ X[..., None])[..., 0] + t
    pred = project_stereo(cam, xc)
    r = pred - prob.obs_uvr

    x, y, z = xc[:, 0], xc[:, 1], xc[:, 2]
    z = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    iz = 1.0 / z
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    j_proj = jnp.stack(
        [
            jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2], axis=-1),
            jnp.stack([zero, cam.fy * iz, -cam.fy * y * iz2], axis=-1),
            jnp.stack(
                [cam.fx * iz, zero, (-cam.fx * x + cam.bf) * iz2], axis=-1
            ),
        ],
        axis=-2,
    )  # (O, 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3), (r.shape[0], 3, 3))
    dxc_dtwist = jnp.concatenate([eye, -se3.hat(xc)], axis=-1)  # (O,3,6)
    Jc = hmat(j_proj, dxc_dtwist)
    Jp = hmat(j_proj, R)  # dxc/dX = R
    return r, Jc, Jp, xc[:, 2]


def _chi2(r: jnp.ndarray, prob: BAProblem) -> jnp.ndarray:
    w = 1.0 / prob.obs_sigma2
    r2m = jnp.sum(r[:, :2] ** 2, axis=-1)
    r2s = jnp.sum(r ** 2, axis=-1)
    return jnp.where(prob.obs_is_stereo, r2s, r2m) * w


def _lm_round(
    kf_pose: jnp.ndarray,
    pt_pos: jnp.ndarray,
    prob: BAProblem,
    active: jnp.ndarray,
    cam: CameraParams,
    use_huber: bool,
    n_iters: int,
    lam0_scale: float = 1e-5,
):
    """One g2o-style LM stage over `active` observations."""
    K = prob.kf_pose.shape[0]
    P = prob.pt_pos.shape[0]
    free_kf = prob.kf_valid & ~prob.kf_fixed

    def robust_chi2(kp, pp):
        r, _, _, _ = _residuals(kp, pp, prob, cam)
        chi2 = _chi2(r, prob)
        if use_huber:
            delta = jnp.where(prob.obs_is_stereo, DELTA_STEREO, DELTA_MONO)
            s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            rho = jnp.where(
                s <= delta, chi2, 2.0 * delta * s - delta * delta
            )
        else:
            rho = chi2
        return jnp.sum(jnp.where(active, rho, 0.0))

    def build_and_solve(kp, pp, lam):
        r, Jc, Jp, _ = _residuals(kp, pp, prob, cam)
        chi2 = _chi2(r, prob)
        if use_huber:
            delta = jnp.where(prob.obs_is_stereo, DELTA_STEREO, DELTA_MONO)
            s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            wh = jnp.where(s <= delta, 1.0, delta / s)
        else:
            wh = jnp.ones_like(chi2)
        row_mask = jnp.concatenate(
            [
                jnp.ones((r.shape[0], 2), r.dtype),
                prob.obs_is_stereo[:, None].astype(r.dtype),
            ],
            axis=-1,
        )
        w = (active.astype(r.dtype) * wh / prob.obs_sigma2)[:, None]
        w = w * row_mask  # (O, 3)
        Jc_w = Jc * w[..., None]
        Jp_w = Jp * w[..., None]

        # block accumulations
        Hcc = jnp.zeros((K, 6, 6)).at[prob.obs_kf].add(
            jnp.einsum("oij,oik->ojk", Jc_w, Jc,
                       precision=jax.lax.Precision.HIGHEST)
        )
        Hpp = jnp.zeros((P, 3, 3)).at[prob.obs_pt].add(
            jnp.einsum("oij,oik->ojk", Jp_w, Jp,
                       precision=jax.lax.Precision.HIGHEST)
        )
        bc = jnp.zeros((K, 6)).at[prob.obs_kf].add(
            -jnp.einsum("oij,oi->oj", Jc_w, r,
                        precision=jax.lax.Precision.HIGHEST)
        )
        bp = jnp.zeros((P, 3)).at[prob.obs_pt].add(
            -jnp.einsum("oij,oi->oj", Jp_w, r,
                        precision=jax.lax.Precision.HIGHEST)
        )
        # per-obs cross blocks scattered into dense E (P, K, 6, 3)
        Hcp = jnp.einsum("oij,oik->ojk", Jc_w, Jp,
                         precision=jax.lax.Precision.HIGHEST)  # (O,6,3)
        E = jnp.zeros((P, K, 6, 3)).at[prob.obs_pt, prob.obs_kf].add(Hcp)

        # damped point-block inverses
        Hpp_d = Hpp + (
            lam * jnp.eye(3) + 1e-9 * jnp.eye(3)
        )[None]
        # guard: points with no observations get identity (delta = 0)
        has_pt = (
            jnp.zeros(P).at[prob.obs_pt].add(active.astype(jnp.float32))
            > 0
        ) & prob.pt_valid
        Hpp_d = jnp.where(
            has_pt[:, None, None], Hpp_d, jnp.eye(3)[None]
        )
        with jax.default_matmul_precision("highest"):
            Hpp_inv = jnp.linalg.inv(Hpp_d)

        # Schur: S = Hcc + lam I - sum_p E_p Hpp_inv E_p^T
        G = jnp.einsum("pkil,plm->pkim", E, Hpp_inv,
                       precision=jax.lax.Precision.HIGHEST)
        G2 = G.reshape(P, K * 6, 3)
        E2 = E.reshape(P, K * 6, 3)
        S_red = jnp.einsum("pal,pbl->ab", G2, E2,
                           precision=jax.lax.Precision.HIGHEST)
        # S = blockdiag(Hcc + lam I) - S_red
        Hcc_d = Hcc + lam * jnp.eye(6)[None]
        idx = jnp.arange(K)
        S = (-S_red).reshape(K, 6, K, 6)
        S = S.at[idx, :, idx, :].add(Hcc_d)
        S = S.reshape(K * 6, K * 6)

        # gauge: fixed/invalid cameras -> identity rows/cols, zero rhs
        free6 = jnp.repeat(free_kf, 6)
        mask2d = free6[:, None] & free6[None, :]
        S = jnp.where(mask2d, S, 0.0)
        S = S + jnp.diag(jnp.where(free6, 0.0, 1.0))
        b_red = (
            bc.reshape(-1)
            - jnp.einsum("pal,pl->a", G2, bp,
                         precision=jax.lax.Precision.HIGHEST)
        )
        b_red = jnp.where(free6, b_red, 0.0)

        with jax.default_matmul_precision("highest"):
            # bf16-default factorization noise exceeds the update
            # sizes this solve must resolve
            dc = jnp.linalg.solve(S, b_red).reshape(K, 6)
        # back-substitute points
        Etd = jnp.einsum("pkil,ki->pl", E, dc,
                         precision=jax.lax.Precision.HIGHEST)
        dp = jnp.einsum("plm,pm->pl", Hpp_inv, bp - Etd,
                        precision=jax.lax.Precision.HIGHEST)
        dp = jnp.where(has_pt[:, None], dp, 0.0)

        kp_new = jnp.where(
            free_kf[:, None, None], hmat(se3.exp(dc), kp), kp
        )
        pp_new = jnp.where(prob.pt_valid[:, None], pp + dp, pp)
        return kp_new, pp_new, S

    # initial lambda from max diagonal (g2o tau * max diag)
    r0, Jc0, Jp0, _ = _residuals(kf_pose, pt_pos, prob, cam)
    w0 = (active / prob.obs_sigma2)[:, None, None]
    diag_max = jnp.maximum(
        jnp.max(jnp.einsum("oij,oij->o", Jc0 * w0, Jc0)),
        1.0,
    )
    lam_init = lam0_scale * diag_max

    def step(carry, _):
        kp, pp, lam, best = carry
        kp_new, pp_new, _ = build_and_solve(kp, pp, lam)
        new_chi2 = robust_chi2(kp_new, pp_new)
        improved = new_chi2 < best
        kp = jnp.where(improved, kp_new, kp)
        pp = jnp.where(improved, pp_new, pp)
        lam = jnp.where(improved, lam * 0.5, lam * 4.0)
        best = jnp.minimum(new_chi2, best)
        return (kp, pp, lam, best), None

    init = (kf_pose, pt_pos, lam_init, robust_chi2(kf_pose, pt_pos))
    (kf_pose, pt_pos, lam, chi2), _ = jax.lax.scan(
        step, init, None, length=n_iters
    )
    # final S at lam ~ 0 for covariance extraction
    _, _, S_final = build_and_solve(kf_pose, pt_pos, 0.0)
    return kf_pose, pt_pos, chi2, S_final


def _chunked_machinery(
    prob: BAProblem,
    active: jnp.ndarray,
    cam: CameraParams,
    use_huber: bool,
    o_chunk: int,
):
    """(robust_chi2, build_and_solve) closures for the chunked-Schur LM
    iteration — shared by the scan-based solver and the STEPPED api
    (gba_chunked_begin/step/finish), which dispatches one iteration per
    program so per-frame tracking work interleaves with a long post-loop
    GBA instead of queueing behind one monolithic solve.

    The Schur reduction is accumulated by a lax.scan over observation
    chunks instead of the dense (P, K, 6, 3) cross-block buffer — the
    full-map scale path (ref: Optimizer.cc:39-271 runs over EVERY
    keyframe and point; the dense buffer capped us at 64 KF / 8k
    points). Requires observations sorted by point with no point group
    spanning a chunk boundary (ba_build pads them so); a
    boundary-spanning group degrades gracefully (its cross-chunk Schur
    pairs are dropped — the point acts as two independent points).

    Peak memory: O(o_chunk * K * 18) for the per-chunk cross blocks
    (~19 MB at o_chunk=1024, K=256) instead of O(P * K * 18) (~600 MB).
    """
    K = prob.kf_pose.shape[0]
    P = prob.pt_pos.shape[0]
    O = prob.obs_kf.shape[0]
    assert O % o_chunk == 0, "obs capacity must be a chunk multiple"
    n_chunks = O // o_chunk
    free_kf = prob.kf_valid & ~prob.kf_fixed

    obs_kf_c = prob.obs_kf.reshape(n_chunks, o_chunk)
    obs_pt_c = prob.obs_pt.reshape(n_chunks, o_chunk)

    def _chunk_E(hcp_c, okf_c, opt_c):
        """(OC,6,3) cross blocks -> (OC, K, 6, 3) per-point-slot E plus
        the slot->point index map. Local slots come from a group
        cumsum, so only as many slots as distinct points are used."""
        newgrp = jnp.concatenate(
            [jnp.ones(1, bool), opt_c[1:] != opt_c[:-1]]
        )
        lp = jnp.cumsum(newgrp) - 1
        E_c = jnp.zeros((o_chunk, K, 6, 3)).at[lp, okf_c].add(hcp_c)
        pts_local = jnp.zeros(o_chunk, jnp.int32).at[lp].set(opt_c)
        return E_c, pts_local

    def robust_chi2(kp, pp):
        r, _, _, _ = _residuals(kp, pp, prob, cam)
        chi2 = _chi2(r, prob)
        if use_huber:
            delta = jnp.where(
                prob.obs_is_stereo, DELTA_STEREO, DELTA_MONO
            )
            s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            rho = jnp.where(
                s <= delta, chi2, 2.0 * delta * s - delta * delta
            )
        else:
            rho = chi2
        return jnp.sum(jnp.where(active, rho, 0.0))

    def build_and_solve(kp, pp, lam):
        r, Jc, Jp, _ = _residuals(kp, pp, prob, cam)
        chi2 = _chi2(r, prob)
        if use_huber:
            delta = jnp.where(
                prob.obs_is_stereo, DELTA_STEREO, DELTA_MONO
            )
            s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            wh = jnp.where(s <= delta, 1.0, delta / s)
        else:
            wh = jnp.ones_like(chi2)
        row_mask = jnp.concatenate(
            [
                jnp.ones((r.shape[0], 2), r.dtype),
                prob.obs_is_stereo[:, None].astype(r.dtype),
            ],
            axis=-1,
        )
        w = (active.astype(r.dtype) * wh / prob.obs_sigma2)[:, None]
        w = w * row_mask
        Jc_w = Jc * w[..., None]
        Jp_w = Jp * w[..., None]

        Hcc = jnp.zeros((K, 6, 6)).at[prob.obs_kf].add(
            jnp.einsum("oij,oik->ojk", Jc_w, Jc,
                       precision=jax.lax.Precision.HIGHEST)
        )
        Hpp = jnp.zeros((P, 3, 3)).at[prob.obs_pt].add(
            jnp.einsum("oij,oik->ojk", Jp_w, Jp,
                       precision=jax.lax.Precision.HIGHEST)
        )
        bc = jnp.zeros((K, 6)).at[prob.obs_kf].add(
            -jnp.einsum("oij,oi->oj", Jc_w, r,
                        precision=jax.lax.Precision.HIGHEST)
        )
        bp = jnp.zeros((P, 3)).at[prob.obs_pt].add(
            -jnp.einsum("oij,oi->oj", Jp_w, r,
                        precision=jax.lax.Precision.HIGHEST)
        )
        Hcp = jnp.einsum("oij,oik->ojk", Jc_w, Jp,
                         precision=jax.lax.Precision.HIGHEST)
        Hcp_c = Hcp.reshape(n_chunks, o_chunk, 6, 3)

        Hpp_d = Hpp + (lam * jnp.eye(3) + 1e-9 * jnp.eye(3))[None]
        has_pt = (
            jnp.zeros(P).at[prob.obs_pt].add(active.astype(jnp.float32))
            > 0
        ) & prob.pt_valid
        Hpp_d = jnp.where(
            has_pt[:, None, None], Hpp_d, jnp.eye(3)[None]
        )
        with jax.default_matmul_precision("highest"):
            Hpp_inv = jnp.linalg.inv(Hpp_d)

        def reduce_body(carry, inp):
            S_red, b_corr = carry
            hcp_c, okf_c, opt_c = inp
            E_c, pts_local = _chunk_E(hcp_c, okf_c, opt_c)
            Hinv_c = Hpp_inv[pts_local]
            G_c = jnp.einsum("pkil,plm->pkim", E_c, Hinv_c,
                             precision=jax.lax.Precision.HIGHEST)
            G2 = G_c.reshape(o_chunk, K * 6, 3)
            E2 = E_c.reshape(o_chunk, K * 6, 3)
            S_red = S_red + jnp.einsum(
                "pal,pbl->ab", G2, E2,
                precision=jax.lax.Precision.HIGHEST,
            )
            b_corr = b_corr + jnp.einsum(
                "pal,pl->a", G2, bp[pts_local],
                precision=jax.lax.Precision.HIGHEST,
            )
            return (S_red, b_corr), None

        (S_red, b_corr), _ = jax.lax.scan(
            reduce_body,
            (jnp.zeros((K * 6, K * 6)), jnp.zeros(K * 6)),
            (Hcp_c, obs_kf_c, obs_pt_c),
        )

        Hcc_d = Hcc + lam * jnp.eye(6)[None]
        idx = jnp.arange(K)
        S = (-S_red).reshape(K, 6, K, 6)
        S = S.at[idx, :, idx, :].add(Hcc_d)
        S = S.reshape(K * 6, K * 6)
        free6 = jnp.repeat(free_kf, 6)
        mask2d = free6[:, None] & free6[None, :]
        S = jnp.where(mask2d, S, 0.0)
        S = S + jnp.diag(jnp.where(free6, 0.0, 1.0))
        b_red = jnp.where(free6, bc.reshape(-1) - b_corr, 0.0)
        with jax.default_matmul_precision("highest"):
            # bf16-default factorization noise exceeds the update
            # sizes this solve must resolve
            dc = jnp.linalg.solve(S, b_red).reshape(K, 6)

        # back-substitution: Etd per point via a second chunk scan
        def backsub_body(Etd_all, inp):
            hcp_c, okf_c, opt_c = inp
            E_c, pts_local = _chunk_E(hcp_c, okf_c, opt_c)
            Etd = jnp.einsum("pkil,ki->pl", E_c, dc,
                             precision=jax.lax.Precision.HIGHEST)
            return Etd_all.at[pts_local].add(Etd), None

        Etd_all, _ = jax.lax.scan(
            backsub_body, jnp.zeros((P, 3)),
            (Hcp_c, obs_kf_c, obs_pt_c),
        )
        dp = jnp.einsum("plm,pm->pl", Hpp_inv, bp - Etd_all,
                        precision=jax.lax.Precision.HIGHEST)
        dp = jnp.where(has_pt[:, None], dp, 0.0)

        kp_new = jnp.where(
            free_kf[:, None, None], hmat(se3.exp(dc), kp), kp
        )
        pp_new = jnp.where(prob.pt_valid[:, None], pp + dp, pp)
        return kp_new, pp_new, S

    return robust_chi2, build_and_solve


def _lm_step_generic(robust_chi2, build_and_solve, carry):
    """One accept/reject LM iteration over a (kp, pp, lam, best) carry."""
    kp, pp, lam, best = carry
    kp_new, pp_new, _ = build_and_solve(kp, pp, lam)
    new_chi2 = robust_chi2(kp_new, pp_new)
    improved = new_chi2 < best
    kp = jnp.where(improved, kp_new, kp)
    pp = jnp.where(improved, pp_new, pp)
    lam = jnp.where(improved, lam * 0.5, lam * 4.0)
    best = jnp.minimum(new_chi2, best)
    return kp, pp, lam, best


def _lm_round_chunked(
    kf_pose: jnp.ndarray,
    pt_pos: jnp.ndarray,
    prob: BAProblem,
    active: jnp.ndarray,
    cam: CameraParams,
    use_huber: bool,
    n_iters: int,
    o_chunk: int,
    lam0_scale: float = 1e-5,
):
    """Chunked-Schur LM round (see _chunked_machinery), all n_iters in
    one program via lax.scan."""
    robust_chi2, build_and_solve = _chunked_machinery(
        prob, active, cam, use_huber, o_chunk
    )
    r0, Jc0, _, _ = _residuals(kf_pose, pt_pos, prob, cam)
    w0 = (active / prob.obs_sigma2)[:, None, None]
    diag_max = jnp.maximum(
        jnp.max(jnp.einsum("oij,oij->o", Jc0 * w0, Jc0)), 1.0
    )
    lam_init = lam0_scale * diag_max

    def step(carry, _):
        return _lm_step_generic(robust_chi2, build_and_solve, carry), None

    init = (kf_pose, pt_pos, lam_init, robust_chi2(kf_pose, pt_pos))
    (kf_pose, pt_pos, lam, chi2), _ = jax.lax.scan(
        step, init, None, length=n_iters
    )
    _, _, S_final = build_and_solve(kf_pose, pt_pos, 0.0)
    return kf_pose, pt_pos, chi2, S_final


@functools.partial(jax.jit, static_argnames=("cam", "o_chunk"))
def gba_chunked_begin(
    prob: BAProblem, cam: CameraParams, o_chunk: int = 1024
):
    """Initial (kf_pose, pt_pos, lam, best_chi2) carry for the STEPPED
    full-map GBA. The stepped api exists because the single-chip device
    executes programs in dispatch order: a monolithic 10-iteration
    full-map solve blockades every per-frame tracking program behind it
    (measured as a 36 s frame stall when compaction joined the queue);
    one-iteration programs paced by the loop closer's poll interleave
    with frames (ref behavior: LoopClosing.cc:663-765 runs GBA in its
    own THREAD for the same reason)."""
    robust_chi2, _ = _chunked_machinery(
        prob, prob.obs_valid, cam, False, o_chunk
    )
    r0, Jc0, _, _ = _residuals(prob.kf_pose, prob.pt_pos, prob, cam)
    w0 = (prob.obs_valid / prob.obs_sigma2)[:, None, None]
    diag_max = jnp.maximum(
        jnp.max(jnp.einsum("oij,oij->o", Jc0 * w0, Jc0)), 1.0
    )
    return (
        prob.kf_pose,
        prob.pt_pos,
        1e-5 * diag_max,
        robust_chi2(prob.kf_pose, prob.pt_pos),
    )


@functools.partial(jax.jit, static_argnames=("cam", "o_chunk"))
def gba_chunked_step(
    carry, prob: BAProblem, cam: CameraParams, o_chunk: int = 1024
):
    """ONE LM iteration of the stepped full-map GBA."""
    robust_chi2, build_and_solve = _chunked_machinery(
        prob, prob.obs_valid, cam, False, o_chunk
    )
    return _lm_step_generic(robust_chi2, build_and_solve, carry)


@functools.partial(jax.jit, static_argnames=("cam", "o_chunk"))
def gba_chunked_finish(
    carry, prob: BAProblem, cam: CameraParams, o_chunk: int = 1024
) -> BAResult:
    """Inlier classification for a stepped GBA's final carry. newest_cov
    is identity: the post-loop GBA consumer only applies poses/points
    (ref: LoopClosing.cc:683-765)."""
    kp, pp, lam, best = carry
    r, _, _, z = _residuals(kp, pp, prob, cam)
    chi2 = _chi2(r, prob)
    th = jnp.where(prob.obs_is_stereo, CHI2_STEREO, CHI2_MONO)
    inlier = prob.obs_valid & (chi2 <= th) & (z > 0)
    return BAResult(
        kf_pose=kp,
        pt_pos=pp,
        obs_inlier=inlier,
        newest_cov=jnp.eye(6),
        chi2=best,
    )


@functools.partial(
    jax.jit, static_argnames=("cam", "iterations", "o_chunk")
)
def global_bundle_adjustment_chunked(
    prob: BAProblem,
    cam: CameraParams,
    iterations: int = 10,
    o_chunk: int = 1024,
) -> BAResult:
    """Full-map BA at KITTI scale (ref: Optimizer.cc:39-271): the
    chunked Schur path removes the 64-KF/8k-point window of the dense
    solver. Observations must be point-sorted and boundary-padded
    (ba_build.build_problem(..., o_chunk=...))."""
    kp, pp, chi2_total, S = _lm_round_chunked(
        prob.kf_pose, prob.pt_pos, prob, prob.obs_valid, cam,
        use_huber=False, n_iters=iterations, o_chunk=o_chunk,
    )
    r, _, _, z = _residuals(kp, pp, prob, cam)
    chi2 = _chi2(r, prob)
    th = jnp.where(prob.obs_is_stereo, CHI2_STEREO, CHI2_MONO)
    inlier = prob.obs_valid & (chi2 <= th) & (z > 0)
    Sinv = jnp.linalg.inv(S + 1e-9 * jnp.eye(S.shape[0]))
    return BAResult(
        kf_pose=kp,
        pt_pos=pp,
        obs_inlier=inlier,
        newest_cov=Sinv[:6, :6],
        chi2=chi2_total,
    )


@functools.partial(jax.jit, static_argnames=("cam", "iterations"))
def global_bundle_adjustment(
    prob: BAProblem,
    cam: CameraParams,
    iterations: int = 10,
) -> BAResult:
    """Full-map BA (ref: Optimizer.cc:39-271 GlobalBundleAdjustment via
    LoopClosing::RunGlobalBundleAdjustment — 10 iterations, robust
    kernel OFF). Same Schur machinery as local BA; capacity bounded by
    the dense (P, K, 6, 3) cross-block buffer — small problems only;
    ``global_bundle_adjustment_chunked`` is the full-map-scale path."""
    kp, pp, chi2_total, S = _lm_round(
        prob.kf_pose, prob.pt_pos, prob, prob.obs_valid, cam,
        use_huber=False, n_iters=iterations,
    )
    r, _, _, z = _residuals(kp, pp, prob, cam)
    chi2 = _chi2(r, prob)
    th = jnp.where(prob.obs_is_stereo, CHI2_STEREO, CHI2_MONO)
    inlier = prob.obs_valid & (chi2 <= th) & (z > 0)
    Sinv = jnp.linalg.inv(S + 1e-9 * jnp.eye(S.shape[0]))
    return BAResult(
        kf_pose=kp,
        pt_pos=pp,
        obs_inlier=inlier,
        newest_cov=Sinv[:6, :6],
        chi2=chi2_total,
    )


@functools.partial(jax.jit, static_argnames=("cam",))
def local_bundle_adjustment(
    prob: BAProblem,
    newest: jnp.ndarray,  # () int32 index of the newest keyframe
    cam: CameraParams,
) -> BAResult:
    """Two-stage local BA (ref: Optimizer.cc:763-820): 5 Huber
    iterations, chi2 outlier demotion (+ positive-depth check), 10 more
    iterations without the demoted observations, final classification,
    and the newest keyframe's marginal covariance from the reduced
    camera system (ref: Optimizer.cc:876-912)."""
    active0 = prob.obs_valid

    kp1, pp1, _, _ = _lm_round(
        prob.kf_pose, prob.pt_pos, prob, active0, cam,
        use_huber=True, n_iters=5,
    )
    r1, _, _, z1 = _residuals(kp1, pp1, prob, cam)
    chi21 = _chi2(r1, prob)
    th = jnp.where(prob.obs_is_stereo, CHI2_STEREO, CHI2_MONO)
    active1 = active0 & (chi21 <= th) & (z1 > 0)

    kp2, pp2, chi2_total, S = _lm_round(
        kp1, pp1, prob, active1, cam, use_huber=False, n_iters=10,
    )
    r2, _, _, z2 = _residuals(kp2, pp2, prob, cam)
    chi22 = _chi2(r2, prob)
    inlier = prob.obs_valid & (chi22 <= th) & (z2 > 0)

    # marginal covariance of the newest KF: 6x6 block of S^-1
    Sinv = jnp.linalg.inv(
        S + 1e-9 * jnp.eye(S.shape[0])
    )
    i0 = newest * 6
    cov = jax.lax.dynamic_slice(Sinv, (i0, i0), (6, 6))
    return BAResult(
        kf_pose=kp2,
        pt_pos=pp2,
        obs_inlier=inlier,
        newest_cov=cov,
        chi2=chi2_total,
    )
