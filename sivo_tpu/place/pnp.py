"""EPnP + batched RANSAC for relocalization.

TPU-native replacement for PnPsolver (ref: src/orbslam/PnPsolver.cc,
EPnP after Lepetit et al. + adaptive RANSAC). The reference iterates
hypotheses sequentially with early exit; RANSAC is embarrassingly
parallel, so here ALL hypotheses run as one batched program (minimal
sets -> EPnP -> reprojection inlier counts -> best), a direct win of
the batch-everything design (SURVEY §7 stage 6).

EPnP per hypothesis: 4 control points (centroid + PCA axes),
barycentric coordinates, the 12x12 M^T M eigen-decomposition, the
reference's three beta cases (ref: PnPsolver.cc:669-763) each refined
by 5 Gauss-Newton iterations on the inter-control-point distance
constraints (ref: PnPsolver.cc:814-863) — all three candidate poses
are built batched and the per-hypothesis winner is the one with the
least reprojection error on its minimal set, exactly the reference's
case selection (ref: PnPsolver.cc:352-383) — and absolute orientation
(Horn) for R, t (ref: PnPsolver.cc:572-630).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sivo_tpu.geometry.projection import CameraParams, project
from sivo_tpu.utils.precision import hmat

MIN_SET = 6  # points per hypothesis (reference uses 4; 6 keeps a
#              vote margin over noise in the batched all-hypotheses
#              scoring and is free when batched)


class RansacResult(NamedTuple):
    pose: jnp.ndarray  # (4, 4) best Tcw
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray  # () int32
    ok: jnp.ndarray  # () bool


def _kabsch(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Batched absolute orientation: R, t minimizing ||R src + t - dst||
    (Horn via SVD). src/dst: (..., M, 3). Returns (..., 4, 4)."""
    cs = jnp.mean(src, axis=-2, keepdims=True)
    cd = jnp.mean(dst, axis=-2, keepdims=True)
    H = hmat(jnp.swapaxes(src - cs, -1, -2), dst - cd)
    # the SVD's internal iterations MUST NOT run at the TPU's bf16
    # matmul default: percent-level non-orthonormal U/V bake a SCALE
    # into R, and every downstream exp-update pose product PRESERVES
    # it — measured as det(R) compounding 1.0 -> 1.5 over an
    # anchor-heavy burst, corrupting the whole session's trajectory
    with jax.default_matmul_precision("highest"):
        U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(hmat(jnp.swapaxes(Vt, -1, -2),
                              jnp.swapaxes(U, -1, -2)))
    D = jnp.zeros_like(H)
    D = D.at[..., 0, 0].set(1.0)
    D = D.at[..., 1, 1].set(1.0)
    D = D.at[..., 2, 2].set(det)
    R = hmat(
        jnp.swapaxes(Vt, -1, -2), hmat(D, jnp.swapaxes(U, -1, -2))
    )
    t = cd[..., 0, :] - (R @ cs[..., 0, :, None])[..., 0]
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    return T.at[..., 3, 3].set(1.0)


def _epnp(
    pw: jnp.ndarray,  # (..., M, 3) world points
    uv: jnp.ndarray,  # (..., M, 2) pixels
    cam: CameraParams,
) -> jnp.ndarray:
    """Batched EPnP (single-beta case): (..., 4, 4) Tcw."""
    m = pw.shape[-2]
    # control points: centroid + PCA axes (ref: PnPsolver.cc:385-418)
    c0 = jnp.mean(pw, axis=-2)
    centered = pw - c0[..., None, :]
    cov = hmat(jnp.swapaxes(centered, -1, -2), centered) / m
    with jax.default_matmul_precision("highest"):
        evals, evecs = jnp.linalg.eigh(cov)
    scale = jnp.sqrt(jnp.maximum(evals, 1e-10))
    ctrl = jnp.concatenate(
        [
            c0[..., None, :],
            c0[..., None, :]
            + jnp.swapaxes(evecs, -1, -2) * scale[..., :, None],
        ],
        axis=-2,
    )  # (..., 4, 3)

    # barycentric coordinates (ref: PnPsolver.cc:420-441)
    cc = ctrl[..., 1:, :] - ctrl[..., :1, :]  # (..., 3, 3)
    cc_inv = jnp.linalg.inv(jnp.swapaxes(cc, -1, -2))
    a123 = hmat(centered, jnp.swapaxes(cc_inv, -1, -2))  # (..., M, 3)
    a0 = 1.0 - jnp.sum(a123, axis=-1, keepdims=True)
    alphas = jnp.concatenate([a0, a123], axis=-1)  # (..., M, 4)

    # M matrix (2M x 12) (ref: PnPsolver.cc:443-470)
    u = uv[..., 0]
    v = uv[..., 1]
    fu, fv, uc, vc = cam.fx, cam.fy, cam.cx, cam.cy
    zero = jnp.zeros_like(alphas)
    row_u = jnp.stack(
        [alphas * fu, zero, alphas * (uc - u)[..., None]], axis=-1
    ).reshape(*alphas.shape[:-1], 12)
    row_v = jnp.stack(
        [zero, alphas * fv, alphas * (vc - v)[..., None]], axis=-1
    ).reshape(*alphas.shape[:-1], 12)
    Mm = jnp.concatenate([row_u, row_v], axis=-2)  # (..., 2M, 12)
    MtM = hmat(jnp.swapaxes(Mm, -1, -2), Mm)
    with jax.default_matmul_precision("highest"):
        _, vecs = jnp.linalg.eigh(MtM)
    # 4 smallest eigenvectors of M^T M, each reshaped to 4 camera
    # control points (ref: PnPsolver.cc:500-510 kernel columns)
    batch = MtM.shape[:-2]
    vk = jnp.moveaxis(vecs[..., :, :4], -1, -2).reshape(
        *batch, 4, 4, 3
    )  # (..., beta k, ctrl point, 3)

    # distance-constraint system L betas10 = rho over the 6 control
    # point pairs (ref: PnPsolver.cc:765-812 compute_L_6x10 / rho)
    ia = jnp.array([0, 0, 0, 1, 1, 2])
    ib = jnp.array([1, 2, 3, 2, 3, 3])
    dv = (
        jnp.take(vk, ia, axis=-2) - jnp.take(vk, ib, axis=-2)
    )  # (..., 4, 6, 3)
    with jax.default_matmul_precision("highest"):
        dots = jnp.einsum("...kpc,...lpc->...pkl", dv, dv)
    L = jnp.stack(
        [
            dots[..., 0, 0], 2 * dots[..., 0, 1], dots[..., 1, 1],
            2 * dots[..., 0, 2], 2 * dots[..., 1, 2], dots[..., 2, 2],
            2 * dots[..., 0, 3], 2 * dots[..., 1, 3],
            2 * dots[..., 2, 3], dots[..., 3, 3],
        ],
        axis=-1,
    )  # (..., 6, 10)
    rho = jnp.sum(
        (
            jnp.take(ctrl, ia, axis=-2) - jnp.take(ctrl, ib, axis=-2)
        ) ** 2,
        axis=-1,
    )  # (..., 6)

    betas = jnp.stack(
        [
            _betas_approx_1(L, rho),
            _betas_approx_2(L, rho),
            _betas_approx_3(L, rho),
        ],
        axis=-2,
    )  # (..., 3 cases, 4)
    Lc = L[..., None, :, :]
    rhoc = rho[..., None, :]
    for _ in range(5):  # ref: PnPsolver.cc:814-863 gauss_newton
        betas = _gn_betas_step(betas, Lc, rhoc)

    # one pose per case, then the reference's least-reprojection-error
    # case selection (ref: PnPsolver.cc:352-383)
    with jax.default_matmul_precision("highest"):
        cc_cam = jnp.einsum(
            "...ck,...kpj->...cpj", betas, vk
        )  # (..., 3 cases, 4 ctrl, 3)
    pc = hmat(alphas[..., None, :, :], cc_cam)  # (..., 3, M, 3)
    # points must be in front of the camera: flip if mean z < 0
    flip = jnp.mean(pc[..., 2], axis=-1) < 0
    pc = jnp.where(flip[..., None, None], -pc, pc)
    # absolute orientation world -> camera (ref: PnPsolver.cc:572-630)
    poses = _kabsch(
        jnp.broadcast_to(pw[..., None, :, :], pc.shape), pc
    )  # (..., 3, 4, 4)
    pred = project(
        cam,
        hmat(
            jnp.broadcast_to(pw[..., None, :, :], pc.shape),
            jnp.swapaxes(poses[..., :3, :3], -1, -2),
        )
        + poses[..., None, :3, 3],
    )
    err = jnp.sum(
        jnp.sum((pred - uv[..., None, :, :]) ** 2, axis=-1), axis=-1
    )
    err = jnp.where(
        jnp.all(
            jnp.isfinite(poses.reshape(*poses.shape[:-2], 16)), axis=-1
        ),
        err,
        jnp.inf,
    )
    best = jnp.argmin(err, axis=-1)
    return jnp.take_along_axis(
        poses, best[..., None, None, None], axis=-3
    )[..., 0, :, :]


def _solve_ls(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched least squares of a small (..., 6, k) system via ridge-
    stabilized normal equations at full precision."""
    At = jnp.swapaxes(A, -1, -2)
    with jax.default_matmul_precision("highest"):
        AtA = hmat(At, A)
        Atb = hmat(At, b[..., None])[..., 0]
        k = AtA.shape[-1]
        return jnp.linalg.solve(
            AtA + 1e-9 * jnp.eye(k, dtype=AtA.dtype), Atb[..., None]
        )[..., 0]


def _betas_approx_1(L: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
    """Case 1: betas10 ~ [b11, b12, b13, b14] from L columns 0/1/3/6
    (ref: PnPsolver.cc:669-702)."""
    x = _solve_ls(L[..., (0, 1, 3, 6)], rho)
    s = jnp.where(x[..., 0] < 0, -1.0, 1.0)
    b1 = jnp.sqrt(jnp.abs(x[..., 0]))
    safe = jnp.maximum(b1, 1e-12)
    rest = s[..., None] * x[..., 1:] / safe[..., None]
    return jnp.concatenate([b1[..., None], rest], axis=-1)


def _betas_approx_2(L: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
    """Case 2: betas10 ~ [b11, b12, b22] from L columns 0/1/2
    (ref: PnPsolver.cc:704-730)."""
    x = _solve_ls(L[..., (0, 1, 2)], rho)
    b11, b12, b22 = x[..., 0], x[..., 1], x[..., 2]
    b1 = jnp.sqrt(jnp.abs(b11))
    b2 = jnp.where(
        (b22 > 0) == (b11 > 0), jnp.sqrt(jnp.abs(b22)), 0.0
    )
    b1 = jnp.where(b12 < 0, -b1, b1)
    z = jnp.zeros_like(b1)
    return jnp.stack([b1, b2, z, z], axis=-1)


def _betas_approx_3(L: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
    """Case 3: betas10 ~ [b11, b12, b22, b13, b23] from L columns
    0/1/2/3/4 (ref: PnPsolver.cc:732-763)."""
    x = _solve_ls(L[..., (0, 1, 2, 3, 4)], rho)
    b11, b12, b22, b13 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    b1 = jnp.sqrt(jnp.abs(b11))
    b2 = jnp.where(
        (b22 > 0) == (b11 > 0), jnp.sqrt(jnp.abs(b22)), 0.0
    )
    b1 = jnp.where(b12 < 0, -b1, b1)
    safe = jnp.where(jnp.abs(b1) < 1e-12, 1e-12, b1)
    b3 = b13 / safe
    z = jnp.zeros_like(b1)
    return jnp.stack([b1, b2, b3, z], axis=-1)


def _gn_betas_step(
    betas: jnp.ndarray, L: jnp.ndarray, rho: jnp.ndarray
) -> jnp.ndarray:
    """One Gauss-Newton step on the 4 betas against the 6 distance
    constraints (ref: PnPsolver.cc:814-863)."""
    b1, b2, b3, b4 = (
        betas[..., 0], betas[..., 1], betas[..., 2], betas[..., 3]
    )
    b10 = jnp.stack(
        [
            b1 * b1, b1 * b2, b2 * b2, b1 * b3, b2 * b3, b3 * b3,
            b1 * b4, b2 * b4, b3 * b4, b4 * b4,
        ],
        axis=-1,
    )
    with jax.default_matmul_precision("highest"):
        r = rho - jnp.einsum("...pk,...k->...p", L, b10)
    c = lambda i: L[..., i]  # noqa: E731 — column accessor
    e = lambda x: x[..., None]  # noqa: E731
    J = jnp.stack(
        [
            2 * e(b1) * c(0) + e(b2) * c(1) + e(b3) * c(3)
            + e(b4) * c(6),
            e(b1) * c(1) + 2 * e(b2) * c(2) + e(b3) * c(4)
            + e(b4) * c(7),
            e(b1) * c(3) + e(b2) * c(4) + 2 * e(b3) * c(5)
            + e(b4) * c(8),
            e(b1) * c(6) + e(b2) * c(7) + e(b3) * c(8)
            + 2 * e(b4) * c(9),
        ],
        axis=-1,
    )  # (..., 6, 4)
    return betas + _solve_ls(J, r)


@functools.partial(
    jax.jit, static_argnames=("cam", "n_hypotheses", "min_inliers")
)
def ransac_pnp(
    pw: jnp.ndarray,  # (N, 3) world points
    uv: jnp.ndarray,  # (N, 2) measured pixels
    sigma2: jnp.ndarray,  # (N,) per-point noise (level sigma^2)
    valid: jnp.ndarray,  # (N,) bool
    rng: jnp.ndarray,
    cam: CameraParams,
    n_hypotheses: int = 256,
    min_inliers: int = 10,
    chi2_th: float = 5.991,  # ref: Tracking.cc:1281 th2
) -> RansacResult:
    """All-hypotheses-at-once RANSAC (replaces the sequential
    PnPsolver::iterate loop, ref: PnPsolver.cc:131-270). Inlier test is
    the reference's per-octave chi-squared radius (:241-258)."""
    n = pw.shape[0]
    # sample minimal sets among valid indices: random keys per
    # hypothesis; gumbel-top-k over validity mask
    g = jax.random.gumbel(rng, (n_hypotheses, n))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, sets = jax.lax.top_k(g, MIN_SET)  # (H, MIN_SET)
    pw_sets = pw[sets]  # (H, MIN_SET, 3)
    uv_sets = uv[sets]
    poses = _epnp(pw_sets, uv_sets, cam)  # (H, 4, 4)

    # score: chi2 inliers over all points
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    pc = (
        jnp.einsum("hij,nj->hni", R, pw,
                   precision=jax.lax.Precision.HIGHEST)
        + t[:, None, :]
    )
    pred = project(cam, pc)
    err2 = jnp.sum((pred - uv[None]) ** 2, axis=-1)  # (H, N)
    in_front = pc[..., 2] > 0
    inl = (
        (err2 / sigma2[None]) < chi2_th
    ) & in_front & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    finite = jnp.all(jnp.isfinite(poses.reshape(n_hypotheses, -1)),
                     axis=1)
    counts = jnp.where(finite, counts, -1)
    best = jnp.argmax(counts)
    best_pose = poses[best]
    best_inl = inl[best]
    n_in = counts[best]

    # refine with EPnP on all inliers (ref: PnPsolver.cc:271-316),
    # padded via weighting: re-run Kabsch-EPnP on the full set with
    # inlier selection by masking through resampling
    def refine(pose, inliers):
        w = inliers.astype(jnp.float32)
        # weighted EPnP: replicate the inlier subset by zero-weighting
        # outliers in the centroid/covariance/M accumulations is
        # involved; a Gauss-Newton polish on the inlier set is
        # equivalent and reuses pose_lm-style math
        from sivo_tpu.optim import pose_lm

        obs = pose_lm.PoseObservations(
            points=pw,
            uvr=jnp.concatenate([uv, -jnp.ones((n, 1))], axis=-1),
            sigma2=sigma2,
            is_stereo=jnp.zeros(n, bool),
            valid=inliers,
        )
        res = pose_lm.optimize_pose_impl(
            pose, obs, cam, rounds=2, iterations=5
        )
        return res.pose, res.inliers

    best_pose, best_inl = refine(best_pose, best_inl)
    n_in = jnp.sum(best_inl)
    return RansacResult(
        pose=best_pose,
        inliers=best_inl,
        n_inliers=n_in.astype(jnp.int32),
        ok=n_in >= min_inliers,
    )
