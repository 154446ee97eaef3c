"""Two-view triangulation of new map points.

TPU-native replacement for LocalMapping::CreateNewMapPoints
(ref: src/orbslam/LocalMapping.cc:198-472) and the epipolar search
(ref: src/orbslam/ORBmatcher.cc:631 SearchForTriangulation): one device
program per keyframe pair that matches unassigned keypoints under the
epipolar constraint (masked Hamming matrix + point-to-line distance),
triangulates all matches by batched DLT SVD, and applies the
reference's acceptance cascade — parallax, positive depth in both
views, chi-squared reprojection in both views, scale consistency —
plus the SIVO semantic gate (ref: LocalMapping.cc:448-452 + 474-545
CheckSemantics: classes agree and static, confidence above threshold,
entropy-reduction criterion with the keyframe covariance).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sivo_tpu.geometry import se3
from sivo_tpu.geometry.projection import CameraParams, project_stereo
from sivo_tpu.ops.stereo import hamming_matrix
from sivo_tpu.select import info as info_ops
from sivo_tpu.utils.precision import hmat

TH_LOW = 50.0


class TriangulationResult(NamedTuple):
    xw: jnp.ndarray  # (N, 3) new point positions (world)
    kp1: jnp.ndarray  # (N,) keypoint slot in KF1
    kp2: jnp.ndarray  # (N,) keypoint slot in KF2 (matched)
    accepted: jnp.ndarray  # (N,) bool


def fundamental_matrix(
    T1w: jnp.ndarray, T2w: jnp.ndarray, cam: CameraParams
) -> jnp.ndarray:
    """F12 from two world->camera poses
    (ref: LocalMapping.cc:639-654 ComputeF12)."""
    R1, t1 = T1w[:3, :3], T1w[:3, 3]
    R2, t2 = T2w[:3, :3], T2w[:3, 3]
    R12 = hmat(R1, R2.T)
    t12 = t1 - (R12 @ t2[:, None])[:, 0]
    K = jnp.array(
        [[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]]
    )
    Kinv = jnp.linalg.inv(K)
    return hmat(Kinv.T, hmat(hmat(se3.hat(t12), R12), Kinv))


@functools.partial(
    jax.jit, static_argnames=("cam", "scale_factor", "n_levels")
)
def triangulate_neighbors(
    T1w, xy1, level1, desc1, free1, ur1, sem_class1, sem_conf1,
    sem_ent1, cov1,  # desc1: (N, 32) packed uint8
    # neighbor axis (B, ...); desc2: (B, N, 32) packed uint8
    T2w, xy2, level2, desc2, free2, sem_class2, nb_valid,
    th_confidence, th_entropy, cam,
    scale_factor: float = 1.2, n_levels: int = 8,
) -> TriangulationResult:
    """All covisible neighbors in ONE program (vmapped pair
    triangulation + one fetch — per-neighbor dispatches dominate the
    keyframe-rate budget on a high-latency link)."""
    from sivo_tpu.runtime.device_map import unpack_bits

    bits1 = unpack_bits(desc1)  # (N, 256) from packed uint8
    res = jax.vmap(
        lambda t2, x2, l2, d2, f2, c2: _triangulate_pair_impl(
            T1w, xy1, level1, bits1, free1, ur1, sem_class1,
            sem_conf1, sem_ent1, cov1,
            t2, x2, l2, unpack_bits(d2), f2, c2,
            th_confidence, th_entropy, cam, scale_factor, n_levels,
        )
    )(T2w, xy2, level2, desc2, free2, sem_class2)
    return res._replace(
        accepted=res.accepted & nb_valid[:, None]
    )


def _triangulate_pair_impl(
    # KF1 (the new keyframe)
    T1w: jnp.ndarray,
    xy1: jnp.ndarray,  # (N, 2)
    level1: jnp.ndarray,
    desc1: jnp.ndarray,  # (N, 256) bits
    free1: jnp.ndarray,  # (N,) semantic & no map point yet
    ur1: jnp.ndarray,  # (N,) right-u or -1 (stereo kps get baseline info)
    sem_class1: jnp.ndarray,
    sem_conf1: jnp.ndarray,
    sem_ent1: jnp.ndarray,
    cov1: jnp.ndarray,  # (6, 6) KF1 covariance
    # KF2 (neighbor)
    T2w: jnp.ndarray,
    xy2: jnp.ndarray,
    level2: jnp.ndarray,
    desc2: jnp.ndarray,
    free2: jnp.ndarray,
    sem_class2: jnp.ndarray,
    # gates
    th_confidence: jnp.ndarray,
    th_entropy: jnp.ndarray,
    cam: CameraParams,
    scale_factor: float = 1.2,
    n_levels: int = 8,
) -> TriangulationResult:
    scales = scale_factor ** jnp.arange(n_levels, dtype=jnp.float32)
    sigma2_1 = scales[level1] ** 2
    sigma2_2 = scales[level2] ** 2

    # baseline check is the caller's job (host scalar); epipolar search:
    F12 = fundamental_matrix(T1w, T2w, cam)
    d = hamming_matrix(desc1, desc2)
    # epipolar point-line distance of kp2 to the line of kp1
    ones1 = jnp.ones((xy1.shape[0], 1))
    # epipolar line of kp1 in image 2: l2 = F12^T x1, i.e. row-wise
    # x1^T F12 (ref: ORBmatcher.cc CheckDistEpipolarLine)
    lines = hmat(jnp.concatenate([xy1, ones1], axis=-1), F12)
    a, b, c = lines[:, 0:1], lines[:, 1:2], lines[:, 2:3]
    num = a * xy2[None, :, 0] + b * xy2[None, :, 1] + c
    den = a * a + b * b
    dsqr = num * num / jnp.maximum(den, 1e-12)
    # ref: ORBmatcher.cc:136-160 — dsqr < 3.84 sigma2[octave2]
    epi_ok = dsqr < 3.84 * sigma2_2[None, :]
    ok = epi_ok & free1[:, None] & free2[None, :]
    d = jnp.where(ok, d, jnp.inf)
    best_j = jnp.argmin(d, axis=1)
    best_d = jnp.take_along_axis(d, best_j[:, None], axis=1)[:, 0]
    matched = best_d < TH_LOW  # ref: ORBmatcher.cc:689

    xy2m = xy2[best_j]
    lvl2m = level2[best_j]
    sig2m = sigma2_2[best_j]

    # rays + parallax (ref: LocalMapping.cc:285-325)
    def rays(xy, T):
        xn = jnp.stack(
            [
                (xy[:, 0] - cam.cx) / cam.fx,
                (xy[:, 1] - cam.cy) / cam.fy,
                jnp.ones(xy.shape[0]),
            ],
            axis=-1,
        )
        return hmat(xn, T[:3, :3])  # world-frame ray (R^T xn)

    r1 = rays(xy1, T1w)
    r2 = rays(xy2m, T2w)
    cos_par = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1),
        1e-12,
    )
    parallax_ok = (cos_par > 0) & (cos_par < 0.9998)

    # DLT triangulation (ref: LocalMapping.cc:327-352): rows of
    # A x = 0 from both projections
    P1 = hmat(
        jnp.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy],
                   [0, 0, 1.0]]),
        T1w[:3, :4],
    )
    P2 = hmat(
        jnp.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy],
                   [0, 0, 1.0]]),
        T2w[:3, :4],
    )
    A = jnp.stack(
        [
            xy1[:, 0, None] * P1[2] - P1[0],
            xy1[:, 1, None] * P1[2] - P1[1],
            xy2m[:, 0, None] * P2[2] - P2[0],
            xy2m[:, 1, None] * P2[2] - P2[1],
        ],
        axis=1,
    )  # (N, 4, 4)
    with jax.default_matmul_precision("highest"):
        # bf16-default SVD: percent-level null-vector error -> metres
        # of triangulation error at KITTI depths
        _, _, Vt = jnp.linalg.svd(A)
    xh = Vt[:, 3, :]
    w = xh[:, 3]
    xw = xh[:, :3] / jnp.where(jnp.abs(w) > 1e-12, w, 1e-12)[:, None]

    # acceptance cascade (ref: LocalMapping.cc:354-447)
    xc1 = se3.transform(T1w, xw)
    xc2 = se3.transform(T2w, xw)
    z_ok = (xc1[:, 2] > 0) & (xc2[:, 2] > 0)
    p1 = project_stereo(cam, xc1)
    p2 = project_stereo(cam, xc2)
    e1 = jnp.sum((p1[:, :2] - xy1) ** 2, axis=-1)
    e2 = jnp.sum((p2[:, :2] - xy2m) ** 2, axis=-1)
    chi_ok = (e1 <= 5.991 * sigma2_1) & (e2 <= 5.991 * sig2m)
    # scale consistency (ref: :427-443)
    o1 = -hmat(T1w[:3, :3].T, T1w[:3, 3][:, None])[:, 0]
    o2 = -hmat(T2w[:3, :3].T, T2w[:3, 3][:, None])[:, 0]
    d1 = jnp.linalg.norm(xw - o1, axis=-1)
    d2 = jnp.linalg.norm(xw - o2, axis=-1)
    ratio_dist = d2 / jnp.maximum(d1, 1e-12)
    ratio_oct = scales[level1] / scales[lvl2m]
    rf = 1.5 * scale_factor
    scale_ok = (ratio_dist < ratio_oct * rf) & (
        ratio_dist > ratio_oct / rf
    )

    # SIVO semantic gate (ref: LocalMapping.cc:448-452, 474-545):
    # both views' classes equal and static, confidence above threshold,
    # entropy-reduction with the KF covariance at the new world point
    cls2m = sem_class2[best_j]
    sem_ok = (
        (sem_class1 == cls2m)
        & (sem_class1 <= 8)
        & (sem_conf1 >= th_confidence)
    )
    # Deliberate divergence: the reference evaluates the information
    # Jacobian at the WORLD coordinates of the point
    # (LocalMapping.cc:506-513, like Tracking.cc:966), which makes MI
    # decay quadratically with distance from the world origin — point
    # creation starves permanently once the camera has travelled a few
    # tens of metres. The physically meaningful evaluation point is the
    # CAMERA-frame position (translation-invariant, and close points
    # correctly score as more informative).
    scores = info_ops.entropy_reduction_stereo(
        cov1, xc1, sigma2_1, sem_ent1,
        cam.fx, cam.fy, cam.bf / cam.fx,
    )
    ent_ok = scores >= th_entropy

    accepted = (
        matched & parallax_ok & z_ok & chi_ok & scale_ok
        & sem_ok & ent_ok & free1
    )
    return TriangulationResult(
        xw=xw,
        kp1=jnp.arange(xy1.shape[0], dtype=jnp.int32),
        kp2=best_j.astype(jnp.int32),
        accepted=accepted,
    )


triangulate_pair = jax.jit(
    _triangulate_pair_impl,
    static_argnames=("cam", "scale_factor", "n_levels"),
)
