"""Batched stereo pinhole projection / unprojection and frustum checks.

Replaces the per-point loops of the reference (ref:
src/orbslam/Frame.cc:267-324 ``isInFrustum``, Frame.cc:631-645
``UnprojectStereo``) with masked array ops over all keypoints at once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sivo_tpu.utils.precision import hmat


class CameraParams(NamedTuple):
    """Static pinhole + stereo parameters, usable inside jit."""

    fx: float
    fy: float
    cx: float
    cy: float
    bf: float  # baseline * fx
    width: int
    height: int

    @property
    def baseline(self) -> float:
        return self.bf / self.fx


def project(cam: CameraParams, pc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> pixel (..., 2). No distortion
    (KITTI rectified, ref: config k1=k2=0)."""
    z = pc[..., 2]
    invz = 1.0 / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = cam.fx * pc[..., 0] * invz + cam.cx
    v = cam.fy * pc[..., 1] * invz + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(cam: CameraParams, pc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> (uL, vL, uR) (..., 3), the stereo
    measurement used by the reference's optimizer edges
    (ref: g2o EdgeStereoSE3ProjectXYZ; Optimizer.cc:195-229)."""
    uv = project(cam, pc)
    z = pc[..., 2]
    invz = 1.0 / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    ur = uv[..., 0] - cam.bf * invz
    return jnp.concatenate([uv, ur[..., None]], axis=-1)


def unproject_stereo(
    cam: CameraParams, uv: jnp.ndarray, depth: jnp.ndarray
) -> jnp.ndarray:
    """Pixels (..., 2) + depth (...,) -> camera-frame points (..., 3)
    (ref: Frame.cc:631-645)."""
    z = depth
    x = (uv[..., 0] - cam.cx) * z / cam.fx
    y = (uv[..., 1] - cam.cy) * z / cam.fy
    return jnp.stack([x, y, z], axis=-1)


def in_image(
    cam: CameraParams,
    uv: jnp.ndarray,
    min_x: float = 0.0,
    min_y: float = 0.0,
) -> jnp.ndarray:
    """Boolean mask (...,) of pixels inside image bounds."""
    u, v = uv[..., 0], uv[..., 1]
    return (
        (u >= min_x)
        & (u < cam.width - min_x)
        & (v >= min_y)
        & (v < cam.height - min_y)
    )


def frustum_check(
    cam: CameraParams,
    Tcw: jnp.ndarray,
    pw: jnp.ndarray,
    normals: jnp.ndarray,
    min_dist: jnp.ndarray,
    max_dist: jnp.ndarray,
    view_cos_limit: float = 0.5,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Vectorized frustum culling (ref: Frame.cc:267-324 ``isInFrustum``).

    Args:
      Tcw: (4, 4) world->camera pose.
      pw: (N, 3) world points.
      normals: (N, 3) mean viewing directions.
      min_dist / max_dist: (N,) scale-invariance distance bounds.

    Returns:
      (visible (N,), uvr (N, 3) stereo projection, dist (N,), view_cos (N,)).
    """
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    pc = hmat(pw, R.T) + t
    z_ok = pc[..., 2] > 0.0
    uvr = project_stereo(cam, pc)
    img_ok = in_image(cam, uvr[..., :2])
    # distance from camera center in world frame
    ow = -hmat(R.T, t[..., None])[..., 0]
    po = pw - ow
    dist = jnp.linalg.norm(po, axis=-1)
    dist_ok = (dist >= min_dist) & (dist <= max_dist)
    view_cos = jnp.sum(po * normals, axis=-1) / jnp.maximum(dist, 1e-9)
    cos_ok = view_cos >= view_cos_limit
    return z_ok & img_ok & dist_ok & cos_ok, uvr, dist, view_cos


def predict_scale(
    dist: jnp.ndarray,
    max_dist: jnp.ndarray,
    scale_factor: float,
    n_levels: int,
) -> jnp.ndarray:
    """Predicted pyramid octave from distance (ref: MapPoint.cc:423-451):
    ``ceil(log(max_dist / dist) / log(scale_factor))`` clamped to
    [0, n_levels)."""
    ratio = max_dist / jnp.maximum(dist, 1e-9)
    level = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(scale_factor))
    return jnp.clip(level, 0, n_levels - 1).astype(jnp.int32)
