"""Triangulation tests: synthetic two-view geometry with known points."""

import jax.numpy as jnp
import numpy as np

from sivo_tpu.geometry import se3
from sivo_tpu.geometry.projection import CameraParams, project
from sivo_tpu.ops import triangulation as tri

CAM = CameraParams(
    fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=250.0,
    width=640, height=480,
)


def make_two_view(n=128, seed=0, noise=0.2):
    rng = np.random.default_rng(seed)
    pw = np.stack(
        [
            rng.uniform(-8, 8, n),
            rng.uniform(-4, 4, n),
            rng.uniform(8, 30, n),
        ],
        axis=-1,
    ).astype(np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.asarray(
        se3.exp(jnp.asarray([1.5, 0.0, 0.3, 0.0, 0.05, 0.0],
                            jnp.float32))
    )
    uv1 = np.array(project(CAM, jnp.asarray(pw)))
    xc2 = pw @ T2[:3, :3].T + T2[:3, 3]
    uv2 = np.array(project(CAM, jnp.asarray(xc2)))
    uv1 += rng.normal(0, noise, uv1.shape)
    uv2 += rng.normal(0, noise, uv2.shape)
    return pw, T1, T2, uv1.astype(np.float32), uv2.astype(np.float32)


def test_fundamental_matrix_epipolar_constraint():
    pw, T1, T2, uv1, uv2 = make_two_view(noise=0.0)
    F = np.asarray(
        tri.fundamental_matrix(
            jnp.asarray(T1), jnp.asarray(T2), CAM
        )
    )
    ones = np.ones((len(pw), 1))
    x1 = np.concatenate([uv1, ones], -1)
    x2 = np.concatenate([uv2, ones], -1)
    # x2^T F^T x1 = 0 for the (1->2) convention used in the matcher
    vals = np.abs(np.einsum("ni,ij,nj->n", x1, F, x2))
    scale = np.abs(F).max()
    assert np.median(vals) / scale < 1e-2, np.median(vals) / scale


def test_triangulate_pair_recovers_points():
    pw, T1, T2, uv1, uv2 = make_two_view()
    n = len(pw)
    # identical descriptors per true correspondence, distinct otherwise
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, (n, 256)).astype(np.float32)
    level = np.zeros(n, np.int32)
    res = tri.triangulate_pair(
        jnp.asarray(T1),
        jnp.asarray(uv1), jnp.asarray(level), jnp.asarray(bits),
        jnp.ones(n, bool), jnp.full(n, -1.0),
        jnp.zeros(n, np.uint8), jnp.ones(n, jnp.float32),
        jnp.zeros(n, jnp.float32),
        jnp.eye(6) * 1e-3,
        jnp.asarray(T2),
        jnp.asarray(uv2), jnp.asarray(level), jnp.asarray(bits),
        jnp.ones(n, bool),
        jnp.zeros(n, np.uint8),
        jnp.float32(0.5), jnp.float32(-10.0),  # permissive gates
        CAM,
    )
    acc = np.asarray(res.accepted)
    kp2 = np.asarray(res.kp2)
    # most correspondences found (identical descriptors + epipolar)
    assert acc.mean() > 0.7, acc.mean()
    # matched indices correct
    assert (kp2[acc] == np.arange(n)[acc]).mean() > 0.95
    err = np.linalg.norm(np.asarray(res.xw)[acc] - pw[acc], axis=-1)
    assert np.median(err) < 0.25, np.median(err)


def test_semantic_gate_blocks_dynamic_classes():
    pw, T1, T2, uv1, uv2 = make_two_view()
    n = len(pw)
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, (n, 256)).astype(np.float32)
    level = np.zeros(n, np.int32)
    classes = np.full(n, 11, np.uint8)  # CAR: dynamic
    res = tri.triangulate_pair(
        jnp.asarray(T1),
        jnp.asarray(uv1), jnp.asarray(level), jnp.asarray(bits),
        jnp.ones(n, bool), jnp.full(n, -1.0),
        jnp.asarray(classes), jnp.ones(n, jnp.float32),
        jnp.zeros(n, jnp.float32),
        jnp.eye(6) * 1e-3,
        jnp.asarray(T2),
        jnp.asarray(uv2), jnp.asarray(level), jnp.asarray(bits),
        jnp.ones(n, bool),
        jnp.asarray(classes),
        jnp.float32(0.5), jnp.float32(-10.0),
        CAM,
    )
    assert int(np.asarray(res.accepted).sum()) == 0
