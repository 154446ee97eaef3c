import jax
import jax.numpy as jnp
import numpy as np

from sivo_tpu.geometry import se3


def random_twists(n=16, scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.normal(size=(n, 6)) * scale, dtype=jnp.float32
    )


def test_exp_log_roundtrip():
    xi = random_twists(scale=0.5)
    T = se3.exp(xi)
    xi2 = se3.log(T)
    np.testing.assert_allclose(xi, xi2, atol=1e-4)


def test_exp_small_angle():
    xi = random_twists(scale=1e-6)
    T = se3.exp(xi)
    # ~ identity + [I, rho]
    np.testing.assert_allclose(
        np.asarray(T[:, :3, 3]), np.asarray(xi[:, :3]), atol=1e-6
    )


def test_inverse_and_compose():
    xi = random_twists(scale=0.7)
    T = se3.exp(xi)
    eye = jnp.broadcast_to(jnp.eye(4), T.shape)
    np.testing.assert_allclose(T @ se3.inverse(T), eye, atol=1e-5)


def test_rotation_orthonormal():
    T = se3.exp(random_twists(scale=2.0))
    R = T[:, :3, :3]
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(
        R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5
    )
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_transform_matches_matmul():
    T = se3.exp(random_twists(n=4))
    p = jnp.asarray(np.random.default_rng(1).normal(size=(4, 3)), jnp.float32)
    out = se3.transform(T, p)
    hom = jnp.concatenate([p, jnp.ones((4, 1))], axis=-1)
    expect = (T @ hom[..., None])[..., :3, 0]
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_adjoint_matches_reference_structure():
    # ref: sivo_helpers.cpp:242-266 — Ad = [[R, t^ R], [0, R]]
    T = se3.exp(random_twists(n=1))[0]
    A = se3.adjoint(T)
    R = T[:3, :3]
    t = T[:3, 3]
    tx = se3.hat(t)
    np.testing.assert_allclose(A[:3, :3], R, atol=1e-6)
    np.testing.assert_allclose(A[:3, 3:], tx @ R, atol=1e-6)
    np.testing.assert_allclose(A[3:, 3:], R, atol=1e-6)
    np.testing.assert_allclose(A[3:, :3], jnp.zeros((3, 3)), atol=1e-6)


def test_jit_and_vmap():
    xi = random_twists()
    T1 = jax.jit(se3.exp)(xi)
    T2 = jax.vmap(lambda v: se3.exp(v))(xi)
    np.testing.assert_allclose(T1, T2, atol=1e-6)
