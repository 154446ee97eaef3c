"""Precision helpers.

TPU matmuls default to bfloat16 inputs on the MXU; that is the right
trade for the CNN but wrong for 6x6 covariance algebra, Jacobian
products and LM normal equations, where 0.4% relative error breaks
chi-squared tests and marginal covariances. Everything in geometry /
select / optim goes through these helpers, which force full fp32
(HIGHEST) precision regardless of the global default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def hmat(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """matmul at HIGHEST precision."""
    return jnp.matmul(a, b, precision=HIGHEST)


def hdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """dot/contraction at HIGHEST precision via einsum-free matmul."""
    return jnp.matmul(a, b, precision=HIGHEST)


def heinsum(subscripts: str, *operands: jnp.ndarray) -> jnp.ndarray:
    """einsum at HIGHEST precision."""
    return jnp.einsum(subscripts, *operands, precision=HIGHEST)
