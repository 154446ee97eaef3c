"""Fused masked-Hamming top-2 as a Pallas TPU kernel.

The matcher family (ops/matching.py) replaces ORBmatcher's per-keypoint
loops (ref: ORBmatcher.cc:44-159, 1278-1417, 303-331) with masked
Hamming MATRICES. Pure-XLA, each search materializes the (N, M) score
matrix in HBM and reads it back for the row reductions — at the local
map's (4096, 2048) that is 32 MB of HBM round-trip per search on a
part where HBM, not FLOPs, is the bottleneck (CLAUDE.md).

This kernel fuses the whole pipeline per row-tile in VMEM:

    window/octave/right-u mask  (VPU, from per-row + per-col attrs)
  -> Hamming = na + nb - 2 * (A @ B^T)   (MXU, bf16 with f32 accum:
     0/1 products are exact)
  -> best / second-best distance + argmins per row

so HBM sees only the descriptor reads and four (N,) outputs — the
(N, M) matrix never leaves the chip.

Mask parameterization (covers every matcher variant):
  row attrs: u, v, ur, radius, lvl_lo, lvl_hi, valid
  col attrs: x, y, ur, level, valid
  ok[i, j] = |x_j - u_i| <= radius_i  &  |y_j - v_i| <= radius_i
           & lvl_lo_i <= level_j <= lvl_hi_i
           & (not use_ur or ur_j <= 0 or |ur_i - ur_j| <= radius_i)
           & valid_i & valid_j

On CPU (tests) the kernel runs in interpreter mode; `SIVO_NO_PALLAS=1`
forces the reference XLA path everywhere (kept as the numerical oracle
in tests/test_pallas_match.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

TILE_N = 256  # rows per grid step; score tile (256, M) f32 stays <4MB


def use_pallas() -> bool:
    """Pallas path policy: on for real TPU backends, off on CPU (the
    interpreter is exact but slow — the dedicated parity tests exercise
    the kernel there). SIVO_NO_PALLAS=1 forces the XLA path everywhere;
    SIVO_FORCE_PALLAS=1 forces the kernel (interpreted on CPU)."""
    if os.environ.get("SIVO_NO_PALLAS", "") == "1":
        return False
    if os.environ.get("SIVO_FORCE_PALLAS", "") == "1":
        return True
    # "axon" is the relay PJRT plugin in front of a real TPU
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return _probe_ok()


@functools.cache
def _probe_ok() -> bool:
    """One-time compile probe: Mosaic may be unavailable behind some
    PJRT relays — fall back to the XLA path instead of crashing the
    first jitted program that embeds the kernel."""
    try:
        # probe at a multi-tile N: single-tile probes compiled while
        # the real N=2048 program failed Mosaic layout verification
        # (1-D output tiling differs with total length)
        n_p = 8 * TILE_N
        a = jnp.zeros((n_p, 256), jnp.float32)
        b = jnp.zeros((128, 256), jnp.float32)
        row = jnp.zeros((n_p, 8), jnp.float32)
        col = jnp.zeros((8, 128), jnp.float32)
        out = masked_hamming_top2(
            a, b, row, col, use_ur=True, interpret=False
        )
        jax.block_until_ready(out)
        return True
    except Exception as e:  # noqa: BLE001 — any compile failure
        import warnings

        warnings.warn(
            f"pallas match kernel unavailable ({type(e).__name__}); "
            "using the XLA matcher path"
        )
        return False


def _kernel(row_ref, colt_ref, a_ref, b_ref,
            best_ref, second_ref, bj_ref, sj_ref, *, use_ur: bool):
    a = a_ref[:]  # (TILE_N, 256) f32 0/1
    na = jnp.sum(a, axis=1, keepdims=True)  # (TILE_N, 1)
    dot = jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b_ref[:].astype(jnp.bfloat16),  # (M, 256)
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE_N, M)
    nb = jnp.sum(b_ref[:], axis=1)[None, :]  # (1, M)
    ham = na + nb - 2.0 * dot

    # mask from attrs (row (TILE_N, 8); col transposed (8, M))
    u = row_ref[:, 0:1]
    v = row_ref[:, 1:2]
    r_ur = row_ref[:, 2:3]
    radius = row_ref[:, 3:4]
    lvl_lo = row_ref[:, 4:5]
    lvl_hi = row_ref[:, 5:6]
    r_valid = row_ref[:, 6:7] > 0.5
    x = colt_ref[0:1, :]
    y = colt_ref[1:2, :]
    c_ur = colt_ref[2:3, :]
    lvl = colt_ref[3:4, :]
    c_valid = colt_ref[4:5, :] > 0.5
    ok = (
        (jnp.abs(x - u) <= radius)
        & (jnp.abs(y - v) <= radius)
        & (lvl >= lvl_lo) & (lvl <= lvl_hi)
        & r_valid & c_valid
    )
    if use_ur:
        ok = ok & ((c_ur <= 0.0) | (jnp.abs(r_ur - c_ur) <= radius))
    d = jnp.where(ok, ham, jnp.inf)

    # keepdims: outputs are (TILE_N, 1) blocks — 1-D (TILE_N,) outputs
    # trip Mosaic/XLA layout disagreement at some total lengths (XLA
    # tiles 1-D f32[2048] as T(1024); Mosaic wants the block size)
    best = jnp.min(d, axis=1, keepdims=True)
    bj = jnp.argmin(d, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d2 = jnp.where(cols == bj[:, None], jnp.inf, d)
    second = jnp.min(d2, axis=1, keepdims=True)
    sj = jnp.argmin(d2, axis=1).astype(jnp.int32)

    best_ref[:] = best
    second_ref[:] = second
    bj_ref[:] = bj[:, None]
    sj_ref[:] = sj[:, None]


@functools.partial(
    jax.jit, static_argnames=("use_ur", "interpret")
)
def masked_hamming_top2(
    a_bits: jnp.ndarray,  # (N, 256) 0/1 float
    b_bits: jnp.ndarray,  # (M, 256) 0/1 float
    row_attr: jnp.ndarray,  # (N, 8) f32 [u, v, ur, radius, lo, hi, valid, _]
    col_attr_t: jnp.ndarray,  # (8, M) f32 [x, y, ur, level, valid, ...]
    use_ur: bool = True,
    interpret: bool | None = None,
):
    """Returns (best_d, second_d, best_j, second_j), each (N,)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, dbits = a_bits.shape
    m = b_bits.shape[0]
    if n % TILE_N:
        raise ValueError(f"N={n} must be a multiple of {TILE_N}")
    if m % 128:
        raise ValueError(f"M={m} must be a multiple of 128")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    grid = (n // TILE_N,)
    kern = functools.partial(_kernel, use_ur=use_ur)
    best, second, bj, sj = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (TILE_N, 8), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, m), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TILE_N, dbits), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (m, dbits), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(row_attr, col_attr_t, a_bits, b_bits)
    # squeeze back to the (N,) contract of the XLA path
    return best[:, 0], second[:, 0], bj[:, 0], sj[:, 0]


def pack_row_attr(
    u, v, ur, radius, lvl_lo, lvl_hi, valid
) -> jnp.ndarray:
    """(N,)-vectors -> (N, 8) f32 row-attribute pack."""
    n = u.shape[0]
    return jnp.stack(
        [
            u.astype(jnp.float32),
            v.astype(jnp.float32),
            ur.astype(jnp.float32),
            radius.astype(jnp.float32),
            lvl_lo.astype(jnp.float32),
            lvl_hi.astype(jnp.float32),
            valid.astype(jnp.float32),
            jnp.zeros(n, jnp.float32),
        ],
        axis=1,
    )


def pack_col_attr_t(x, y, ur, level, valid) -> jnp.ndarray:
    """(M,)-vectors -> (8, M) f32 column-attribute pack (transposed so
    each attribute is one aligned (1, M) lane row in VMEM)."""
    m = x.shape[0]
    z = jnp.zeros(m, jnp.float32)
    return jnp.stack(
        [
            x.astype(jnp.float32),
            y.astype(jnp.float32),
            ur.astype(jnp.float32),
            level.astype(jnp.float32),
            valid.astype(jnp.float32),
            z, z, z,
        ],
        axis=0,
    )
