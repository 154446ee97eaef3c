"""Fused IC-angle + rBRIEF as a Pallas TPU kernel.

The XLA descriptor path (ops/orb.py) gathers one 31x31 raw patch and
one 37x37 blurred patch per keypoint via vmapped dynamic_slice, then
samples 512 rotated pattern points with take_along_axis. Measured on
hardware, those gathers are LATENCY-bound (~148 B row reads; dtype and
slice-count tricks moved nothing): 15.4 ms of the 28 ms per-image
frontend at 2048 keypoints — the single largest per-frame device cost
after the CNN.

This kernel replaces both stages per keypoint block:

  * double-buffered async DMAs stream both patches HBM -> VMEM while
    the previous block computes (the latency the XLA gather eats
    serially is hidden behind compute);
  * orientation = masked moment sums over the raw patch (VPU);
    cos/sin derived directly from the moments (same math as
    cos(atan2(m01, m10)) — ref: ORBextractor.cc:75-100 IC_Angle);
  * the 512 rotated-pattern samples factorize as two one-hot
    contractions per pattern set:  v[b] = e_row[b]^T P e_col[b]
    -> T = onehot_rows @ patch  (256x40 @ 40x128, MXU)
    -> v = sum(T * onehot_cols, axis=1)  (VPU)
    so the scattered reads become two tiny matmuls per keypoint
    (ref: ORBextractor.cc:104-150 computeOrbDescriptor — identical
    sampling: row = round(x sin + y cos), col = round(x cos - y sin),
    bit = I(p1) < I(p2)).

Outputs are the descriptor bits and the raw moments (m01, m10); the
caller derives angle = atan2(m01, m10) in XLA. On CPU the kernel runs
interpreted (tests); SIVO_NO_PALLAS=1 forces the XLA path everywhere.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sivo_tpu.ops.image import BORDER
from sivo_tpu.ops.orb import (
    BRIEF_MARGIN,
    HALF_PATCH,
    _PATTERN,
    ic_angle_mask,
)

BK = 8  # keypoints per grid step
RAW_ROWS = 32  # 31 rows padded to the f32 sublane multiple
BLUR_ROWS = 40  # 37 rows padded
LANES = 128
RAW_PS = 2 * HALF_PATCH + 1  # 31
BLUR_PS = 2 * BRIEF_MARGIN + 1  # 37


def use_pallas() -> bool:
    """Same policy as ops/pallas_match.py: kernel on real TPU backends,
    XLA fallback on CPU unless forced."""
    if os.environ.get("SIVO_NO_PALLAS", "") == "1":
        return False
    if os.environ.get("SIVO_FORCE_PALLAS", "") == "1":
        return True
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return _probe_ok()


@functools.cache
def _probe_ok() -> bool:
    """One-time compile+run probe (Mosaic may be unavailable behind
    some PJRT plugins)."""
    try:
        canvas = jnp.zeros((1, 64, 160), jnp.float32)
        coords = jnp.full((BK, 3), 24, jnp.int32).at[:, 0].set(0)
        bits, mom = _call(canvas, canvas, coords, interpret=False)
        _ = jax.device_get(mom)
        return True
    except Exception as e:  # noqa: BLE001
        print(
            f"pallas orb kernel unavailable ({type(e).__name__}); "
            "using the XLA descriptor path",
            flush=True,
        )
        return False


def _kernel(coords_ref, raw_ref, blur_ref, patt_ref, mask_ref,
            bits_ref, mom_ref, rawp, blurp, sems):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    def dmas(buf, blk):
        out = []
        for j in range(BK):
            k = blk * BK + j
            l = coords_ref[k, 0]
            y = coords_ref[k, 1]
            x = coords_ref[k, 2]
            out.append(pltpu.make_async_copy(
                raw_ref.at[l, pl.ds(y - HALF_PATCH, RAW_PS),
                           pl.ds(x - HALF_PATCH, RAW_PS)],
                rawp.at[buf, j, :RAW_PS, :RAW_PS],
                sems.at[buf, 2 * j],
            ))
            out.append(pltpu.make_async_copy(
                blur_ref.at[l, pl.ds(y - BRIEF_MARGIN, BLUR_PS),
                            pl.ds(x - BRIEF_MARGIN, BLUR_PS)],
                blurp.at[buf, j, :BLUR_PS, :BLUR_PS],
                sems.at[buf, 2 * j + 1],
            ))
        return out

    @pl.when(step == 0)
    def _():
        # zero the scratch ONCE: the DMAs only fill the :PS regions and
        # the padding participates in masked sums / one-hot matmuls —
        # uninitialized VMEM there poisons them (NaN * 0 = NaN)
        rawp[...] = jnp.zeros_like(rawp)
        blurp[...] = jnp.zeros_like(blurp)
        for d in dmas(0, 0):
            d.start()

    @pl.when(step + 1 < n_steps)
    def _():
        for d in dmas((step + 1) % 2, step + 1):
            d.start()

    buf = step % 2
    for d in dmas(buf, step):
        d.wait()

    iota_r_raw = jax.lax.broadcasted_iota(
        jnp.float32, (RAW_ROWS, LANES), 0
    )
    iota_c_raw = jax.lax.broadcasted_iota(
        jnp.float32, (RAW_ROWS, LANES), 1
    )
    vco = iota_r_raw - HALF_PATCH  # patch-centered v coordinate
    uco = iota_c_raw - HALF_PATCH

    px1 = patt_ref[0, :][:, None]  # (256, 1)
    py1 = patt_ref[1, :][:, None]
    px2 = patt_ref[2, :][:, None]
    py2 = patt_ref[3, :][:, None]
    iota_oh_r = jax.lax.broadcasted_iota(jnp.int32, (256, BLUR_ROWS), 1)
    iota_oh_c = jax.lax.broadcasted_iota(jnp.int32, (256, LANES), 1)

    for j in range(BK):
        p = rawp[buf, j]  # (32, 128)
        wm = p * mask_ref[:]
        m01 = jnp.sum(wm * vco)
        m10 = jnp.sum(wm * uco)
        r = jax.lax.rsqrt(jnp.maximum(m01 * m01 + m10 * m10, 1e-18))
        a = m10 * r  # cos(angle)
        b = m01 * r  # sin(angle)

        bp = blurp[buf, j]  # (40, 128)

        def sample(px, py):
            row = jnp.round(px * b + py * a).astype(jnp.int32) + (
                BRIEF_MARGIN
            )
            col = jnp.round(px * a - py * b).astype(jnp.int32) + (
                BRIEF_MARGIN
            )
            oh_r = (iota_oh_r == row).astype(jnp.float32)  # (256, 40)
            oh_c = (iota_oh_c == col).astype(jnp.float32)  # (256, 128)
            T = jnp.dot(
                oh_r, bp, preferred_element_type=jnp.float32
            )  # (256, 128)
            return jnp.sum(T * oh_c, axis=1)  # (256,)

        v1 = sample(px1, py1)
        v2 = sample(px2, py2)
        bits_ref[j, :] = (v1 < v2).astype(jnp.float32)
        mom_ref[j, 0] = m01
        mom_ref[j, 1] = m10


def _call(raw_canvas, blur_canvas, coords, interpret: bool):
    n = coords.shape[0]
    patt_t = jnp.asarray(_PATTERN.T, jnp.float32)  # (4, 256)
    mask = np.zeros((RAW_ROWS, LANES), np.float32)
    mask[:RAW_PS, :RAW_PS] = ic_angle_mask()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // BK,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # raw canvas (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # blur canvas (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pattern (4, 256)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ic mask
        ],
        out_specs=[
            pl.BlockSpec((BK, 256), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, 2), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, BK, RAW_ROWS, LANES), jnp.float32),
            pltpu.VMEM((2, BK, BLUR_ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2 * BK)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n, 256), jnp.float32),
            jax.ShapeDtypeStruct((n, 2), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(coords, raw_canvas, blur_canvas, patt_t, mask)


def orient_and_describe(
    raw_canvas: jnp.ndarray,
    blur_canvas: jnp.ndarray,
    level: jnp.ndarray,  # (N,) int32
    xy_level: jnp.ndarray,  # (N, 2) float level coords
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(angle (N,), bits (N, 256) f32, packed (N, 32) u8) — the fused
    IC-angle + rBRIEF path. Caller guarantees keypoints sit >= the
    detection margin from level edges (ops/image.level_valid_mask), so
    patch DMAs stay in-bounds; invalid slots carry xy = -1 which lands
    at the canvas corner (BORDER margin keeps that in-bounds too)."""
    n = xy_level.shape[0]
    assert n % BK == 0
    xy = xy_level.astype(jnp.int32)
    ymax = raw_canvas.shape[1] - BRIEF_MARGIN - 1
    xmax = raw_canvas.shape[2] - BRIEF_MARGIN - 1
    coords = jnp.stack(
        [
            level.astype(jnp.int32),
            jnp.clip(xy[:, 1] + BORDER, BRIEF_MARGIN, ymax),
            jnp.clip(xy[:, 0] + BORDER, BRIEF_MARGIN, xmax),
        ],
        axis=1,
    )
    interpret = jax.default_backend() == "cpu"
    bits, mom = _call(raw_canvas, blur_canvas, coords, interpret)
    angle = jnp.arctan2(mom[:, 0], mom[:, 1])
    b8 = bits.reshape(n, 32, 8).astype(jnp.int32)
    weights = (2 ** jnp.arange(8, dtype=jnp.int32))[None, None, :]
    packed = jnp.sum(b8 * weights, axis=-1).astype(jnp.uint8)
    return angle, bits, packed
