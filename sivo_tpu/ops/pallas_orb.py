"""Fused IC-angle + rBRIEF as a Pallas TPU kernel.

The XLA descriptor path (ops/orb.py) gathers one 31x31 raw patch and
one 37x37 blurred patch per keypoint via vmapped dynamic_slice, then
samples 512 rotated pattern points with take_along_axis. Measured on
hardware, those gathers are LATENCY-bound (~148 B row reads; dtype and
slice-count tricks moved nothing): 15.4 ms of the 28 ms per-image
frontend at 2048 keypoints — the single largest per-frame device cost
after the CNN.

This kernel restructures the work around the hardware's DMA rules
(Mosaic requires slice shapes AND offsets tile-aligned: rows % 8,
lanes % 128 — measured on this chip):

  * per keypoint, ONE aligned (48, 256) uint8 BAND per canvas is
    DMA-streamed HBM -> VMEM, double-buffered across keypoint blocks
    (the band always contains the 37x37 patch: row offset
    ((y-18)//8)*8, lane offset ((x-18)//128)*128 — both provably
    aligned, with the canvases padded so bands never run off the end);
  * the circular IC-angle mask is evaluated ANALYTICALLY at the
    keypoint's in-band offset: |u| <= round(sqrt(225 - v^2)) and the
    transpose condition — exactly ops/orb.ic_angle_mask
    (ref: ORBextractor.cc:431-447, :75-100 IC_Angle); cos/sin come
    straight from the moments (== cos(atan2(m01, m10)));
  * the 512 rotated-pattern samples factorize as one-hot contractions:
    v[b] = e_row[b]^T Band e_col[b]
    -> T = onehot_rows @ band  (256x48 @ 48x256, MXU)
    -> v = sum(T * onehot_cols, axis=1)  (VPU)
    (ref: ORBextractor.cc:104-150 computeOrbDescriptor — identical
    sampling: row = round(x sin + y cos), col = round(x cos - y sin),
    bit = I(p1) < I(p2)).

Canvases are passed as uint8 (round+clip in XLA) — WHICH IMPROVES
reference parity: OpenCV runs both IC_Angle and BRIEF on 8U images.
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
)

BK = 8  # keypoints per grid step
ROWS = 48  # band rows: covers dy in [18, 25] +- 18, multiple of 8
COLS = 256  # band lanes: covers dx in [18, 145] +- 18, multiple of 128


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
        canvas = jnp.zeros((1, 128, 512), jnp.uint8)
        coords = jnp.full((3, BK), 48, jnp.int32).at[0, :].set(0)
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


def _kernel(coords_ref, raw_ref, blur_ref, patt_ref,
            bits_ref, mom_ref, rawb, blurb, sems):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    def dmas(buf, blk):
        out = []
        for j in range(BK):
            k = blk * BK + j
            l = coords_ref[0, k]
            ys = ((coords_ref[1, k] - BRIEF_MARGIN) // 8) * 8
            xs = ((coords_ref[2, k] - BRIEF_MARGIN) // 128) * 128
            out.append(pltpu.make_async_copy(
                raw_ref.at[l, pl.ds(ys, ROWS), pl.ds(xs, COLS)],
                rawb.at[buf, j],
                sems.at[buf, 2 * j],
            ))
            out.append(pltpu.make_async_copy(
                blur_ref.at[l, pl.ds(ys, ROWS), pl.ds(xs, COLS)],
                blurb.at[buf, j],
                sems.at[buf, 2 * j + 1],
            ))
        return out

    @pl.when(step == 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    @pl.when(step + 1 < n_steps)
    def _():
        for d in dmas((step + 1) % 2, step + 1):
            d.start()

    buf = step % 2
    for d in dmas(buf, step):
        d.wait()

    iota_r = jax.lax.broadcasted_iota(
        jnp.int32, (ROWS, COLS), 0
    ).astype(jnp.float32)
    iota_c = jax.lax.broadcasted_iota(
        jnp.int32, (ROWS, COLS), 1
    ).astype(jnp.float32)
    iota_oh_r = jax.lax.broadcasted_iota(jnp.int32, (256, ROWS), 1)
    iota_oh_c = jax.lax.broadcasted_iota(jnp.int32, (256, COLS), 1)
    px1 = patt_ref[0, :][:, None]  # (256, 1)
    py1 = patt_ref[1, :][:, None]
    px2 = patt_ref[2, :][:, None]
    py2 = patt_ref[3, :][:, None]
    R2 = float(HALF_PATCH * HALF_PATCH)  # 225

    for j in range(BK):
        k = step * BK + j
        dy = (
            coords_ref[1, k]
            - ((coords_ref[1, k] - BRIEF_MARGIN) // 8) * 8
        )
        dx = (
            coords_ref[2, k]
            - ((coords_ref[2, k] - BRIEF_MARGIN) // 128) * 128
        )
        dyf = dy.astype(jnp.float32)
        dxf = dx.astype(jnp.float32)
        praw = rawb[buf, j].astype(jnp.int32).astype(jnp.float32)
        v = iota_r - dyf
        u = iota_c - dxf
        # analytic circular mask == ic_angle_mask at (dy, dx): the
        # umax bound AND its transpose (the reference's symmetry fix)
        umax_v = jnp.round(jnp.sqrt(jnp.maximum(R2 - v * v, 0.0)))
        umax_u = jnp.round(jnp.sqrt(jnp.maximum(R2 - u * u, 0.0)))
        inside = (jnp.abs(u) <= umax_v) & (jnp.abs(v) <= umax_u)
        wm = jnp.where(inside, praw, 0.0)
        m01 = jnp.sum(wm * v)
        m10 = jnp.sum(wm * u)
        r = jax.lax.rsqrt(jnp.maximum(m01 * m01 + m10 * m10, 1e-18))
        a = m10 * r  # cos(angle)
        b = m01 * r  # sin(angle)

        bband = blurb[buf, j].astype(jnp.int32).astype(jnp.float32)

        def sample(px, py):
            row = jnp.round(px * b + py * a).astype(jnp.int32) + dy
            col = jnp.round(px * a - py * b).astype(jnp.int32) + dx
            oh_r = (iota_oh_r == row).astype(jnp.float32)  # (256, 48)
            oh_c = (iota_oh_c == col).astype(jnp.float32)  # (256, 256)
            T = jnp.dot(
                oh_r, bband, preferred_element_type=jnp.float32
            )  # (256, 256)
            return jnp.sum(T * oh_c, axis=1)  # (256,)

        v1 = sample(px1, py1)
        v2 = sample(px2, py2)
        bits_ref[j, :] = (v1 < v2).astype(jnp.float32)
        # vector store (Mosaic rejects scalar stores to VMEM)
        mom_ref[j, :] = jnp.stack([m01, m10])


def _call(raw_canvas_u8, blur_canvas_u8, coords, interpret: bool):
    # coords arrives (3, N): SMEM pads the MINOR dim to 128 lanes, so an
    # (N, 3) layout would burn N*128*4 B of the chip's 1 MB SMEM
    # (measured: the 2048-kp probe allocated exactly 1.00 MB and died)
    n = coords.shape[1]
    patt_t = jnp.asarray(_PATTERN.T, jnp.float32)  # (4, 256)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // BK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # raw canvas u8
            pl.BlockSpec(memory_space=pltpu.HBM),  # blur canvas u8
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pattern (4, 256)
        ],
        out_specs=[
            pl.BlockSpec((BK, 256), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, 2), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, BK, ROWS, COLS), jnp.uint8),
            pltpu.VMEM((2, BK, ROWS, COLS), jnp.uint8),
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
    )(coords, raw_canvas_u8, blur_canvas_u8, patt_t)


def _pad_canvas_u8(canvas: jnp.ndarray) -> jnp.ndarray:
    """Round+clip to uint8 (OpenCV parity: the reference's IC_Angle and
    BRIEF both read 8U images) and pad so every aligned (48, 256) band
    stays in-bounds: rows to a multiple of 8 plus one band of slack,
    lanes to a multiple of 128 plus one lane-tile of slack."""
    L, H, W = canvas.shape
    h_pad = ((H + 7) // 8) * 8 + ROWS - H
    w_pad = ((W + 127) // 128) * 128 + COLS - 128 - W
    u8 = jnp.clip(jnp.round(canvas), 0, 255).astype(jnp.uint8)
    return jnp.pad(u8, ((0, 0), (0, h_pad), (0, max(w_pad, 0))))


def prepare(
    raw_canvas: jnp.ndarray,
    blur_canvas: jnp.ndarray,
    level: jnp.ndarray,  # (N,) int32
    xy_level: jnp.ndarray,  # (N, 2) float level coords
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The XLA half: pad/convert the canvases to u8 and clamp the
    keypoint coords. MUST run in a SEPARATE program from the kernel:
    on this backend a Mosaic call whose HBM-space operands are
    in-program INTERMEDIATES pays ~27 ms (one relay RTT — measured
    r5; operands arriving as program inputs are free). The frontend
    therefore dispatches prepare() inside its pre program and
    describe_prepared() in the program that follows."""
    xy = xy_level.astype(jnp.int32)
    ymax = raw_canvas.shape[1] - BRIEF_MARGIN - 1
    xmax = raw_canvas.shape[2] - BRIEF_MARGIN - 1
    coords = jnp.stack(
        [
            level.astype(jnp.int32),
            jnp.clip(xy[:, 1] + BORDER, BRIEF_MARGIN, ymax),
            jnp.clip(xy[:, 0] + BORDER, BRIEF_MARGIN, xmax),
        ],
        axis=0,
    )
    return _pad_canvas_u8(raw_canvas), _pad_canvas_u8(blur_canvas), coords


def describe_prepared(
    raw_u8: jnp.ndarray,
    blur_u8: jnp.ndarray,
    coords: jnp.ndarray,  # (3, N) int32 from prepare()
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The kernel half of orient_and_describe: (angle, bits, packed)
    from prepare()'s outputs. The XLA epilogue (atan2, bit packing) is
    free in the same program (measured: only HBM operands flowing INTO
    the kernel trigger the embedded-call penalty)."""
    n = coords.shape[1]
    assert n % BK == 0
    interpret = jax.default_backend() == "cpu"
    bits, mom = _call(raw_u8, blur_u8, coords, interpret)
    angle = jnp.arctan2(mom[:, 0], mom[:, 1])
    b8 = bits.reshape(n, 32, 8).astype(jnp.int32)
    weights = (2 ** jnp.arange(8, dtype=jnp.int32))[None, None, :]
    packed = jnp.sum(b8 * weights, axis=-1).astype(jnp.uint8)
    return angle, bits, packed


def orient_and_describe(
    raw_canvas: jnp.ndarray,
    blur_canvas: jnp.ndarray,
    level: jnp.ndarray,  # (N,) int32
    xy_level: jnp.ndarray,  # (N, 2) float level coords
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(angle (N,), bits (N, 256) f32, packed (N, 32) u8) — the fused
    IC-angle + rBRIEF path as ONE traced computation. Valid keypoints
    sit >= the detection margin from level edges
    (ops/image.level_valid_mask); invalid slots carry xy = -1, clamped
    into bounds (their outputs are masked by the caller).

    NOTE: composing this inside a larger jitted program pays the
    embedded-Mosaic penalty (see prepare()); the hot path splits via
    prepare()/describe_prepared() instead."""
    return describe_prepared(
        *prepare(raw_canvas, blur_canvas, level, xy_level)
    )
