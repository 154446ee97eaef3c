"""Image ops: grayscale, pyramid construction, Gaussian blur.

TPU-native replacement for the reference's OpenCV imaging calls
(ref: src/orbslam/ORBextractor.cc:1085-1122 ``ComputePyramid``,
:1060-1062 GaussianBlur; src/orbslam/Tracking.cc:187-205 cvtColor).

Design: the 8-level pyramid lives in ONE stacked canvas array
``[L, Hp, Wp]`` where level l occupies the top-left ``(h_l+2b, w_l+2b)``
region (b = 19px reflected border, ref EDGE_THRESHOLD). This gives every
downstream stage (FAST over all levels, patch gathers at mixed octaves)
static shapes and single-program vectorization — the reference instead
loops levels on the CPU and pads each cv::Mat separately.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

BORDER = 19  # ref: ORBextractor.cc EDGE_THRESHOLD


class PyramidSpec(NamedTuple):
    """Static pyramid geometry, computed at trace time."""

    n_levels: int
    scale_factor: float
    heights: tuple[int, ...]  # per-level unpadded h_l
    widths: tuple[int, ...]
    scales: tuple[float, ...]  # scale_factor ** l
    canvas_h: int  # h_0 + 2*BORDER
    canvas_w: int

    @property
    def sigma2(self) -> tuple[float, ...]:
        """Per-level variance scale (ref: ORBextractor mvLevelSigma2)."""
        return tuple(s * s for s in self.scales)


def make_pyramid_spec(
    height: int, width: int, n_levels: int = 8, scale_factor: float = 1.2
) -> PyramidSpec:
    """Level sizes follow the reference: each level is the previous
    resized by 1/scale (ref: ORBextractor.cc:1085-1122 uses
    cvRound(prev/scale) successively)."""
    hs, ws, ss = [height], [width], [1.0]
    for lvl in range(1, n_levels):
        s = scale_factor ** lvl
        ss.append(s)
        hs.append(int(round(height / s)))
        ws.append(int(round(width / s)))
    return PyramidSpec(
        n_levels=n_levels,
        scale_factor=scale_factor,
        heights=tuple(hs),
        widths=tuple(ws),
        scales=tuple(ss),
        canvas_h=height + 2 * BORDER,
        canvas_w=width + 2 * BORDER,
    )


def bgr_to_gray(img: jnp.ndarray, rgb: bool = False) -> jnp.ndarray:
    """(H, W, 3) -> (H, W) luma with OpenCV weights
    (ref: Tracking.cc:187-205 cvtColor BGR2GRAY/RGB2GRAY)."""
    if rgb:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
    else:
        b, g, r = img[..., 0], img[..., 1], img[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def gaussian_kernel_7_sigma2() -> jnp.ndarray:
    """The 7-tap sigma=2 kernel of the reference's pre-descriptor blur
    (ref: ORBextractor.cc:1060-1062)."""
    xs = jnp.arange(7, dtype=jnp.float32) - 3.0
    k = jnp.exp(-(xs * xs) / (2.0 * 4.0))
    return k / jnp.sum(k)


def gaussian_blur_7x7(img: jnp.ndarray) -> jnp.ndarray:
    """Separable 7x7 sigma=2 blur over the last two axes. Accepts
    (..., H, W)."""
    k = gaussian_kernel_7_sigma2()
    orig_shape = img.shape
    x = img.reshape((-1, 1) + orig_shape[-2:])  # NCHW
    kh = k.reshape(1, 1, 7, 1)
    kw = k.reshape(1, 1, 1, 7)
    dn = ("NCHW", "OIHW", "NCHW")
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(3, 3), (0, 0)], dimension_numbers=dn
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (3, 3)], dimension_numbers=dn
    )
    return x.reshape(orig_shape)


def _resize_level(img: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers (OpenCV INTER_LINEAR
    convention, matching cv::resize in ComputePyramid)."""
    return jax.image.resize(img, (h, w), method="linear")


def _reflect_pad(img: jnp.ndarray, b: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 (no edge duplication) as used by the
    reference's copyMakeBorder (ref: ORBextractor.cc:1098-1118)."""
    return jnp.pad(img, ((b, b), (b, b)), mode="reflect")


@functools.partial(jax.jit, static_argnames=("spec",))
def build_pyramid(
    gray: jnp.ndarray, spec: PyramidSpec
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build the stacked pyramid canvas.

    Args:
      gray: (H, W) float image.
      spec: static geometry.

    Returns:
      (raw, blurred): two (L, canvas_h, canvas_w) arrays. Level l's
      padded image occupies ``[:h_l+2b, :w_l+2b]``; the pixel at
      unpadded level coordinate (y, x) is at canvas (y+b, x+b).
      ``raw`` feeds FAST and IC-angle; ``blurred`` feeds rBRIEF and the
      stereo SAD refinement, matching the reference's use of the
      GaussianBlur'd workingMat for descriptors only.
    """
    levels_raw = []
    levels_blur = []
    img = gray
    for lvl in range(spec.n_levels):
        if lvl > 0:
            img = _resize_level(img, spec.heights[lvl], spec.widths[lvl])
        padded = _reflect_pad(img, BORDER)
        ph, pw = padded.shape
        canvas = jnp.zeros((spec.canvas_h, spec.canvas_w), gray.dtype)
        canvas = canvas.at[:ph, :pw].set(padded)
        levels_raw.append(canvas)
        blurred = jnp.zeros((spec.canvas_h, spec.canvas_w), gray.dtype)
        blurred = blurred.at[:ph, :pw].set(gaussian_blur_7x7(padded))
        levels_blur.append(blurred)
    return jnp.stack(levels_raw), jnp.stack(levels_blur)


def level_valid_mask(spec: PyramidSpec, margin: int) -> jnp.ndarray:
    """(L, canvas_h, canvas_w) bool: canvas pixels that are inside the
    level's unpadded region shrunk by ``margin`` (in level pixels,
    measured from the unpadded image edge). Used to restrict FAST
    detection to the reference's region [EDGE_THRESHOLD-3, size-16)
    (ref: ORBextractor.cc:758-766)."""
    ys = jnp.arange(spec.canvas_h)[None, :, None]
    xs = jnp.arange(spec.canvas_w)[None, None, :]
    h = jnp.asarray(spec.heights)[:, None, None]
    w = jnp.asarray(spec.widths)[:, None, None]
    lo = BORDER + margin
    return (
        (ys >= lo)
        & (ys < h + BORDER - margin)
        & (xs >= lo)
        & (xs < w + BORDER - margin)
    )


def per_level_budgets(n_features: int, spec: PyramidSpec) -> tuple[int, ...]:
    """Geometric per-level feature budget (ref: ORBextractor.cc:440-452):
    level 0 gets n*(1-f)/(1-f^L) with f = 1/scale, rounded, last level
    takes the remainder."""
    f = 1.0 / spec.scale_factor
    n0 = n_features * (1 - f) / (1 - f ** spec.n_levels)
    budgets = []
    acc = 0
    for lvl in range(spec.n_levels - 1):
        b = int(round(n0 * (f ** lvl)))
        budgets.append(b)
        acc += b
    budgets.append(max(n_features - acc, 0))
    return tuple(budgets)
