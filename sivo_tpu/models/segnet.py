"""Bayesian SegNet in Flax — the semantic front end.

TPU-native rebuild of the reference's Caffe wrapper (ref:
src/bayesian_segnet/bayesian_segnet.cpp, the ``Upsample``/dropout-at-test
layers of the caffe-segnet-cudnn7 fork, and the two architectures in
config/bayesian_segnet/{basic,standard}/kitti/*.prototxt).

Key differences from the reference by design:
  * MC-dropout samples are a ``vmap`` axis over dropout RNG keys instead
    of replicated rows of a Caffe batch blob
    (ref: bayesian_segnet.cpp:119-178) — one XLA program, and the sample
    axis is shardable across a device mesh.
  * The posterior post-processing (mean over samples, argmax class, max
    confidence, Shannon entropy) that the reference runs on *CPU* in
    Eigen tensors after copying the prob blob back
    (ref: bayesian_segnet.cpp:180-297) is fused into the same jitted
    program and never leaves the device.
  * Layout is NHWC (TPU conv-friendly); the Caffe weight converter
    transposes.

Architecture notes:
  * "basic": LRN -> 4 x [conv7x7(64) + ReLU + maxpool2x2(argmax)] with
    MC dropout after pool3/pool4, mirrored decoder with max-unpooling,
    1x1 conv to classes, softmax (bayesian_segnet_basic_kitti.prototxt).
  * "standard": VGG16-style 13-conv encoder with Caffe "BN" after every
    conv, 5 pools, mirrored decoder, MC dropout after pool3/4/5 and
    before upsample4/3/2 (bayesian_segnet_kitti.prototxt).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# (name, out_channels, kernel) per encoder stage; decoder mirrors.
_BASIC_ENCODER = (
    (("conv1", 64, 7),),
    (("conv2", 64, 7),),
    (("conv3", 64, 7),),
    (("conv4", 64, 7),),
)
_BASIC_DECODER = (
    (("conv_decode4", 64, 7),),
    (("conv_decode3", 64, 7),),
    (("conv_decode2", 64, 7),),
    (("conv_decode1", 64, 7),),
)
_STD_ENCODER = (
    (("conv1_1", 64, 3), ("conv1_2", 64, 3)),
    (("conv2_1", 128, 3), ("conv2_2", 128, 3)),
    (("conv3_1", 256, 3), ("conv3_2", 256, 3), ("conv3_3", 256, 3)),
    (("conv4_1", 512, 3), ("conv4_2", 512, 3), ("conv4_3", 512, 3)),
    (("conv5_1", 512, 3), ("conv5_2", 512, 3), ("conv5_3", 512, 3)),
)
_STD_DECODER = (
    (("conv5_3_D", 512, 3), ("conv5_2_D", 512, 3), ("conv5_1_D", 512, 3)),
    (("conv4_3_D", 512, 3), ("conv4_2_D", 512, 3), ("conv4_1_D", 256, 3)),
    (("conv3_3_D", 256, 3), ("conv3_2_D", 256, 3), ("conv3_1_D", 128, 3)),
    (("conv2_2_D", 128, 3), ("conv2_1_D", 64, 3)),
    (("conv1_2_D", 64, 3),),
)


def lrn(x: Array, local_size: int = 5, alpha: float = 1e-4,
        beta: float = 0.75, k: float = 1.0) -> Array:
    """Caffe ACROSS_CHANNELS LRN (ref: basic prototxt "norm" layer):
    ``x / (k + alpha/n * sum_{window} x^2)^beta`` over the channel dim
    (NHWC: last axis)."""
    sq = x * x
    half = local_size // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(half, half)]
    sq = jnp.pad(sq, pad)
    # windowed channel sum via cumulative sum difference
    csum = jnp.cumsum(sq, axis=-1)
    csum = jnp.pad(csum, [(0, 0)] * (x.ndim - 1) + [(1, 0)])
    n_ch = x.shape[-1]
    win = (
        jax.lax.dynamic_slice_in_dim(csum, local_size, n_ch, axis=-1)
        - jax.lax.dynamic_slice_in_dim(csum, 0, n_ch, axis=-1)
    )
    scale = k + (alpha / local_size) * win
    return x / (scale ** beta)


def max_pool_argmax(x: Array) -> tuple[Array, Array]:
    """Non-overlapping 2x2 max pooling that also returns the in-window
    argmax (0..3, row-major), the TPU equivalent of Caffe's pooling
    mask output (ref: prototxt ``top: "pool1_mask"``).

    x: (..., H, W, C) with H, W even. Returns (pooled, idx) both
    (..., H/2, W/2, C); idx dtype int32.
    """
    *batch, h, w, c = x.shape
    xr = x.reshape(*batch, h // 2, 2, w // 2, 2, c)  # (.., h2, dy, w2, dx, c)
    xr = jnp.moveaxis(xr, -4, -3)  # (..., h/2, w/2, dy, dx, c)
    xw = xr.reshape(*batch, h // 2, w // 2, 4, c)
    idx = jnp.argmax(xw, axis=-2).astype(jnp.int32)
    val = jnp.max(xw, axis=-2)
    return val, idx


def max_unpool(x: Array, idx: Array) -> Array:
    """Max-unpooling: scatter each value into the 2x2 output slot named
    by ``idx`` (the caffe-segnet ``Upsample`` layer; ref: prototxt
    ``type: "Upsample"`` consuming a pool mask)."""
    *batch, h, w, c = x.shape
    onehot = jax.nn.one_hot(idx, 4, dtype=x.dtype, axis=-2)  # (...,h,w,4,c)
    y = x[..., None, :] * onehot
    y = y.reshape(*batch, h, w, 2, 2, c)
    y = jnp.moveaxis(y, -3, -4)  # (..., h, 2, w, 2, c)
    return y.reshape(*batch, h * 2, w * 2, c)


class CaffeBN(nn.Module):
    """Inference-form Caffe "BN" layer (ref: standard prototxt type "BN"):
    ``y = scale * (x - mean) / sqrt(var + eps) + shift``.

    The SegNet release ships weights with BN statistics pre-merged into
    scale/shift (README.md:90 of the reference describes the merge
    script); with merged weights ``mean`` stays 0 and ``var`` stays 1.
    Both forms load through the converter.
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        shift = self.param("shift", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return x * inv + (shift - mean * inv)


class SegNet(nn.Module):
    """Bayesian SegNet ("basic" or "standard" variant).

    Input: (H, W, 3) float image, raw 0..255 channel order matching the
    training data (the reference feeds raw float BGR; ref:
    bayesian_segnet.cpp:164-178 — no mean subtraction; the basic
    variant's LRN layer normalizes).
    Output: (H, W, num_classes) per-pixel class probabilities.
    """

    variant: str = "basic"
    num_classes: int = 15
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32

    def _conv(self, name: str, ch: int, k: int) -> nn.Conv:
        return nn.Conv(
            ch,
            (k, k),
            padding=[(k // 2, k // 2), (k // 2, k // 2)],
            name=name,
            dtype=self.dtype,
        )

    def _block(self, x: Array, spec: Sequence[tuple[str, int, int]],
               use_bn: bool) -> Array:
        for name, ch, k in spec:
            x = self._conv(name, ch, k)(x)
            if use_bn:
                x = CaffeBN(name=f"{name}_bn")(x)
            x = nn.relu(x)
        return x

    @nn.compact
    def __call__(self, image: Array, train: bool = True,
                 mc_samples: int | None = None) -> Array:
        """``mc_samples=S`` (static): run the deterministic pre-dropout
        encoder ONCE on a single image, then tile the activation S-fold
        at the first dropout layer and continue with per-sample masks —
        the MC ensemble as an explicit batch axis. Mathematically the
        Caffe replicated-blob batch (ref: bayesian_segnet.cpp:119-178)
        minus the redundant pre-dropout compute (conv1-conv3 at the
        highest resolutions are identical across samples; the reference
        recomputes them per blob row). Returns (S, H, W, classes).
        """
        if self.variant == "basic":
            encoder, decoder = _BASIC_ENCODER, _BASIC_DECODER
            use_bn = False
            enc_drop = {2, 3}  # after pool3, pool4 (0-indexed stages 2, 3)
            dec_drop = {0, 1}  # after conv_decode4, conv_decode3
        elif self.variant == "standard":
            encoder, decoder = _STD_ENCODER, _STD_DECODER
            use_bn = True
            enc_drop = {2, 3, 4}  # after pool3/4/5
            dec_drop = {0, 1, 2}  # before upsample4/3/2
        else:
            raise ValueError(f"unknown variant {self.variant!r}")

        drop = nn.Dropout(
            rate=self.dropout_rate, deterministic=not train
        )

        n_pools = len(_BASIC_ENCODER if self.variant == "basic"
                      else _STD_ENCODER)
        div = 2 ** n_pools
        h, w = image.shape[-3], image.shape[-2]
        if h % div or w % div:
            raise ValueError(
                f"SegNet '{self.variant}' needs H, W divisible by {div} "
                f"(got {h}x{w}); center-crop the input first "
                "(ref: System.cc:154-170 resizeImages)"
            )
        if mc_samples is not None and image.ndim != 3:
            raise ValueError("mc_samples needs a single (H, W, 3) image")
        x = image.astype(self.dtype)
        if x.ndim == 3:
            x = x[None]
        if self.variant == "basic":
            x = lrn(x)  # ref: basic prototxt "norm" layer

        masks = []
        tiled = mc_samples is None
        for i, spec in enumerate(encoder):
            x = self._block(x, spec, use_bn)
            x, idx = max_pool_argmax(x)
            masks.append(idx)
            if i in enc_drop:
                if not tiled:
                    # first stochastic layer: fan the shared encoder
                    # state out to the MC ensemble
                    x = jnp.broadcast_to(
                        x, (mc_samples,) + x.shape[1:]
                    )
                    tiled = True
                x = drop(x)

        for i, spec in enumerate(decoder):
            x = max_unpool(x, masks[len(masks) - 1 - i])
            x = self._block(x, spec, use_bn)
            if i in dec_drop:
                x = drop(x)

        if self.variant == "basic":
            logits = nn.Conv(
                self.num_classes, (1, 1),
                name="dense_softmax_inner_prod", dtype=self.dtype,
            )(x)
        else:
            # standard: final conv1_1_D maps 64 -> classes, no BN/ReLU
            logits = self._conv("conv1_1_D", self.num_classes, 3)(x)

        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if mc_samples is not None:
            return probs  # (S, H, W, classes)
        return probs[0] if image.ndim == 3 else probs


def posterior(mean_probs: Array) -> tuple[Array, Array, Array]:
    """Fused posterior statistics from MC-mean class probabilities
    (H, W, C):
      classes   (H, W) uint8 argmax      (ref: bayesian_segnet.cpp:180-190)
      confidence(H, W) max prob          (ref: bayesian_segnet.cpp:192-203)
      entropy   (H, W) Shannon bits      (ref: bayesian_segnet.cpp:38-44,
                                          262-276): sum of -p*log2(p).
    """
    classes = jnp.argmax(mean_probs, axis=-1).astype(jnp.uint8)
    confidence = jnp.max(mean_probs, axis=-1)
    p = mean_probs
    plogp = jnp.where(p > 0.0, p * jnp.log2(jnp.maximum(p, 1e-30)), 0.0)
    entropy = -jnp.sum(plogp, axis=-1)
    return classes, confidence, entropy


@functools.partial(
    jax.jit, static_argnames=("model", "mc_samples", "sample_axis")
)
def segment_image(
    model: SegNet,
    params: Any,
    image: Array,
    rng: Array,
    mc_samples: int = 3,
    sample_axis: str | None = None,
) -> tuple[Array, Array, Array]:
    """Full MC-dropout segmentation: one device program from image to
    (classes, confidence, entropy) rasters (replaces
    ref: bayesian_segnet.cpp:299-318 ``segmentImage``).

    MC samples ride an explicit batch axis fanned out at the first
    dropout layer (the pre-dropout encoder runs once — see
    ``SegNet.__call__``); when ``sample_axis`` names a mesh axis (used
    under shard_map), the per-sample probabilities are averaged with a
    ``psum`` so samples shard across chips.
    """
    probs = model.apply(
        params, image, train=True, rngs={"dropout": rng},
        mc_samples=mc_samples,
    )  # (S, H, W, C)
    mean_probs = jnp.mean(probs, axis=0)
    if sample_axis is not None:
        mean_probs = jax.lax.pmean(mean_probs, axis_name=sample_axis)
    return posterior(mean_probs)


def mc_variance(probs: Array, classes: Array) -> Array:
    """Per-pixel SAMPLE variance (Bessel, /(S-1)) of the softmax
    probability of the DETECTED class across the MC draws
    (ref: bayesian_segnet.cpp:205-260 ``computeVariance`` — the
    reference triple-loops per pixel on CPU after copying the prob
    blob back; here it is one fused one-hot contraction + moment
    reduction that never leaves the device).

    probs: (S, H, W, C) per-sample probabilities; classes: (H, W)
    detected class (argmax of the MC mean). Returns (H, W) float32.
    """
    s = probs.shape[0]
    onehot = jax.nn.one_hot(
        classes.astype(jnp.int32), probs.shape[-1], dtype=probs.dtype
    )
    sel = jnp.sum(probs * onehot[None], axis=-1)  # (S, H, W)
    mean = jnp.mean(sel, axis=0)
    return jnp.sum(
        (sel - mean[None]) ** 2, axis=0
    ) / jnp.float32(max(s - 1, 1))


def variance_image(variance: Array) -> Array:
    """Min-max normalize the variance raster to [0, 1]
    (ref: bayesian_segnet.cpp:330-344 ``generateVarianceImage``,
    cv::NORM_MINMAX)."""
    lo = jnp.min(variance)
    hi = jnp.max(variance)
    return (variance - lo) / jnp.maximum(hi - lo, 1e-30)


@functools.partial(
    jax.jit, static_argnames=("model", "mc_samples")
)
def segment_image_with_variance(
    model: SegNet,
    params: Any,
    image: Array,
    rng: Array,
    mc_samples: int = 3,
) -> tuple[Array, Array, Array, Array]:
    """``segment_image`` plus the MC-variance raster (classes,
    confidence, entropy, variance) — the full BayesianSegNet API
    surface (ref: bayesian_segnet.hpp:108-170). Off the hot path: the
    reference's ``computeVariance`` is likewise not called per frame."""
    probs = model.apply(
        params, image, train=True, rngs={"dropout": rng},
        mc_samples=mc_samples,
    )
    classes, confidence, entropy = posterior(jnp.mean(probs, axis=0))
    return classes, confidence, entropy, mc_variance(probs, classes)


def init_params(
    model: SegNet, rng: Array, height: int = 352, width: int = 1024
) -> Any:
    dummy = jnp.zeros((height, width, 3), jnp.float32)
    return model.init(
        {"params": rng, "dropout": rng}, dummy, train=False
    )
