"""SegNet training (median-frequency-balanced cross-entropy).

The reference trains its Bayesian SegNet offline in Caffe (the repo
ships only inference: prototxts + caffemodel weights, ref:
bayesian_segnet.cpp:46-66) — this module is the tpu-native equivalent
of that offline step so the full pipeline (train -> save_segnet_params
-> load_segnet_params -> segment_image) can run inside this framework.
Loss follows the SegNet paper's class balancing: per-class weights
median(freq)/freq(c), the scheme the released Caffe solvers use.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sivo_tpu.models import segnet as segnet_mod


def class_balance_weights(
    labels: np.ndarray, num_classes: int
) -> np.ndarray:
    """Median-frequency balancing over a label corpus (SegNet paper
    §3.3): weight(c) = median(freq)/freq(c); absent classes get 0."""
    counts = np.bincount(
        np.asarray(labels).reshape(-1), minlength=num_classes
    ).astype(np.float64)
    freq = counts / max(counts.sum(), 1)
    present = freq > 0
    med = np.median(freq[present]) if present.any() else 1.0
    w = np.zeros(num_classes, np.float64)
    w[present] = med / freq[present]
    return w.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("model", "tx"))
def _train_step(
    model: segnet_mod.SegNet,
    tx: optax.GradientTransformation,
    params: Any,
    opt_state: Any,
    images: jnp.ndarray,  # (B, H, W, 3) float 0..255
    labels: jnp.ndarray,  # (B, H, W) int32
    weights: jnp.ndarray,  # (C,)
    rng: jnp.ndarray,
) -> tuple[Any, Any, jnp.ndarray]:
    def loss_fn(p):
        def one(img, key):
            return model.apply(
                p, img, train=True, rngs={"dropout": key}
            )

        keys = jax.random.split(rng, images.shape[0])
        probs = jax.vmap(one)(images, keys)  # (B, H, W, C)
        logp = jnp.log(jnp.maximum(probs, 1e-12))
        ll = jnp.take_along_axis(
            logp, labels[..., None], axis=-1
        )[..., 0]
        w = weights[labels]
        return -jnp.sum(w * ll) / jnp.maximum(jnp.sum(w), 1.0)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def train_segnet(
    model: segnet_mod.SegNet,
    params: Any,
    images: np.ndarray,  # (N, H, W, 3) uint8/float
    labels: np.ndarray,  # (N, H, W) integer class ids
    *,
    steps: int = 200,
    batch: int = 2,
    lr: float = 1e-3,
    seed: int = 0,
    log_every: int = 0,
) -> Any:
    """A small Adam loop over (image, label) rasters; returns trained
    params. Images/labels stay on host; each step uploads one batch
    (training is offline — per-step transfer cost is irrelevant)."""
    num_classes = model.num_classes
    weights = jnp.asarray(class_balance_weights(labels, num_classes))
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    rng = np.random.default_rng(seed)
    key = jax.random.key(seed)
    n = images.shape[0]
    losses = []
    for step in range(steps):
        idx = rng.choice(n, size=min(batch, n), replace=False)
        img_b = jnp.asarray(
            np.asarray(images[idx], np.float32)
        )
        lab_b = jnp.asarray(np.asarray(labels[idx], np.int32))
        key, sub = jax.random.split(key)
        params, opt_state, loss = _train_step(
            model, tx, params, opt_state, img_b, lab_b, weights, sub
        )
        if log_every and step % log_every == 0:
            losses.append(float(loss))
            print(f"  [train] step {step} loss {float(loss):.4f}",
                  flush=True)
    return params
