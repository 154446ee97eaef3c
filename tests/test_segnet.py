"""SegNet model tests — architecture contracts and posterior numerics
(the reference's test strategy: tests/test_bayesian_segnet.cpp checks
argmax semantics on class-map-shaped tensors and raster geometry)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sivo_tpu.models import segnet

H, W = 64, 128  # divisible by 32 like the real 352x1024 geometry


def test_pool_unpool_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    pooled, idx = segnet.max_pool_argmax(x)
    assert pooled.shape == (1, 4, 4, 4)
    # pooled value must be the max of each 2x2 window
    win = np.asarray(x).reshape(1, 4, 2, 4, 2, 4).max(axis=(2, 4))
    np.testing.assert_allclose(pooled, win, atol=1e-6)
    # unpooling puts each max back at its original location
    up = segnet.max_unpool(pooled, idx)
    assert up.shape == x.shape
    orig = np.asarray(x)
    restored = np.asarray(up)
    nonzero = restored != 0
    np.testing.assert_allclose(restored[nonzero], orig[nonzero], atol=1e-6)
    # exactly one nonzero per 2x2 window (generic random input)
    counts = nonzero.reshape(1, 4, 2, 4, 2, 4).sum(axis=(2, 4))
    assert (counts == 1).all()


def test_pool_argmax_first_occurrence_row_major():
    # Caffe picks the first max in row-major window order; ties must
    # resolve identically (ref: caffe-segnet pooling mask semantics).
    x = jnp.ones((1, 2, 2, 1), jnp.float32)
    _, idx = segnet.max_pool_argmax(x)
    assert int(idx[0, 0, 0, 0]) == 0


def test_lrn_matches_direct_formula():
    rng = np.random.default_rng(1)
    x = np.abs(rng.normal(size=(1, 4, 4, 8))).astype(np.float32) * 100
    out = np.asarray(segnet.lrn(jnp.asarray(x)))
    # direct O(C^2) reference
    expect = np.zeros_like(x)
    n, alpha, beta, k = 5, 1e-4, 0.75, 1.0
    for c in range(8):
        lo, hi = max(0, c - 2), min(8, c + 3)
        s = (x[..., lo:hi] ** 2).sum(axis=-1)
        expect[..., c] = x[..., c] / (k + alpha / n * s) ** beta
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_posterior_matches_reference_semantics():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(H, W, 15))
    p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    classes, conf, ent = segnet.posterior(jnp.asarray(p, jnp.float32))
    np.testing.assert_array_equal(np.asarray(classes), p.argmax(-1))
    np.testing.assert_allclose(np.asarray(conf), p.max(-1), rtol=1e-5)
    expect_ent = -(p * np.log2(p)).sum(-1)
    np.testing.assert_allclose(np.asarray(ent), expect_ent, rtol=1e-4)
    assert classes.dtype == jnp.uint8


@pytest.mark.parametrize("variant", ["basic", "standard"])
def test_segnet_shapes(variant):
    model = segnet.SegNet(variant=variant)
    params = segnet.init_params(model, jax.random.key(0), H, W)
    img = jnp.zeros((H, W, 3), jnp.float32)
    probs = model.apply(
        params, img, train=True, rngs={"dropout": jax.random.key(1)}
    )
    assert probs.shape == (H, W, 15)
    s = np.asarray(probs.sum(-1))
    np.testing.assert_allclose(s, 1.0, atol=1e-4)


def test_basic_param_count_matches_reference_weights():
    # The reference's basic caffemodel is 5,670,476 bytes (LFS stub
    # header); the float payload is ~1.4M params. Check we're in the
    # right ballpark (same architecture).
    model = segnet.SegNet(variant="basic")
    params = segnet.init_params(model, jax.random.key(0), H, W)
    n = sum(x.size for x in jax.tree.leaves(params))
    assert 1_300_000 < n < 1_500_000, n


def test_mc_dropout_sample_variance():
    # different dropout keys must give different probability maps
    model = segnet.SegNet(variant="basic")
    params = segnet.init_params(model, jax.random.key(0), H, W)
    img = jnp.asarray(
        np.random.default_rng(3).uniform(0, 255, size=(H, W, 3)),
        jnp.float32,
    )
    classes, conf, ent = segnet.segment_image(
        model, params, img, jax.random.key(42), mc_samples=2
    )
    assert classes.shape == (H, W) and conf.shape == (H, W)
    p1 = model.apply(
        params, img, train=True, rngs={"dropout": jax.random.key(1)}
    )
    p2 = model.apply(
        params, img, train=True, rngs={"dropout": jax.random.key(2)}
    )
    assert float(jnp.abs(p1 - p2).max()) > 1e-6


def test_segment_image_full_geometry_runs():
    # full 352x1024 geometry as the real system uses
    model = segnet.SegNet(variant="basic")
    params = segnet.init_params(model, jax.random.key(0), 352, 1024)
    img = jnp.zeros((352, 1024, 3), jnp.float32)
    classes, conf, ent = segnet.segment_image(
        model, params, img, jax.random.key(0), mc_samples=2
    )
    assert classes.shape == (352, 1024)
    assert ent.shape == (352, 1024)


def test_mc_variance_matches_numpy_oracle():
    # ref: bayesian_segnet.cpp:205-260 — SAMPLE variance (/(S-1)) of
    # the detected class's probability across the MC draws
    rng = np.random.default_rng(11)
    S, h, w, C = 4, 6, 8, 15
    probs = rng.dirichlet(np.ones(C), size=(S, h, w)).astype(np.float32)
    classes = np.argmax(probs.mean(axis=0), axis=-1).astype(np.uint8)
    got = np.asarray(
        segnet.mc_variance(jnp.asarray(probs), jnp.asarray(classes))
    )
    want = np.empty((h, w))
    for j in range(h):
        for k in range(w):
            v = probs[:, j, k, classes[j, k]].astype(np.float64)
            want[j, k] = ((v - v.mean()) ** 2).sum() / (S - 1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-7)


def test_variance_image_minmax_normalizes():
    # ref: bayesian_segnet.cpp:330-344 — cv::NORM_MINMAX to [0, 1]
    v = jnp.asarray([[0.5, 1.5], [2.5, 0.5]])
    img = np.asarray(segnet.variance_image(v))
    assert img.min() == 0.0 and img.max() == 1.0
    np.testing.assert_allclose(img, [[0.0, 0.5], [1.0, 0.0]])


def test_segment_image_with_variance_shapes():
    model = segnet.SegNet(variant="basic")
    params = segnet.init_params(model, jax.random.key(0), H, W)
    img = jnp.asarray(
        np.random.default_rng(5).uniform(0, 255, size=(H, W, 3)),
        jnp.float32,
    )
    cls, conf, ent, var = segnet.segment_image_with_variance(
        model, params, img, jax.random.key(7), mc_samples=3
    )
    assert var.shape == (H, W)
    assert float(var.min()) >= 0.0
    # MC dropout must produce nonzero posterior variance somewhere
    assert float(var.max()) > 0.0
