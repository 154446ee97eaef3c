"""SegNet training loop: a trivially-separable 3-class task must be
learnable in a few dozen steps, and the trained net must round-trip
through the caffemodel writer/loader and still segment correctly."""

import jax
import numpy as np

from sivo_tpu.models import caffe_io, segnet, train


def _toy_dataset(n=6, h=32, w=64, seed=0):
    """Class = brightness band: dark -> 0, mid -> 1, bright -> 2, with
    distinct color casts so the task is solvable from local pixels."""
    rng = np.random.default_rng(seed)
    images = np.zeros((n, h, w, 3), np.float32)
    labels = np.zeros((n, h, w), np.int32)
    for i in range(n):
        cls = rng.integers(0, 3, size=(4, 8))
        cls = np.kron(cls, np.ones((h // 4, w // 8), int))
        base = np.array([[40.0, 30, 35], [120, 130, 110], [220, 200, 210]])
        img = base[cls] + rng.normal(0, 8, size=(h, w, 3))
        images[i] = np.clip(img, 0, 255)
        labels[i] = cls
    return images, labels


def test_train_learns_and_roundtrips(tmp_path):
    # reduced dropout for the tiny test problem (0.5 MC-dropout noise
    # dominates a 60-step toy fit; the full-size offline train uses the
    # reference's 0.5)
    model = segnet.SegNet(variant="basic", num_classes=15,
                          dropout_rate=0.2)
    params = segnet.init_params(model, jax.random.key(0), 32, 64)
    images, labels = _toy_dataset()
    trained = train.train_segnet(
        model, params, images, labels, steps=80, batch=2, lr=2e-3
    )
    classes, conf, ent = segnet.segment_image(
        model, trained, images[0], jax.random.key(1), mc_samples=2
    )
    acc = float(np.mean(np.asarray(classes) == labels[0]))
    assert acc > 0.7, f"trained accuracy {acc}"

    # round-trip through the reference weight format
    path = tmp_path / "trained.caffemodel"
    caffe_io.save_segnet_params(str(path), jax.tree.map(np.asarray, trained))
    loaded = caffe_io.merge_params(
        segnet.init_params(model, jax.random.key(9), 32, 64),
        caffe_io.load_segnet_params(str(path), "basic"),
    )
    classes2, _, _ = segnet.segment_image(
        model, loaded, images[0], jax.random.key(1), mc_samples=2
    )
    np.testing.assert_array_equal(
        np.asarray(classes), np.asarray(classes2)
    )


def test_class_balance_weights():
    labels = np.array([0] * 90 + [1] * 9 + [2] * 1)
    w = train.class_balance_weights(labels, 4)
    assert w[3] == 0.0  # absent class
    assert w[2] > w[1] > w[0] > 0
