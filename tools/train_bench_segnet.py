"""Offline SegNet training for the bench scene (VERDICT r2 item 9).

Trains the basic Bayesian SegNet on the synthetic circuit's rendered
frames + renderer class maps, then saves the weights through the
caffemodel writer — the tpu-native twin of the reference's offline
Caffe training (the reference ships pre-trained weights and only loads
them, bayesian_segnet.cpp:46-66). `SIVO_BENCH_CNN=1 python bench.py`
then loads this file and consumes the net's real MC-dropout posterior
(use_cnn=True) instead of renderer-derived semantics.

Trains at half resolution (176x512 — conv weights are resolution-
independent; inference runs at 352x1024) so a CPU-only train is
feasible when the TPU is busy. ~10-20 min on one CPU core.

Usage: PYTHONPATH=/root/repo python tools/train_bench_segnet.py \
           [render_cache.npz] [out.caffemodel]
"""

import os as _os
import sys

# runnable as a bare subprocess (bench.py self-trains on first CNN-mode
# run): the script lives in tools/, so the repo root is not on sys.path
# unless the caller exported PYTHONPATH — add it ourselves.
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np


def main() -> None:
    cache = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/tmp/sivo_bench_render_circuit-v11-190-1024x352.npz"
    )
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/tmp/sivo_bench_segnet.caffemodel"
    )
    import os

    import jax

    if os.environ.get("SIVO_TRAIN_CPU"):
        # the axon TPU env force-selects JAX_PLATFORMS=axon via
        # sitecustomize; only a config update can override it
        jax.config.update("jax_platforms", "cpu")

    from sivo_tpu.models import caffe_io, segnet, train

    z = np.load(cache)
    left, cls = z["left"], z["cls"]
    # every 8th frame, half resolution (1024/2=512, 352/2=176; both
    # divisible by 16 as the basic variant requires)
    sel = np.arange(0, left.shape[0], 8)
    imgs = left[sel, ::2, ::2].astype(np.float32)
    # the frontend feeds a 3-channel broadcast of the grayscale left
    # image (frame.py build_frame) — train on the same distribution
    imgs = np.repeat(imgs[..., None], 3, axis=-1)
    labels = cls[sel, ::2, ::2].astype(np.int32)
    print(f"training on {len(sel)} frames {imgs.shape[1:]} "
          f"classes={np.unique(labels)}", flush=True)

    model = segnet.SegNet(variant="basic", num_classes=15)
    params = segnet.init_params(
        model, jax.random.key(0), imgs.shape[1], imgs.shape[2]
    )
    trained = train.train_segnet(
        model, params, imgs, labels,
        steps=int(sys.argv[3]) if len(sys.argv) > 3 else 150,
        batch=2, lr=1e-3, log_every=10,
    )
    caffe_io.save_segnet_params(out, jax.tree.map(np.asarray, trained))
    print("wrote", out, flush=True)

    # quick holdout check at full resolution
    i = 4  # not in the training subset (multiples of 8)
    img_full = np.repeat(
        left[i].astype(np.float32)[..., None], 3, axis=-1
    )
    classes, conf, ent = segnet.segment_image(
        model, trained, img_full, jax.random.key(1), mc_samples=3
    )
    acc = float(np.mean(np.asarray(classes) == cls[i]))
    print(f"holdout frame {i} full-res pixel acc: {acc:.3f}", flush=True)


if __name__ == "__main__":
    main()
