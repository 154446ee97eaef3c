"""Command-line entry point.

Mirrors the reference binary (ref: src/sivo.cc:41-49):
    SIVO vocab settings prototxt caffemodel sequence_dir
Usage:
    python -m sivo_tpu.cli VOCAB SETTINGS PROTOTXT CAFFEMODEL SEQ_DIR
with '-' accepted for VOCAB (disables loop closing) and CAFFEMODEL
(random-initialized network — the reference checkout only ships Git-LFS
weight stubs, see BASELINE.md).

Outputs match the reference: per-frame pacing to the dataset
timestamps, median/mean track-time stats at exit (sivo.cc:130-137),
CameraTrajectory.txt (System.cc:274-336) and keyframes_points.txt
(System.cc:263-271).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    no_semantics = "--no-semantics" in argv
    save_frames = None
    if "--save-frames" in argv:
        # offline viewer (ref: Viewer.cc/FrameDrawer.cc live windows):
        # per-frame tracked-keypoint overlays + a final top-down map
        # render, written as a PNG series
        j = argv.index("--save-frames")
        save_frames = argv[j + 1]
        argv = argv[:j] + argv[j + 2 :]
    argv = [a for a in argv if not a.startswith("--")]
    if len(argv) < 5:
        print(
            "usage: python -m sivo_tpu.cli path_to_vocabulary "
            "path_to_settings path_to_prototxt path_to_caffemodel "
            "path_to_sequence [--no-semantics] [--save-frames DIR]",
            file=sys.stderr,
        )
        return 1
    vocab_path, settings_path, prototxt, caffemodel, seq_dir = argv[:5]

    import jax

    from sivo_tpu import config as cfg_mod
    from sivo_tpu.io import kitti
    from sivo_tpu.models import caffe_io, segnet
    from sivo_tpu.runtime.system import System

    cfg = cfg_mod.load_settings(settings_path)
    variant = "basic" if "basic" in prototxt else "standard"

    params = None
    if caffemodel != "-":
        try:
            model = segnet.SegNet(variant=variant)
            init = segnet.init_params(
                model, jax.random.key(0),
                cfg.camera.height, cfg.camera.width,
            )
            params = caffe_io.merge_params(
                init, caffe_io.load_segnet_params(caffemodel, variant)
            )
            print(f"Loaded weights from {caffemodel}")
        except ValueError as e:
            print(f"WARNING: {e}; using random initialization")

    vocabulary = None
    if vocab_path != "-":
        from sivo_tpu.place import vocabulary as voc_mod

        t0 = time.time()
        vocabulary = voc_mod.load_text(vocab_path)
        print(
            f"Vocabulary loaded: {vocabulary.n_words} words "
            f"({time.time() - t0:.1f}s)"
        )

    seq = kitti.load_sequence(seq_dir)
    print(f"Images in the sequence: {len(seq)}")

    system = System(
        cfg=cfg,
        segnet_variant=variant,
        segnet_params=params,
        vocabulary=vocabulary,
    )

    sem_override = None
    if no_semantics:
        # geometric-only mode: every pixel static/certain (the CNN
        # still runs; its posterior is bypassed at runtime). Useful
        # when no trained weights are available.
        import jax.numpy as jnp

        h, w = cfg.camera.height, cfg.camera.width
        sem_override = (
            jnp.zeros((h, w), jnp.uint8),
            jnp.ones((h, w), jnp.float32),
            jnp.zeros((h, w), jnp.float32),
            jnp.asarray(False),
        )
        print("Semantics bypassed (--no-semantics): geometric VO mode")

    import jax as _jax
    import jax.numpy as _jnp
    from sivo_tpu.runtime import frame as _frame_mod

    def read_crop(i):
        left, right = seq.read(i)
        return (
            kitti.center_crop(
                left, cfg.camera.height, cfg.camera.width
            ).astype(np.uint8),
            kitti.center_crop(
                right, cfg.camera.height, cfg.camera.width
            ).astype(np.uint8),
        )

    rng_key = _jax.random.key(42)
    built = {}

    def build(i):
        nonlocal rng_key
        if i in built or i >= len(seq):
            return
        left, right = read_crop(i)
        rng_key, key = _jax.random.split(rng_key)
        built[i] = _frame_mod.build_frame(
            system.model, system.segnet_params, system.statics,
            _jnp.asarray(left), _jnp.asarray(right), key,
            sem_override=sem_override,
            # the posterior source is fixed for the whole run: with
            # --no-semantics let XLA drop the CNN from the compiled
            # program (3 discarded MC passes otherwise run per frame)
            use_cnn_static=None if sem_override is None else False,
        )

    if save_frames:
        import os

        os.makedirs(save_frames, exist_ok=True)

    track_times = []
    for i in range(len(seq)):
        build(i)
        f = built.pop(i)
        t1 = time.time()
        # prefetch next frame's frontend via pre_retire: its device
        # program enqueues AFTER this frame's tracking step (see
        # System.track_frame), its host work overlaps the retire wait
        system.track_frame(
            f, float(seq.timestamps[i]), pipeline=not save_frames,
            pre_retire=lambda: build(i + 1),
        )
        dt = time.time() - t1
        track_times.append(dt)
        if save_frames:
            import cv2

            from sivo_tpu.utils.fetch import fetch_packed
            from sivo_tpu.viz import replay

            h = fetch_packed(
                {
                    "cls": f.classes_raster,
                    "xy": f.xy,
                    "valid": f.valid,
                    "tracked": system.tracker.carry.pt_idx >= 0,
                }
            )
            gray, _ = read_crop(i)
            img = replay.draw_frame(
                gray.astype(np.float32)
                if gray.ndim == 2
                else gray.mean(-1),
                np.asarray(h["cls"]),
                np.asarray(h["xy"]),
                np.asarray(h["tracked"]),
                np.asarray(h["valid"]),
                status=(
                    f"frame {i}  KFs {system.map.n_keyframes}  "
                    f"state {system.state.name}"
                ),
            )
            cv2.imwrite(
                f"{save_frames}/frame_{i:06d}.png", img
            )
        # pace to the dataset timestamps (ref: sivo.cc:115-123)
        if i + 1 < len(seq):
            wait = float(seq.timestamps[i + 1] - seq.timestamps[i]) - dt
            if wait > 0:
                time.sleep(min(wait, 0.5))

    system.shutdown("keyframes_points.txt")
    system.save_trajectory_kitti("CameraTrajectory.txt")
    if save_frames:
        from sivo_tpu.viz import replay

        replay.render_session(system, save_frames)
        print(f"Frame overlays + map render written to {save_frames}/")
    tt = np.sort(track_times)
    print(
        "-------\n"
        f"median tracking time: {tt[len(tt) // 2]:.4f}\n"
        f"mean tracking time: {tt.mean():.4f}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
