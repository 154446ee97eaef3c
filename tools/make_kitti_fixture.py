"""Render the synthetic world into a KITTI-format sequence directory.

Produces exactly what the reference CLI consumes (ref: src/sivo.cc:41-49
argv contract, :145-177 loadImages): ``image_2/NNNNNN.png`` (left),
``image_3/NNNNNN.png`` (right), ``times.txt``, plus a KITTI03-style
OpenCV-YAML settings file (keys per src/orbslam/Tracking.cc:64-165) and
``gt_poses.npy`` (renderer ground truth, for ATE checks — not part of
the KITTI contract).

Usage: PYTHONPATH=/root/repo python tools/make_kitti_fixture.py \
           OUT_DIR [n_frames] [width] [height]
"""

from __future__ import annotations

import os
import sys

import numpy as np


def write_settings(path: str, cam, orb, sem, trk) -> None:
    """KITTI03-style OpenCV YAML (ref: config/kitti/KITTI03.yaml)."""
    with open(path, "w") as f:
        f.write("%YAML:1.0\n\n")
        for k, v in [
            ("Camera.fx", cam.fx), ("Camera.fy", cam.fy),
            ("Camera.cx", cam.cx), ("Camera.cy", cam.cy),
            ("Camera.k1", cam.k1), ("Camera.k2", cam.k2),
            ("Camera.p1", cam.p1), ("Camera.p2", cam.p2),
            ("Camera.width", cam.width), ("Camera.height", cam.height),
            ("Camera.fps", cam.fps), ("Camera.bf", cam.bf),
            ("Camera.RGB", cam.rgb),
            ("ThDepth", trk.th_depth),
            ("ThConfidence", sem.th_confidence),
            ("ThEntropyReduction", sem.th_entropy_reduction),
            ("ORBextractor.nFeatures", orb.n_features),
            ("ORBextractor.scaleFactor", orb.scale_factor),
            ("ORBextractor.nLevels", orb.n_levels),
            ("ORBextractor.iniThFAST", orb.ini_th_fast),
            ("ORBextractor.minThFAST", orb.min_th_fast),
        ]:
            f.write(f"{k}: {v}\n")


def make_fixture(
    out_dir: str,
    n_frames: int = 60,
    width: int = 1024,
    height: int = 352,
    ss: int = 2,
) -> str:
    import dataclasses

    import cv2

    from sivo_tpu.config import CameraConfig, SystemConfig
    from sivo_tpu.io import synthetic

    base = SystemConfig()
    scale = width / base.camera.width
    cam = dataclasses.replace(
        base.camera,
        width=width, height=height,
        fx=base.camera.fx * scale, fy=base.camera.fy * scale,
        cx=base.camera.cx * scale,
        cy=base.camera.cy * (height / base.camera.height),
        bf=base.camera.bf * scale,
    )
    cfg = dataclasses.replace(base, camera=cam)
    world = synthetic.make_loop_world(
        cam, seed=0, outer=16.0, inner=6.0
    )
    gt = synthetic.square_loop_trajectory(
        n_frames=n_frames, half=9.5, corner_r=3.5, jitter=0.03
    )
    left, right, _cls = synthetic.render_sequence(world, gt, ss=ss)

    os.makedirs(os.path.join(out_dir, "image_2"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "image_3"), exist_ok=True)
    for i in range(n_frames):
        cv2.imwrite(
            os.path.join(out_dir, "image_2", f"{i:06d}.png"),
            left[i].astype(np.uint8),
        )
        cv2.imwrite(
            os.path.join(out_dir, "image_3", f"{i:06d}.png"),
            right[i].astype(np.uint8),
        )
    with open(os.path.join(out_dir, "times.txt"), "w") as f:
        for i in range(n_frames):
            f.write(f"{i / cam.fps:.6e}\n")
    write_settings(
        os.path.join(out_dir, "settings.yaml"),
        cam, cfg.orb, cfg.semantic, cfg.tracking,
    )
    np.save(os.path.join(out_dir, "gt_poses.npy"), gt)
    return out_dir


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kittiseq03"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    h = int(sys.argv[4]) if len(sys.argv) > 4 else 352
    make_fixture(out, n, w, h)
    print(f"wrote {n} frames ({w}x{h}) to {out}")


if __name__ == "__main__":
    main()
