"""End-to-end benchmark: SIVO frames/sec on one TPU chip.

Runs the FULL pipeline (Bayesian SegNet MC-dropout semantics, ORB
stereo front end, entropy-gated tracking with pose LM, local mapping
with triangulation + Schur BA + culling) at KITTI geometry (1024x352,
2000 features, MC=3) on a synthetic corridor sequence, and reports
steady-state FPS with a per-stage breakdown.

Baseline: the KITTI camera rate of 10 FPS that the reference paces to
(ref: config/kitti/KITTI00-02.yaml:22, src/sivo.cc:115-123) and does
NOT meet ("does not quite run in real time", README.md:40-42) on an
i7 + TitanX. vs_baseline = fps / 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from sivo_tpu.config import SystemConfig
    from sivo_tpu.io import synthetic
    from sivo_tpu.runtime import frame as frame_mod
    from sivo_tpu.runtime.system import System

    cfg = SystemConfig()  # KITTI03 defaults: 1024x352, fx=721.5, 2000 feats
    cfg = dataclasses.replace(
        cfg,
        semantic=dataclasses.replace(
            cfg.semantic, th_entropy_reduction=2.0
        ),
    )
    n_frames = 28
    world = synthetic.make_world(
        cfg.camera, seed=0, half_width=12.0, length=240.0
    )
    gt = synthetic.forward_trajectory(n_frames=n_frames, speed=1.1)
    left, right, clsmaps = synthetic.render_sequence(world, gt)
    # uint8 uploads: the host->device link is the bottleneck
    left_color = np.repeat(
        left[:, :, :, None], 3, axis=-1
    ).astype(np.uint8)
    right = right.astype(np.uint8)
    # no trained CNN weights exist in this environment (Git-LFS stubs,
    # BASELINE.md) — the CNN runs at full cost every frame, but the
    # tracking policy consumes CNN-like structured semantics derived
    # from the renderer's class maps (graded per-pixel entropy: with a
    # CONSTANT raster the SIVO criterion degenerates to all-or-nothing
    # creation, which no real posterior produces)
    sem_frames = [
        synthetic.structured_semantics(c, seed=7) for c in clsmaps
    ]
    use_cnn = jnp.asarray(False)

    system = System(cfg=cfg, max_keyframes=256, max_points=131072)

    built = {}

    def build(i: int):
        if i in built or i >= n_frames:
            return
        with system.timer.stage("build_frame"):
            built[i] = frame_mod.build_frame(
                system.model, system.segnet_params, system.statics,
                jnp.asarray(left_color[i]),
                jnp.asarray(right[i]),
                jax.random.key(i),
                sem_override=(
                    jnp.asarray(sem_frames[i][0]),
                    jnp.asarray(sem_frames[i][1]),
                    jnp.asarray(sem_frames[i][2]),
                    use_cnn,
                ),
            )

    def run_frame(i: int) -> None:
        build(i)
        f = built.pop(i)
        build(i + 1)  # prefetch: frontend of i+1 overlaps tracking of i
        system.track_frame(f, timestamp=i * 0.1, pipeline=True)

    # warmup: compile every program variant — continue until the
    # keyframe pipeline (mapping, triangulation, BA) has run twice
    warm = 0
    kf_events = 0
    while warm < n_frames - 10 and (warm < 4 or kf_events < 2):
        kf_before = system.map.n_keyframes
        run_frame(warm)
        if system.map.n_keyframes > kf_before:
            kf_events += 1
        warm += 1
    system.timer.totals.clear()
    system.timer.counts.clear()
    system.timer.samples.clear()

    t0 = time.time()
    for i in range(warm, n_frames):
        run_frame(i)
    system.flush()  # retire the pipelined frame + drain mapping
    _ = np.asarray(system.tracker.last_pose)  # full sync
    dt = (time.time() - t0) / max(n_frames - warm, 1)
    fps = 1.0 / dt

    est = system.frame_poses()
    est = est[: len(gt)]
    ate = synthetic.ate_rmse(est, gt[: len(est)])
    n_lost_main = system.n_lost()

    # pure-tracking FPS: localization mode against the built map
    # (no keyframe pipeline) — the per-frame hot path in isolation
    system.activate_localization_mode()
    t0 = time.time()
    n_loc = 8
    for i in range(n_frames - n_loc, n_frames):
        run_frame(i)
    system.flush()
    _ = np.asarray(system.tracker.last_pose)
    fps_tracking = n_loc / (time.time() - t0)
    system.deactivate_localization_mode()

    # relay calibration: the TPU sits behind a shared relay whose
    # dispatch/fetch costs vary with contention; these two numbers let
    # runs be compared fairly (dispatch floor + fixed matmul)
    calib_x = jnp.ones((2048, 2048), jnp.float32)
    _ = float((calib_x @ calib_x).reshape(-1)[0])
    t0 = time.time()
    for _i in range(10):
        _ = float(jnp.sum(calib_x[:1, :1]))
    disp_ms = (time.time() - t0) / 10 * 1000
    t0 = time.time()
    for _i in range(10):
        calib_y = calib_x @ calib_x
    _ = float(calib_y.reshape(-1)[0])
    mm_ms = (time.time() - t0) / 10 * 1000
    stage_ms = {
        name: round(
            1000 * system.timer.totals[name]
            / max(system.timer.counts[name], 1),
            1,
        )
        for name in system.timer.totals
    }
    result = {
        "metric": "kitti_geometry_sivo_fps",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 10.0, 3),
        "detail": {
            "frames": n_frames,
            "warmup": warm,
            "lost": n_lost_main,
            "keyframes": system.map.n_keyframes,
            "map_points": system.map.n_points,
            "ate_m": round(float(ate), 3),
            "ms_per_frame": round(dt * 1000, 1),
            "tracking_only_fps": round(fps_tracking, 2),
            "stage_mean_ms": stage_ms,
            "relay_calibration": {
                "dispatch_fetch_ms": round(disp_ms, 2),
                "matmul_2048_ms": round(mm_ms, 2),
            },
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
