"""End-to-end benchmark: SIVO frames/sec on one TPU chip.

Runs the FULL system — Bayesian SegNet MC-dropout semantics, ORB
stereo front end, entropy-gated tracking with pose LM, pipelined local
mapping (triangulation + Schur BA + culling), BoW loop detection, Sim3
+ essential-graph + GBA loop correction, and relocalization — at KITTI
geometry (1024x352, 2000 features, MC=3) on a synthetic out-and-back
corridor whose return leg revisits the outbound path, and reports
steady-state FPS, ATE, and loop-closure counts.

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

# Persistent compilation cache: verified working THROUGH the axon
# relay (2026-08-19: a 29.4 s first compile replayed in 5.2 s from a
# cold process) — kills in-window compile spikes (a cold pose-graph
# E_pad bucket cost 10.6 s inside run 1's timed window) and makes
# back-to-back bench runs comparable. SIVO_BENCH_NOCACHE=1 opts out
# for cold-compile measurements.
import os as _os_cache

if not _os_cache.environ.get("SIVO_BENCH_NOCACHE"):
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp"
    )
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", 0.5
    )

import jax.numpy as jnp
import numpy as np


def _warm_loop_programs(system) -> None:
    """Compile the loop-closure device programs with dummy inputs of
    the exact shapes the closure path uses — a first closure inside the
    timed window otherwise pays ~1 min of XLA compiles."""
    from sivo_tpu.optim import local_ba, pose_graph

    cfg = system.cfg
    cam = system.tracker.cam
    N = cfg.orb.max_keypoints
    bits = jnp.zeros((N, 256), jnp.float32)
    ang = jnp.zeros(N, jnp.float32)
    has = jnp.zeros(N, bool)

    # fused Sim3-stage programs (loopclosing._bf/_ransac/_guided):
    # warm with the REAL kf_store pytree so shapes/dtypes match live
    from sivo_tpu.runtime import loopclosing as lc_mod

    store = system.tracker.kf_store
    nkp = store.xy.shape[1]
    ij = jnp.zeros(2, jnp.int32)
    has12 = jnp.zeros((2, nkp), bool)
    _ = jax.device_get(lc_mod._bf_program(store, ij, has12))

    n_cap = 256
    pk13 = jnp.zeros((n_cap, 13), jnp.float32)
    flat, g12w = lc_mod._ransac_program(
        pk13, jax.random.key(0), cam
    )
    _ = jax.device_get(flat)
    scales_w = jnp.asarray(
        cfg.orb.scale_factor
        ** np.arange(cfg.orb.n_levels, dtype=np.float32)
    )
    pkd4 = jnp.zeros((2, nkp, 4), jnp.float32)
    _ = jax.device_get(lc_mod._guided_program(
        store, ij, g12w.s, g12w.R, g12w.t, pkd4, scales_w, cam
    ))

    # relocalization programs (EPnP RANSAC + standalone pose polish):
    # a mid-run reloc otherwise pays their first compiles in the timed
    # window
    from sivo_tpu.optim import pose_lm
    from sivo_tpu.place import pnp as pnp_mod

    pw = jnp.zeros((N, 3), jnp.float32)
    has = jnp.zeros(N, bool).at[:8].set(True)
    pres = pnp_mod.ransac_pnp(
        pw, jnp.zeros((N, 2)), jnp.ones(N), has,
        jax.random.key(0), cam,
    )
    _ = jax.device_get(pres.ok)
    pobs = pose_lm.PoseObservations(
        points=pw,
        uvr=jnp.zeros((N, 3)),
        sigma2=jnp.ones(N),
        is_stereo=jnp.zeros(N, bool),
        valid=has,
    )
    pfin = pose_lm.optimize_pose(jnp.eye(4), pobs, cam)
    _ = jax.device_get(pfin.n_inliers)

    # fused reloc brute-force (system._reloc_bf_program)
    from sivo_tpu.runtime import system as system_mod

    _ = jax.device_get(system_mod._reloc_bf_program(
        store, jnp.int32(0), jnp.zeros(nkp, bool), bits, has, ang
    ))

    # reloc projection round (system._reloc_project_program)
    from sivo_tpu.runtime import track_step as ts_mod

    tr = system.tracker
    _ = jax.device_get(
        system._reloc_project_program(
            tr.dmap,
            jnp.full(ts_mod.LOCAL_CAND, -1, jnp.int32),
            jnp.eye(4),
            jnp.zeros((N, 2)), jnp.zeros(N, jnp.int32),
            jnp.zeros((N, 256)), jnp.full(N, -1.0),
            jnp.zeros(N, bool),
            jnp.float32(10.0),
            cam, cfg.orb.scale_factor, cfg.orb.n_levels,
        )
    )

    # loopclosing pads K to pow-2 (min 64) and edges to pow-2 buckets;
    # batch-mode maps (~8k points over 44 KFs) produce >512
    # strong-covisibility edges, so 1024 must be warm too (a cold
    # bucket = ~10 s compile inside lc.correct.graph). Endurance runs
    # reach ~160 live KFs -> K_cap 256 with denser edge sets.
    import os as _os_pg

    _endur = int(_os_pg.environ.get("SIVO_BENCH_LAPS", "1")) > 1
    pg_buckets = (
        # endurance maps can exceed 256 live KFs (448-slot store):
        # warm the 512-KF pads the essential graph will select
        # (512, 8192): the 2050-frame dumbbell run built >4096
        # essential-graph edges (8182 revisit edges) and paid a 10.2 s
        # cold compile inside lc.correct.graph
        # ... but early loop closures in an endurance run happen at
        # SMALL K (the r04 artifact closed a loop at KF 39 -> K_cap
        # 64), so the flagship buckets plus the 128 step must stay
        # warm too or a ~10 s compile lands inside the timed window
        # (ADVICE r4 medium). Warms are one-time (persistent cache).
        [(64, 256), (64, 512), (64, 1024), (64, 2048),
         (128, 512), (128, 1024), (128, 2048),
         (256, 1024), (256, 2048), (256, 4096),
         (512, 2048), (512, 4096), (512, 8192)]
        if _endur
        # (64, 2048): flagship runs cross 1024 edges on some relay
        # timings (flag4 r4: a cold 2048 bucket cost 10.2 s INSIDE
        # lc.correct.graph and wrecked the run) — one warm compile,
        # persistent-cached thereafter
        else [(64, 256), (64, 512), (64, 1024), (64, 2048)]
    )
    for K_cap, E_pad in pg_buckets:
        prob = pose_graph.PoseGraphProblem(
            s=jnp.ones(K_cap),
            R=jnp.tile(jnp.eye(3), (K_cap, 1, 1)),
            t=jnp.zeros((K_cap, 3)),
            fixed=jnp.zeros(K_cap, bool).at[0].set(True),
            valid=jnp.zeros(K_cap, bool).at[:4].set(True),
            edge_i=jnp.zeros(E_pad, jnp.int32),
            edge_j=jnp.zeros(E_pad, jnp.int32),
            meas_s=jnp.ones(E_pad),
            meas_R=jnp.tile(jnp.eye(3), (E_pad, 1, 1)),
            meas_t=jnp.zeros((E_pad, 3)),
            edge_valid=jnp.zeros(E_pad, bool),
        )
        s, R, t = pose_graph.optimize_essential_graph(prob)
        _ = jax.device_get(s)

    # local BA at the mapper's caps (BA-skip means the warmup frames
    # may never have dispatched one; first compile is ~25 s on TPU)
    from sivo_tpu.runtime import mapping as mapping_mod

    lprob = local_ba.BAProblem(
        kf_pose=jnp.tile(jnp.eye(4), (mapping_mod.MAX_BA_KF, 1, 1)),
        kf_fixed=jnp.zeros(mapping_mod.MAX_BA_KF, bool).at[0].set(True),
        kf_valid=jnp.zeros(mapping_mod.MAX_BA_KF, bool).at[:2].set(
            True
        ),
        pt_pos=jnp.zeros((mapping_mod.MAX_BA_PT, 3)),
        pt_valid=jnp.zeros(mapping_mod.MAX_BA_PT, bool),
        obs_kf=jnp.zeros(mapping_mod.MAX_BA_OBS, jnp.int32),
        obs_pt=jnp.zeros(mapping_mod.MAX_BA_OBS, jnp.int32),
        obs_uvr=jnp.zeros((mapping_mod.MAX_BA_OBS, 3)),
        obs_sigma2=jnp.ones(mapping_mod.MAX_BA_OBS),
        obs_is_stereo=jnp.zeros(mapping_mod.MAX_BA_OBS, bool),
        obs_valid=jnp.zeros(mapping_mod.MAX_BA_OBS, bool),
    )
    lres = local_ba.local_bundle_adjustment(
        lprob, jnp.int32(0), cam
    )
    # warm the mapper's packed-fetch program too (same keys/shapes)
    from sivo_tpu.utils.fetch import fetch_packed

    _ = fetch_packed(
        {
            "kf_pose": lres.kf_pose,
            "pt_pos": lres.pt_pos,
            "inlier": lres.obs_inlier,
            "cov": lres.newest_cov,
        }
    )

    lc = system.loop_closer
    gprob = local_ba.BAProblem(
        kf_pose=jnp.tile(jnp.eye(4), (lc.GBA_KF, 1, 1)),
        kf_fixed=jnp.zeros(lc.GBA_KF, bool).at[0].set(True),
        kf_valid=jnp.zeros(lc.GBA_KF, bool).at[:2].set(True),
        pt_pos=jnp.zeros((lc.GBA_PT, 3)),
        pt_valid=jnp.zeros(lc.GBA_PT, bool),
        obs_kf=jnp.zeros(lc.GBA_OBS, jnp.int32),
        obs_pt=jnp.zeros(lc.GBA_OBS, jnp.int32),
        obs_uvr=jnp.zeros((lc.GBA_OBS, 3)),
        obs_sigma2=jnp.ones(lc.GBA_OBS),
        obs_is_stereo=jnp.zeros(lc.GBA_OBS, bool),
        obs_valid=jnp.zeros(lc.GBA_OBS, bool),
    )
    gres = local_ba.global_bundle_adjustment(gprob, cam, iterations=10)
    _ = fetch_packed(
        {
            "kf_pose": gres.kf_pose,
            "pt_pos": gres.pt_pos,
            "inlier": gres.obs_inlier,
        }
    )

    # capacity-shaped device-map writes: loop correction / GBA apply
    # push ALL point positions at dmap.capacity shape — a different
    # program than mapping's MAX_BA_PT-shaped write-back, so its first
    # compile (~seconds) otherwise lands inside lc.correct
    from sivo_tpu.runtime import device_map as dm_mod

    cap = system.tracker.dmap.capacity
    system.tracker.dmap = dm_mod.set_positions(
        system.tracker.dmap,
        jnp.full(cap, -1, jnp.int32),
        jnp.zeros((cap, 3)),
    )
    _ = fetch_packed({"p": system.tracker.dmap.pt_pos[:1]})

    # stepped full-map PCG GBA (the path taken once the map outgrows
    # the dense caps — the bench map does by the first loop closure).
    # Buckets are smallest-fit; warm MID always, BIG too for
    # endurance-scale runs (each bucket shape is its own compile; the
    # MAX 2048-KF bucket only fires past 256 keyframes, which no bench
    # config reaches — left cold).
    import os as _os_w

    from sivo_tpu.optim import gba_cg

    endurance = int(_os_w.environ.get("SIVO_BENCH_LAPS", "1")) > 1
    # endurance: warm MID+BIG+XL (the 448-KF/49k-pt dumbbell map fits
    # XL; MAX only fires past 512 KFs, which no bench config reaches)
    buckets = (
        lc.GBA_BUCKETS[:3] if endurance else lc.GBA_BUCKETS[:1]
    )
    for kf_b, pt_b, obs_b in buckets:
        cprob = local_ba.BAProblem(
            kf_pose=jnp.tile(jnp.eye(4), (kf_b, 1, 1)),
            kf_fixed=jnp.zeros(kf_b, bool).at[0].set(True),
            kf_valid=jnp.zeros(kf_b, bool).at[:2].set(True),
            pt_pos=jnp.zeros((pt_b, 3)),
            pt_valid=jnp.zeros(pt_b, bool),
            obs_kf=jnp.zeros(obs_b, jnp.int32),
            obs_pt=jnp.zeros(obs_b, jnp.int32),
            obs_uvr=jnp.zeros((obs_b, 3)),
            obs_sigma2=jnp.ones(obs_b),
            obs_is_stereo=jnp.zeros(obs_b, bool),
            obs_valid=jnp.zeros(obs_b, bool),
        )
        ccarry = gba_cg.gba_cg_begin(cprob, cam)
        ccarry = gba_cg.gba_cg_step(ccarry, cprob, cam)
        cres = gba_cg.gba_cg_finish(ccarry, cprob, cam)
        _ = fetch_packed(
            {
                "kf_pose": cres.kf_pose,
                "pt_pos": cres.pt_pos,
                "inlier": cres.obs_inlier,
            }
        )


def main() -> None:
    from sivo_tpu.config import SystemConfig
    from sivo_tpu.io import synthetic
    from sivo_tpu.place import vocabulary as voc_mod
    from sivo_tpu.runtime import frame as frame_mod
    from sivo_tpu.runtime.system import System
    from sivo_tpu.utils.fetch import fetch_packed

    import os as _os

    # SIVO_BENCH_SEQ=1: the PAPER's sequential selection semantics at
    # the reference's 4.0-bit gate (arXiv 1811.11946 §III-B) — the
    # greedy Kalman-shrink walk, with the supply floor as the only
    # concession to the circuit's yaw-driven attrition. Default: the
    # reference-BINARY batch semantics (the binary implements the
    # sequential shrink but never calls it, sivo_helpers.cpp:221-240).
    seq_mode = bool(int(_os.environ.get("SIVO_BENCH_SEQ", "0")))
    cfg = SystemConfig()  # KITTI03 defaults: 1024x352, fx=721.5, 2000 feats
    cfg = dataclasses.replace(
        cfg,
        semantic=dataclasses.replace(
            cfg.semantic,
            # batch mode: 3.0 bits (reference default 4.0): each
            # keyframe minting 500+ points dilutes the old map's
            # anchoring — fresh points encode the creation pose, so
            # orientation creeps between BA solves; a higher bar keeps
            # the old:new balance while the 128-point floor still
            # guarantees supply. Sequential mode uses the paper's 4.0.
            th_entropy_reduction=4.0 if seq_mode else 3.0,
            sequential_selection=seq_mode,
            # supply floor 128 in BOTH modes: at 64 the sequential runs
            # sat on the corner-starvation edge — identical code lost
            # 2 / 21 / 51 frames across three runs purely on relay
            # timing; the map stays ~1/5 of batch mode regardless
            seq_min_select=128,
        ),
    )
    # circuit: a square-ring corridor driven for one lap plus a
    # re-drive of its first straight — the start zone is occluded by
    # the inner block for most of the lap, so the revisit is a genuine
    # place-recognition event (BoW detection + Sim3 + essential graph
    # + GBA all run inside the bench). KITTI-urban motion profile:
    # long straights at 0.67 m/frame with brief ~4 deg/frame corners
    # (a continuous-yaw circle rotates the whole FOV out every ~23
    # frames and starves the map between keyframes).
    import os

    # endurance mode (SIVO_BENCH_LAPS=N > 1): drive the SAME circuit N
    # laps + the revisit straight with a jitter-free (exactly periodic)
    # trajectory, so one lap's rendered frames serve every lap — a
    # KITTI-00-scale run (slot recycling, repeated loop closures,
    # bounded capacities) without hours of host-side rendering.
    laps = int(os.environ.get("SIVO_BENCH_LAPS", "1"))
    if laps > 1:
        # endurance: the DUMBBELL world (two ring corridors + middle
        # gap) driven as a figure-8 — each super-lap revisits TWO
        # distinct previously-occluded zones, so the loop stack fires
        # repeatedly (KITTI-00's multiple closures), unlike the single
        # ring where one closure makes the whole map covisible. One
        # super-lap = ~404 frames; 5 super-laps ~ KITTI-00 scale.
        LAP = synthetic.figure8_lap_frames()
        n_frames = LAP * laps + 30
        world = synthetic.make_dumbbell_world(cfg.camera, seed=0)
        gt = synthetic.figure8_trajectory(n_frames)
        ck_tag = "dumbbell-v1"
    else:
        LAP = 160
        n_frames = 190
        world = synthetic.make_loop_world(
            cfg.camera, seed=0, outer=16.0, inner=6.0
        )
        gt = synthetic.square_loop_trajectory(
            n_frames=n_frames, half=9.5, corner_r=3.5, jitter=0.03
        )
        ck_tag = "circuit-v11"
    n_render = LAP if laps > 1 else n_frames
    # render cache: the full-res circuit render costs minutes of host
    # time; keyed by the scene parameters so edits invalidate it
    cache_key = (
        f"{ck_tag}-{n_render}-{cfg.camera.width}x{cfg.camera.height}"
    )
    cache_path = f"/tmp/sivo_bench_render_{cache_key}.npz"
    if os.path.exists(cache_path):
        z = np.load(cache_path)
        left, right, clsmaps = z["left"], z["right"], z["cls"]
    else:
        left, right, clsmaps = synthetic.render_sequence(
            world, gt[:n_render], ss=2
        )
        np.savez_compressed(
            cache_path,
            left=left.astype(np.uint8),
            right=right.astype(np.uint8),
            cls=clsmaps,
        )

    def src(i: int) -> int:
        """Rendered-frame index for sequence frame i (lap-periodic in
        endurance mode)."""
        return i % LAP if laps > 1 else i
    # uint8 grayscale uploads (channel broadcast happens on device):
    # the host->device link is the bottleneck
    left_color = left.astype(np.uint8)
    right = right.astype(np.uint8)
    # no trained CNN weights exist in this environment (Git-LFS stubs,
    # BASELINE.md) — the CNN runs at full cost every frame, but the
    # tracking policy consumes CNN-like structured semantics derived
    # from the renderer's class maps (graded per-pixel entropy: with a
    # CONSTANT raster the SIVO criterion degenerates to all-or-nothing
    # creation, which no real posterior produces). Quantized uploads
    # (confidence u8, entropy f16): raster bytes are the frame-loop
    # bottleneck.
    # the smooth uncertainty field is frame-CONSTANT: upload it once
    # and derive per-frame confidence/entropy ON DEVICE from the class
    # raster (class-boundary dilation) — only one u8 raster per frame
    # crosses the relay instead of three
    field_dev = jnp.asarray(
        synthetic.structured_semantics_field(clsmaps[0].shape, seed=7)
    )
    cls_frames = [np.asarray(c, np.uint8) for c in clsmaps]

    # SIVO_BENCH_CNN=1: consume the REAL MC-dropout posterior of a net
    # trained on this scene (tools/train_bench_segnet.py writes the
    # caffemodel) — the reference's actual semantic path
    # (bayesian_segnet.cpp:299-318). Default: renderer-derived rasters
    # (no trained weights ship with the reference checkout, BASELINE.md).
    cnn_model_path = f"/tmp/sivo_bench_segnet_{ck_tag}.caffemodel"
    # DEFAULT: trained-CNN posterior — the reference pays its SegNet
    # every frame (its namesake cost, ref README.md:40-42), so the
    # headline number must too (VERDICT r4 #1). SIVO_BENCH_CNN=0 keeps
    # the renderer-semantics mode as the opt-out for geometry-only
    # debugging.
    cnn_mode = bool(int(_os.environ.get("SIVO_BENCH_CNN", "1")))
    if cnn_mode and not _os.path.exists(cnn_model_path):
        # self-sufficient: train the bench net now (one-time, minutes
        # on the chip; cached in /tmp thereafter). Runs BEFORE system
        # construction so its device programs don't interleave with
        # the warmed session.
        import subprocess
        import sys as _sys

        print(f"[bench] training bench segnet -> {cnn_model_path}",
              file=_sys.stderr, flush=True)
        subprocess.run(
            [_sys.executable,
             _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                           "tools", "train_bench_segnet.py"),
             cache_path, cnn_model_path],
            check=True,
        )
    use_cnn = jnp.asarray(cnn_mode)

    # point capacity sized to the scene (~10k live points): every
    # frame's frustum check + top-k scans the FULL capacity, so a
    # 131k-slot map pays 4x the per-frame HBM traffic of a 32k one.
    # Endurance laps need HEADROOM above the ~27k steady-state live
    # set: at 32k slots the dead-slot budget is ~3k, compaction fired
    # every ~56 frames and its drain cost 21% of the r04 run (35
    # compactions x 4.2 s); 1.5x capacity trades ~8% per-frame scan
    # traffic for ~5x fewer compactions
    system = System(
        # 448 KF slots for endurance: the dumbbell figure-8 holds more
        # live keyframes than the old ring (5 super-laps hit the hard
        # 256 wall mid-run and the r4 first attempt crashed there);
        # 448 pads to the SAME 512 pose-graph bucket a 257-KF map
        # would, so headroom is free at the pose-graph level
        cfg=cfg, max_keyframes=448 if laps > 1 else 256,
        max_points=49152 if laps > 1 else 32768,
        # depth 3: the ~110 ms relay RTT needs three frame periods of
        # slack before the retire wait disappears (measured: depth 2
        # -> 3 took 3.7 -> 4.6 FPS and halved crisis entries)
        pipeline_depth=int(os.environ.get("SIVO_BENCH_DEPTH", "3")),
    )
    if cnn_mode:
        from sivo_tpu.models import caffe_io

        # device_put once: merge_params returns host numpy, and numpy
        # params passed into the jitted builder re-upload the full
        # ~6 MB parameter set EVERY frame (measured: build_frame
        # 13.5 -> 378 ms in CNN mode before this line)
        system.segnet_params = jax.device_put(
            caffe_io.merge_params(
                system.segnet_params,
                caffe_io.load_segnet_params(cnn_model_path, "basic"),
            )
        )

    # ONE flat uint8 upload per frame: relay transactions cost
    # ~35-50 ms EACH regardless of payload size (measured), so the
    # previous 3 uploads + 2 dispatches were ~115 ms of build_frame
    # host time. The planes are concatenated host-side once and sliced
    # back INSIDE the jitted builder — no standalone unpack program
    # (that was round 2's relay pathology, commit f3073a1). Left goes
    # up as u8 luma in geometric mode — the reference's cvtColor
    # produces u8 gray too (ref: Tracking.cc:187-205).
    Hc, Wc = cfg.camera.height, cfg.camera.width
    left_is_color = left_color.ndim == 4
    if cnn_mode or not left_is_color:
        # grayscale renders (or CNN mode's color planes) pack as-is
        left_planes = left_color.reshape(len(left_color), -1)
    else:
        left_planes = np.clip(
            0.299 * left_color[..., 2]
            + 0.587 * left_color[..., 1]
            + 0.114 * left_color[..., 0],
            0, 255,
        ).astype(np.uint8).reshape(len(left_color), -1)
    packed_host = np.concatenate(
        [
            left_planes,
            right.reshape(len(right), -1),
            np.stack(cls_frames).reshape(len(cls_frames), -1),
        ],
        axis=1,
    )
    del left_planes

    @jax.jit
    def build_packed(params, flat_u8, key):
        if cnn_mode and left_is_color:
            off = 3 * Hc * Wc
            left_dev = flat_u8[:off].reshape(Hc, Wc, 3)
        else:
            off = Hc * Wc
            left_dev = flat_u8[:off].reshape(Hc, Wc)
        right_dev = flat_u8[off: off + Hc * Wc].reshape(Hc, Wc)
        cls_dev = flat_u8[off + Hc * Wc:].reshape(Hc, Wc)
        conf_dev, ent_dev = synthetic.structured_semantics_device(
            cls_dev, field_dev
        )
        # PRE half only: the Mosaic ORB kernels live in the separate
        # build_frame_post program so their canvas operands cross a
        # program boundary (embedded-Mosaic HBM-operand penalty,
        # ~27 ms/kernel — frame.py build_frame docstring)
        return frame_mod.frontend_pre(
            system.model, params, system.statics,
            left_dev, right_dev, key,
            sem_override=(cls_dev, conf_dev, ent_dev, use_cnn),
            # the posterior source is fixed for the whole run: letting
            # XLA DCE the unused one saves ~27 ms/frame of device time
            # in renderer-semantics mode (3 discarded MC passes)
            use_cnn_static=cnn_mode,
        )

    built = {}
    uploads: dict[int, object] = {}
    from sivo_tpu.utils.fetch import device_put_async

    def _ensure_upload(i: int) -> None:
        if i not in uploads and i < n_frames:
            uploads[i] = device_put_async(packed_host[src(i)])

    def build(i: int):
        if i in built or i >= n_frames:
            return
        # async upload, 3 frames ahead: a synchronous per-frame
        # jnp.asarray paid a ~35-60 ms relay transaction on the frame
        # loop's critical path (measured via the device probe:
        # 164.6 ms/frame with sync upload vs 105.1 without)
        for j in (i, i + 1, i + 2):
            _ensure_upload(j)
        with system.timer.stage("build_frame"):
            pre = build_packed(
                system.segnet_params,
                uploads.pop(i).result(),
                jax.random.key(i),
            )
            built[i] = frame_mod.build_frame_post(system.statics, pre)

    # vocabulary: prefer the OFFLINE vocabulary trained on imagery
    # disjoint from this bench sequence (tools/train_offline_vocab.py,
    # k=10/depth=5 — the reference's pre-trained-ORBvoc.txt role,
    # System.cc:75-82). Round 3 trained a <=10^4-word SESSION
    # vocabulary on 8 frames of the bench sequence itself — circular,
    # and too weak to discriminate the self-similar corridor (55-58
    # Sim3 evaluations for one true loop). SIVO_BENCH_VOC overrides
    # the path; SIVO_BENCH_VOC=session forces the old behavior.
    voc_env = _os.environ.get("SIVO_BENCH_VOC", "")
    offline_voc = voc_env or _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)),
        "sivo_tpu", "place", "data", "orbvoc_synth.npz",
    )
    if voc_env != "session" and _os.path.exists(offline_voc):
        voc = voc_mod.load_npz(offline_voc)
    else:
        voc_cache = f"/tmp/sivo_bench_voc_{cache_key}.npz"
        if os.path.exists(voc_cache):
            voc = voc_mod.load_npz(voc_cache)
        else:
            voc_desc = []
            for i in range(0, n_frames, max(n_frames // 8, 1)):
                build(i)
                f = built[i]
                h = fetch_packed(
                    {"desc": f.desc_u8, "sem": f.semantic}
                )
                voc_desc.append(
                    np.asarray(h["desc"])[np.asarray(h["sem"])]
                )
            voc = voc_mod.train(
                np.concatenate(voc_desc), k=10, depth=4, seed=0
            )
            voc_mod.save_npz(voc_cache, voc)
    system.attach_vocabulary(voc)

    def run_frame(i: int) -> None:
        build(i)
        f = built.pop(i)
        # prefetch frontend of i+1 via the pre_retire hook: it must
        # enqueue AFTER frame i's tracking program (dispatching it
        # first delayed every summary by the frontend's ~66 ms device
        # time — r4 flag3: retire.wait median 74 ms at depth 3) while
        # its host-side work still overlaps the retire wait
        system.track_frame(
            f, timestamp=i * 0.1, pipeline=True,
            pre_retire=lambda: build(i + 1),
        )

    # warmup: compile every program variant — continue until the
    # keyframe pipeline (mapping, triangulation, BA) has run twice
    warm = 0
    kf_events = 0
    while warm < 16 and (warm < 4 or kf_events < 2):
        kf_before = system.map.n_keyframes
        run_frame(warm)
        if system.map.n_keyframes > kf_before:
            kf_events += 1
        warm += 1
    # drain the mapper so the phase-1 programs (cull/triangulate/fuse
    # gathers) COMPILE during warmup — a first compile inside the timed
    # window showed up as ~800ms/keyframe of phase1_dispatch
    system.mapper.drain(system.tracker)
    _warm_loop_programs(system)
    system.timer.totals.clear()
    system.timer.counts.clear()
    system.timer.samples.clear()

    if os.environ.get("SIVO_BENCH_DEVPROBE"):
        # device-time probe: the steady-state FPS ceiling is
        # max(device_ms, relay_rtt) per frame — measure the DEVICE side
        # alone by back-to-back dispatches with one end-of-queue fetch
        # (block_until_ready returns early through the relay; a
        # 1-element fetch of the LAST output is the only true sync)
        NP = 16
        for i in range(warm, warm + NP):
            build(i)
        f0 = built[warm]
        _ = float(np.asarray(f0.desc_u8[0, 0]))  # drain build queue
        # pre-upload ONE payload, reused (a sync device_put inside the
        # loop would bill ~0.36 MB of relay upload per frame)
        pre = jax.device_put(packed_host[src(warm)])
        _ = float(np.asarray(pre[0]))

        def run_frontend(n):
            tp = time.time()
            outs = [
                build_packed(
                    system.segnet_params, pre,
                    jax.random.key(10_000 + k),
                )
                for k in range(n)
            ]
            _ = float(np.asarray(outs[-1].desc_u8[0, 0]))
            return time.time() - tp

        # marginal cost (t32 - t8)/24 cancels dispatch/fetch overhead;
        # 3 reps expose shared-chip tenancy noise
        fr = []
        for _r in range(3):
            t8, t32 = run_frontend(8), run_frontend(32)
            fr.append((t32 - t8) / 24 * 1e3)

        def run_track(n):
            tp = time.time()
            for k in range(n):
                system.tracker.dispatch(
                    built[warm], timestamp=k * 0.1
                )
            last = system.tracker._inflight[-1].result.summary
            _ = float(np.asarray(last[0]))
            while system.tracker.inflight_count:
                system.tracker.take_inflight()
            return time.time() - tp

        trk = []
        for _r in range(3):
            t8, t32 = run_track(8), run_track(32)
            trk.append((t32 - t8) / 24 * 1e3)

        # burst test: dispatch 8 frames back-to-back, record when each
        # summary future LANDS. Spacing ~T_dev with first ~T_dev+RTT =
        # device-bound with overlapping fetches (healthy); spacing ~RTT
        # = serialized transfers (the pipeline can't hide the relay).
        tb = time.time()
        tks = [
            system.tracker.dispatch(built[warm], timestamp=k * 0.1)
            for k in range(8)
        ]
        done_at = [None] * 8
        while any(d is None for d in done_at):
            for k, tk in enumerate(tks):
                if done_at[k] is None and tk.summary_future.done():
                    done_at[k] = time.time() - tb
            time.sleep(0.002)
        while system.tracker.inflight_count:
            system.tracker.take_inflight()
        print(json.dumps({
            "metric": "device_probe",
            "frontend_ms": [round(x, 1) for x in fr],
            "track_step_ms": [round(x, 1) for x in trk],
            "summary_land_ms": [round(1e3 * d, 1) for d in done_at],
            "note": "marginal per-frame DEVICE cost, 3 reps",
        }))
        return

    progress = int(os.environ.get("SIVO_BENCH_PROGRESS", "0"))
    t0 = time.time()
    for i in range(warm, n_frames):
        run_frame(i)
        if progress and i % progress == 0:
            import sys

            print(
                f"# f={i}/{n_frames} kf={system.map.n_keyframes} "
                f"pts={int(system.map.pt_valid[:system.map.n_points].sum())} "
                f"slots={system.map.n_points} "
                f"compactions={getattr(system, 'compactions', 0)} "
                f"lost={getattr(system.tracker, 'raw_lost', 0)} "
                f"loops={system.loop_closer.loops_closed if system.loop_closer else 0} "
                f"fps={(i - warm + 1) / (time.time() - t0):.2f}",
                file=sys.stderr, flush=True,
            )
    # retire the still-pipelined FRAMES inside the timed window (their
    # poses are part of the sequence) ...
    while system.tracker.inflight_count:
        system._retire_one()
    _ = np.asarray(system.tracker.last_pose)  # full sync
    dt = (time.time() - t0) / max(n_frames - warm, 1)
    fps = 1.0 / dt
    # ... but drain mapping / loop closing / an in-flight GBA OUTSIDE
    # it: the reference measures per-frame tracking time only
    # (sivo.cc:90-113) — its mapper/looper threads keep working after
    # the last frame and Shutdown's joins are not counted
    # (System.cc:245-258). Report the drain separately.
    t_drain = time.time()
    system.flush()
    drain_s = time.time() - t_drain
    # snapshot BEFORE the localization replay below appends its own
    # loss events — `lost` reports the mapping run only
    main_lost = getattr(system.tracker, "raw_lost", 0)
    main_lost_frames = list(
        getattr(system.tracker, "raw_lost_frames", [])
    )

    # align by frame id: a mid-run System reset truncates the
    # trajectory, and positional alignment would silently compare the
    # post-reset segment against the start of ground truth
    est = system.frame_poses()
    rec_ids = np.array(
        [r.frame_id for r in system.tracker.trajectory], np.int64
    )
    ok_ids = rec_ids[rec_ids < len(gt)]
    ate = synthetic.ate_rmse(est[: len(ok_ids)], gt[ok_ids])
    # pre-correction ATE: the poses as recorded at retire time, before
    # loop closure / GBA re-chained history — the drift the loop stack
    # actually removed
    est_raw = np.stack(
        [r.pose for r in system.tracker.trajectory]
    ).astype(np.float64)
    ate_raw = synthetic.ate_rmse(est_raw[: len(ok_ids)], gt[ok_ids])
    traj_out = os.environ.get("SIVO_BENCH_SAVE_TRAJ")
    if traj_out:
        lost_mask = np.array(
            [r.lost for r in system.tracker.trajectory], bool
        )
        kf_fids = np.array(
            [
                system.map.kf_data[k].frame_id
                if system.map.kf_data[k] is not None
                else -1
                for k in range(system.map.n_keyframes)
            ],
            np.int64,
        )
        ref_kfs = np.array(
            [r.ref_kf for r in system.tracker.trajectory], np.int64
        )
        np.savez(
            traj_out, est=est, est_raw=est_raw, gt=gt,
            rec_ids=rec_ids, lost=lost_mask, ref_kfs=ref_kfs,
            kf_pose=system.map.kf_pose[: system.map.n_keyframes],
            kf_frame_ids=kf_fids,
        )
    n_resets = getattr(system, "n_resets", 0)
    frames_tracked = len(ok_ids)
    n_lost_all = sum(
        1 for r in system.tracker.trajectory if r.lost
    )
    loops = (
        system.loop_closer.loops_closed
        if system.loop_closer is not None else 0
    )
    # revisit re-attachment: covisibility edges spanning a large
    # temporal gap mean a revisit lap re-attached to the old map
    # through tracking — after the FIRST closure aligns the map, later
    # laps stay connected and loop DETECTION correctly stays silent
    # (the reference's behavior re-driving a street: candidates
    # covisible with the current KF are excluded,
    # KeyFrameDatabase.cc:127-135)
    Kn = system.map.n_keyframes
    Cm = system.map.covisibility_matrix()[:Kn, :Kn]
    fid_arr = np.array(
        [
            system.map.kf_data[k].frame_id
            if system.map.kf_data[k] is not None else -1
            for k in range(Kn)
        ]
    )
    ii, jj = np.where(Cm >= 15)
    sel_e = (jj > ii) & (fid_arr[jj] - fid_arr[ii] >= 150)
    n_revisit_edges = int(sel_e.sum())

    # pure-tracking FPS: localization mode against the built map
    # (no keyframe pipeline) — the per-frame hot path in isolation.
    # The first frames refill the pipeline (their summaries pay the
    # full relay RTT), so time only the steady-state tail.
    system.activate_localization_mode()
    n_loc = 64  # >= 50 timed frames (round-2 review: 12 was noise)
    n_fill = 8
    # the replay jumps ~64 frames back: seed the tracker at the
    # window's start pose (re-chained through the corrected keyframes)
    # instead of timing a kidnapped-robot recovery
    i0 = n_frames - n_loc
    rec0 = next(
        (r for r in system.tracker.trajectory if r.frame_id == i0),
        None,
    )
    if rec0 is not None and rec0.ref_kf >= 0:
        seed_tcw = rec0.rel_pose.astype(np.float64) @ system.map.kf_pose[
            rec0.ref_kf
        ].astype(np.float64)
        system.seed_localization_pose(seed_tcw, rec0.ref_kf)
    t0 = None
    for k, i in enumerate(range(n_frames - n_loc, n_frames)):
        if k == n_fill:
            t0 = time.time()
        run_frame(i)
    fps_tracking = (n_loc - n_fill) / (time.time() - t0)
    system.flush()
    _ = np.asarray(system.tracker.last_pose)
    n_lost_loc = sum(
        1 for r in system.tracker.trajectory[-n_loc:] if r.lost
    )
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
        "metric": (
            ("kitti_cnn_sivo_seq_fps" if cnn_mode
             else "kitti_geometry_sivo_seq_fps")
            if seq_mode
            else ("kitti_cnn_sivo_fps" if cnn_mode
                  else "kitti_geometry_sivo_fps")
        ),
        "semantics": "trained_cnn" if cnn_mode else "renderer_geometry",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 10.0, 3),
        "detail": {
            "frames": n_frames,
            "warmup": warm,
            # raw loss events (pre-reloc); lost_final = records still
            # lost after relocalization rewrites
            "lost": main_lost,
            "lost_frames": main_lost_frames[:32],
            "lost_final": n_lost_all,
            "resets": n_resets,
            "reloc_attempts": getattr(system, "reloc_attempts", 0),
            "reloc_successes": getattr(system, "reloc_successes", 0),
            "frames_in_final_session": frames_tracked,
            "lost_localization_replay": n_lost_loc,
            "keyframes": system.map.n_keyframes,
            "map_points": int(
                system.map.pt_valid[: system.map.n_points].sum()
            ),
            "loops_closed": loops,
            "revisit_edges": n_revisit_edges,
            "ate_m": round(float(ate), 3),
            "ate_m_before_correction": round(float(ate_raw), 3),
            "cap_binds": {
                **system.mapper.cap_binds,
                **(
                    system.loop_closer.cap_binds
                    if system.loop_closer is not None else {}
                ),
                **(
                    {"kf_cap_skips": system.tracker.kf_cap_skips}
                    if getattr(system.tracker, "kf_cap_skips", 0)
                    else {}
                ),
            },
            "local_cap_binds": getattr(
                system.tracker, "local_cap_binds", 0
            ),
            "sel_cap_binds": getattr(
                system.tracker, "sel_cap_binds", 0
            ),
            # SEL_CAP truncation audit (round-3 weak #7): candidates
            # beyond the cap and the best score among them vs the gate
            "sel_last_accept_hist": getattr(
                system.tracker, "sel_last_accept_hist", None
            ),
            "sel_trunc_cands": getattr(
                system.tracker, "sel_trunc_cands", 0
            ),
            "sel_trunc_best_bits": round(
                float(
                    getattr(system.tracker, "sel_trunc_best", -1.0)
                ),
                2,
            ),
            "sel_trunc_mean_best_bits": round(
                getattr(system.tracker, "sel_trunc_best_sum", 0.0)
                / max(getattr(system.tracker, "sel_cap_binds", 0), 1),
                2,
            ),
            "points_dropped": getattr(
                system.tracker, "points_dropped", 0
            ),
            "compactions": getattr(system, "compactions", 0),
            "peak_point_slots": max(
                int(system.map.n_points),
                getattr(system, "peak_point_slots", 0),
            ),
            "peak_kf_slots": max(
                int(system.map.n_keyframes),
                getattr(system, "peak_kf_slots", 0),
            ),
            "loop_events": (
                system.loop_closer.loop_events
                if system.loop_closer is not None else []
            ),
            "ms_per_frame": round(dt * 1000, 1),
            "shutdown_drain_s": round(drain_s, 2),
            "tracking_only_fps": round(fps_tracking, 2),
            "crisis_frames": getattr(system, "crisis_frames", 0),
            # (frame, trigger, tracked, prev_tracked) per crisis entry
            "crisis_log": getattr(system, "crisis_log", [])[:64],
            "phase1_fetch_mb": round(
                getattr(system.mapper, "fetch_bytes", 0) / 1e6, 1
            ),
            "stage_mean_ms": stage_ms,
            "stage_total_s": {
                name: round(system.timer.totals[name], 2)
                for name in system.timer.totals
            },
            "stage_calls": dict(system.timer.counts),
            "stage_max_ms": {
                name: round(1000 * max(s), 1)
                for name, s in system.timer.samples.items()
            },
            "relay_calibration": {
                "dispatch_fetch_ms": round(disp_ms, 2),
                "matmul_2048_ms": round(mm_ms, 2),
            },
            # SIVO_BENCH_TRACE=1: full per-call sample series for the
            # hot stages (diagnosing e.g. whether retire.wait is
            # uniform-RTT or spike-driven)
            **(
                {
                    "stage_series": {
                        k: [round(1000 * x, 1) for x in v]
                        for k, v in system.timer.samples.items()
                        if k in (
                            "track.retire.wait", "build_frame",
                            "track", "map.advance", "loop_closing",
                        )
                    }
                }
                if os.environ.get("SIVO_BENCH_TRACE")
                else {}
            ),
        },
    }
    # Output robustness (round-3 verdict weak #9): the driver captures
    # the TAIL of stdout, and the full JSON line is several KB — its
    # head got truncated in BENCH_r03. Emit (a) the full JSON to a
    # file, (b) the full JSON line first, (c) a COMPACT one-line JSON
    # (headline + small detail) LAST so any tail capture parses.
    full = json.dumps(result)
    out_path = os.environ.get("SIVO_BENCH_OUT", "/tmp/sivo_bench_last.json")
    try:
        with open(out_path, "w") as fh:
            fh.write(full + "\n")
    except OSError:
        pass
    print(full)
    compact = {
        k: result[k]
        for k in ("metric", "semantics", "value", "unit", "vs_baseline")
        if k in result
    }
    d = result["detail"]
    compact["detail"] = {
        k: d[k]
        for k in (
            "frames", "lost", "lost_final", "resets", "keyframes",
            "map_points", "loops_closed", "ate_m",
            "ate_m_before_correction", "compactions",
            "peak_point_slots", "peak_kf_slots", "crisis_frames",
            "tracking_only_fps", "lost_localization_replay",
            "ms_per_frame",
        )
        if k in d
    }
    compact["full_json"] = out_path
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
