"""System: the top-level session orchestrator.

TPU-native replacement for SIVO::System (ref: src/orbslam/System.cc):
owns the SegNet, frontend statics, map, tracker and local mapper, and
exposes the per-frame ``track_stereo`` API plus shutdown outputs
(trajectory file, keyframes_points counts). The reference's four
threads collapse into host orchestration + device program pipelining.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sivo_tpu.config import SystemConfig
from sivo_tpu.io import trajectory as traj_io
from sivo_tpu.models import segnet as segnet_mod
from sivo_tpu.runtime import frame as frame_mod
from sivo_tpu.runtime.map_state import MapState
from sivo_tpu.runtime.mapping import LocalMapper
from sivo_tpu.runtime.tracking import Tracker, TrackingState


@dataclass
class System:
    cfg: SystemConfig
    segnet_variant: str = "basic"
    segnet_params: Any = None
    vocabulary: Any = None  # place.vocabulary.Vocabulary for loop closing
    use_viewer: bool = False  # placeholder parity with the reference API
    max_keyframes: int = 2048
    max_points: int = 131072

    def __post_init__(self):
        self.statics = frame_mod.make_statics(self.cfg)
        self.model = segnet_mod.SegNet(variant=self.segnet_variant)
        if self.segnet_params is None:
            self.segnet_params = segnet_mod.init_params(
                self.model,
                jax.random.key(0),
                self.cfg.camera.height,
                self.cfg.camera.width,
            )
        self.map = MapState(
            max_keyframes=self.max_keyframes,
            max_points=self.max_points,
            kp_capacity=self.cfg.orb.max_keypoints,
            n_levels=self.cfg.orb.n_levels,
            scale_factor=self.cfg.orb.scale_factor,
        )
        self.tracker = Tracker(cfg=self.cfg, map=self.map)
        self.mapper = LocalMapper(
            cfg=self.cfg, map=self.map, cam=self.tracker.cam
        )
        self.loop_closer = None
        if self.vocabulary is not None:
            from sivo_tpu.runtime.loopclosing import LoopCloser

            self.loop_closer = LoopCloser(
                cfg=self.cfg,
                map=self.map,
                cam=self.tracker.cam,
                voc=self.vocabulary,
            )
        self._rng = jax.random.key(42)
        self._frame_no = 0

    # -- per-frame API --------------------------------------------------------

    def track_stereo(
        self,
        img_left_color: np.ndarray,  # (H, W, 3) BGR 0..255
        img_right_gray: np.ndarray,  # (H, W)
        timestamp: float,
        sem_override: tuple | None = None,
    ) -> Optional[np.ndarray]:
        """ref: System.cc:172-218 TrackStereo."""
        self._rng, key = jax.random.split(self._rng)
        f = frame_mod.build_frame(
            self.model,
            self.segnet_params,
            self.statics,
            jnp.asarray(img_left_color, jnp.float32),
            jnp.asarray(img_right_gray, jnp.float32),
            key,
            sem_override=sem_override,
        )
        return self.track_frame(f, timestamp)

    def track_frame(self, f, timestamp: float) -> Optional[np.ndarray]:
        """Track a pre-built Frame (device pipelining entry)."""
        kf_before = self.map.n_keyframes
        pose = self.tracker.track(f, timestamp)
        if self.map.n_keyframes > kf_before:
            kf_idx = self.map.n_keyframes - 1
            # mapping pipeline at keyframe rate
            # (ref: LocalMapping::Run, SURVEY §3.3)
            self.mapper.process_keyframe(self.tracker, kf_idx)
            # loop closing at keyframe rate (ref: LoopClosing::Run)
            if self.loop_closer is not None:
                self.loop_closer.process_keyframe(self.tracker, kf_idx)
        return pose

    # -- shutdown / outputs ----------------------------------------------------

    @property
    def state(self) -> TrackingState:
        return self.tracker.state

    def n_lost(self) -> int:
        return sum(1 for r in self.tracker.trajectory if r.lost)

    def frame_poses(self) -> np.ndarray:
        """Final per-frame poses re-chained through (BA-corrected)
        reference keyframes (ref: System.cc:303-321)."""
        recs = self.tracker.trajectory
        if not recs:
            return np.zeros((0, 4, 4), np.float32)
        rel = [r.rel_pose for r in recs]
        refs = [max(r.ref_kf, 0) for r in recs]
        return traj_io.chained_frame_poses(
            rel, refs, self.map.kf_pose[: self.map.n_keyframes]
        )

    def save_trajectory_kitti(self, path: str) -> None:
        """ref: System.cc:274-336."""
        traj_io.save_trajectory_kitti(path, self.frame_poses())

    def shutdown(self, counts_path: str = "keyframes_points.txt") -> None:
        """ref: System.cc:245-272."""
        n_pts = int(self.map.pt_valid[: self.map.n_points].sum())
        traj_io.save_keyframes_points(
            counts_path, self.map.n_keyframes, n_pts
        )
