"""Device-resident keyframe store.

The mapping pipeline (triangulation, fusion) consumes the keypoint
arrays of ~10 covisible neighbor keyframes per new keyframe. Those
arrays were ON the device when each keyframe was created (they are the
Frame program's outputs); round 1 re-uploaded them from the host numpy
mirror every time (~1 MB x several buffers per keyframe through a
~100 ms/transfer relay — the dominant keyframe-rate cost, VERDICT r1).

This store keeps them device-resident: one donation write at keyframe
insertion, pure device gathers afterwards. The host MapState remains
the bookkeeping truth (ref: the KeyFrame snapshot semantics,
KeyFrame.cc:31-103); this is its hot mirror, exactly like DeviceMap is
for map points.

Poses are NOT stored here: BA/loop corrections rewrite them host-side
at keyframe rate, and a (B, 4, 4) upload per dispatch is ~2 KB.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class DeviceKFStore(NamedTuple):
    xy: jnp.ndarray  # (K, N, 2) f32
    level: jnp.ndarray  # (K, N) int32
    angle: jnp.ndarray  # (K, N) f32 keypoint orientation (rad)
    desc_u8: jnp.ndarray  # (K, N, 32) uint8
    u_right: jnp.ndarray  # (K, N) f32
    semantic: jnp.ndarray  # (K, N) bool
    sem_class: jnp.ndarray  # (K, N) uint8
    sem_confidence: jnp.ndarray  # (K, N) f32
    sem_entropy: jnp.ndarray  # (K, N) f32

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]


def make_kf_store(max_keyframes: int, kp_capacity: int) -> DeviceKFStore:
    K, N = max_keyframes, kp_capacity
    return DeviceKFStore(
        xy=jnp.zeros((K, N, 2), jnp.float32),
        level=jnp.zeros((K, N), jnp.int32),
        angle=jnp.zeros((K, N), jnp.float32),
        desc_u8=jnp.zeros((K, N, 32), jnp.uint8),
        u_right=jnp.full((K, N), -1.0, jnp.float32),
        semantic=jnp.zeros((K, N), bool),
        sem_class=jnp.full((K, N), 255, jnp.uint8),
        sem_confidence=jnp.zeros((K, N), jnp.float32),
        sem_entropy=jnp.zeros((K, N), jnp.float32),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def insert(
    store: DeviceKFStore,
    slot: jnp.ndarray,  # () int32 keyframe index
    xy: jnp.ndarray,
    level: jnp.ndarray,
    angle: jnp.ndarray,
    desc_u8: jnp.ndarray,
    u_right: jnp.ndarray,
    semantic: jnp.ndarray,
    sem_class: jnp.ndarray,
    sem_confidence: jnp.ndarray,
    sem_entropy: jnp.ndarray,
) -> DeviceKFStore:
    """Write one keyframe's arrays into its slot (donation: in-place)."""
    s = jnp.asarray(slot, jnp.int32)[None]
    return DeviceKFStore(
        xy=store.xy.at[s].set(xy[None]),
        level=store.level.at[s].set(level[None]),
        angle=store.angle.at[s].set(angle[None]),
        desc_u8=store.desc_u8.at[s].set(desc_u8[None]),
        u_right=store.u_right.at[s].set(u_right[None]),
        semantic=store.semantic.at[s].set(semantic[None]),
        sem_class=store.sem_class.at[s].set(sem_class[None]),
        sem_confidence=store.sem_confidence.at[s].set(
            sem_confidence[None]
        ),
        sem_entropy=store.sem_entropy.at[s].set(sem_entropy[None]),
    )


def gather(store: DeviceKFStore, idx: jnp.ndarray) -> DeviceKFStore:
    """(B,) int32 keyframe indices -> per-field (B, N, ...) views."""
    return DeviceKFStore(*(f[idx] for f in store))
