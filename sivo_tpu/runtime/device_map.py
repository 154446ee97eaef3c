"""Device-resident map mirror.

The map's hot data (point positions, descriptors, viewing normals,
scale bounds, validity, counters) lives ON the TPU as fixed-capacity
arrays, updated incrementally by jitted donation programs when
keyframes are inserted. The host MapState remains the source of truth
for bookkeeping (observation table, covisibility), but the per-frame
tracking program never transfers map data — an essential inversion of
the reference's shared-memory design once the accelerator sits behind
a ~30ms/35MB-s link (the reference's CPU threads share pointers for
free; we ship indices, not arrays).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


DESC_RING = 4  # recent keyframe observations kept per point


class DeviceMap(NamedTuple):
    pt_pos: jnp.ndarray  # (P, 3) f32 world positions
    pt_normal: jnp.ndarray  # (P, 3) f32 mean viewing direction
    pt_min_dist: jnp.ndarray  # (P,) f32
    pt_max_dist: jnp.ndarray  # (P,) f32
    pt_desc_u8: jnp.ndarray  # (P, 32) uint8 distinctive descriptor
    pt_desc_ring: jnp.ndarray  # (P, DESC_RING, 32) recent observations
    pt_class: jnp.ndarray  # (P,) uint8 semantic class (255 = unset)
    pt_valid: jnp.ndarray  # (P,) bool
    pt_obs_count: jnp.ndarray  # (P,) int32
    pt_visible: jnp.ndarray  # (P,) int32 found/visible counters
    pt_found: jnp.ndarray  # (P,) int32
    n_points: jnp.ndarray  # () int32

    @property
    def capacity(self) -> int:
        return self.pt_pos.shape[0]


def make_device_map(capacity: int) -> DeviceMap:
    return DeviceMap(
        pt_pos=jnp.zeros((capacity, 3), jnp.float32),
        pt_normal=jnp.zeros((capacity, 3), jnp.float32),
        pt_min_dist=jnp.zeros(capacity, jnp.float32),
        pt_max_dist=jnp.zeros(capacity, jnp.float32),
        pt_desc_u8=jnp.zeros((capacity, 32), jnp.uint8),
        pt_desc_ring=jnp.zeros(
            (capacity, DESC_RING, 32), jnp.uint8
        ),
        pt_class=jnp.full(capacity, 255, jnp.uint8),
        pt_valid=jnp.zeros(capacity, bool),
        pt_obs_count=jnp.zeros(capacity, jnp.int32),
        pt_visible=jnp.zeros(capacity, jnp.int32),
        pt_found=jnp.zeros(capacity, jnp.int32),
        n_points=jnp.zeros((), jnp.int32),
    )


def unpack_bits(desc_u8: jnp.ndarray) -> jnp.ndarray:
    """(..., 32) uint8 -> (..., 256) float32 bits, LSB-first per byte
    (inverse of ops.orb.compute_descriptors packing)."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (desc_u8[..., :, None] >> shifts) & 1
    return bits.reshape(*desc_u8.shape[:-1], 256).astype(jnp.float32)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("scale_factor", "n_levels"))
def add_points(
    dmap: DeviceMap,
    sel_mask: jnp.ndarray,  # (N,) create a point for these keypoint slots
    xw: jnp.ndarray,  # (N, 3) world positions
    desc_u8: jnp.ndarray,  # (N, 32)
    classes: jnp.ndarray,  # (N,) uint8
    levels: jnp.ndarray,  # (N,) int32
    cam_center: jnp.ndarray,  # (3,)
    scale_factor: float = 1.2,
    n_levels: int = 8,
) -> tuple[DeviceMap, jnp.ndarray]:
    """Create map points for selected keypoints in-place on device.

    Returns (updated map, (N,) int32 assigned point ids or -1).
    Normal/scale-bound init follows MapPoint ctor + UpdateNormalAndDepth
    (ref: MapPoint.cc:32-59, 368-421).
    """
    n = sel_mask.shape[0]
    rank = jnp.cumsum(sel_mask.astype(jnp.int32)) - 1
    ids = jnp.where(sel_mask, dmap.n_points + rank, dmap.capacity)
    # out-of-capacity writes drop
    ids = jnp.minimum(ids, dmap.capacity)
    d = xw - cam_center
    dist = jnp.linalg.norm(d, axis=-1) + 1e-9
    level_sf = scale_factor ** levels.astype(jnp.float32)
    max_dist = dist * level_sf
    min_dist = max_dist / (scale_factor ** (n_levels - 1))
    ring = dmap.pt_desc_ring.at[ids].set(
        jnp.broadcast_to(
            desc_u8[:, None, :], (n, DESC_RING, 32)
        ),
        mode="drop",
    )
    new = dmap._replace(
        pt_pos=dmap.pt_pos.at[ids].set(xw, mode="drop"),
        pt_normal=dmap.pt_normal.at[ids].set(
            d / dist[:, None], mode="drop"
        ),
        pt_min_dist=dmap.pt_min_dist.at[ids].set(
            0.8 * min_dist, mode="drop"
        ),
        pt_max_dist=dmap.pt_max_dist.at[ids].set(
            1.2 * max_dist, mode="drop"
        ),
        pt_desc_u8=dmap.pt_desc_u8.at[ids].set(desc_u8, mode="drop"),
        pt_desc_ring=ring,
        pt_class=dmap.pt_class.at[ids].set(classes, mode="drop"),
        pt_valid=dmap.pt_valid.at[ids].set(True, mode="drop"),
        pt_obs_count=dmap.pt_obs_count.at[ids].set(1, mode="drop"),
        pt_visible=dmap.pt_visible.at[ids].set(1, mode="drop"),
        pt_found=dmap.pt_found.at[ids].set(1, mode="drop"),
        n_points=jnp.minimum(
            dmap.n_points + jnp.sum(sel_mask), dmap.capacity
        ).astype(jnp.int32),
    )
    out_ids = jnp.where(
        sel_mask & (ids < dmap.capacity), ids, -1
    ).astype(jnp.int32)
    return new, out_ids


@functools.partial(jax.jit, donate_argnums=(0,))
def observe_points(
    dmap: DeviceMap,
    pt_idx: jnp.ndarray,  # (N,) int32 per-keypoint point id, -1 none
    classes: jnp.ndarray,  # (N,) uint8 current detection at the keypoint
    desc_u8: jnp.ndarray,  # (N, 32) observing keyframe's descriptors
) -> DeviceMap:
    """Keyframe observation bookkeeping: bump obs counts, set the class
    of fresh points, refresh the point's distinctive descriptor from
    the newest KEYFRAME observation.

    Class note: the reference's class-flip deletion
    (MapPoint.cc:104-111 SetSemanticInfo) only executes at point
    CREATION (its call sites are Tracking.cc:539 and :1008, both on
    brand-new points) — re-observations never re-test the class.
    Round 1 applied the flip-kill at every keyframe observation, which
    massacred live points whose matches landed near class boundaries;
    this now matches the reference: first observation sets the class,
    later ones leave it alone.

    Descriptor note: the reference recomputes the min-median-Hamming
    descriptor over ALL observations (ref: MapPoint.cc:284-347
    ComputeDistinctiveDescriptors). The device equivalent keeps a ring
    of the last DESC_RING keyframe observations per point and selects
    the ring member with the smallest median Hamming distance to the
    others — the same "most central appearance" semantics over a
    bounded window (unbounded per-observation history does not fit a
    fixed-capacity device layout; beyond ~4 observations the reference
    median is dominated by recent views of the current approach
    anyway).
    """
    has = pt_idx >= 0
    idx = jnp.where(has, pt_idx, dmap.capacity)
    obs_before = dmap.pt_obs_count[
        jnp.clip(pt_idx, 0, dmap.capacity - 1)
    ]
    obs = dmap.pt_obs_count.at[idx].add(1, mode="drop")
    stored = dmap.pt_class[jnp.clip(pt_idx, 0, dmap.capacity - 1)]
    fresh = has & (stored == 255)
    cls = dmap.pt_class.at[jnp.where(fresh, idx, dmap.capacity)].set(
        classes, mode="drop"
    )
    # ring insert at slot obs_count % DESC_RING
    slot = jnp.where(has, obs_before % DESC_RING, 0)
    ring = dmap.pt_desc_ring.at[idx, slot].set(desc_u8, mode="drop")
    # min-median-Hamming among the ring (for points observed fewer
    # than DESC_RING times the empty slots were pre-filled with the
    # creation descriptor, so they bias the median toward it — the
    # correct prior)
    touched = jnp.clip(pt_idx, 0, dmap.capacity - 1)
    r = ring[touched]  # (N, R, 32) uint8
    bits = unpack_bits(r)  # (N, R, 256)
    dist = jnp.sum(
        jnp.abs(bits[:, :, None, :] - bits[:, None, :, :]), axis=-1
    )  # (N, R, R) pairwise Hamming
    med = jnp.median(dist, axis=-1)  # (N, R)
    best = jnp.argmin(med, axis=-1)  # (N,)
    distinctive = jnp.take_along_axis(
        r, best[:, None, None], axis=1
    )[:, 0]
    desc = dmap.pt_desc_u8.at[idx].set(distinctive, mode="drop")
    return dmap._replace(
        pt_obs_count=obs,
        pt_class=cls,
        pt_desc_u8=desc,
        pt_desc_ring=ring,
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def add_obs_counts(dmap: DeviceMap, pt_ids: jnp.ndarray) -> DeviceMap:
    """Bump observation counts for cross-observations created by
    triangulation/fusion (host-table truth mirrored to the device so
    the keyframe policy's TrackedMapPoints(minObs) counter
    (ref: Tracking.cc:845-851) sees them; -1 entries ignored)."""
    idx = jnp.where(pt_ids >= 0, pt_ids, dmap.capacity)
    return dmap._replace(
        pt_obs_count=dmap.pt_obs_count.at[idx].add(1, mode="drop")
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def invalidate_points(dmap: DeviceMap, pt_ids: jnp.ndarray) -> DeviceMap:
    """Kill points by id (culling; -1 entries ignored)."""
    idx = jnp.where(pt_ids >= 0, pt_ids, dmap.capacity)
    return dmap._replace(
        pt_valid=dmap.pt_valid.at[idx].set(False, mode="drop")
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def set_positions(
    dmap: DeviceMap, pt_ids: jnp.ndarray, positions: jnp.ndarray
) -> DeviceMap:
    """Update point positions (BA write-back)."""
    idx = jnp.where(pt_ids >= 0, pt_ids, dmap.capacity)
    return dmap._replace(
        pt_pos=dmap.pt_pos.at[idx].set(positions, mode="drop")
    )
