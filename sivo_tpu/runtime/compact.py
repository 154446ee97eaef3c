"""Map compaction: bounded-lifetime capacity for points and keyframes.

The reference frees culled map points and keyframes outright
(ref: MapPoint.cc:201-223 SetBadFlag, KeyFrame.cc:459-573 SetBadFlag,
Map.cc:103-121 — std::set erase semantics), so it runs KITTI-00's
~4,500 frames indefinitely. Our SoA world assigns monotonic slot ids
(creation order — the host/device lockstep contract in CLAUDE.md), so
culled slots would leak until the fixed capacities exhaust mid-run.

Compaction is the slot-recycling strategy that PRESERVES the
creation-order contract: when occupancy crosses a threshold, live
entries are slid down to contiguous slots in their original order and
every id-bearing structure (observation table, spanning tree, point
reference keyframes, device mirrors, tracker carry, trajectory
records, loop-closer bookkeeping) is remapped in one pass. Slot order
stays time order, so every "slot index as clock" comparison in the
codebase (cull age, spanning-tree predecessors, loop-gap gates,
recent-point cull windows) survives unchanged — the alternative,
free-list recycling with generation counters, would have broken all of
them.

Called at a drained-pipeline point (no in-flight frames, mapper idle,
loop closer idle) at keyframe rate; a compaction moves O(capacity)
host memory and runs two device gather programs — amortized across the
thousands of frames between triggers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sivo_tpu.runtime import device_map as dm_mod
from sivo_tpu.runtime.device_map import DeviceMap
from sivo_tpu.runtime.kf_store import DeviceKFStore


@functools.partial(jax.jit, donate_argnums=(0,))
def _compact_dmap_program(dmap: DeviceMap, perm: jnp.ndarray) -> DeviceMap:
    """New slot i takes old slot perm[i] (perm == -1 -> dead slot)."""
    cap = dmap.capacity
    idx = jnp.clip(perm, 0, cap - 1)
    live = perm >= 0
    g = lambda a: a[idx]
    return DeviceMap(
        pt_pos=g(dmap.pt_pos),
        pt_normal=g(dmap.pt_normal),
        pt_min_dist=g(dmap.pt_min_dist),
        pt_max_dist=g(dmap.pt_max_dist),
        pt_desc_u8=g(dmap.pt_desc_u8),
        pt_desc_ring=g(dmap.pt_desc_ring),
        pt_class=g(dmap.pt_class),
        pt_valid=g(dmap.pt_valid) & live,
        pt_obs_count=g(dmap.pt_obs_count),
        pt_visible=g(dmap.pt_visible),
        pt_found=g(dmap.pt_found),
        n_points=jnp.sum(live).astype(jnp.int32),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _compact_kf_store_program(
    store: DeviceKFStore, perm: jnp.ndarray
) -> DeviceKFStore:
    idx = jnp.clip(perm, 0, store.capacity - 1)
    return DeviceKFStore(*(f[idx] for f in store))


@jax.jit
def _remap_ids_program(ids: jnp.ndarray, lut: jnp.ndarray) -> jnp.ndarray:
    """Map old point ids through the old->new lut; dead/out-of-range
    ids become -1."""
    cap = lut.shape[0]
    ok = (ids >= 0) & (ids < cap)
    return jnp.where(
        ok, lut[jnp.clip(ids, 0, cap - 1)], -1
    ).astype(jnp.int32)


def _nearest_live_ancestor(m) -> np.ndarray:
    """anc[k] = k if live, else the nearest live ancestor through the
    spanning tree (falling back to k-1 chains), 0 at worst — the
    reference's bad-KF parent walk (System.cc:303-311)."""
    K = m.n_keyframes
    anc = np.arange(K)
    for k in range(K):
        a = k
        hops = 0
        while a > 0 and not m.kf_valid[a] and hops <= K:
            p = int(m.kf_parent[a])
            a = p if 0 <= p < a else a - 1
            hops += 1
        anc[k] = a if m.kf_valid[a] or a == 0 else 0
    return anc


def should_compact(system) -> bool:
    """Trigger when either store is nearly full AND enough is dead to
    make the move worthwhile."""
    m = system.map
    pt_occ = m.n_points / max(m.max_points, 1)
    kf_occ = m.n_keyframes / max(m.max_keyframes, 1)
    pt_dead = (
        1.0 - m.pt_valid[: m.n_points].mean() if m.n_points else 0.0
    )
    kf_dead = (
        1.0 - m.kf_valid[: m.n_keyframes].mean()
        if m.n_keyframes
        else 0.0
    )
    # 0.95: the in-flight pipeline keeps minting between this trigger
    # and the drained-compaction point (~2 keyframes ≈ 1000 points),
    # and the GBA-defer below can stretch that window further — at
    # 0.97 a 12-lap endurance run reached the hard capacity mid-drain
    critical = (pt_occ > 0.95 and pt_dead > 0.01) or (
        kf_occ > 0.95 and kf_dead > 0.01
    )
    lc = getattr(system, "loop_closer", None)
    if lc is not None and lc._gba is not None and not critical:
        # compaction would turn the ASYNC post-loop GBA into a
        # synchronous stall (_compact must apply it first — measured
        # 36 s when it landed mid-solve); defer until the solve drains
        # unless a store is critically full
        return False
    return critical or (
        (pt_occ > 0.85 and pt_dead > 0.10)
        or (kf_occ > 0.85 and kf_dead > 0.10)
    )


def compact_map(system) -> dict:
    """Compact points and keyframes. The caller must have drained the
    pipelines (no in-flight tracked frames, mapper idle, loop closer
    idle). Returns {"points_freed", "keyframes_freed"}."""
    m = system.map
    tr = system.tracker
    lc = system.loop_closer

    n_pt, n_kf = m.n_points, m.n_keyframes

    # ---- permutations (creation order preserved) -----------------------
    anc = _nearest_live_ancestor(m)
    perm_kf = np.where(m.kf_valid[:n_kf])[0]
    lut_kf = np.full(max(n_kf, 1), -1, np.int64)
    lut_kf[perm_kf] = np.arange(len(perm_kf))

    perm_pt = np.where(m.pt_valid[:n_pt])[0]
    lut_pt = np.full(max(n_pt, 1), -1, np.int64)
    lut_pt[perm_pt] = np.arange(len(perm_pt))

    def kmap(k: int) -> int:
        """Old kf id -> new id of its nearest live representative."""
        if k < 0 or k >= n_kf:
            return -1
        return int(lut_kf[anc[k]])

    # ---- trajectory records (before kf arrays move) --------------------
    # Records referencing a culled keyframe re-express their relative
    # pose through the nearest live ancestor using current poses
    # (ref: System.cc:303-311 walks Tcp through bad parents the same
    # way at save time).
    for r in tr.trajectory:
        k = r.ref_kf
        if 0 <= k < n_kf and not m.kf_valid[k]:
            a = int(anc[k])
            rel = (
                r.rel_pose.astype(np.float64)
                @ m.kf_pose[k].astype(np.float64)
                @ np.linalg.inv(m.kf_pose[a].astype(np.float64))
            ).astype(np.float32)
            r.rel_pose = rel
            r.ref_kf = a
        if 0 <= r.ref_kf < n_kf:
            r.ref_kf = int(lut_kf[r.ref_kf])

    # ---- observation table ---------------------------------------------
    n = m._obs_n
    obs = m._obs[:n]
    alive = m._obs_alive[:n].copy()
    alive &= m.kf_valid[np.clip(obs[:, 0], 0, m.max_keyframes - 1)]
    alive &= m.pt_valid[np.clip(obs[:, 1], 0, m.max_points - 1)]
    rows = obs[alive]
    rows = rows.copy()
    rows[:, 0] = lut_kf[rows[:, 0]]
    rows[:, 1] = lut_pt[rows[:, 1]]
    keep = (rows[:, 0] >= 0) & (rows[:, 1] >= 0)
    rows = rows[keep]
    m._obs[: len(rows)] = rows
    m._obs_alive[: len(rows)] = True
    m._obs_alive[len(rows):] = False
    m._obs_n = len(rows)
    m._obs_dirty = True

    # ---- point arrays ---------------------------------------------------
    # reference keyframes first (they are kf ids): dead refs chain to
    # the nearest live ancestor (ref: MapPoint keeps a live mpRefKF)
    ref = m.pt_ref_kf[:n_pt].copy()
    first = m.pt_first_kf[:n_pt].copy()
    for arr in (ref, first):
        ok = (arr >= 0) & (arr < n_kf)
        arr[ok] = lut_kf[anc[arr[ok]]]
    m.pt_ref_kf[:n_pt] = ref
    m.pt_first_kf[:n_pt] = first

    n_live_pt = len(perm_pt)
    for name in (
        "pt_pos", "pt_normal", "pt_min_dist", "pt_max_dist",
        "pt_desc_u8", "pt_class", "pt_ref_kf", "pt_first_kf",
        "pt_visible", "pt_found",
    ):
        a = getattr(m, name)
        a[:n_live_pt] = a[perm_pt]
    m.pt_valid[:n_live_pt] = True
    m.pt_valid[n_live_pt:] = False
    m.n_points = n_live_pt

    # ---- keyframe arrays -------------------------------------------------
    n_live_kf = len(perm_kf)
    parent = m.kf_parent[:n_kf].copy()
    new_parent = np.full(m.max_keyframes, -1, np.int32)
    for i, old in enumerate(perm_kf):
        p = int(parent[old])
        if 0 <= p < n_kf:
            new_parent[i] = lut_kf[anc[p]]
    m.kf_pose[:n_live_kf] = m.kf_pose[perm_kf]
    m.kf_cov[:n_live_kf] = m.kf_cov[perm_kf]
    new_data = [m.kf_data[old] for old in perm_kf]
    m.kf_data = new_data + [None] * (m.max_keyframes - n_live_kf)
    m.kf_parent[:] = new_parent
    m.kf_valid[:n_live_kf] = True
    m.kf_valid[n_live_kf:] = False
    m.n_keyframes = n_live_kf

    # ---- device mirrors --------------------------------------------------
    cap = tr.dmap.capacity
    perm_pad = np.full(cap, -1, np.int32)
    perm_pad[:n_live_pt] = perm_pt
    tr.dmap = _compact_dmap_program(tr.dmap, jnp.asarray(perm_pad))

    kcap = tr.kf_store.capacity
    kperm_pad = np.zeros(kcap, np.int32)
    kperm_pad[:n_live_kf] = perm_kf
    tr.kf_store = _compact_kf_store_program(
        tr.kf_store, jnp.asarray(kperm_pad)
    )

    # tracker device id arrays + carry
    lut_pad = np.full(cap, -1, np.int32)
    lut_pad[:n_pt] = lut_pt[:n_pt]
    lut_dev = jnp.asarray(lut_pad)
    tr._ref_pt_idx = _remap_ids_program(tr._ref_pt_idx, lut_dev)
    tr._local_ids_dev = _remap_ids_program(tr._local_ids_dev, lut_dev)
    tr.carry = tr.carry._replace(
        pt_idx=_remap_ids_program(tr.carry.pt_idx, lut_dev)
    )
    tr.last_kf_id = kmap(tr.last_kf_id)

    # ---- loop-closer bookkeeping ----------------------------------------
    if lc is not None:
        db = lc.db
        new_bow = {}
        for k, v in db.bow.items():
            nk = int(lut_kf[k]) if 0 <= k < n_kf else -1
            if nk >= 0:
                new_bow[nk] = v
        db.bow = new_bow
        # the array mirror is keyed by OLD kf ids — drop it wholesale
        # (db.score lazily rebuilds entries from the remapped bow)
        db.bow_arr = {}
        inv: dict[int, list[int]] = {}
        for nk, v in new_bow.items():
            for wid in v:
                inv.setdefault(wid, []).append(nk)
        db.inverted = inv
        lc.consistent_groups = [
            (g2, c)
            for g, c in lc.consistent_groups
            if (g2 := {
                int(lut_kf[k]) for k in g if 0 <= k < n_kf
                and lut_kf[k] >= 0
            })
        ]
        lc.loop_edges = [
            (kmap(i), kmap(j), T)
            for i, j, T in lc.loop_edges
            if kmap(i) >= 0 and kmap(j) >= 0 and kmap(i) != kmap(j)
        ]
        if 0 <= lc.last_loop_kf < n_kf:
            lc.last_loop_kf = kmap(lc.last_loop_kf)

    return {
        "points_freed": int(n_pt - n_live_pt),
        "keyframes_freed": int(n_kf - n_live_kf),
    }
