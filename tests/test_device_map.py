"""Device-map mirror semantics: distinctive descriptor selection
(min-median Hamming over the recent-observation ring, the bounded
equivalent of MapPoint::ComputeDistinctiveDescriptors,
ref: MapPoint.cc:284-347) and observation bookkeeping."""

import jax
import jax.numpy as jnp
import numpy as np

from sivo_tpu.runtime import device_map


def _rand_desc(rng, n):
    return rng.integers(0, 256, (n, 32)).astype(np.uint8)


def _hamming(a, b):
    return int(
        np.unpackbits(np.bitwise_xor(a, b)).sum()
    )


def _oracle_distinctive(descs):
    """MapPoint.cc:284-347 transcribed: the descriptor with the least
    median distance to the rest."""
    n = len(descs)
    D = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            D[i, j] = _hamming(descs[i], descs[j])
    med = np.median(D, axis=1)
    return descs[int(np.argmin(med))]


def test_distinctive_descriptor_min_median():
    rng = np.random.default_rng(3)
    cap = 64
    n_kp = 8
    dmap = device_map.make_device_map(cap)
    # create 8 points with an initial descriptor each
    d0 = _rand_desc(rng, n_kp)
    dmap, ids = device_map.add_points(
        dmap,
        jnp.ones(n_kp, bool),
        jnp.asarray(rng.uniform(-1, 1, (n_kp, 3)), jnp.float32),
        jnp.asarray(d0),
        jnp.zeros(n_kp, jnp.uint8),
        jnp.zeros(n_kp, jnp.int32),
        jnp.zeros(3, jnp.float32),
    )
    ids = np.asarray(jax.device_get(ids))
    assert (ids == np.arange(n_kp)).all()
    # observe each point from 3 more keyframes with fresh descriptors
    history = [[d0[i]] for i in range(n_kp)]
    for _ in range(device_map.DESC_RING - 1):
        dk = _rand_desc(rng, n_kp)
        for i in range(n_kp):
            history[i].append(dk[i])
        dmap = device_map.observe_points(
            dmap,
            jnp.asarray(ids.astype(np.int32)),
            jnp.zeros(n_kp, jnp.uint8),
            jnp.asarray(dk),
        )
    got = np.asarray(jax.device_get(dmap.pt_desc_u8))[:n_kp]
    for i in range(n_kp):
        want = _oracle_distinctive(np.stack(history[i]))
        np.testing.assert_array_equal(got[i], want)


def test_observe_counts_and_class_freeze():
    rng = np.random.default_rng(4)
    dmap = device_map.make_device_map(16)
    d0 = _rand_desc(rng, 4)
    dmap, ids = device_map.add_points(
        dmap,
        jnp.ones(4, bool),
        jnp.zeros((4, 3), jnp.float32),
        jnp.asarray(d0),
        jnp.full(4, 255, jnp.uint8),  # class unset at creation
        jnp.zeros(4, jnp.int32),
        jnp.zeros(3, jnp.float32),
    )
    ids32 = jnp.asarray(np.asarray(jax.device_get(ids)), jnp.int32)
    dmap = device_map.observe_points(
        dmap, ids32, jnp.asarray([1, 2, 3, 4], jnp.uint8),
        jnp.asarray(d0),
    )
    # first observation sets the class…
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(dmap.pt_class))[:4], [1, 2, 3, 4]
    )
    # …later ones do not re-test it (ref: flip-kill only at creation,
    # MapPoint.cc:104-111 call sites)
    dmap = device_map.observe_points(
        dmap, ids32, jnp.asarray([9, 9, 9, 9], jnp.uint8),
        jnp.asarray(d0),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(dmap.pt_class))[:4], [1, 2, 3, 4]
    )
    assert (
        np.asarray(jax.device_get(dmap.pt_obs_count))[:4] == 3
    ).all()
