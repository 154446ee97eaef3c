"""Distinctive-descriptor equivalence: the DESC_RING min-median-Hamming
selection (device_map.observe_points) must behave like the reference's
ComputeDistinctiveDescriptors (ref: MapPoint.cc:284-347) — pick the
most CENTRAL appearance among recent observations, and stay matchable
under per-view appearance noise where a last-observation policy
drifts."""

import jax
import jax.numpy as jnp
import numpy as np

from sivo_tpu.runtime import device_map


def _rand_desc(rng):
    return rng.integers(0, 256, 32, dtype=np.uint8)


def _flip_bits(desc, rng, n_bits):
    """Flip n random bits of a packed 256-bit descriptor."""
    out = desc.copy()
    for b in rng.choice(256, n_bits, replace=False):
        out[b // 8] ^= np.uint8(1 << (b % 8))
    return out


def _hamming(a, b):
    return int(
        np.unpackbits(np.bitwise_xor(a, b)).sum()
    )


def _observe_sequence(descs):
    """Run a sequence of keyframe observations of ONE point through the
    device map; return the stored distinctive descriptor."""
    dmap = device_map.make_device_map(capacity=8)
    n = len(descs)
    # create the point with the first observation
    dmap, ids = device_map.add_points(
        dmap,
        jnp.asarray(np.array([True], bool)),
        jnp.asarray(np.zeros((1, 3), np.float32)),
        jnp.asarray(descs[0][None]),
        jnp.asarray(np.zeros(1, np.uint8)),
        jnp.asarray(np.zeros(1, np.int32)),
        jnp.asarray(np.array([0.0, 0.0, -1.0], np.float32)),
    )
    pid = int(np.asarray(ids)[0])
    for d in descs[1:]:
        dmap = device_map.observe_points(
            dmap,
            jnp.asarray(np.array([pid], np.int32)),
            jnp.asarray(np.zeros(1, np.uint8)),
            jnp.asarray(d[None]),
        )
    return np.asarray(dmap.pt_desc_u8[pid])


def test_distinctive_descriptor_is_central():
    """Observations = a true appearance plus per-view noise and one
    outlier view: the stored descriptor must be closer to the true
    appearance than the outlier (median Hamming centrality), exactly
    the reference's selection property."""
    rng = np.random.default_rng(3)
    true = _rand_desc(rng)
    views = [
        _flip_bits(true, rng, 8),
        _flip_bits(true, rng, 8),
        _flip_bits(true, rng, 96),  # outlier appearance (occlusion)
        _flip_bits(true, rng, 8),
    ]
    stored = _observe_sequence(views)
    d_true = _hamming(stored, true)
    d_outlier = _hamming(stored, views[2])
    assert d_true < d_outlier, (d_true, d_outlier)
    assert d_true <= 16  # one of the near-true views

    # a LAST-observation policy here would have kept whatever came
    # last; make the outlier last and check the ring still rejects it
    views2 = [
        _flip_bits(true, rng, 8),
        _flip_bits(true, rng, 8),
        _flip_bits(true, rng, 8),
        _flip_bits(true, rng, 96),  # outlier arrives LAST
    ]
    stored2 = _observe_sequence(views2)
    assert _hamming(stored2, true) <= 16, _hamming(stored2, true)


def test_distinctive_descriptor_matching_robustness():
    """Under matching: the distinctive descriptor must stay within the
    matcher's accept radius (TH_LOW=50, ref: ORBmatcher.cc:37-39) of
    every inlier view while a drifted template (last noisy view each
    frame — round 1's policy) walks away from early views."""
    rng = np.random.default_rng(11)
    true = _rand_desc(rng)
    # appearance drifts progressively (viewpoint change): each view
    # flips 16 NEW bits relative to the previous view
    views = [true]
    for _ in range(6):
        views.append(_flip_bits(views[-1], rng, 16))
    stored = _observe_sequence(views)
    # distinctive descriptor stays matchable to the RECENT views (the
    # ring covers the current approach) — all within TH_LOW
    recent = views[-3:]
    dists = [_hamming(stored, v) for v in recent]
    assert max(dists) < 50, dists
    # whereas the oldest and newest views themselves have drifted
    # apart beyond the accept radius (6 x 16 flips ~ 80+ expected)
    assert _hamming(views[0], views[-1]) > 50
