"""Parity: the fused Pallas IC-angle + rBRIEF kernel vs the XLA path.

The kernel (ops/pallas_orb.py) must reproduce ops/orb.py's
compute_orientations + compute_descriptors given the same keypoints —
same sampling math (ref: ORBextractor.cc:75-150), different execution
(double-buffered patch DMAs + one-hot contractions instead of vmapped
dynamic_slice + take_along_axis). Runs interpreted on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp

from sivo_tpu.ops import orb as orb_ops
from sivo_tpu.ops import pallas_orb
from sivo_tpu.ops.image import BORDER


def test_pallas_orb_matches_xla():
    rng = np.random.default_rng(0)
    L, H, W = 3, 96, 160  # small canvas (already includes BORDER)
    # integer-valued canvases: the kernel rounds to uint8 internally
    # (OpenCV parity — the reference reads 8U images), so exact parity
    # with the float XLA path needs both to see the same intensities
    raw = jnp.asarray(
        rng.integers(0, 255, (L, H, W)).astype(np.float32)
    )
    blur = jnp.asarray(
        rng.integers(0, 255, (L, H, W)).astype(np.float32)
    )

    n = 4 * pallas_orb.BK
    m = pallas_orb.BRIEF_MARGIN
    lvl = rng.integers(0, L, n).astype(np.int32)
    # level coords with enough margin for the 37x37 patch
    y = rng.integers(m, H - 2 * BORDER - m, n).astype(np.int32)
    x = rng.integers(m, W - 2 * BORDER - m, n).astype(np.int32)
    xy_level = jnp.asarray(np.stack([x, y], 1).astype(np.float32))
    level = jnp.asarray(lvl)

    ang_x = np.asarray(orb_ops.compute_orientations(raw, level, xy_level))
    bits_x, packed_x = orb_ops.compute_descriptors(
        blur, level, xy_level, jnp.asarray(ang_x)
    )
    ang_p, bits_p, packed_p = pallas_orb.orient_and_describe(
        raw, blur, level, xy_level
    )

    np.testing.assert_allclose(
        np.asarray(ang_p), ang_x, rtol=0, atol=1e-4
    )
    # a borderline round() can flip the odd sample when cos/sin differ
    # in the last ulp; demand near-exact bit parity
    ham = np.abs(np.asarray(bits_p) - np.asarray(bits_x)).sum(axis=1)
    assert np.mean(ham) < 1.0, ham
    assert (ham <= 4).all(), ham
    same = np.asarray(packed_p) == np.asarray(packed_x)
    assert same.mean() > 0.95
