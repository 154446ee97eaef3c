"""Pallas fused masked-Hamming top-2 vs the XLA oracle.

Runs the kernel in interpreter mode on CPU; the oracle is the exact
computation ops/matching.py performs today (materialized matrix +
top_k)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sivo_tpu.ops import pallas_match as pm
from sivo_tpu.ops.stereo import hamming_matrix


def _random_problem(seed, n=512, m=256, window=True):
    rng = np.random.default_rng(seed)
    a = (rng.uniform(size=(n, 256)) < 0.5).astype(np.float32)
    b = (rng.uniform(size=(m, 256)) < 0.5).astype(np.float32)
    u = rng.uniform(0, 1024, n).astype(np.float32)
    v = rng.uniform(0, 352, n).astype(np.float32)
    x = rng.uniform(0, 1024, m).astype(np.float32)
    y = rng.uniform(0, 352, m).astype(np.float32)
    if window:
        radius = rng.uniform(30, 120, n).astype(np.float32)
    else:
        radius = np.full(n, np.inf, np.float32)
    lvl_r = rng.integers(0, 8, n).astype(np.float32)
    lvl_c = rng.integers(0, 8, m).astype(np.float32)
    r_ur = rng.uniform(0, 1024, n).astype(np.float32)
    c_ur = np.where(
        rng.uniform(size=m) < 0.5, rng.uniform(0, 1024, m), -1.0
    ).astype(np.float32)
    r_valid = (rng.uniform(size=n) < 0.9).astype(np.float32)
    c_valid = (rng.uniform(size=m) < 0.9).astype(np.float32)
    return (a, b, u, v, x, y, radius, lvl_r, lvl_c, r_ur, c_ur,
            r_valid, c_valid)


def _oracle(a, b, u, v, x, y, radius, lo, hi, lvl_c, r_ur, c_ur,
            r_valid, c_valid, use_ur):
    ok = (
        (np.abs(x[None, :] - u[:, None]) <= radius[:, None])
        & (np.abs(y[None, :] - v[:, None]) <= radius[:, None])
        & (lvl_c[None, :] >= lo[:, None])
        & (lvl_c[None, :] <= hi[:, None])
        & (r_valid[:, None] > 0.5) & (c_valid[None, :] > 0.5)
    )
    if use_ur:
        ok = ok & (
            (c_ur[None, :] <= 0)
            | (np.abs(r_ur[:, None] - c_ur[None, :])
               <= radius[:, None])
        )
    ham = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    d = np.where(ok, ham, np.inf)
    bj = np.argmin(d, axis=1)
    best = d[np.arange(len(d)), bj]
    d2 = d.copy()
    d2[np.arange(len(d)), bj] = np.inf
    sj = np.argmin(d2, axis=1)
    second = d2[np.arange(len(d2)), sj]
    return best, second, bj, sj


@pytest.mark.parametrize("use_ur", [True, False])
@pytest.mark.parametrize("window", [True, False])
def test_masked_hamming_top2_parity(use_ur, window):
    (a, b, u, v, x, y, radius, lvl_r, lvl_c, r_ur, c_ur,
     r_valid, c_valid) = _random_problem(
        seed=hash((use_ur, window)) % 1000, window=window
    )
    lo, hi = lvl_r - 1.0, lvl_r
    row = pm.pack_row_attr(
        *map(jnp.asarray, (u, v, r_ur, radius, lo, hi, r_valid))
    )
    col = pm.pack_col_attr_t(
        *map(jnp.asarray, (x, y, c_ur, lvl_c, c_valid))
    )
    best, second, bj, sj = jax.device_get(
        pm.masked_hamming_top2(
            jnp.asarray(a), jnp.asarray(b), row, col, use_ur=use_ur
        )
    )
    o_best, o_second, o_bj, o_sj = _oracle(
        a, b, u, v, x, y, radius, lo, hi, lvl_c, r_ur, c_ur,
        r_valid, c_valid, use_ur,
    )
    np.testing.assert_array_equal(best, o_best)
    np.testing.assert_array_equal(second, o_second)
    # argmins must agree wherever the distance is finite (ties broken
    # identically: first index)
    fin = np.isfinite(o_best)
    np.testing.assert_array_equal(bj[fin], o_bj[fin])
    fin2 = np.isfinite(o_second)
    np.testing.assert_array_equal(sj[fin2], o_sj[fin2])


def test_fully_masked_rows():
    (a, b, u, v, x, y, radius, lvl_r, lvl_c, r_ur, c_ur,
     r_valid, c_valid) = _random_problem(seed=7)
    r_valid[:] = 0.0  # nothing valid
    row = pm.pack_row_attr(
        *map(jnp.asarray,
             (u, v, r_ur, radius, lvl_r - 1, lvl_r, r_valid))
    )
    col = pm.pack_col_attr_t(
        *map(jnp.asarray, (x, y, c_ur, lvl_c, c_valid))
    )
    best, second, bj, sj = jax.device_get(
        pm.masked_hamming_top2(
            jnp.asarray(a), jnp.asarray(b), row, col
        )
    )
    assert np.all(np.isinf(best)) and np.all(np.isinf(second))


def test_production_search_via_pallas(monkeypatch):
    """search_brute_force routed through the kernel must equal the XLA
    route bit-for-bit."""
    from sivo_tpu.ops import matching

    rng = np.random.default_rng(5)
    n = m = 256
    src = (rng.uniform(size=(n, 256)) < 0.5).astype(np.float32)
    dst = src.copy()
    rng.shuffle(dst)
    flips = rng.uniform(size=dst.shape) < 0.02
    dst = np.where(flips, 1.0 - dst, dst)
    sv = rng.uniform(size=n) < 0.95
    dv = rng.uniform(size=m) < 0.95
    ang = rng.uniform(0, 2 * np.pi, n).astype(np.float32)

    def run():
        return jax.device_get(matching.search_brute_force(
            jnp.asarray(src), jnp.asarray(sv), jnp.asarray(ang),
            jnp.asarray(dst), jnp.asarray(dv), jnp.asarray(ang),
            check_rotation=False,
        ))

    monkeypatch.setenv("SIVO_NO_PALLAS", "1")
    monkeypatch.delenv("SIVO_FORCE_PALLAS", raising=False)
    xla = run()
    monkeypatch.delenv("SIVO_NO_PALLAS")
    monkeypatch.setenv("SIVO_FORCE_PALLAS", "1")
    pal = run()
    np.testing.assert_array_equal(xla.dst_for_src, pal.dst_for_src)
    np.testing.assert_array_equal(xla.src_for_dst, pal.src_for_dst)
    assert int(pal.n_matches) > 100
