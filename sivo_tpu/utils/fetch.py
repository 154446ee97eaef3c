"""Packed device-to-host fetches.

On this deployment the accelerator sits behind a relay where EVERY
fetched buffer pays a large fixed cost (measured ~100-200ms per
distinct array, vs ~10ms for one array of the same total bytes).
``fetch_packed`` concatenates a pytree of device arrays into a single
float32 vector in one tiny jitted program, fetches once, and splits on
host.

float32 packing is lossless for all runtime payloads here: masks,
uint8 descriptors/classes, level indices, point ids (< 2^24), pixel
coordinates and positions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _packer(treedef, shapes_dtypes):
    @jax.jit
    def pack(flat):
        return jnp.concatenate(
            [a.astype(jnp.float32).reshape(-1) for a in flat]
        )

    return pack


def fetch_packed(tree) -> dict:
    """dict[str, jax.Array] -> dict[str, np.ndarray] via ONE transfer."""
    keys = list(tree.keys())
    arrs = [tree[k] for k in keys]
    shapes = tuple((a.shape, str(a.dtype)) for a in arrs)
    pack = _packer(tuple(keys), shapes)
    flat = np.asarray(pack(arrs))
    out = {}
    pos = 0
    for k, a in zip(keys, arrs):
        n = int(np.prod(a.shape)) if a.shape else 1
        chunk = flat[pos : pos + n].reshape(a.shape)
        out[k] = chunk.astype(a.dtype)
        pos += n
    return out
