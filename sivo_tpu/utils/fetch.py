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


@functools.lru_cache(maxsize=64)
def _unpacker(keys, shapes_dtypes):
    sizes = [
        int(np.prod(s)) if s else 1 for s, _ in shapes_dtypes
    ]
    offsets = np.cumsum([0] + sizes)

    @jax.jit
    def unpack(flat):
        out = []
        for i, (shape, dtype) in enumerate(shapes_dtypes):
            seg = jax.lax.dynamic_slice_in_dim(
                flat, int(offsets[i]), sizes[i]
            )
            out.append(seg.reshape(shape).astype(dtype))
        return tuple(out)

    return unpack


def upload_packed(tree: dict) -> dict:
    """DO NOT USE on the axon relay: multi-output unpack programs pay a
    pathological per-output cost there (measured 15s for a 7-output
    unpack vs 91ms for plain per-array uploads, which are async anyway).
    Kept for reference/possible use on direct-attached TPUs."""
    keys = tuple(tree.keys())
    arrs = [np.asarray(tree[k]) for k in keys]
    shapes_dtypes = tuple(
        (a.shape, str(a.dtype)) for a in arrs
    )
    flat = np.concatenate(
        [a.astype(np.float32).reshape(-1) for a in arrs]
    )
    unpack = _unpacker(keys, shapes_dtypes)
    out = unpack(jnp.asarray(flat))
    return dict(zip(keys, out))


def _split(flat: np.ndarray, keys, arrs) -> dict:
    out = {}
    pos = 0
    for k, a in zip(keys, arrs):
        n = int(np.prod(a.shape)) if a.shape else 1
        chunk = flat[pos : pos + n].reshape(a.shape)
        out[k] = chunk.astype(a.dtype)
        pos += n
    return out


def _pack_dispatch(tree):
    keys = list(tree.keys())
    arrs = [tree[k] for k in keys]
    shapes = tuple((a.shape, str(a.dtype)) for a in arrs)
    pack = _packer(tuple(keys), shapes)
    return keys, arrs, pack(arrs)


def fetch_packed(tree) -> dict:
    """dict[str, jax.Array] -> dict[str, np.ndarray] via ONE transfer."""
    keys, arrs, flat_dev = _pack_dispatch(tree)
    return _split(np.asarray(flat_dev), keys, arrs)


# -- asynchronous fetches ----------------------------------------------------
#
# The relay's ~100-200ms per-fetch cost is pure wall-clock waiting; a
# single worker thread absorbs it so the orchestrator can keep
# dispatching device work. Device-side ops (the pack program) always
# run on the CALLER's thread — only the blocking host copy moves to the
# worker — so the device program order stays deterministic.

_EXECUTOR = None


def _executor():
    global _EXECUTOR
    if _EXECUTOR is None:
        from concurrent.futures import ThreadPoolExecutor

        # 4 workers: two big keyframe-rate fetches (phase1 + BA) must
        # never head-of-line-block the ~256-byte per-frame summary
        _EXECUTOR = ThreadPoolExecutor(
            max_workers=4, thread_name_prefix="sivo-fetch"
        )
    return _EXECUTOR


class PackedFuture:
    """In-flight packed fetch; ``result()`` blocks, ``done()`` polls."""

    def __init__(self, keys, arrs, fut):
        self._keys = keys
        self._arrs = arrs
        self._fut = fut
        self._out = None

    def done(self) -> bool:
        return self._fut.done()

    def result(self) -> dict:
        if self._out is None:
            self._out = _split(self._fut.result(), self._keys, self._arrs)
        return self._out


def fetch_packed_async(tree) -> PackedFuture:
    """Start a packed fetch; returns a PackedFuture."""
    keys, arrs, flat_dev = _pack_dispatch(tree)
    fut = _executor().submit(np.asarray, flat_dev)
    return PackedFuture(keys, arrs, fut)


def device_get_async(x):
    """Future[np.ndarray] for a single device array (e.g. the per-frame
    tracking summary): the copy overlaps subsequent host dispatches."""
    return _executor().submit(lambda a: np.asarray(jax.device_get(a)), x)


def device_put_async(x):
    """Future[jax.Array] for a host->device upload. Through the relay a
    synchronous ``jnp.asarray`` of the per-frame image payload blocks
    the frame loop ~35-60 ms per transaction (measured: upload+compute
    164.6 ms/frame vs 105.1 device-only); a worker-thread ``device_put``
    moves that wait off the critical path so the NEXT frame's bytes
    ride under the current frame's device work."""
    return _executor().submit(jax.device_put, x)
