"""ctypes bindings for the native runtime library (see
sivo_native.cpp). Gracefully degrades: ``available()`` is False when
the shared library has not been built (run sivo_tpu/native/build.sh),
and callers fall back to the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libsivo_native.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.voc_count_nodes.restype = ctypes.c_int64
    lib.voc_count_nodes.argtypes = [ctypes.c_char_p]
    lib.voc_parse.restype = ctypes.c_int
    lib.voc_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.invfile_create.restype = ctypes.c_void_p
    lib.invfile_create.argtypes = [ctypes.c_int64]
    lib.invfile_destroy.argtypes = [ctypes.c_void_p]
    lib.invfile_add.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64
    ]
    lib.invfile_erase.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64
    ]
    lib.invfile_shared_counts.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64,
    ]
    _LIB = lib
    return lib


def build() -> bool:
    """Compile the shared library (cmake + ninja)."""
    try:
        subprocess.run(
            ["bash", os.path.join(_DIR, "build.sh")],
            check=True, capture_output=True,
        )
    except subprocess.CalledProcessError:
        return False
    global _LIB
    _LIB = None
    return _load() is not None


def available() -> bool:
    return _load() is not None


def parse_vocabulary_text(path: str):
    """Fast ORBvoc.txt parse -> (k, depth, parents, leaf_flags,
    descriptors (n, 32) uint8, weights). ~20x faster than line-by-line
    Python on the ~1M-node DBoW2 vocabularies."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libsivo_native.so not built")
    n = lib.voc_count_nodes(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    parents = np.zeros(n, np.int32)
    leaf = np.zeros(n, np.uint8)
    desc = np.zeros((n, 32), np.uint8)
    weights = np.zeros(n, np.float32)
    k = ctypes.c_int32()
    depth = ctypes.c_int32()
    rc = lib.voc_parse(
        path.encode(), n, ctypes.byref(k), ctypes.byref(depth),
        parents.ctypes.data_as(ctypes.c_void_p),
        leaf.ctypes.data_as(ctypes.c_void_p),
        desc.ctypes.data_as(ctypes.c_void_p),
        weights.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise ValueError(f"vocabulary parse failed (code {rc})")
    return int(k.value), int(depth.value), parents, leaf, desc, weights


class NativeInvertedFile:
    """C++ inverted file (ref: KeyFrameDatabase.cc inverted index)."""

    def __init__(self, n_words: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("libsivo_native.so not built")
        self._lib = lib
        self._h = lib.invfile_create(n_words)
        self.n_words = n_words

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.invfile_destroy(self._h)
            self._h = None

    def add(self, kf: int, words: np.ndarray) -> None:
        w = np.ascontiguousarray(words, np.int32)
        self._lib.invfile_add(
            self._h, kf, w.ctypes.data_as(ctypes.c_void_p), len(w)
        )

    def erase(self, kf: int, words: np.ndarray) -> None:
        w = np.ascontiguousarray(words, np.int32)
        self._lib.invfile_erase(
            self._h, kf, w.ctypes.data_as(ctypes.c_void_p), len(w)
        )

    def shared_counts(
        self, words: np.ndarray, max_kf: int
    ) -> np.ndarray:
        w = np.ascontiguousarray(words, np.int32)
        counts = np.zeros(max_kf, np.int32)
        self._lib.invfile_shared_counts(
            self._h, w.ctypes.data_as(ctypes.c_void_p), len(w),
            counts.ctypes.data_as(ctypes.c_void_p), max_kf,
        )
        return counts
