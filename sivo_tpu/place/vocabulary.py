"""Visual vocabulary: hierarchical binary descriptor tree on device.

TPU-native replacement for DBoW2's TemplatedVocabulary (ref:
dependencies/DBoW2/DBoW2/TemplatedVocabulary.h): the k^L-word
hierarchical k-medians tree becomes flat device arrays (node centroids
as 0/1 float bit matrices + an explicit children index table, so ragged
real-world trees load too), and ``transform`` — the per-descriptor
greedy descent — becomes L batched Hamming argmin steps over all
keypoints at once (popcount as an MXU bit matmul, like ops/stereo).

Includes:
  * a trainer (hierarchical binary k-medians, host) since the
    reference's config/Vocabulary/ORBvoc.txt is absent from its tree
    (SURVEY §5.6);
  * a loader for the DBoW2 text format so a real ORBvoc.txt drops in
    (ref: TemplatedVocabulary.h:1338 loadFromTextFile — the dominant
    init cost of the reference, System.cc:75-82);
  * TF-IDF (L1) scoring — the only scoring the reference uses.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Vocabulary(NamedTuple):
    """Flat node arrays. Node 0 is the (virtual) root. Leaves carry
    word ids; leaf rows in ``children`` self-loop so a fixed-depth
    descent is correct for ragged trees."""

    k: int  # max branching factor
    depth: int  # descent steps (max tree depth)
    centroids: jnp.ndarray  # (n_nodes, 256) float 0/1 bits
    children: jnp.ndarray  # (n_nodes, k) int32, -1 padded
    word_id: jnp.ndarray  # (n_nodes,) int32, -1 for internal nodes
    word_weights: jnp.ndarray  # (n_words,) idf weights
    n_words: int


def _unpack_bits_np(desc_u8: np.ndarray) -> np.ndarray:
    return np.unpackbits(
        desc_u8.astype(np.uint8), axis=-1, bitorder="little"
    ).astype(np.float32)


def _pack_bits_np(bits: np.ndarray) -> np.ndarray:
    return np.packbits(bits.astype(np.uint8), axis=-1, bitorder="little")


def train(
    descriptors_u8: np.ndarray,
    k: int = 10,
    depth: int = 4,
    seed: int = 0,
    iters: int = 8,
) -> Vocabulary:
    """Hierarchical binary k-medians (DBoW2's HKmeansStep scheme) on
    packed descriptors (M, 32)."""
    rng = np.random.default_rng(seed)
    bits = _unpack_bits_np(descriptors_u8)

    def kmedians(data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        kk = min(k, max(len(data), 1))
        if len(data) <= kk:
            cent = data.copy() if len(data) else rng.integers(
                0, 2, (1, 256)
            ).astype(np.float32)
            return cent, np.arange(len(data)) % max(len(cent), 1)
        idx = rng.choice(len(data), kk, replace=False)
        cent = data[idx].copy()
        assign = None
        for _ in range(iters):
            d = data @ (1 - 2 * cent.T) + cent.sum(1)[None, :]
            assign = np.argmin(d, axis=1)
            for j in range(kk):
                sel = data[assign == j]
                if len(sel):
                    cent[j] = (sel.mean(0) > 0.5).astype(np.float32)
        return cent, assign

    # build the tree breadth-first
    centroids = [np.zeros((1, 256), np.float32)]  # root placeholder
    children: list[list[int]] = [[]]
    word_id = [-1]
    queue = [(0, bits, 0)]  # (node, data, level)
    n_words = 0
    while queue:
        node, data, level = queue.pop(0)
        if level >= depth or len(data) <= 1:
            word_id[node] = n_words
            n_words += 1
            continue
        cent, assign = kmedians(data)
        for j in range(len(cent)):
            cid = len(centroids)
            centroids.append(cent[j : j + 1])
            children.append([])
            word_id.append(-1)
            children[node].append(cid)
            queue.append((cid, data[assign == j], level + 1))

    n_nodes = len(centroids)
    cent_arr = np.concatenate(centroids, axis=0)
    child_arr = np.full((n_nodes, k), -1, np.int32)
    for i, ch in enumerate(children):
        if ch:
            child_arr[i, : len(ch)] = ch
        else:
            child_arr[i, 0] = i  # leaf self-loop
    voc = Vocabulary(
        k=k,
        depth=depth,
        centroids=jnp.asarray(cent_arr),
        children=jnp.asarray(child_arr),
        word_id=jnp.asarray(np.array(word_id, np.int32)),
        word_weights=jnp.ones(n_words, jnp.float32),
        n_words=n_words,
    )
    # idf weights from training-set word frequencies
    # (ref: TemplatedVocabulary TF_IDF setNodeWeights)
    counts = np.zeros(n_words, np.float64)
    for i in range(0, len(bits), 8192):
        w, _ = transform(
            voc,
            jnp.asarray(bits[i : i + 8192]),
            jnp.ones(min(8192, len(bits) - i), bool),
        )
        w = np.asarray(w)
        counts += np.bincount(w[w >= 0], minlength=n_words)
    idf = np.log(max(len(bits), 1) / np.maximum(counts, 1.0))
    return voc._replace(
        word_weights=jnp.asarray(idf.astype(np.float32))
    )


@functools.partial(jax.jit, static_argnames=("depth",))
def _transform_impl(
    centroids: jnp.ndarray,
    children: jnp.ndarray,
    word_id: jnp.ndarray,
    desc_bits: jnp.ndarray,
    valid: jnp.ndarray,
    depth: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    n = desc_bits.shape[0]
    node = jnp.zeros(n, jnp.int32)
    parent = jnp.zeros(n, jnp.int32)
    db16 = desc_bits.astype(jnp.bfloat16)
    for _ in range(depth):
        cand_idx = children[node]  # (N, k)
        ok = cand_idx >= 0
        cand = centroids[jnp.maximum(cand_idx, 0)]  # (N, k, 256)
        d = jnp.sum(cand, axis=-1) - 2.0 * jnp.einsum(
            "nb,nkb->nk", db16, cand.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        d = jnp.where(ok, d, jnp.inf)
        best = jnp.argmin(d, axis=-1)
        new_node = jnp.take_along_axis(
            cand_idx, best[:, None], axis=1
        )[:, 0]
        moved = new_node != node
        parent = jnp.where(moved, node, parent)
        node = new_node
    words = jnp.where(valid, word_id[node], -1)
    return words, jnp.where(valid, parent, -1)


def transform(
    voc: Vocabulary, desc_bits: jnp.ndarray, valid: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize descriptors to words: greedy Hamming descent, batched
    (ref: TemplatedVocabulary.h:1127-1199 transform).

    Returns (word ids (N,) int32 or -1, parent node ids (N,) int32 —
    the coarser grouping node, DBoW2's "levelsup" concept).
    """
    return _transform_impl(
        voc.centroids, voc.children, voc.word_id,
        desc_bits, valid, voc.depth,
    )


_HOST_WEIGHTS_CACHE: dict[int, np.ndarray] = {}


def bow_vector(voc: Vocabulary, words: jnp.ndarray) -> dict[int, float]:
    """Host-side sparse TF-IDF BoW vector, L1-normalized
    (ref: BowVector::addWeight + normalize(L1))."""
    w = np.asarray(words)
    w = w[w >= 0]
    key = id(voc.word_weights)
    weights = _HOST_WEIGHTS_CACHE.get(key)
    if weights is None:
        weights = np.asarray(voc.word_weights)
        _HOST_WEIGHTS_CACHE.clear()
        _HOST_WEIGHTS_CACHE[key] = weights
    vec: dict[int, float] = {}
    for wid in w.tolist():
        vec[wid] = vec.get(wid, 0.0) + float(weights[wid])
    total = sum(vec.values())
    if total > 0:
        vec = {key: v / total for key, v in vec.items()}
    return vec


def l1_score(a: dict[int, float], b: dict[int, float]) -> float:
    """DBoW2 L1 scoring (ref: ScoringObject.cc L1Scoring::score):
    s = -0.5 * sum_{common} (|a_i - b_i| - |a_i| - |b_i|)."""
    s = 0.0
    for wid, va in a.items():
        vb = b.get(wid)
        if vb is not None:
            s += abs(va - vb) - abs(va) - abs(vb)
    return -0.5 * s


def bow_arrays(vec: dict[int, float]) -> tuple[np.ndarray, np.ndarray]:
    """Sparse BoW vector as sorted (word ids (W,), weights (W,)) arrays
    — the vectorized-scoring representation (the dict form stays the
    canonical one for the inverted file)."""
    if not vec:
        return (
            np.zeros(0, np.int64),
            np.zeros(0, np.float32),
        )
    ids = np.fromiter(vec.keys(), np.int64, len(vec))
    w = np.fromiter(vec.values(), np.float32, len(vec))
    order = np.argsort(ids)
    return ids[order], w[order]


def l1_score_arrays(
    a: tuple[np.ndarray, np.ndarray], b: tuple[np.ndarray, np.ndarray]
) -> float:
    """L1 score over sorted-array BoW vectors — numerically identical
    to ``l1_score`` but vectorized (the reference's C++ merge walk,
    ScoringObject.cc, is ~free; the python-dict loop is 1-2 ms per pair
    at every keyframe — this makes scoring ALL covisible neighbours for
    min_score affordable, removing the round-3 top-15 divergence)."""
    ia, wa = a
    ib, wb = b
    if len(ia) == 0 or len(ib) == 0:
        return 0.0
    common, ka, kb = np.intersect1d(
        ia, ib, assume_unique=True, return_indices=True
    )
    if len(common) == 0:
        return 0.0
    va, vb = wa[ka], wb[kb]
    return float(
        -0.5 * np.sum(np.abs(va - vb) - np.abs(va) - np.abs(vb))
    )


def save_text(voc: Vocabulary, path: str) -> None:
    """DBoW2-style text writer (round-trips with load_text). Nodes are
    written in BFS order excluding the root, each as
    ``parent_line_idx is_leaf <32 bytes> weight`` after a
    ``k L scoring weighting`` header — the ORBvoc.txt layout."""
    cents = _pack_bits_np(np.asarray(voc.centroids))
    children = np.asarray(voc.children)
    word_id = np.asarray(voc.word_id)
    weights = np.asarray(voc.word_weights)

    order: list[int] = []
    parent_of: dict[int, int] = {}
    queue = [0]
    while queue:
        nid = queue.pop(0)
        for c in children[nid]:
            c = int(c)
            if c >= 0 and c != nid:
                parent_of[c] = nid
                order.append(c)
                queue.append(c)
    line_of = {nid: i for i, nid in enumerate(order)}
    with open(path, "w") as f:
        f.write(f"{voc.k} {voc.depth} 0 0\n")
        for nid in order:
            p = parent_of[nid]
            pline = 0 if p == 0 else line_of[p] + 1
            is_leaf = int(word_id[nid] >= 0)
            w = float(weights[word_id[nid]]) if is_leaf else 0.0
            f.write(
                f"{pline} {is_leaf} "
                + " ".join(str(int(v)) for v in cents[nid])
                + f" {w}\n"
            )


def load_text(path: str) -> Vocabulary:
    """DBoW2-format text loader; tolerates ragged trees
    (ref: TemplatedVocabulary.h:1338). Uses the native C++ parser when
    built (sivo_tpu/native) — the reference's ~1M-line ORBvoc.txt is
    its dominant startup cost (System.cc:75-82)."""
    try:
        from sivo_tpu import native

        if native.available():
            k, depth, par, leaf, desc, w_arr = (
                native.parse_vocabulary_text(path)
            )
            parents = par.tolist()
            weights = w_arr.tolist()
            rows = desc
            n = len(rows)
            bits = _unpack_bits_np(rows)
            return _assemble(k, depth, n, parents, bits, weights)
    except (RuntimeError, OSError):
        pass
    with open(path) as f:
        header = f.readline().split()
        k, depth = int(header[0]), int(header[1])
        parents, leaf_flags, rows, weights = [], [], [], []
        for line in f:
            parts = line.split()
            if len(parts) < 35:
                continue
            parents.append(int(parts[0]))
            leaf_flags.append(int(parts[1]))
            rows.append([int(float(v)) for v in parts[2:34]])
            weights.append(float(parts[34]))
    n = len(rows)
    bits = _unpack_bits_np(np.array(rows, np.uint8))
    return _assemble(k, depth, n, parents, bits, weights)


def save_npz(path: str, voc: Vocabulary) -> None:
    """Binary round-trip (session-vocabulary caching; the text format
    exists for reference ORBvoc.txt compatibility, not speed)."""
    np.savez_compressed(
        path,
        k=voc.k,
        depth=voc.depth,
        centroids=_pack_bits_np(np.asarray(voc.centroids)),
        children=np.asarray(voc.children),
        word_id=np.asarray(voc.word_id),
        word_weights=np.asarray(voc.word_weights),
        n_words=voc.n_words,
    )


def load_npz(path: str) -> Vocabulary:
    z = np.load(path)
    return Vocabulary(
        k=int(z["k"]),
        depth=int(z["depth"]),
        centroids=jnp.asarray(_unpack_bits_np(z["centroids"])),
        children=jnp.asarray(z["children"]),
        word_id=jnp.asarray(z["word_id"]),
        word_weights=jnp.asarray(z["word_weights"]),
        n_words=int(z["n_words"]),
    )


def _assemble(k, depth, n, parents, bits, weights) -> Vocabulary:
    # node ids: 0 = root, line i -> node i+1; parent field is
    # 0 for root children else parent line index + 1
    cent_arr = np.concatenate(
        [np.zeros((1, 256), np.float32), bits], axis=0
    )
    children_lists: list[list[int]] = [[] for _ in range(n + 1)]
    for i, p in enumerate(parents):
        children_lists[p].append(i + 1)
    child_arr = np.full((n + 1, k), -1, np.int32)
    word_id = np.full(n + 1, -1, np.int32)
    n_words = 0
    word_w = []
    for i in range(n + 1):
        ch = children_lists[i]
        if ch:
            child_arr[i, : min(len(ch), k)] = ch[:k]
        else:
            child_arr[i, 0] = i  # leaf self-loop
            word_id[i] = n_words
            word_w.append(weights[i - 1])
            n_words += 1
    return Vocabulary(
        k=k,
        depth=depth,
        centroids=jnp.asarray(cent_arr),
        children=jnp.asarray(child_arr),
        word_id=jnp.asarray(word_id),
        word_weights=jnp.asarray(np.array(word_w, np.float32)),
        n_words=n_words,
    )
