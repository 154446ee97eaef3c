"""Native runtime library tests (builds the C++ module in-test)."""

import numpy as np
import pytest

from sivo_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        assert native.build(), "native build failed"


def test_vocabulary_parse_matches_python(tmp_path):
    from sivo_tpu.place import vocabulary as voc_mod

    rng = np.random.default_rng(0)
    descs = rng.integers(0, 256, (800, 32)).astype(np.uint8)
    voc = voc_mod.train(descs, k=4, depth=3, seed=0)
    path = str(tmp_path / "voc.txt")
    voc_mod.save_text(voc, path)

    k, depth, parents, leaf, desc, weights = (
        native.parse_vocabulary_text(path)
    )
    assert k == 4 and depth == 3
    # cross-check against the python loader line-by-line
    with open(path) as f:
        f.readline()
        lines = [ln.split() for ln in f if len(ln.split()) >= 35]
    assert len(lines) == len(parents)
    np.testing.assert_array_equal(
        parents[:50], [int(l[0]) for l in lines[:50]]
    )
    np.testing.assert_array_equal(
        desc[7], [int(v) for v in lines[7][2:34]]
    )
    np.testing.assert_allclose(
        weights[:20], [float(l[34]) for l in lines[:20]], rtol=1e-6
    )


def test_inverted_file_counts():
    inv = native.NativeInvertedFile(1000)
    inv.add(0, np.array([1, 2, 3, 4], np.int32))
    inv.add(1, np.array([3, 4, 5], np.int32))
    inv.add(2, np.array([900], np.int32))
    counts = inv.shared_counts(np.array([3, 4, 900], np.int32), 8)
    np.testing.assert_array_equal(
        counts, [2, 2, 1, 0, 0, 0, 0, 0]
    )
    inv.erase(1, np.array([3], np.int32))
    counts = inv.shared_counts(np.array([3], np.int32), 8)
    np.testing.assert_array_equal(counts[:3], [1, 0, 0])


def test_inverted_file_parity_with_python_db():
    from sivo_tpu.place.database import KeyFrameDatabase

    rng = np.random.default_rng(1)
    inv = native.NativeInvertedFile(500)
    db = KeyFrameDatabase(n_words=500)
    for kf in range(20):
        words = rng.choice(500, 40, replace=False).astype(np.int32)
        inv.add(kf, words)
        db.add(kf, {int(w): 1.0 for w in words})
    q = rng.choice(500, 40, replace=False).astype(np.int32)
    native_counts = inv.shared_counts(q, 20)
    py_counts = np.zeros(20, np.int32)
    got = db._shared_word_counts({int(w): 1.0 for w in q}, set())
    for kf, c in got.items():
        py_counts[kf] = c
    np.testing.assert_array_equal(native_counts, py_counts)
