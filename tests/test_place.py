"""Place recognition tests: vocabulary training/transform/scoring,
text-format round-trip, inverted-file candidate retrieval, and batched
RANSAC PnP recovery."""

import jax
import jax.numpy as jnp
import numpy as np

from sivo_tpu.geometry import se3
from sivo_tpu.geometry.projection import CameraParams, project
from sivo_tpu.place import database, pnp, vocabulary

CAM = CameraParams(
    fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=250.0,
    width=640, height=480,
)


def random_descs(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, 32)).astype(np.uint8)


def bits_of(u8):
    return jnp.asarray(
        np.unpackbits(u8, axis=-1, bitorder="little").astype(np.float32)
    )


def test_vocabulary_train_and_transform():
    descs = random_descs(2000)
    voc = vocabulary.train(descs, k=5, depth=3, seed=0)
    assert voc.n_words > 20
    words, parents = vocabulary.transform(
        voc, bits_of(descs[:100]), jnp.ones(100, bool)
    )
    w = np.asarray(words)
    assert (w >= 0).all() and (w < voc.n_words).all()
    # identical descriptors quantize identically
    words2, _ = vocabulary.transform(
        voc, bits_of(descs[:100]), jnp.ones(100, bool)
    )
    np.testing.assert_array_equal(w, np.asarray(words2))
    # invalid entries map to -1
    words3, _ = vocabulary.transform(
        voc, bits_of(descs[:100]), jnp.zeros(100, bool)
    )
    assert (np.asarray(words3) == -1).all()


def test_similar_images_score_higher():
    descs = random_descs(3000)
    voc = vocabulary.train(descs, k=6, depth=3, seed=1)
    rng = np.random.default_rng(2)
    img_a = descs[rng.choice(3000, 300, replace=False)]
    # img_b = img_a with a few bit flips; img_c = disjoint descriptors
    img_b = img_a.copy()
    flips = rng.integers(0, 2, img_b.shape).astype(np.uint8)
    img_b ^= flips & (rng.random(img_b.shape) < 0.1).astype(np.uint8)
    img_c = random_descs(300, seed=99)

    def bow(d):
        w, _ = vocabulary.transform(
            voc, bits_of(d), jnp.ones(len(d), bool)
        )
        return vocabulary.bow_vector(voc, w)

    va, vb, vc = bow(img_a), bow(img_b), bow(img_c)
    s_ab = vocabulary.l1_score(va, vb)
    s_ac = vocabulary.l1_score(va, vc)
    s_aa = vocabulary.l1_score(va, va)
    assert s_aa > s_ab > s_ac, (s_aa, s_ab, s_ac)
    assert abs(s_aa - 1.0) < 1e-6  # self-score = 1 under L1 norm


def test_text_format_roundtrip(tmp_path):
    descs = random_descs(1000)
    voc = vocabulary.train(descs, k=4, depth=3, seed=3)
    path = tmp_path / "voc.txt"
    vocabulary.save_text(voc, str(path))
    voc2 = vocabulary.load_text(str(path))
    assert voc2.k == voc.k and voc2.depth == voc.depth
    assert voc2.n_words == voc.n_words
    q = bits_of(descs[:64])
    w1, _ = vocabulary.transform(voc, q, jnp.ones(64, bool))
    w2, _ = vocabulary.transform(voc2, q, jnp.ones(64, bool))
    # word identities can be permuted by BFS re-ordering; check that the
    # PARTITION is identical (same descriptors -> same word groups)
    a, b = np.asarray(w1), np.asarray(w2)
    remap = {}
    for x, y in zip(a, b):
        assert remap.setdefault(x, y) == y


def test_database_loop_candidates():
    db = database.KeyFrameDatabase(n_words=1000)
    rng = np.random.default_rng(4)
    # 10 keyframes: 0-8 distinct, 9 similar to 0
    base = {int(w): 1.0 for w in rng.choice(1000, 50, replace=False)}
    def norm(v):
        t = sum(v.values())
        return {k: x / t for k, x in v.items()}
    vecs = []
    for i in range(9):
        v = {
            int(w): 1.0
            for w in rng.choice(1000, 50, replace=False)
        }
        vecs.append(norm(v))
    # KF9's vector shares 80% of words with KF0
    shared = dict(list(vecs[0].items())[:40])
    extra = {int(w): 1.0 for w in rng.choice(1000, 10, replace=False)}
    q = norm({**shared, **extra})
    for i in range(9):
        db.add(i, vecs[i])
    cands = db.detect_loop_candidates(
        9, q, min_score=0.05, connected={8},
        covisible_groups={i: [max(i - 1, 0)] for i in range(9)},
        score_fn=vocabulary.l1_score,
    )
    assert 0 in cands
    assert 8 not in cands  # connected KFs excluded


def test_ransac_pnp_recovers_pose_with_outliers():
    rng = np.random.default_rng(5)
    n = 256
    pw = np.stack(
        [
            rng.uniform(-10, 10, n),
            rng.uniform(-4, 4, n),
            rng.uniform(5, 40, n),
        ],
        axis=-1,
    ).astype(np.float32)
    xi = np.array([0.4, -0.2, 0.8, 0.05, -0.1, 0.03], np.float32)
    T_true = np.asarray(se3.exp(jnp.asarray(xi)))
    pc = pw @ T_true[:3, :3].T + T_true[:3, 3]
    uv = np.array(project(CAM, jnp.asarray(pc)))
    uv += rng.normal(0, 0.5, uv.shape)
    n_out = 80
    uv[:n_out] = rng.uniform(
        [0, 0], [CAM.width, CAM.height], (n_out, 2)
    )
    res = pnp.ransac_pnp(
        jnp.asarray(pw),
        jnp.asarray(uv.astype(np.float32)),
        jnp.ones(n, jnp.float32),
        jnp.ones(n, bool),
        jax.random.key(0),
        CAM,
    )
    assert bool(res.ok)
    err = np.asarray(
        se3.log(jnp.asarray(np.linalg.inv(T_true) @
                            np.asarray(res.pose)))
    )
    assert np.abs(err[:3]).max() < 0.05, err
    inl = np.asarray(res.inliers)
    assert inl[:n_out].mean() < 0.1  # outliers rejected
    assert inl[n_out:].mean() > 0.8


def _pnp_scene(rng, n_good, n=256):
    """n correspondences of which n_good are consistent with a pose
    (the rest uniform-random pixels)."""
    pw = np.stack(
        [
            rng.uniform(-10, 10, n),
            rng.uniform(-4, 4, n),
            rng.uniform(5, 40, n),
        ],
        axis=-1,
    ).astype(np.float32)
    xi = np.array([0.3, -0.1, 0.5, 0.02, -0.05, 0.01], np.float32)
    T_true = np.asarray(se3.exp(jnp.asarray(xi)))
    pc = pw @ T_true[:3, :3].T + T_true[:3, 3]
    uv = np.array(project(CAM, jnp.asarray(pc)))
    uv += rng.normal(0, 0.3, uv.shape)
    uv[n_good:] = rng.uniform(
        [0, 0], [CAM.width, CAM.height], (n - n_good, 2)
    )
    return pw, uv.astype(np.float32)


def test_ransac_pnp_accept_reject_thresholds():
    """The reference accepts a hypothesis only at >= 10 chi2 inliers
    (RANSAC minInliers, ref: Tracking.cc:1281, PnPsolver.cc:131-270);
    below that the solver must report failure rather than a garbage
    pose."""
    rng = np.random.default_rng(9)
    # 8 consistent points: below the reference's minInliers=10
    pw, uv = _pnp_scene(rng, n_good=8)
    res = pnp.ransac_pnp(
        jnp.asarray(pw), jnp.asarray(uv),
        jnp.ones(len(pw), jnp.float32), jnp.ones(len(pw), bool),
        jax.random.key(1), CAM,
    )
    assert not bool(res.ok), int(res.n_inliers)

    # a realistic reloc candidate: ~40% inliers (the reference's
    # RANSAC epsilon default is 0.5, Tracking.cc:1281) — accepted
    pw, uv = _pnp_scene(rng, n_good=40, n=96)
    res = pnp.ransac_pnp(
        jnp.asarray(pw), jnp.asarray(uv),
        jnp.ones(len(pw), jnp.float32), jnp.ones(len(pw), bool),
        jax.random.key(2), CAM, n_hypotheses=1024,
    )
    assert bool(res.ok)
    assert int(res.n_inliers) >= 10


def test_epnp_beta_cases_planar_scene():
    """A near-planar point cloud drives M^T M toward a multi-
    dimensional null space, where the single-beta case degrades; the
    reference solves cases 1-3 + Gauss-Newton and keeps the least
    reprojection error (ref: PnPsolver.cc:352-383, 669-863). The
    batched solver must recover a clean pose from planar geometry."""
    rng = np.random.default_rng(11)
    n = 128
    pw = np.stack(
        [
            rng.uniform(-10, 10, n),
            rng.uniform(-4, 4, n),
            np.full(n, 18.0) + rng.normal(0, 0.02, n),  # near-planar
        ],
        axis=-1,
    ).astype(np.float32)
    xi = np.array([0.2, -0.15, 0.4, 0.04, -0.08, 0.02], np.float32)
    T_true = np.asarray(se3.exp(jnp.asarray(xi)))
    pc = pw @ T_true[:3, :3].T + T_true[:3, 3]
    uv = np.array(project(CAM, jnp.asarray(pc)))
    uv += rng.normal(0, 0.3, uv.shape)
    res = pnp.ransac_pnp(
        jnp.asarray(pw),
        jnp.asarray(uv.astype(np.float32)),
        jnp.ones(n, jnp.float32),
        jnp.ones(n, bool),
        jax.random.key(3),
        CAM,
    )
    assert bool(res.ok)
    err = np.asarray(
        se3.log(jnp.asarray(np.linalg.inv(T_true) @
                            np.asarray(res.pose)))
    )
    assert np.abs(err[:3]).max() < 0.05, err
    assert np.asarray(res.inliers).mean() > 0.8


def test_epnp_gauss_newton_beta_refinement_scale():
    """The Gauss-Newton beta refinement enforces the inter-control-
    point distance constraints (ref: PnPsolver.cc:814-863): the
    recovered camera-frame point cloud must carry the world scale, so
    translation comes out metric even from a noiseless minimal set."""
    rng = np.random.default_rng(13)
    m = pnp.MIN_SET
    pw = np.stack(
        [
            rng.uniform(-8, 8, m),
            rng.uniform(-3, 3, m),
            rng.uniform(8, 30, m),
        ],
        axis=-1,
    ).astype(np.float32)
    xi = np.array([0.1, 0.2, -0.3, 0.03, 0.01, -0.02], np.float32)
    T_true = np.asarray(se3.exp(jnp.asarray(xi)))
    pc = pw @ T_true[:3, :3].T + T_true[:3, 3]
    uv = np.asarray(project(CAM, jnp.asarray(pc)), np.float32)
    pose = np.asarray(
        pnp._epnp(jnp.asarray(pw)[None], jnp.asarray(uv)[None], CAM)
    )[0]
    err = np.asarray(
        se3.log(jnp.asarray(np.linalg.inv(T_true) @ pose))
    )
    assert np.abs(err[:3]).max() < 2e-2, err  # metric translation
    assert np.abs(err[3:]).max() < 5e-3, err
