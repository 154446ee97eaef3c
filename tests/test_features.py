"""ORB front-end parity tests vs OpenCV (the reference's feature math is
OpenCV FAST + the standard rBRIEF pattern, so cv2 is a faithful oracle;
SURVEY §7: keypoint parity is distributional, descriptors-given-
keypoints near-exact)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sivo_tpu.ops import fast as fast_ops
from sivo_tpu.ops import image as image_ops
from sivo_tpu.ops import orb as orb_ops
from sivo_tpu.ops import stereo as stereo_ops


def synth_image(h=240, w=320, seed=0):
    """Textured synthetic image with corners (blurred noise + boxes)."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(60, 190, (h, w)).astype(np.float32)
    img = cv2.GaussianBlur(img, (9, 9), 3)
    for _ in range(40):
        y, x = rng.integers(20, h - 40), rng.integers(20, w - 40)
        bh, bw = rng.integers(8, 30, 2)
        val = rng.uniform(0, 255)
        img[y : y + bh, x : x + bw] = val
    return np.clip(img, 0, 255).astype(np.float32)


def test_fast_score_matches_opencv_detection():
    img = synth_image()
    h, w = img.shape
    score = np.asarray(fast_ops.corner_score(jnp.asarray(img)))

    det = cv2.FastFeatureDetector_create(
        threshold=20, nonmaxSuppression=False
    )
    cv_kps = det.detect(img.astype(np.uint8))
    cv_mask = np.zeros((h, w), bool)
    for k in cv_kps:
        cv_mask[int(k.pt[1]), int(k.pt[0])] = True

    ours = score > 20
    ours[:3] = ours[-3:] = False
    ours[:, :3] = ours[:, -3:] = False
    inter = ours & cv_mask
    # Near-exact agreement expected (same algorithm; float vs uint8
    # rounding allows a small fringe).
    recall = inter.sum() / max(cv_mask.sum(), 1)
    precision = inter.sum() / max(ours.sum(), 1)
    assert cv_mask.sum() > 100
    assert recall > 0.93, (recall, cv_mask.sum(), ours.sum())
    assert precision > 0.93, precision


def test_fast_dual_threshold_fallback():
    # a weak corner (score in (7, 20]) in an otherwise empty cell must
    # survive via the min-threshold fallback
    img = np.full((64, 64), 100.0, np.float32)
    img[32, 32] = 112.0  # weak bright point: score ~12
    score = fast_ops.detect(
        jnp.asarray(img), jnp.ones((64, 64), bool),
        ini_threshold=20.0, min_threshold=7.0,
    )
    assert np.isfinite(np.asarray(score)[32, 32])


def test_pyramid_geometry():
    spec = image_ops.make_pyramid_spec(352, 1024)
    assert spec.heights[0] == 352 and spec.widths[0] == 1024
    # successive round(prev/1.2) like the reference
    assert spec.widths[1] == round(1024 / 1.2)
    raw, blur = image_ops.build_pyramid(
        jnp.asarray(synth_image(352, 1024)), spec
    )
    assert raw.shape == (8, 352 + 38, 1024 + 38)
    # level 3 region occupied, rest zero
    h3 = spec.heights[3] + 2 * image_ops.BORDER
    w3 = spec.widths[3] + 2 * image_ops.BORDER
    lvl3 = np.asarray(raw[3])
    assert np.abs(lvl3[:h3, :w3]).sum() > 0
    assert np.abs(lvl3[h3:, :]).sum() == 0
    assert np.abs(lvl3[:, w3:]).sum() == 0


def test_budgets_sum():
    spec = image_ops.make_pyramid_spec(352, 1024)
    budgets = image_ops.per_level_budgets(2000, spec)
    assert sum(budgets) == 2000
    assert budgets[0] > budgets[1] > budgets[-1]


def extract_synth(seed=0, h=240, w=320, n_feat=500):
    img = synth_image(h, w, seed)
    spec = image_ops.make_pyramid_spec(h, w)
    raw, blur = image_ops.build_pyramid(jnp.asarray(img), spec)
    valid = image_ops.level_valid_mask(spec, margin=16)
    budgets = image_ops.per_level_budgets(n_feat, spec)
    kps = orb_ops.extract(raw, blur, valid, spec, budgets, 1024)
    return img, spec, kps


def test_extract_counts_and_bounds():
    img, spec, kps = extract_synth()
    n = int(np.sum(np.asarray(kps.valid)))
    assert n > 200, n
    xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 320).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 240).all()
    lv = np.asarray(kps.level)[np.asarray(kps.valid)]
    assert lv.min() == 0 and lv.max() >= 3  # multiple levels populated


def test_orientation_matches_opencv():
    # cv2 ORB *detection* fills real IC angles (compute() keeps the
    # provided angle, including the -1 default) — so detect with cv2
    # and evaluate OUR orientation at the same positions.
    img = synth_image()
    spec = image_ops.make_pyramid_spec(*img.shape)
    raw, _ = image_ops.build_pyramid(jnp.asarray(img), spec)
    orb = cv2.ORB_create(nfeatures=300, nlevels=1, edgeThreshold=19)
    cv_kps = orb.detect(img.astype(np.uint8), None)
    cv_kps = [k for k in cv_kps if k.octave == 0]
    assert len(cv_kps) > 50
    xy = jnp.asarray([[k.pt[0], k.pt[1]] for k in cv_kps], jnp.float32)
    lvl = jnp.zeros(len(cv_kps), jnp.int32)
    ours = np.degrees(
        np.asarray(orb_ops.compute_orientations(raw, lvl, xy))
    ) % 360.0
    diffs = np.array(
        [
            min(abs(o - k.angle) % 360.0, 360.0 - abs(o - k.angle) % 360.0)
            for o, k in zip(ours, cv_kps)
        ]
    )
    # uint8-vs-float moments: expect near-identical angles
    assert np.median(diffs) < 2.0, np.median(diffs)
    assert np.mean(diffs < 5.0) > 0.9, diffs


def test_descriptors_match_opencv():
    img, spec, kps = extract_synth()
    valid = np.asarray(kps.valid)
    xy = np.asarray(kps.xy)[valid]
    lvl = np.asarray(kps.level)[valid]
    ang = np.degrees(np.asarray(kps.angle)[valid]) % 360.0
    desc = np.asarray(kps.desc_u8)[valid]

    sel = np.where(lvl == 0)[0]
    cv_kps = [
        cv2.KeyPoint(
            float(xy[i, 0]), float(xy[i, 1]), 31, float(ang[i]), 0, 0
        )
        for i in sel
    ]
    orb = cv2.ORB_create(nlevels=1, edgeThreshold=19)
    cv_out, cv_desc = orb.compute(img.astype(np.uint8), cv_kps)
    # map back: compute() may drop border keypoints
    pos = {
        (round(k.pt[0]), round(k.pt[1])): d
        for k, d in zip(cv_out, cv_desc)
    }
    hams = []
    for i in sel:
        key = (round(xy[i, 0]), round(xy[i, 1]))
        if key in pos:
            x = np.bitwise_xor(desc[i], pos[key])
            hams.append(np.unpackbits(x).sum())
    assert len(hams) > 50
    # identical pattern & sampling rule; blur rounding flips a few bits
    assert np.mean(hams) < 20, np.mean(hams)
    assert np.median(hams) <= 12, np.median(hams)


def test_hamming_matrix_exact():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2, (64, 256)).astype(np.float32)
    b = rng.integers(0, 2, (48, 256)).astype(np.float32)
    d = np.asarray(stereo_ops.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    expect = (a[:, None, :] != b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(d, expect)


def test_stereo_matching_recovers_disparity():
    h, w = 240, 320
    fx, bf = 300.0, 150.0
    true_disp = 12.0
    left = synth_image(h, w, seed=3)
    # right image: shift left image right-to-left by disparity
    M = np.float32([[1, 0, -true_disp], [0, 1, 0]])
    right = cv2.warpAffine(
        left, M, (w, h), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_REFLECT_101,
    )
    spec = image_ops.make_pyramid_spec(h, w)
    raw_l, blur_l = image_ops.build_pyramid(jnp.asarray(left), spec)
    raw_r, blur_r = image_ops.build_pyramid(jnp.asarray(right), spec)
    validm = image_ops.level_valid_mask(spec, margin=16)
    budgets = image_ops.per_level_budgets(500, spec)
    kl = orb_ops.extract(raw_l, blur_l, validm, spec, budgets, 1024)
    kr = orb_ops.extract(raw_r, blur_r, validm, spec, budgets, 1024)
    m = stereo_ops.match(kl, kr, blur_l, blur_r, spec, fx, bf)
    ok = np.asarray(m.valid)
    assert ok.sum() > 100, ok.sum()
    disp = np.asarray(kl.xy[:, 0] - m.u_right)[ok]
    # majority of matches recover the planar disparity to sub-pixel
    err = np.abs(disp - true_disp)
    assert np.median(err) < 0.5, np.median(err)
    depth = np.asarray(m.depth)[ok]
    np.testing.assert_allclose(
        np.median(depth), bf / true_disp, rtol=0.05
    )
