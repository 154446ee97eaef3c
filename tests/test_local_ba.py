"""Local BA tests: joint pose+point recovery on a perturbed synthetic
problem, outlier demotion, gauge fixing, and marginal covariance."""

import jax.numpy as jnp
import numpy as np

from sivo_tpu.geometry import se3
from sivo_tpu.geometry.projection import CameraParams, project_stereo
from sivo_tpu.optim import local_ba

CAM = CameraParams(
    fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=250.0,
    width=640, height=480,
)
K, P = 8, 512


def make_problem(seed=0, noise=0.2, pose_perturb=0.02,
                 point_perturb=0.05, outlier_frac=0.0):
    rng = np.random.default_rng(seed)
    # ground-truth: cameras along a line, points in front
    gt_poses = []
    for k in range(K):
        xi = np.zeros(6)
        xi[2] = -0.5 * k  # forward
        xi[:3] += rng.normal(0, 0.05, 3)
        gt_poses.append(np.asarray(se3.exp(jnp.asarray(xi, jnp.float32))))
    gt_poses = np.stack(gt_poses)
    gt_pts = np.stack(
        [
            rng.uniform(-8, 8, P),
            rng.uniform(-3, 3, P),
            rng.uniform(8, 30, P),
        ],
        axis=-1,
    ).astype(np.float32)

    obs_kf, obs_pt, obs_uvr = [], [], []
    for k in range(K):
        xc = gt_pts @ gt_poses[k][:3, :3].T + gt_poses[k][:3, 3]
        uvr = np.array(project_stereo(CAM, jnp.asarray(xc)))
        vis = (
            (xc[:, 2] > 1)
            & (uvr[:, 0] > 0) & (uvr[:, 0] < 640)
            & (uvr[:, 1] > 0) & (uvr[:, 1] < 480)
        )
        ids = np.where(vis)[0]
        obs_kf += [k] * len(ids)
        obs_pt += ids.tolist()
        obs_uvr.append(uvr[ids] + rng.normal(0, noise, (len(ids), 3)))
    obs_uvr = np.concatenate(obs_uvr).astype(np.float32)
    O = len(obs_kf)
    n_out = int(outlier_frac * O)
    if n_out:
        sel = rng.choice(O, n_out, replace=False)
        obs_uvr[sel] += rng.uniform(30, 80, (n_out, 3))
    # cap/pad observations
    O_cap = 8192
    pad = O_cap - O
    obs_valid = np.concatenate([np.ones(O, bool), np.zeros(pad, bool)])
    obs_kf = np.concatenate([obs_kf, np.zeros(pad)]).astype(np.int32)
    obs_pt = np.concatenate([obs_pt, np.zeros(pad)]).astype(np.int32)
    obs_uvr = np.concatenate(
        [obs_uvr, np.zeros((pad, 3), np.float32)]
    )

    # perturb non-fixed poses and all points
    init_poses = gt_poses.copy()
    for k in range(1, K):
        xi = rng.normal(0, pose_perturb, 6).astype(np.float32)
        init_poses[k] = np.asarray(
            se3.exp(jnp.asarray(xi))
        ) @ init_poses[k]
    init_pts = gt_pts + rng.normal(0, point_perturb, gt_pts.shape).astype(
        np.float32
    )

    fixed = np.zeros(K, bool)
    fixed[0] = True  # gauge
    prob = local_ba.BAProblem(
        kf_pose=jnp.asarray(init_poses),
        kf_fixed=jnp.asarray(fixed),
        kf_valid=jnp.ones(K, bool),
        pt_pos=jnp.asarray(init_pts),
        pt_valid=jnp.ones(P, bool),
        obs_kf=jnp.asarray(obs_kf),
        obs_pt=jnp.asarray(obs_pt),
        obs_uvr=jnp.asarray(obs_uvr),
        obs_sigma2=jnp.ones(O_cap, jnp.float32),
        obs_is_stereo=jnp.ones(O_cap, bool),
        obs_valid=jnp.asarray(obs_valid),
    )
    mask_out = np.zeros(O_cap, bool)
    if n_out:
        mask_out[sel] = True
    return prob, gt_poses, gt_pts, mask_out


def pose_errors(est, gt):
    errs = []
    for k in range(K):
        d = np.asarray(
            se3.log(jnp.asarray(np.linalg.inv(gt[k]) @ np.asarray(est[k])))
        )
        errs.append(np.abs(d).max())
    return np.array(errs)


def test_ba_recovers_poses_and_points():
    prob, gt_poses, gt_pts, _ = make_problem(noise=0.1)
    res = local_ba.local_bundle_adjustment(prob, jnp.int32(K - 1), CAM)
    errs = pose_errors(np.asarray(res.kf_pose), gt_poses)
    init_errs = pose_errors(np.asarray(prob.kf_pose), gt_poses)
    assert errs.max() < 0.2 * init_errs.max(), (errs, init_errs)
    assert errs.max() < 5e-3, errs
    pt_err = np.linalg.norm(
        np.asarray(res.pt_pos) - gt_pts, axis=-1
    )
    # 0.1px noise at up to 30m depth bounds stereo triangulation at a
    # few cm; BA should sit at that noise floor
    assert np.median(pt_err) < 0.05, np.median(pt_err)


def test_ba_gauge_fixed_kf_unchanged():
    prob, gt_poses, _, _ = make_problem()
    res = local_ba.local_bundle_adjustment(prob, jnp.int32(1), CAM)
    np.testing.assert_allclose(
        np.asarray(res.kf_pose[0]), np.asarray(prob.kf_pose[0]), atol=1e-7
    )


def test_ba_outlier_demotion():
    prob, gt_poses, gt_pts, mask_out = make_problem(
        noise=0.1, outlier_frac=0.1
    )
    res = local_ba.local_bundle_adjustment(prob, jnp.int32(K - 1), CAM)
    inl = np.asarray(res.obs_inlier)
    # outlier observations classified out
    assert inl[mask_out].mean() < 0.05
    # poses still recovered
    errs = pose_errors(np.asarray(res.kf_pose), gt_poses)
    assert errs.max() < 1e-2, errs


def test_ba_marginal_covariance_sane():
    prob, *_ = make_problem(noise=0.1)
    res = local_ba.local_bundle_adjustment(prob, jnp.int32(K - 1), CAM)
    cov = np.asarray(res.newest_cov)
    assert np.isfinite(cov).all()
    np.testing.assert_allclose(cov, cov.T, atol=1e-8)
    ev = np.linalg.eigvalsh(cov)
    assert (ev > 0).all()
    # hundreds of stereo observations pin the pose to sub-mm/sub-mrad
    assert np.trace(cov) < 1e-3, np.trace(cov)


def _sort_pad_for_chunks(prob, o_chunk):
    """Point-sort + boundary-pad a BAProblem's observations (the layout
    ba_build.build_problem(o_chunk=...) produces)."""
    O = prob.obs_kf.shape[0]
    kf = np.asarray(prob.obs_kf)
    pt = np.asarray(prob.obs_pt)
    uvr = np.asarray(prob.obs_uvr)
    st = np.asarray(prob.obs_is_stereo)
    s2 = np.asarray(prob.obs_sigma2)
    valid = np.asarray(prob.obs_valid)
    real = np.where(valid)[0]
    order = real[np.argsort(pt[real], kind="stable")]
    out = {k: np.zeros_like(v) for k, v in
           dict(kf=kf, pt=pt, uvr=uvr, st=st, s2=s2).items()}
    ovalid = np.zeros(O, bool)
    pos = 0
    i = 0
    while i < len(order) and pos < O:
        j = i
        while j < len(order) and pt[order[j]] == pt[order[i]]:
            j += 1
        g = j - i
        room = o_chunk - (pos % o_chunk)
        if g > room and g <= o_chunk:
            # pad with copies of the previous row (invalid)
            for arr, src_arr in (("kf", kf), ("pt", pt), ("uvr", uvr),
                                 ("st", st), ("s2", s2)):
                out[arr][pos:pos + room] = src_arr[order[i - 1]]
            pos += room
        if pos + g > O:
            break
        sel = order[i:j]
        for arr, src_arr in (("kf", kf), ("pt", pt), ("uvr", uvr),
                             ("st", st), ("s2", s2)):
            out[arr][pos:pos + g] = src_arr[sel]
        ovalid[pos:pos + g] = True
        pos += g
        i = j
    out["s2"][~ovalid] = 1.0
    return prob._replace(
        obs_kf=jnp.asarray(out["kf"]),
        obs_pt=jnp.asarray(out["pt"]),
        obs_uvr=jnp.asarray(out["uvr"]),
        obs_is_stereo=jnp.asarray(out["st"]),
        obs_sigma2=jnp.asarray(out["s2"]),
        obs_valid=jnp.asarray(ovalid),
    )


def test_gba_chunked_matches_dense():
    """The chunked-Schur full-map solver (Optimizer.cc:39-271 scale
    path) must agree with the dense solver on the same problem."""
    prob, gt_poses, gt_pts, _ = make_problem(noise=0.1)
    dense = local_ba.global_bundle_adjustment(prob, CAM, iterations=8)
    sorted_prob = _sort_pad_for_chunks(prob, o_chunk=1024)
    chunked = local_ba.global_bundle_adjustment_chunked(
        prob=sorted_prob, cam=CAM, iterations=8, o_chunk=1024
    )
    # both must recover ground truth
    errs_d = pose_errors(np.asarray(dense.kf_pose), gt_poses)
    errs_c = pose_errors(np.asarray(chunked.kf_pose), gt_poses)
    assert errs_d.max() < 5e-3, errs_d
    assert errs_c.max() < 5e-3, errs_c
    # and each other (same solve, different accumulation order)
    np.testing.assert_allclose(
        np.asarray(chunked.kf_pose), np.asarray(dense.kf_pose),
        atol=2e-4,
    )
    pt_err = np.linalg.norm(np.asarray(chunked.pt_pos) - gt_pts, axis=-1)
    assert np.median(pt_err) < 0.05, np.median(pt_err)


def test_gba_stepped_matches_chunked():
    """The stepped api (begin/step/finish — one LM iteration per
    program, paced by the loop closer's poll) must produce EXACTLY the
    scan-based chunked solve: same iteration math, different program
    boundaries."""
    prob, gt_poses, _, _ = make_problem(noise=0.1)
    sorted_prob = _sort_pad_for_chunks(prob, o_chunk=1024)
    chunked = local_ba.global_bundle_adjustment_chunked(
        prob=sorted_prob, cam=CAM, iterations=8, o_chunk=1024
    )
    carry = local_ba.gba_chunked_begin(sorted_prob, CAM, o_chunk=1024)
    for _ in range(8):
        carry = local_ba.gba_chunked_step(
            carry, sorted_prob, CAM, o_chunk=1024
        )
    stepped = local_ba.gba_chunked_finish(
        carry, sorted_prob, CAM, o_chunk=1024
    )
    np.testing.assert_allclose(
        np.asarray(stepped.kf_pose), np.asarray(chunked.kf_pose),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(stepped.pt_pos), np.asarray(chunked.pt_pos),
        atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(stepped.obs_inlier), np.asarray(chunked.obs_inlier)
    )
    errs = pose_errors(np.asarray(stepped.kf_pose), gt_poses)
    assert errs.max() < 5e-3, errs


def test_gba_pcg_matches_dense():
    """The matrix-free PCG full-map solver (optim/gba_cg.py — the path
    that lifts GBA to the System's 2048-KF capacity, no K^2 buffer)
    must recover the same solution as the dense Schur solver."""
    from sivo_tpu.optim import gba_cg

    prob, gt_poses, gt_pts, _ = make_problem(noise=0.1)
    dense = local_ba.global_bundle_adjustment(prob, CAM, iterations=8)
    carry = gba_cg.gba_cg_begin(prob, CAM)
    for _ in range(8):
        carry = gba_cg.gba_cg_step(carry, prob, CAM)
    pcg = gba_cg.gba_cg_finish(carry, prob, CAM)
    errs_d = pose_errors(np.asarray(dense.kf_pose), gt_poses)
    errs_p = pose_errors(np.asarray(pcg.kf_pose), gt_poses)
    assert errs_d.max() < 5e-3, errs_d
    assert errs_p.max() < 5e-3, errs_p
    # inexact-Newton steps differ from exact Cholesky steps along the
    # way; both must land on the same optimum
    np.testing.assert_allclose(
        np.asarray(pcg.kf_pose), np.asarray(dense.kf_pose), atol=2e-3
    )
    pt_err = np.linalg.norm(np.asarray(pcg.pt_pos) - gt_pts, axis=-1)
    assert np.median(pt_err) < 0.05, np.median(pt_err)
