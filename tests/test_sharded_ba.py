"""Sharded BA on the virtual 8-device CPU mesh: parity with the
single-device solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sivo_tpu.optim import local_ba
from sivo_tpu.parallel import sharded_ba
from tests.test_local_ba import CAM, K, P, make_problem, pose_errors


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8
    return Mesh(np.array(devs[:8]), ("ba",))


def test_sharded_matches_single_device(mesh):
    prob, gt_poses, gt_pts, _ = make_problem(noise=0.1)
    part = sharded_ba.partition_problem(prob, 8)
    res_sh = sharded_ba.sharded_bundle_adjustment(
        part, CAM, mesh, iterations=10, use_huber=False
    )
    res_one = local_ba.global_bundle_adjustment(
        prob, CAM, iterations=10
    )
    errs_sh = pose_errors(np.asarray(res_sh.kf_pose), gt_poses)
    errs_one = pose_errors(np.asarray(res_one.kf_pose), gt_poses)
    # both converge to the optimum within noise
    assert errs_sh.max() < 5e-3, errs_sh
    assert abs(errs_sh.max() - errs_one.max()) < 2e-3
    pt_err = np.linalg.norm(np.asarray(res_sh.pt_pos) - gt_pts, axis=-1)
    assert np.median(pt_err) < 0.1


def test_partition_keeps_all_observations(mesh):
    prob, *_ = make_problem()
    part = sharded_ba.partition_problem(prob, 8)
    # nearly all observations kept (shard-boundary straddlers are
    # dropped by the static partitioning; inherently a few percent)
    assert int(jnp.sum(part.obs_valid)) >= int(
        jnp.sum(prob.obs_valid)
    ) * 0.95
    # each obs references a point in its shard
    shard_of_pt = np.asarray(part.obs_pt) // (P // 8)
    shard_of_obs = np.repeat(
        np.arange(8), part.obs_kf.shape[0] // 8
    )
    valid = np.asarray(part.obs_valid)
    np.testing.assert_array_equal(
        shard_of_pt[valid], shard_of_obs[valid]
    )
