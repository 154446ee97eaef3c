"""IO tests: KITTI loader contract, trajectory chaining, map
serialization round-trip, CLI arg handling."""

import numpy as np
import pytest

from sivo_tpu.io import kitti, serialization, trajectory
from sivo_tpu.runtime.map_state import KeyFrameData, MapState


def make_kitti_dir(tmp_path, n=4, h=64, w=96):
    import cv2

    seq = tmp_path / "03"
    (seq / "image_2").mkdir(parents=True)
    (seq / "image_3").mkdir(parents=True)
    rng = np.random.default_rng(0)
    with open(seq / "times.txt", "w") as f:
        for i in range(n):
            f.write(f"{i * 0.1:.6e}\n")
    for i in range(n):
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(seq / "image_2" / f"{i:06d}.png"), img)
        cv2.imwrite(str(seq / "image_3" / f"{i:06d}.png"), img)
    return str(seq)


def test_kitti_loader(tmp_path):
    seq_dir = make_kitti_dir(tmp_path)
    seq = kitti.load_sequence(seq_dir)
    assert len(seq) == 4
    np.testing.assert_allclose(
        seq.timestamps, [0.0, 0.1, 0.2, 0.3], atol=1e-9
    )
    left, right = seq.read(2)
    assert left.shape == (64, 96, 3) and right.shape == (64, 96)
    assert left.dtype == np.float32


def test_center_crop():
    img = np.arange(100 * 120).reshape(100, 120).astype(np.float32)
    out = kitti.center_crop(img, 64, 96)
    assert out.shape == (64, 96)
    assert out[0, 0] == img[100 // 2 - 32, 120 // 2 - 48]
    with pytest.raises(ValueError):
        kitti.center_crop(img, 128, 96)


def test_chained_frame_poses():
    # frame poses chained through (corrected) keyframes
    kf_poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
    kf_poses[1][0, 3] = -1.0  # KF1 at x=+1 in world
    rel = [np.eye(4, dtype=np.float32) for _ in range(3)]
    rel[2][0, 3] = -0.5  # frame 2 half a meter past its ref KF1
    refs = [0, 1, 1]
    chained = trajectory.chained_frame_poses(rel, refs, kf_poses)
    # camera centers: 0, 1, 1.5
    centers = [-(T[:3, :3].T @ T[:3, 3])[0] for T in chained]
    np.testing.assert_allclose(centers, [0.0, 1.0, 1.5], atol=1e-6)


def _tiny_map():
    m = MapState(max_keyframes=8, max_points=64, kp_capacity=16)
    rng = np.random.default_rng(0)
    for k in range(2):
        data = KeyFrameData(
            frame_id=k,
            timestamp=0.1 * k,
            xy=rng.normal(size=(16, 2)).astype(np.float32),
            level=rng.integers(0, 8, 16).astype(np.int32),
            angle=rng.normal(size=16).astype(np.float32),
            desc_u8=rng.integers(0, 255, (16, 32)).astype(np.uint8),
            desc_bits=None,
            u_right=rng.normal(size=16).astype(np.float32),
            depth=rng.uniform(1, 10, 16).astype(np.float32),
            sem_class=rng.integers(0, 9, 16).astype(np.uint8),
            sem_confidence=rng.uniform(0, 1, 16).astype(np.float32),
            sem_entropy=rng.uniform(0, 2, 16).astype(np.float32),
            semantic=np.ones(16, bool),
        )
        m.add_keyframe(
            np.eye(4, dtype=np.float32),
            np.eye(6, dtype=np.float32) * 1e-4,
            data,
        )
    m.add_points(
        rng.normal(size=(5, 3)).astype(np.float32),
        rng.integers(0, 255, (5, 32)).astype(np.uint8),
        np.zeros(5, np.uint8),
        0,
        np.arange(5),
        np.zeros(5, np.int32),
    )
    m.add_observations(1, np.arange(3), np.arange(3))
    return m


def test_map_serialization_roundtrip(tmp_path):
    m = _tiny_map()
    path = str(tmp_path / "map.npz")
    serialization.save_map(path, m)
    m2 = serialization.load_map(path)
    assert m2.n_keyframes == m.n_keyframes
    assert m2.n_points == m.n_points
    np.testing.assert_array_equal(m2.kf_pose[:2], m.kf_pose[:2])
    np.testing.assert_array_equal(
        m2.pt_desc_u8[:5], m.pt_desc_u8[:5]
    )
    np.testing.assert_array_equal(m2.observations(), m.observations())
    np.testing.assert_array_equal(
        m2.kf_data[1].desc_u8, m.kf_data[1].desc_u8
    )
    assert m2.kf_data[1].timestamp == m.kf_data[1].timestamp
    # covisibility derived identically
    np.testing.assert_array_equal(
        m2.covisibility(0), m.covisibility(0)
    )


def test_cli_usage_error():
    from sivo_tpu import cli

    assert cli.main([]) == 1
