"""Depth fusion preprocessing + retrieval metric."""
import numpy as np

from equi_articulated_pose_tpu.data.preprocess import (
    depth_to_points,
    fuse_depth_maps,
    voxel_downsample,
)
from equi_articulated_pose_tpu.eval.retrieval import retrieval_precision


def test_depth_backprojection_roundtrip():
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    depth = np.zeros((48, 64))
    depth[24, 32] = 2.0  # principal-point pixel at depth 2
    pts = depth_to_points(depth, K)
    np.testing.assert_allclose(pts, [[0.0, 0.0, 2.0]], atol=1e-9)
    # with a camera pose
    pose = np.eye(4)
    pose[:3, 3] = [1, 2, 3]
    pts = depth_to_points(depth, K, pose)
    np.testing.assert_allclose(pts, [[1.0, 2.0, 5.0]], atol=1e-9)


def test_voxel_downsample():
    rng = np.random.RandomState(0)
    pts = rng.rand(1000, 3)
    down = voxel_downsample(pts, 0.25)
    assert len(down) <= 4 ** 3
    assert len(down) >= 40
    # every input point has a representative within a voxel diagonal
    d = np.sqrt(((pts[:, None] - down[None]) ** 2).sum(-1)).min(1)
    assert d.max() < 0.25 * np.sqrt(3)


def test_fuse_depth_maps():
    K = np.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]])
    d1 = np.full((24, 32), 1.0)
    d2 = np.full((24, 32), 1.5)
    fused = fuse_depth_maps([d1, d2], K, [np.eye(4), np.eye(4)], voxel=0.05)
    assert fused.shape[1] == 3 and len(fused) > 50


def test_retrieval_precision():
    feats = np.array([[0, 0], [0.1, 0], [5, 5], [5.1, 5]])
    labels = np.array([0, 0, 1, 1])
    assert retrieval_precision(feats, labels, n=1) == 100.0
    labels_bad = np.array([0, 1, 0, 1])
    assert retrieval_precision(feats, labels_bad, n=1) == 0.0
