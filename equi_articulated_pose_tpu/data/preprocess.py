"""Scan preprocessing tools (ref ``SPConvNets/datasets/preprocess/`` S23):
depth-map back-projection, multi-view fusion, voxel downsampling — the
pipeline that produces HOI4D-style ``*_down_pts.npy`` per-part clouds.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def depth_to_points(
    depth: np.ndarray,           # [H, W] metric depth, 0 = invalid
    intrinsics: np.ndarray,      # [3, 3] pinhole K
    pose: Optional[np.ndarray] = None,  # [4, 4] camera-to-world
    max_depth: float = 10.0,
) -> np.ndarray:
    """Back-project a depth map to world-frame points [M, 3]."""
    H, W = depth.shape
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    z = depth.reshape(-1)
    valid = (z > 0) & (z < max_depth)
    u = u.reshape(-1)[valid]
    v = v.reshape(-1)[valid]
    z = z[valid]
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    pts = np.stack([x, y, z], -1)
    if pose is not None:
        pts = pts @ pose[:3, :3].T + pose[:3, 3]
    return pts


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray:
    """Keep one (mean) point per occupied voxel."""
    keys = np.floor(points / voxel).astype(np.int64)
    # lexicographic unique
    _, inv = np.unique(keys, axis=0, return_inverse=True)
    order = np.argsort(inv, kind="stable")
    inv_sorted = inv[order]
    pts_sorted = points[order]
    boundaries = np.flatnonzero(np.diff(inv_sorted)) + 1
    groups = np.split(pts_sorted, boundaries)
    return np.stack([g.mean(0) for g in groups])


def fuse_depth_maps(
    depths: Sequence[np.ndarray],
    intrinsics: np.ndarray,
    poses: Sequence[np.ndarray],
    voxel: float = 0.01,
) -> np.ndarray:
    """Multi-view depth fusion: back-project each view, merge, voxel
    downsample (the reference's run_fusion pipeline without the open3d
    dependency)."""
    clouds = [depth_to_points(d, intrinsics, p) for d, p in zip(depths, poses)]
    merged = np.concatenate([c for c in clouds if len(c)], axis=0)
    return voxel_downsample(merged, voxel)
