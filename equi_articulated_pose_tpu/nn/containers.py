"""Value containers flowing between equivariant layers.

TPU-native analog of the reference's ``SphericalPointCloud[Pose]``
(``vgtk/vgtk/spconv/base.py:4-45``) — an immutable pytree with channels-last
layout: xyz [B, N, 3], feats [B, N, A, C], pose [B, N, 4, 4] (optional).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class SpherePoints(NamedTuple):
    xyz: jnp.ndarray              # [B, N, 3]
    feats: jnp.ndarray            # [B, N, A, C]
    pose: Optional[jnp.ndarray] = None   # [B, N, 4, 4] per-point pose (or None)

    @property
    def num_anchors(self) -> int:
        return self.feats.shape[2]


def occupancy_features(xyz: jnp.ndarray, n_anchor: int) -> jnp.ndarray:
    """All-ones occupancy feature [B, N, A, 1]
    (ref ``so3conv/functional.py:50-69``)."""
    B, N, _ = xyz.shape
    return jnp.ones((B, N, n_anchor, 1), dtype=jnp.float32)


def identity_pose(B: int, N: int) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, N, 4, 4))


def preprocess_input(xyz: jnp.ndarray, n_anchor: int, pose=None) -> SpherePoints:
    """ref ``SPConvNets/utils/base_so3poseconv.py:18-23``."""
    return SpherePoints(xyz, occupancy_features(xyz, n_anchor), pose)
