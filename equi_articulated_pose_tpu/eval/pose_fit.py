"""Pose fitting utilities (Procrustes, joint least squares).

Replaces ``SPConvNets/pose_utils.py`` (weighted Procrustes :30-136) and the
least-squares joint refinement of ``SPConvNets/eval_utils.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def procrustes(
    src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray | None = None
):
    """Best-fit rigid transform (R, t) mapping src -> dst.

    src, dst: [..., N, 3]; weights: [..., N] or None.  Returns
    R [..., 3, 3], t [..., 3] with the usual SVD reflection fix.
    """
    if weights is None:
        w = jnp.ones(src.shape[:-1], src.dtype)
    else:
        w = weights
    wsum = jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1e-8)
    mu_s = jnp.sum(src * w[..., None], axis=-2) / wsum
    mu_d = jnp.sum(dst * w[..., None], axis=-2) / wsum
    cs = src - mu_s[..., None, :]
    cd = dst - mu_d[..., None, :]
    H = jnp.einsum("...ni,...n,...nj->...ij", cs, w, cd)
    u, _, vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", u, vt))
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], -1)
    # Kabsch: H = U S V^T (with H = Σ w s d^T) => R = V diag(1,1,det) U^T
    R = jnp.swapaxes(vt, -1, -2) @ (d[..., :, None] * jnp.swapaxes(u, -1, -2))
    t = mu_d - jnp.einsum("...ij,...j->...i", R, mu_s)
    return R, t


def fit_joint_axis_two_frames(R_rel: jnp.ndarray):
    """Rotation axis of a relative rotation (the joint axis estimate used by
    the LSQ eval utilities)."""
    from ..geom.so3 import matrix_to_axis_angle

    return matrix_to_axis_angle(R_rel)
