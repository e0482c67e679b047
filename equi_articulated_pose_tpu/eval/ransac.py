"""Vectorised RANSAC delta-pose fitting.

Replaces ``SPConvNets/ransac.py`` (ransac_fit_r :25-110, ransac_fit_t
:113-142): instead of a Python loop over max_iter hypotheses, draw ALL
hypothesis subsets at once and score them with one batched computation
(SURVEY.md §7(7)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geom.so3 import rotation_angle, so3_mean


def ransac_fit_r(
    Rs: jnp.ndarray,
    key: jax.Array,
    n_hyp: int = 100,
    subset: int = 5,
    inlier_deg: float = 20.0,
) -> jnp.ndarray:
    """Robust mean rotation.  Rs: [K, 3, 3] -> [3, 3].

    Hypotheses are chordal means of random subsets; the best by inlier count
    (angular error < inlier_deg) is refit on its inliers.
    """
    K = Rs.shape[0]
    idx = jax.random.randint(key, (n_hyp, subset), 0, K)
    hyp = so3_mean(Rs[idx])                                   # [H, 3, 3]
    ang = rotation_angle(hyp[:, None], Rs[None])              # [H, K]
    thresh = inlier_deg * jnp.pi / 180.0
    inl = (ang < thresh).astype(jnp.float32)                  # [H, K]
    best = jnp.argmax(inl.sum(-1))
    w = inl[best]
    w = jnp.where(w.sum() > 0, w, jnp.ones_like(w))
    return so3_mean(Rs, w)


def ransac_fit_t(
    ts: jnp.ndarray,
    key: jax.Array,
    n_hyp: int = 100,
    subset: int = 5,
    inlier_dist: float = 0.025,
) -> jnp.ndarray:
    """Robust mean translation.  ts: [K, 3] -> [3]."""
    K = ts.shape[0]
    idx = jax.random.randint(key, (n_hyp, subset), 0, K)
    hyp = jnp.mean(ts[idx], axis=1)                           # [H, 3]
    d = jnp.linalg.norm(hyp[:, None] - ts[None], axis=-1)     # [H, K]
    inl = (d < inlier_dist).astype(jnp.float32)
    best = jnp.argmax(inl.sum(-1))
    w = inl[best]
    w = jnp.where(w.sum() > 0, w, jnp.ones_like(w))
    return jnp.sum(ts * w[:, None], axis=0) / jnp.clip(w.sum(), 1e-8)
