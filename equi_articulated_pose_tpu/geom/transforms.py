"""Rigid / articulated transforms (numpy for the data engine, jax for device).

Covers the reference's ``part_transform.revoluteTransform`` (closed-form screw
matrix, ref ``SPConvNets/datasets/part_transform.py:4-71``) and misc 4x4 helpers.
"""
from __future__ import annotations

import numpy as np


def revolute_matrix_np(pivot: np.ndarray, axis: np.ndarray, theta: float) -> np.ndarray:
    """4x4 homogeneous matrix rotating by ``theta`` about the line through
    ``pivot`` with direction ``axis`` (row-vector convention is NOT used here —
    this returns the standard column-vector matrix M so that p' = M @ p_h)."""
    a = np.asarray(axis, dtype=np.float64)
    a = a / np.linalg.norm(a)
    p = np.asarray(pivot, dtype=np.float64).reshape(3)
    x, y, z = a
    c, s = np.cos(theta), np.sin(theta)
    K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
    R = np.eye(3) + s * K + (1 - c) * (K @ K)
    t = p - R @ p
    M = np.eye(4)
    M[:3, :3] = R
    M[:3, 3] = t
    return M


def revolute_transform_np(points: np.ndarray, pivot, axis, theta: float):
    """Apply a revolute (screw, zero-pitch) transform to ``points`` [N, 3].

    Returns (transformed_points [N, 3], M [4, 4]) with column-vector M.
    Matches the reference semantics (``part_transform.py``) but with the
    conventional matrix layout.
    """
    M = revolute_matrix_np(pivot, axis, theta)
    pts = np.asarray(points, dtype=np.float64)
    out = pts @ M[:3, :3].T + M[:3, 3]
    return out.astype(points.dtype, copy=False), M


def prismatic_matrix_np(axis: np.ndarray, dist: float) -> np.ndarray:
    a = np.asarray(axis, dtype=np.float64)
    a = a / np.linalg.norm(a)
    M = np.eye(4)
    M[:3, 3] = a * dist
    return M


def compose_rt_np(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    M = np.eye(4, dtype=np.float64)
    M[:3, :3] = R
    M[:3, 3] = np.asarray(t).reshape(3)
    return M


def inverse_rt_np(M: np.ndarray) -> np.ndarray:
    R = M[:3, :3]
    t = M[:3, 3]
    out = np.eye(4, dtype=M.dtype)
    out[:3, :3] = R.T
    out[:3, 3] = -R.T @ t
    return out


# --------------------------------------------------------------------------
# JAX versions
# --------------------------------------------------------------------------
import jax.numpy as jnp


def apply_rt(points: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """points (..., N, 3), R (..., 3, 3), t (..., 3) -> (..., N, 3)."""
    return jnp.einsum("...ij,...nj->...ni", R, points) + t[..., None, :]


def apply_inverse_rt(points: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ji,...nj->...ni", R, points - t[..., None, :])
