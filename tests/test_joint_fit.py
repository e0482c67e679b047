"""Closed-form least-squares joint fitting (replaces scipy objectives)."""
import numpy as np
import jax
import jax.numpy as jnp

from equi_articulated_pose_tpu.eval.joint_fit import (
    fit_common_axis,
    fit_pivot,
    refine_two_part_joint,
)
from equi_articulated_pose_tpu.geom import so3
from equi_articulated_pose_tpu.geom.transforms import revolute_matrix_np


def _rels(axis, pivot, angles):
    Ms = [revolute_matrix_np(pivot, axis, a) for a in angles]
    R = jnp.asarray(np.stack([M[:3, :3] for M in Ms]).astype(np.float32))
    t = jnp.asarray(np.stack([M[:3, 3] for M in Ms]).astype(np.float32))
    return R, t


def test_fit_common_axis_and_pivot():
    axis = np.array([0.3, 0.9, 0.1])
    axis /= np.linalg.norm(axis)
    pivot = np.array([0.2, -0.1, 0.4])
    angles = np.linspace(0.3, 1.4, 8)
    R, t = _rels(axis, pivot, angles)
    ax = np.asarray(fit_common_axis(R))
    assert abs(np.dot(ax, axis)) > 0.9999
    pv = np.asarray(fit_pivot(R, t))
    # pivot is identified up to translation along the axis
    perp = (pv - pivot) - np.dot(pv - pivot, axis) * axis
    np.testing.assert_allclose(perp, 0.0, atol=1e-4)


def test_refine_two_part_joint():
    axis = np.array([0.0, 1.0, 0.0])
    pivot = np.array([0.5, 0.0, 0.0])
    angles = np.array([0.2, 0.5, 0.9, 1.3], dtype=np.float64)
    relR, relt = _rels(axis, pivot, angles)
    K = len(angles)
    base_R = jnp.asarray(so3.random_rotation(jax.random.PRNGKey(0), (K,)))
    base_T = jnp.asarray(np.random.RandomState(0).randn(K, 3).astype(np.float32))
    # moving-part pose = base ∘ rel
    mov_R = jnp.einsum("kij,kjl->kil", base_R, relR)
    mov_T = jnp.einsum("kij,kj->ki", base_R, relt) + base_T
    pred_R = jnp.stack([base_R, mov_R], axis=1)
    pred_T = jnp.stack([base_T, mov_T], axis=1)
    ax, pv, angs = refine_two_part_joint(pred_R, pred_T)
    assert abs(float(jnp.dot(ax, jnp.asarray(axis)))) > 0.999
    np.testing.assert_allclose(np.abs(np.asarray(angs)), angles, atol=1e-3)
