"""Least-squares joint estimation (ref ``SPConvNets/eval_utils.py``, S19).

The reference minimises Rodrigues-parameterised objectives with scipy for
axis-constrained two-part refinement.  Both quantities have closed-form
least-squares solutions, used here instead:

* common joint AXIS across K relative rotations: R_k a = a for all k, so a is
  the smallest-eigenvalue eigenvector of Σ (R_k - I)^T (R_k - I);
* joint PIVOT for a revolute joint: (R_k - I) p + t_k = 0, a linear system
  solved by normal equations (rank-deficient along the axis — regularised).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def fit_common_axis(R_rels: jnp.ndarray) -> jnp.ndarray:
    """R_rels [K, 3, 3] -> unit axis [3] shared by all relative rotations."""
    eye = jnp.eye(3, dtype=R_rels.dtype)
    D = R_rels - eye
    M = jnp.einsum("kji,kjl->il", D, D)  # Σ D^T D
    _, vecs = jnp.linalg.eigh(M)
    axis = vecs[:, 0]
    # canonical sign: align with the mean skew axis
    skew = jnp.stack(
        [
            R_rels[:, 2, 1] - R_rels[:, 1, 2],
            R_rels[:, 0, 2] - R_rels[:, 2, 0],
            R_rels[:, 1, 0] - R_rels[:, 0, 1],
        ],
        -1,
    ).mean(0)
    sign = jnp.where(jnp.dot(axis, skew) < 0, -1.0, 1.0)
    return axis * sign


def fit_pivot(R_rels: jnp.ndarray, t_rels: jnp.ndarray, reg: float = 1e-6):
    """R_rels [K, 3, 3], t_rels [K, 3] -> pivot [3] minimising
    Σ ||(R_k - I) p + t_k||^2 (regularised along the joint axis where the
    system is rank deficient)."""
    eye = jnp.eye(3, dtype=R_rels.dtype)
    D = R_rels - eye                                # [K, 3, 3]
    A = jnp.einsum("kji,kjl->il", D, D) + reg * eye
    b = -jnp.einsum("kji,kj->i", D, t_rels)
    return jnp.linalg.solve(A, b)


def refine_two_part_joint(
    pred_R: jnp.ndarray,  # [K, P, 3, 3] per-sample per-part rotations
    pred_T: jnp.ndarray,  # [K, P, 3]
    base: int = 0,
    moving: int = 1,
):
    """Axis-constrained two-part refinement over a set of observations
    (the reference's objective_eval use-case): estimate the shared joint
    axis and pivot from the relative motion of ``moving`` w.r.t. ``base``.

    Returns (axis [3], pivot [3], per-sample joint angles [K]).
    """
    rel_R = jnp.einsum("kji,kjl->kil", pred_R[:, base], pred_R[:, moving])
    rel_t = jnp.einsum(
        "kji,kj->ki", pred_R[:, base], pred_T[:, moving] - pred_T[:, base]
    )
    axis = fit_common_axis(rel_R)
    pivot = fit_pivot(rel_R, rel_t)
    # per-sample angle about the fitted axis
    from ..geom.so3 import matrix_to_axis_angle

    ax_k, ang_k = matrix_to_axis_angle(rel_R)
    sign = jnp.sign(jnp.einsum("ki,i->k", ax_k, axis))
    return axis, pivot, ang_k * sign
