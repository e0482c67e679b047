"""Property tests for the icosahedral rotation group (SURVEY.md §4 test plan:
closure, inverse, trace-idx permutation consistency — formalising the
reference's commented-out probes in rotation.py:316-341)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from equi_articulated_pose_tpu.geom import so3


def test_group_size_and_orthogonality():
    R = so3.ANCHORS
    assert R.shape == (60, 3, 3)
    eye = np.einsum("aij,akj->aik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (60, 1, 1)), atol=1e-5)
    dets = np.linalg.det(R)
    np.testing.assert_allclose(dets, 1.0, atol=1e-5)


def test_identity_first():
    np.testing.assert_allclose(so3.ANCHORS[so3.IDENTITY_IDX], np.eye(3), atol=1e-6)


def test_closure_and_unique():
    R = so3.ANCHORS.astype(np.float64)
    # every pairwise product is in the group
    prods = np.einsum("iab,jbc->ijac", R, R)
    tr = np.einsum("ijab,kab->ijk", prods, R)
    best = tr.max(-1)
    assert best.min() > 3 - 1e-4
    # elements are distinct
    cross = np.einsum("iab,jab->ij", R, R)
    np.fill_diagonal(cross, -1)
    assert cross.max() < 3 - 1e-3


def test_inverse_table():
    R = so3.ANCHORS.astype(np.float64)
    inv = so3.INV_IDX
    for i in range(60):
        np.testing.assert_allclose(R[inv[i]], R[i].T, atol=1e-5)


def test_prod_table_is_group_op():
    R = so3.ANCHORS.astype(np.float64)
    P = so3.PROD_IDX
    idx = np.random.RandomState(0).randint(0, 60, size=(20, 2))
    for i, j in idx:
        np.testing.assert_allclose(R[P[i, j]], R[i] @ R[j], atol=1e-5)


def test_trace_idx_left_equivariance():
    """trace_idx[π_g(a), k] == π_g(trace_idx[a, k]) where π_g(a)=idx(R_g R_a).

    This is the property intra-conv needs for equivariance: the gather table
    commutes with the left group action on anchors.
    """
    P = so3.PROD_IDX  # π_g(a) = P[g, a]
    T = so3.TRACE_IDX
    for g in [1, 7, 23, 59]:
        left = T[P[g]]          # [60, 12] : T[π_g(a), k]
        right = P[g][T]         # [60, 12] : π_g(T[a, k])
        np.testing.assert_array_equal(left, right)


def test_trace_idx_rel_rotations_are_72deg():
    R = so3.ANCHORS.astype(np.float64)
    rel = R[so3.REL12_IDX]
    tr = np.einsum("kii->k", rel)
    golden = (1 + 5 ** 0.5) / 2
    np.testing.assert_allclose(tr, golden, atol=1e-5)
    # inverse-closed support set
    inv_set = {so3.INV_IDX[i] for i in so3.REL12_IDX}
    assert inv_set == set(so3.REL12_IDX.tolist())


def test_anchor_subsets():
    for k in (1, 20, 40, 60):
        a = so3.get_anchors(k)
        assert a.shape == (k, 3, 3)


def test_quat_ortho6d_roundtrip():
    key = jax.random.PRNGKey(0)
    R = so3.random_rotation(key, (32,))
    eye = jnp.einsum("aij,akj->aik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    o6 = jnp.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)
    R2 = so3.ortho6d_to_matrix(o6)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_axis_angle_roundtrip():
    key = jax.random.PRNGKey(1)
    axis = jax.random.normal(key, (16, 3))
    angle = jax.random.uniform(jax.random.PRNGKey(2), (16,), minval=0.1, maxval=3.0)
    R = so3.axis_angle_to_matrix(axis, angle)
    ax2, ang2 = so3.matrix_to_axis_angle(R)
    axn = axis / np.linalg.norm(np.asarray(axis), axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(ang2), np.asarray(angle), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ax2), axn, atol=1e-3)


def test_so3_mean_recovers_common_rotation():
    key = jax.random.PRNGKey(3)
    R = so3.random_rotation(key, (4,))
    stack = jnp.repeat(R[:, None], 5, axis=1)
    mean = so3.so3_mean(stack)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(R), atol=1e-5)


def test_nearest_anchor():
    R = so3.ANCHORS
    idx = so3.nearest_anchor_idx(jnp.asarray(R), jnp.asarray(R))
    np.testing.assert_array_equal(np.asarray(idx), np.arange(60))


def test_revolute_transform():
    from equi_articulated_pose_tpu.geom import transforms as tf

    pts = np.random.RandomState(0).randn(100, 3)
    pivot = np.array([1.0, 0.5, -0.2])
    axis = np.array([0.0, 1.0, 0.0])
    out, M = tf.revolute_transform_np(pts, pivot, axis, np.pi / 2)
    # pivot is a fixed point
    pv2 = M[:3, :3] @ pivot + M[:3, 3]
    np.testing.assert_allclose(pv2, pivot, atol=1e-9)
    # distances to the axis line are preserved
    def dist_to_axis(p):
        rel = p - pivot
        return np.linalg.norm(rel - np.outer(rel @ axis, axis), axis=-1)

    np.testing.assert_allclose(dist_to_axis(out), dist_to_axis(pts), atol=1e-9)
    # inverse works
    Minv = tf.inverse_rt_np(M)
    back = out @ Minv[:3, :3].T + Minv[:3, 3]
    np.testing.assert_allclose(back, pts, atol=1e-9)
