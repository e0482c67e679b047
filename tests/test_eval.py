"""Eval stack tests: metrics, RANSAC, Procrustes, and the two-pass evaluator
on synthetic data with a tiny model."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from equi_articulated_pose_tpu.eval import (
    Evaluator,
    axis_angle_error_deg,
    matched_seg_iou,
    procrustes,
    ransac_fit_r,
    ransac_fit_t,
    relative_rotation_errors,
    rot_diff_degree,
)
from equi_articulated_pose_tpu.geom import so3


def test_matched_seg_iou_perfect_and_permuted():
    B, S, N = 2, 3, 30
    labels = np.random.RandomState(0).randint(0, 3, (B, N))
    gt = jax.nn.one_hot(jnp.asarray(labels), 3).transpose(0, 2, 1)
    # predicted = permuted gt
    perm = np.array([2, 0, 1])
    pred = gt[:, perm]
    iou, matching = matched_seg_iou(pred, gt)
    np.testing.assert_allclose(np.asarray(iou), 1.0, atol=1e-6)
    # matching[b, p] = slot index assigned to part p: inverse of perm
    np.testing.assert_array_equal(np.asarray(matching)[0], np.argsort(perm))


def test_rot_diff_degree():
    R = jnp.asarray(so3.ANCHORS[5])
    d = rot_diff_degree(R[None], R[None])
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-3)
    Rz = so3.axis_angle_to_matrix(jnp.array([0.0, 0.0, 1.0]), jnp.array(np.pi / 6))
    d = rot_diff_degree(Rz[None], jnp.eye(3)[None])
    np.testing.assert_allclose(np.asarray(d), 30.0, atol=1e-3)
    # symmetric fold: 170 deg -> reported as 10
    Rb = so3.axis_angle_to_matrix(jnp.array([0.0, 0.0, 1.0]), jnp.array(np.deg2rad(170)))
    d = rot_diff_degree(Rb[None], jnp.eye(3)[None])
    np.testing.assert_allclose(np.asarray(d), 10.0, atol=1e-3)


def test_axis_error_sign_invariant():
    a = jnp.array([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(axis_angle_error_deg(a, -a)), 0.0, atol=1e-4)


def test_ransac_r_rejects_outliers():
    key = jax.random.PRNGKey(0)
    R_true = so3.ANCHORS[7]
    # 40 inliers with small noise + 10 outliers
    noise = so3.random_rotation(jax.random.PRNGKey(1), (40,))
    small = so3.axis_angle_to_matrix(
        jax.random.normal(jax.random.PRNGKey(2), (40, 3)),
        jax.random.uniform(jax.random.PRNGKey(3), (40,), maxval=0.05),
    )
    inliers = jnp.einsum("ij,njk->nik", jnp.asarray(R_true), small)
    outliers = so3.random_rotation(jax.random.PRNGKey(4), (10,))
    Rs = jnp.concatenate([inliers, outliers])
    fit = ransac_fit_r(Rs, key)
    err = rot_diff_degree(fit[None], jnp.asarray(R_true)[None])
    assert float(err[0]) < 5.0


def test_ransac_t():
    key = jax.random.PRNGKey(5)
    t_true = jnp.array([0.1, -0.2, 0.3])
    inl = t_true + 0.01 * jax.random.normal(jax.random.PRNGKey(6), (40, 3))
    out = 5.0 * jax.random.normal(jax.random.PRNGKey(7), (8, 3))
    fit = ransac_fit_t(jnp.concatenate([inl, out]), key)
    assert float(jnp.linalg.norm(fit - t_true)) < 0.02


def test_procrustes():
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(50, 3).astype(np.float32))
    R = jnp.asarray(so3.ANCHORS[13])
    t = jnp.array([0.3, -0.1, 0.2])
    dst = src @ R.T + t
    R_fit, t_fit = procrustes(src, dst)
    np.testing.assert_allclose(np.asarray(R_fit), np.asarray(R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_fit), np.asarray(t), atol=1e-4)
    # weighted: outlier ignored
    dst_o = dst.at[0].set(99.0)
    w = jnp.ones(50).at[0].set(0.0)
    R_fit, t_fit = procrustes(src, dst_o, w)
    np.testing.assert_allclose(np.asarray(R_fit), np.asarray(R), atol=1e-4)


def test_relative_rotation_errors_shape():
    R = so3.random_rotation(jax.random.PRNGKey(8), (2, 3))
    out = relative_rotation_errors(R, R)
    assert out.shape == (2, 3)
    # arccos is ill-conditioned at 1: float32 trace error -> ~0.05 deg
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=0.1)


def test_two_pass_evaluator_runs():
    from equi_articulated_pose_tpu.config import get_config
    from equi_articulated_pose_tpu.data import DataLoader, build_dataset
    from equi_articulated_pose_tpu.models import SlotPoseModel

    cfg = get_config("tiny")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset_type="synthetic", n_samples=4, npoints=cfg.model.input_num
        ),
        train=dataclasses.replace(cfg.train, batch_size=2),
    )
    model = SlotPoseModel(cfg=cfg.model)
    xyz = jnp.zeros((1, cfg.model.input_num, 3))
    params = model.init(jax.random.PRNGKey(0), xyz, jax.random.PRNGKey(1))
    ev = Evaluator(cfg, model, params)

    canon = build_dataset(cfg.data, split="train", canonical_input=True, n_shapes=2)
    deltas = ev.fit_deltas(
        DataLoader(canon, 2, shuffle=False, prefetch=0), jax.random.PRNGKey(2),
        max_batches=2,
    )
    assert deltas[0].shape == (2, 3, 3) and deltas[1].shape == (2, 3)

    test_ds = build_dataset(cfg.data, split="test", n_shapes=2)
    metrics = ev.evaluate(
        DataLoader(test_ds, 2, shuffle=False, prefetch=0), deltas, max_batches=2
    )
    for k in (
        "seg_iou",
        "rot_err_deg_part0_mean",
        "rot_err_deg_part1_median",
        "trans_err_part1_mean",
        "axis_err_deg_mean",
        "chamfer_l1",
        "rel_rot_err_deg_pair0_mean",
    ):
        assert k in metrics and np.isfinite(metrics[k]), k
    assert 0.0 <= metrics["seg_iou"] <= 1.0


def test_two_pass_evaluator_teacher_forced_gt_labels():
    """--force-gt-labels at eval: the model is teacher-forced to the GT
    partition, so matched seg IoU must be exactly 1 and the pipeline still
    produces finite pose metrics (the pose-given-perfect-seg diagnostic)."""
    from equi_articulated_pose_tpu.config import get_config
    from equi_articulated_pose_tpu.data import DataLoader, build_dataset
    from equi_articulated_pose_tpu.models import SlotPoseModel

    cfg = get_config("tiny")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, force_gt_labels=True),
        data=dataclasses.replace(
            cfg.data, dataset_type="synthetic", n_samples=4,
            npoints=cfg.model.input_num,
        ),
        train=dataclasses.replace(cfg.train, batch_size=2),
    )
    model = SlotPoseModel(cfg=cfg.model)
    xyz = jnp.zeros((1, cfg.model.input_num, 3))
    params = model.init(jax.random.PRNGKey(0), xyz, jax.random.PRNGKey(1))
    ev = Evaluator(cfg, model, params)

    test_ds = build_dataset(cfg.data, split="test", n_shapes=2)
    metrics = ev.evaluate(
        DataLoader(test_ds, 2, shuffle=False, prefetch=0), None, max_batches=2
    )
    np.testing.assert_allclose(metrics["seg_iou"], 1.0, atol=1e-5)
    assert np.isfinite(metrics["rot_err_deg_part0_mean"])
    assert np.isfinite(metrics["rot_err_deg_part1_mean"])


def test_axis_projected_rotation_error_spin_invariant():
    """rot_axproj semantics (evaluator): error of the predicted rotation
    acting on the GT joint axis.  A prediction equal to GT composed with an
    arbitrary spin ABOUT the axis must score ~0 while the raw geodesic error
    is large — the symmetry-ambiguity case (safe door) the metric exists for.
    """
    rng = np.random.RandomState(3)
    ax = rng.randn(3); ax /= np.linalg.norm(ax)
    gt = np.asarray(so3.axis_angle_to_matrix(jnp.asarray(ax), jnp.asarray(0.7)))
    spin = np.asarray(
        so3.axis_angle_to_matrix(jnp.asarray(ax), jnp.asarray(1.0))
    )
    pred = gt @ spin                       # spin about the axis FIRST
    # the evaluator's formula: a_mesh = gt^T axis_world; carried = pred a_mesh
    a_mesh = gt.T @ ax
    carried = pred @ a_mesh
    err = np.degrees(np.arccos(np.clip(np.dot(carried, ax), -1, 1)))
    raw = float(rot_diff_degree(jnp.asarray(pred)[None], jnp.asarray(gt)[None])[0])
    assert err < 0.1  # f32 trig noise only
    # rot_diff_degree folds to min(d, 180-d); a 1-rad spin reads 57.3 deg
    assert raw > 45.0
