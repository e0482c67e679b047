"""Eval-side joint axis from cross-state relative pose (round-3 metric).

The reported axis head can lag the articulation machinery (ovengt: posed rot
15.7/9.4 deg yet axis head 85 deg).  The differential relative pose
Rd = R_rel[p]·R_rel[q]ᵀ recovers the joint axis from the part poses alone —
the joint-fit-from-poses analogue of the reference's LSQ axis
(trainer_unsup_arti_align.py:2029-2106).  These tests pin (a) the GT frame
identity the metric relies on, (b) shared-drift cancellation, (c) the
ill-defined-near-zero-angle gating contract.
"""
import numpy as np

from equi_articulated_pose_tpu.data import SyntheticDataset
from equi_articulated_pose_tpu.eval.evaluator import (
    _rot_axis_sin,
    relpose_axis_errors,
)


def _axis_angle_rot(axis, deg):
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    th = np.radians(deg)
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def test_gt_differential_axis_identity_on_synthetic_samples():
    """axis(gt_R[mov]·gt_R[base]ᵀ) == part_axis on real pipeline output."""
    ds = SyntheticDataset(
        "oven", split="test", npoints=64, n_shapes=2, n_samples=4, seed=7
    )
    checked = 0
    for i in range(len(ds)):
        s = ds[i]
        gt_R = np.einsum(
            "pij,pkj->pik", s["part_state_rots"], s["part_ref_rots"]
        )
        err, ang = relpose_axis_errors(gt_R[None], gt_R[None])
        # self-comparison: exact up to f32 arccos precision (~0.03 deg)
        assert np.all(err[ang > 5.0] < 0.1)
        Rd = np.einsum("ij,kj->ik", gt_R[1], gt_R[0])
        ax, s_ang = _rot_axis_sin(Rd[None])
        gt_axis = s["part_axis"][0] / np.linalg.norm(s["part_axis"][0])
        if s_ang[0] > 0.1:  # rel angle above ~6 deg: axis well defined
            assert abs(float(np.dot(ax[0], gt_axis))) > 0.999
            checked += 1
    assert checked >= 3  # the articulation sweep must exercise the identity


def test_shared_drift_cancels_in_differential_form():
    """A shared gauge rotation on every part leaves the metric at ~0."""
    rng = np.random.RandomState(1)
    axis = np.array([0.0, 1.0, 0.0])
    B = 8
    gt, pred = [], []
    for b in range(B):
        Rj = _axis_angle_rot(axis, 20.0 + 10.0 * b)
        # shared gauge error applied first (the convention the training-side
        # differential cancels, tests/test_canon_consist.py:119-140)
        drift = _axis_angle_rot(rng.randn(3), 25.0 + 5.0 * b)
        gt.append(np.stack([np.eye(3), Rj]))
        pred.append(np.stack([drift, Rj @ drift]))
    err, ang = relpose_axis_errors(np.stack(pred), np.stack(gt))
    assert err.shape == (B,)
    assert np.all(ang > 15.0)
    assert np.all(err < 1e-3), err
    # the RAW (non-differential) per-part rel rotation stays contaminated
    raw_ax, _ = _rot_axis_sin(np.stack(pred)[:, 1])
    raw_err = np.degrees(np.arccos(np.clip(np.abs(raw_ax @ axis), 0, 1)))
    assert raw_err.mean() > 10.0

    # world-frame (left-composed) shared error only CONJUGATES the
    # differential: the axis error is bounded by the drift angle instead of
    # blending with it
    pred_l = [np.stack([d, d @ r]) for d, r in (
        (_axis_angle_rot(rng.randn(3), 20.0), _axis_angle_rot(axis, 90.0)),
    )]
    gt_l = [np.stack([np.eye(3), _axis_angle_rot(axis, 90.0)])]
    err_l, _ = relpose_axis_errors(np.stack(pred_l), np.stack(gt_l))
    assert err_l[0] <= 20.0 + 1e-3


def test_zero_relative_motion_reports_zero_angle():
    """No relative motion → angle ≈ 0 so callers weight the pair out."""
    R = np.tile(np.eye(3), (4, 2, 1, 1))
    err, ang = relpose_axis_errors(R, R)
    assert np.all(ang < 1e-3)
