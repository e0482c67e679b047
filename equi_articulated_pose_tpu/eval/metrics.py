"""Evaluation metrics (jittable).

Replaces ``SPConvNets/utils/loss_util.py`` (hungarian IoU) and
``SPConvNets/pose_utils.py`` (rotation/translation diffs).  With at most 4
parts, hungarian matching is brute-force over ≤24 permutations — fully
vectorised and jittable (no scipy in the step).
"""
from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _perms(n: int) -> np.ndarray:
    return np.asarray(list(itertools.permutations(range(n))), dtype=np.int32)


def iou_matrix(pred: jnp.ndarray, gt: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """pred: [B, S, N] soft/hard masks, gt: [B, P, N] -> IoU [B, S, P]."""
    inter = jnp.einsum("bsn,bpn->bsp", pred, gt)
    union = (
        pred.sum(-1)[:, :, None] + gt.sum(-1)[:, None, :] - inter
    )
    return inter / jnp.clip(union, eps)


def matched_seg_iou(pred_onehot: jnp.ndarray, gt_onehot: jnp.ndarray):
    """Hungarian-matched mean IoU by brute-force permutation
    (ref ``loss_util.py:29-54,69-160``).

    pred_onehot: [B, S, N], gt_onehot: [B, P, N] with P <= S.
    Returns (best mean IoU per sample [B], matching [B, P] slot index per part).
    """
    B, S, N = pred_onehot.shape
    P = gt_onehot.shape[1]
    iou = iou_matrix(pred_onehot, gt_onehot)  # [B, S, P]
    perms = jnp.asarray(_perms(S))[:, :P]     # [K, P] slot assignment per part
    # score[k, b] = mean_p iou[b, perms[k, p], p]
    gathered = iou[:, perms, jnp.arange(P)[None, :]]  # [B, K, P]
    scores = gathered.mean(-1)                         # [B, K]
    best = jnp.argmax(scores, axis=-1)                 # [B]
    best_iou = jnp.take_along_axis(scores, best[:, None], 1)[:, 0]
    matching = perms[best]                             # [B, P]
    return best_iou, matching


def rot_diff_rad(R1: jnp.ndarray, R2: jnp.ndarray, chosen_axis: str | None = None,
                 flip_axis: bool = False) -> jnp.ndarray:
    """Geodesic rotation difference (ref ``pose_utils.py:203-224``).

    chosen_axis='y': compare the rotated +y axes instead (for axial-symmetric
    categories); flip_axis allows the flipped axis too.
    """
    if chosen_axis == "y":
        y = jnp.array([0.0, 1.0, 0.0])
        a1 = jnp.einsum("...ij,j->...i", R1, y)
        a2 = jnp.einsum("...ij,j->...i", R2, y)
        d = jnp.sum(a1 * a2, axis=-1)
        if flip_axis:
            d = jnp.abs(d)
        return jnp.arccos(jnp.clip(d, -1.0, 1.0))
    tr = jnp.einsum("...ij,...ij->...", R1, R2)
    return jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0))


def rot_diff_degree(R1, R2, **kw) -> jnp.ndarray:
    """min(d, 180 - d) in degrees — the reference's symmetric-part metric."""
    d = rot_diff_rad(R1, R2, **kw) * 180.0 / jnp.pi
    return jnp.minimum(d, 180.0 - d)


def rot_diff_degree_raw(R1, R2, **kw) -> jnp.ndarray:
    return rot_diff_rad(R1, R2, **kw) * 180.0 / jnp.pi


def axis_angle_error_deg(pred_axis: jnp.ndarray, gt_axis: jnp.ndarray) -> jnp.ndarray:
    """acos(|<pred, gt>|) in degrees (ref trainer:1544-1549)."""
    p = pred_axis / jnp.clip(jnp.linalg.norm(pred_axis, axis=-1, keepdims=True), 1e-8)
    g = gt_axis / jnp.clip(jnp.linalg.norm(gt_axis, axis=-1, keepdims=True), 1e-8)
    d = jnp.abs(jnp.sum(p * g, axis=-1))
    return jnp.arccos(jnp.clip(d, -1.0, 1.0)) * 180.0 / jnp.pi


def translation_error(t1: jnp.ndarray, t2: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(t1 - t2, axis=-1)


def relative_rotation_errors(pred_R: jnp.ndarray, gt_R: jnp.ndarray) -> jnp.ndarray:
    """Part-pair relative rotation error (ref trainer:2052-2111,
    loss_util.calculate_res_relative_Rs): for parts (i, j),
    angle( pred_i pred_j^T, gt_i gt_j^T ).  pred_R/gt_R: [B, P, 3, 3] ->
    [B, P*(P-1)/2] degrees."""
    P = pred_R.shape[1]
    outs = []
    for i in range(P - 1):
        for j in range(i + 1, P):
            rel_p = jnp.einsum("bij,bkj->bik", pred_R[:, i], pred_R[:, j])
            rel_g = jnp.einsum("bij,bkj->bik", gt_R[:, i], gt_R[:, j])
            outs.append(rot_diff_degree(rel_p, rel_g))
    return jnp.stack(outs, axis=-1)
