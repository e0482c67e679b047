"""Classification / attention-regularisation losses.

Re-implementation of ``vgtk/vgtk/loss.py`` (CrossEntropyLoss[PerP]
:18-49, AttentionCrossEntropyLoss :51-93, MultiTaskDetectionLoss :113+) and
the purity loss of ``SPConvNets/models/common_utils.py:67``.  All jittable;
the schedule counter is passed in as ``step`` rather than mutated.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..geom.so3 import quat_to_matrix, ortho6d_to_matrix, rotation_angle


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray):
    """logits [..., C], labels [...] int -> (mean loss, accuracy)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    return nll.mean(), acc


def attention_cross_entropy(
    cls_logits: jnp.ndarray,
    cls_labels: jnp.ndarray,
    anchor_logits: jnp.ndarray,
    anchor_labels: jnp.ndarray,
    *,
    loss_type: str = "no_reg",
    margin: float = 1.0,
    step: Optional[jnp.ndarray] = None,
    pretrain_step: int = 2000,
):
    """Classification + anchor-orbit regulariser
    (ref AttentionCrossEntropyLoss).  Returns
    (loss, cls_loss, r_loss, acc, r_acc)."""
    cls_loss, acc = cross_entropy(cls_logits, cls_labels)
    r_loss, r_acc = cross_entropy(anchor_logits, anchor_labels)
    if loss_type == "schedule":
        w = jnp.clip((step if step is not None else 0) / pretrain_step, 0.0, 1.0)
        loss = w * cls_loss + (margin + 1.0 - w) * r_loss
    elif loss_type == "default":
        loss = cls_loss + margin * r_loss
    elif loss_type == "no_reg":
        loss = cls_loss
    else:
        raise NotImplementedError(loss_type)
    return loss, cls_loss, r_loss, acc, r_acc


def multitask_detection_loss(
    anchor_logits: jnp.ndarray,   # [B, A] orbit classification logits
    pose_raw: jnp.ndarray,        # [B, A, nr] per-anchor quat/ortho6d residual
    gt_R: jnp.ndarray,            # [B, 3, 3]
    gt_label: jnp.ndarray,        # [B] ground-truth anchor index
    anchors: jnp.ndarray,         # [A, 3, 3]
    w: float = 10.0,
):
    """Detection-style rotation loss (ref MultiTaskDetectionLoss): anchor
    classification + l2 on the residual rotation at the GT anchor.
    Returns (loss, cls_loss, reg_loss, angular_error_deg)."""
    cls_loss, acc = cross_entropy(anchor_logits, gt_label)
    nr = pose_raw.shape[-1]
    mapping = quat_to_matrix if nr == 4 else ortho6d_to_matrix
    R_res = mapping(pose_raw)                                  # [B, A, 3, 3]
    pred_R = jnp.einsum("aij,bajk->baik", anchors, R_res)
    sel = jnp.take_along_axis(pred_R, gt_label[:, None, None, None], axis=1)[:, 0]
    reg = jnp.mean(jnp.sum((sel - gt_R) ** 2, axis=(-1, -2)))
    ang = jnp.mean(rotation_angle(sel, gt_R)) * 180.0 / jnp.pi
    return cls_loss + w * reg, cls_loss, reg, ang


def purity_loss(attn: jnp.ndarray, eps: float = 1e-8):
    """Encourage confident (low-entropy over slots) point assignments
    (ref common_utils.py:67)."""
    p = attn / jnp.clip(attn.sum(1, keepdims=True), eps)       # [B, S, N]
    ent = -jnp.sum(p * jnp.log(jnp.clip(p, eps)), axis=1)      # [B, N]
    return ent.mean()


def ov_max_percent_loss(attn: jnp.ndarray, eps: float = 1e-8):
    """Anti-collapse occupancy regulariser: hinge on slots whose soft point
    share starves below a floor of one third of the uniform share.

    The reference carries an "encourage entropy" occupancy term commented out
    in all four model files (``tot_loss = tot_recon_loss #
    + (pts_ov_max_percent_loss) * 4.0``, e.g. unsup_..._35:1560, _38:2014).
    We expose an active analogue because the hard-argmax slot chamfer has a
    degenerate optimum — empty slots cost nothing (indicator-gated), so one
    slot swallows the cloud: observed attn_ent 0.75->0.08 with empty_slots
    0.05->0.57 and IoU 0.23->0.15 on the 3-slot eyeglasses run.  Unlike a
    max-share or entropy penalty, the starvation hinge is ZERO whenever every
    slot holds at least tau = 1/(3S) of the points, so it never pushes
    unequal-sized true parts toward equal occupancy."""
    p = attn / jnp.clip(attn.sum(1, keepdims=True), eps)       # [B, S, N]
    occ = p.mean(-1)                                           # [B, S]
    S = attn.shape[1]
    tau = 1.0 / (3.0 * S)
    return (jnp.clip(tau - occ, 0.0) / tau).sum(-1).mean()


def canon_consistency_loss(out_posed: dict, out_canon: dict) -> "jnp.ndarray":
    """Cross-articulation-state canonical consistency (round-3 axis fix).

    Both dicts are ``SlotPoseModel`` outputs for the SAME instances — one on
    the posed cloud, one on the paired canonical-state cloud (``canon_pc``;
    the reference datasets ship the same pair, MotionDataset.py).  Slots
    correspond by index (same learned queries, same slot rng).  The decoded
    canonical shape of a rigid part is a state-INVARIANT quantity: if the two
    decodes differ, the decoder is absorbing the joint motion — the
    degeneracy that leaves the predicted joint axis unconstrained
    (scripts/diag_articulation.py).  Penalises per-slot symmetric chamfer
    between the decodes plus pivot / per-slot central drift; gauge-free (both
    decodes live in the learned canonical frame), so it needs no alignment.
    """
    from ..ops.chamfer import chamfer_sq

    cp = out_posed["slot_canon"]                  # [B, S, M, 3]
    cc = out_canon["slot_canon"]
    B, S, M, _ = cp.shape
    d1, d2 = chamfer_sq(cp.reshape(B * S, M, 3), cc.reshape(B * S, M, 3))
    consist = d1.mean() + d2.mean()
    consist = consist + jnp.sum(
        (out_posed["pv_points"] - out_canon["pv_points"]) ** 2, -1
    ).mean()
    consist = consist + jnp.sum(
        (out_posed["central_points"] - out_canon["central_points"]) ** 2, -1
    ).mean()
    return consist


def axis_from_relpose_loss(
    pred_R_posed: "jnp.ndarray",   # [B, S, 3, 3]
    pred_R_canon: "jnp.ndarray",   # [B, S, 3, 3] (already stop-gradient'd)
    axis_w: "jnp.ndarray",         # [B, 3] predicted world joint axis
    base_slot: "jnp.ndarray" = None,  # [B] int — differential vs this slot
) -> "jnp.ndarray":
    """Unsupervised joint-axis target from cross-state relative pose.

    rel = R_posed R_canon^T per slot; its antisymmetric part a has
    |a| = 2 sin(theta) and direction = rotation axis, so
    sum_s |a_s|/2 * (1 - |<a_s/|a_s|, axis_w>|) penalises the predicted
    axis against every slot's relative-motion axis, weighted by how much
    that slot actually moved (ill-defined near theta=0, and the weight
    vanishes there).  The target a is detached: poses are trained by the
    chamfer/consistency terms, only the axis head follows.

    With ``base_slot``, each slot's rel is right-conjugated by the base
    slot's inverse rel: the shared component (residual global-alignment
    error between the two states, which every slot inherits) cancels and
    only the DIFFERENTIAL part motion — the joint rotation itself —
    remains.  The base slot's own entry becomes ~identity and self-gates
    through the sin weight.  (First form measured: the shared component
    dominates and pins the axis ~56 deg off — logs_r3/ovencc2, evals
    @200/@400.)
    """
    rel = jnp.einsum("bsij,bskj->bsik", pred_R_posed, pred_R_canon)
    if base_slot is not None:
        rel_b = rel[jnp.arange(rel.shape[0]), base_slot]  # [B, 3, 3]
        rel = jnp.einsum("bsij,bkj->bsik", rel, rel_b)    # rel_s rel_b^T
    a = jnp.stack(
        [
            rel[..., 2, 1] - rel[..., 1, 2],
            rel[..., 0, 2] - rel[..., 2, 0],
            rel[..., 1, 0] - rel[..., 0, 1],
        ],
        axis=-1,
    )                                                     # [B, S, 3]
    a = jax.lax.stop_gradient(a)
    n = jnp.linalg.norm(a, axis=-1)                       # 2 sin(theta)
    dirs = a / jnp.clip(n[..., None], 1e-6)
    align = jnp.abs(jnp.einsum("bsj,bj->bs", dirs, axis_w))
    return (0.5 * n * (1.0 - align)).sum(-1).mean()
