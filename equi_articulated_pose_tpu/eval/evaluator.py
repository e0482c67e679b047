"""Two-pass evaluation protocol.

Re-implementation of the reference eval (``trainer_unsup_arti_align.py:
1163-2259``; SURVEY.md §3.3):

Pass 1 — run the model on CANONICAL-state inputs from the train split and fit
per-part delta corrections (RANSAC robust means of the predicted world-frame
rotations / bbox-centred translations).  The deltas absorb the
self-supervised model's arbitrary-but-consistent gauge.

Pass 2 — run on the posed test split, hungarian-match slots to GT parts by
IoU, compose the (optional) stage-0 global pose with per-slot poses, apply
the deltas, and report per-part rotation (deg) / translation errors,
segmentation IoU, joint-axis angular error, pivot offset error, part-pair
relative rotation error, chamfer-L1.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import DataLoader, build_dataset
from ..models import GlobalAlignModel, SlotPoseModel
from ..ops.chamfer import chamfer_l1
from .metrics import (
    axis_angle_error_deg,
    matched_seg_iou,
    relative_rotation_errors,
    rot_diff_degree,
)
from .ransac import ransac_fit_r, ransac_fit_t


def _bbox_center(pts, axis=-2):
    return (pts.min(axis=axis) + pts.max(axis=axis)) / 2.0


class Evaluator:
    def __init__(
        self,
        cfg: Config,
        model: SlotPoseModel,
        params,
        glb_model: Optional[GlobalAlignModel] = None,
        glb_params=None,
    ):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.glb_model = glb_model
        self.glb_params = glb_params
        self._fwd = jax.jit(self._forward)

    # ------------------------------------------------------------------
    def _forward_full_iou(self, params, xyz, gt_label, oorr_pc, oorr_label,
                          num_parts: int | None = None):
        """Full-resolution (4096-pt) segmentation IoU: transfer predicted
        labels to the dense cloud by nearest neighbour (the reference's
        full-point IoU variant, trainer:2180-2210)."""
        from ..ops.sampling import pairwise_sqdist

        out = self._forward(params, xyz, gt_label, num_parts)
        d2 = pairwise_sqdist(oorr_pc, xyz)                 # [B, No, N]
        nn = jnp.argmin(d2, axis=-1)
        full_pred = jnp.take_along_axis(out["labels"], nn, axis=1)  # [B, No]
        S = self.cfg.model.nmasks
        P = self.cfg.model.nmasks if num_parts is None else num_parts
        pred_oh = jax.nn.one_hot(full_pred, S).transpose(0, 2, 1)
        gt_oh = jax.nn.one_hot(oorr_label, P).transpose(0, 2, 1)
        iou_full, _ = matched_seg_iou(pred_oh, gt_oh)
        out["iou_full"] = iou_full
        return out

    def _forward(self, params, xyz, gt_label, num_parts: int | None = None):
        """Run (glb ∘ slot) model; match slots to GT; emit world-frame poses.

        xyz [B, N, 3]; gt_label [B, N] int.
        """
        P = self.cfg.model.nmasks if num_parts is None else num_parts
        glb_R = jnp.broadcast_to(jnp.eye(3), (xyz.shape[0], 3, 3))
        glb_T = jnp.zeros((xyz.shape[0], 3))
        x_in = xyz
        if self.glb_params is not None:
            g = self.glb_model.apply(self.glb_params, xyz)
            glb_R, glb_T = g["glb_R"], g["glb_T"]
            x_in = g["inv_pts"]
        loss, out = self.model.apply(params, x_in, None)

        S = out["attn"].shape[1]
        pred_onehot = jax.nn.one_hot(out["hard_labels"], S).transpose(0, 2, 1)
        gt_onehot = jax.nn.one_hot(gt_label, P).transpose(0, 2, 1)
        iou, matching = matched_seg_iou(pred_onehot, gt_onehot)  # [B], [B, P]

        # world-frame per-slot poses: x_world = glb_R (R_s c + T_s) + glb_T
        R_w = jnp.einsum("bij,bsjk->bsik", glb_R, out["pred_R"])
        T_w = jnp.einsum("bij,bsj->bsi", glb_R, out["pred_T"]) + glb_T[:, None]
        tp_w = (
            jnp.einsum("bij,bsmj->bsmi", glb_R, out["transformed_pts"])
            + glb_T[:, None, None]
        )
        axis_w = jnp.einsum("bij,bj->bi", glb_R, out["real_defined_axis"])

        # match slots to parts
        mi = matching[..., None]
        R_m = jnp.take_along_axis(R_w, mi[..., None], axis=1)       # [B, P, 3, 3]
        T_m = jnp.take_along_axis(T_w, mi, axis=1)                  # [B, P, 3]
        tp_m = jnp.take_along_axis(tp_w, mi[..., None], axis=1)     # [B, P, M, 3]
        real_pred_T = T_m - _bbox_center(tp_m)                      # bbox-centred

        # whole-shape chamfer L1 between union recon and input (world frame)
        B, S_, M, _ = tp_w.shape
        union = tp_w.reshape(B, S_ * M, 3)
        cl1 = chamfer_l1(union, xyz)

        return {
            "iou": iou,
            "R_pred": R_m,
            "real_pred_T": real_pred_T,
            "axis_pred": axis_w,
            "labels": out["hard_labels"],
            "chamfer_l1": cl1,
            "pv_points": out["pv_points"],
        }

    # ------------------------------------------------------------------
    def fit_deltas(self, canon_loader: DataLoader, key, max_batches: int = 50):
        """Pass 1: RANSAC delta rotations/translations from canonical runs."""
        Rs, Ts = [], []
        for i, batch in enumerate(canon_loader):
            if i >= max_batches:
                break
            out = self._fwd(
                self.params,
                jnp.asarray(batch["pc"]),
                jnp.asarray(batch["label"]),
            )
            Rs.append(np.asarray(out["R_pred"]))
            ref_T = np.asarray(batch["part_ref_trans_bbox"])
            Ts.append(np.asarray(out["real_pred_T"]) - ref_T)
        R_all = np.concatenate(Rs, 0)   # [K, P, 3, 3]
        T_all = np.concatenate(Ts, 0)   # [K, P, 3]
        P = R_all.shape[1]
        delta_r, delta_t = [], []
        for p in range(P):
            kr, kt = jax.random.split(jax.random.fold_in(key, p))
            delta_r.append(np.asarray(ransac_fit_r(jnp.asarray(R_all[:, p]), kr)))
            delta_t.append(np.asarray(ransac_fit_t(jnp.asarray(T_all[:, p]), kt)))
        return np.stack(delta_r), np.stack(delta_t)

    # ------------------------------------------------------------------
    def evaluate(
        self,
        test_loader: DataLoader,
        deltas=None,
        max_batches: int = 100,
    ) -> Dict[str, float]:
        """Pass 2: delta-corrected per-part metrics on the posed test split."""
        per_rot, per_trans, per_axis, per_iou, per_cl1 = [], [], [], [], []
        per_relrot, per_pv, per_iou_full = [], [], []
        fwd_full = jax.jit(self._forward_full_iou)
        for i, batch in enumerate(test_loader):
            if i >= max_batches:
                break
            out = fwd_full(
                self.params,
                jnp.asarray(batch["pc"]),
                jnp.asarray(batch["label"]),
                jnp.asarray(batch["oorr_pc"]),
                jnp.asarray(batch["oorr_label"]),
            )
            per_iou_full.append(np.asarray(out["iou_full"]))
            R_pred = np.asarray(out["R_pred"])          # [B, P, 3, 3]
            if deltas is not None:
                dR, dT = deltas
                R_pred = np.einsum("bpij,pkj->bpik", R_pred, dR)
            gt_R = np.einsum(
                "bpij,bpkj->bpik",
                np.asarray(batch["part_state_rots"]),
                np.asarray(batch["part_ref_rots"]),
            )
            rd = np.asarray(
                rot_diff_degree(jnp.asarray(R_pred), jnp.asarray(gt_R))
            )                                            # [B, P]
            per_rot.append(rd)

            t_pred = np.asarray(out["real_pred_T"])
            if deltas is not None:
                t_pred = t_pred - deltas[1][None]
            t_gt = np.asarray(batch["part_state_trans_bbox"])
            per_trans.append(np.linalg.norm(t_pred - t_gt, axis=-1))

            # joint axis: compare against the first moving part's GT axis
            gt_axis = np.asarray(batch["part_axis"])[:, 0]
            per_axis.append(
                np.asarray(
                    axis_angle_error_deg(out["axis_pred"], jnp.asarray(gt_axis))
                )
            )
            per_iou.append(np.asarray(out["iou"]))
            per_cl1.append(np.asarray(out["chamfer_l1"]))
            per_relrot.append(
                np.asarray(
                    relative_rotation_errors(jnp.asarray(R_pred), jnp.asarray(gt_R))
                )
            )
            gt_pv_off = np.asarray(batch["part_pv_offset"])[:, 0]
            pv_w = np.asarray(out["pv_points"])[:, min(1, out["pv_points"].shape[1] - 1)]
            ax = np.asarray(out["axis_pred"])
            pv_perp = pv_w - (pv_w * ax).sum(-1, keepdims=True) * ax
            per_pv.append(np.abs(np.linalg.norm(pv_perp, axis=-1) - gt_pv_off))

        rot = np.concatenate(per_rot, 0)
        trans = np.concatenate(per_trans, 0)
        axis = np.concatenate(per_axis, 0)
        relrot = np.concatenate(per_relrot, 0)
        metrics = {
            "seg_iou": float(np.mean(np.concatenate(per_iou))),
            "seg_iou_full": float(np.mean(np.concatenate(per_iou_full))),
            "chamfer_l1": float(np.mean(np.concatenate(per_cl1))),
            "axis_err_deg_mean": float(np.mean(axis)),
            "axis_err_deg_median": float(np.median(axis)),
            "pv_offset_err_mean": float(np.mean(np.concatenate(per_pv))),
        }
        for p in range(rot.shape[1]):
            metrics[f"rot_err_deg_part{p}_mean"] = float(np.mean(rot[:, p]))
            metrics[f"rot_err_deg_part{p}_median"] = float(np.median(rot[:, p]))
            metrics[f"trans_err_part{p}_mean"] = float(np.mean(trans[:, p]))
            metrics[f"trans_err_part{p}_median"] = float(np.median(trans[:, p]))
        for k in range(relrot.shape[1]):
            metrics[f"rel_rot_err_deg_pair{k}_mean"] = float(np.mean(relrot[:, k]))
        return metrics


def run_eval(cfg: Config, params, glb_params=None, max_batches: int = 50):
    """Convenience: build datasets/loaders and run the full two-pass eval."""
    model = SlotPoseModel(cfg=cfg.model)
    glb_model = GlobalAlignModel(cfg=cfg.model) if glb_params is not None else None
    ev = Evaluator(cfg, model, params, glb_model, glb_params)

    canon_ds = build_dataset(cfg.data, split="train", canonical_input=True)
    canon_loader = DataLoader(
        canon_ds, cfg.train.batch_size, shuffle=False, prefetch=0
    )
    deltas = ev.fit_deltas(canon_loader, jax.random.PRNGKey(0), max_batches)

    test_ds = build_dataset(cfg.data, split="test")
    test_loader = DataLoader(
        test_ds, cfg.train.batch_size, shuffle=False, prefetch=0
    )
    return ev.evaluate(test_loader, deltas, max_batches)
