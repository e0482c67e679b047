"""Two-pass evaluation protocol.

Re-implementation of the reference eval (``trainer_unsup_arti_align.py:
1163-2259``; SURVEY.md §3.3):

Pass 1 — run the model on CANONICAL-state inputs from the train split and fit
per-PREDICTED-LABEL delta corrections (RANSAC robust means of the predicted
world-frame rotations / bbox-centred translations, ref trainer:1294-1350).
The deltas absorb the self-supervised model's arbitrary-but-consistent gauge.

Pass 2 — for every posed test batch run the model TWICE (posed input and
canonical input, ref trainer:1761-1806), hungarian-match slots to GT parts by
IoU, compose the (optional) stage-0 global pose with per-slot poses, and
report (ref trainer:2180-2259):

* per-part rotation error, delta-corrected:      R·ΔRᵀ  vs  R_state·R_refᵀ
* per-part canonical-relative rotation error:    R·R_canonᵀ  vs  gt
* per-part translation error, delta variant:     ‖T − (R ΔRᵀ)ΔT − T_gt‖
* per-part translation error, canonical variant: ‖T − (R R_canonᵀ)T_canon − T_gt‖
  with T_gt = T_state_bbox − (R_state R_refᵀ) T_ref_bbox and every predicted
  T centred on the bbox of its predicted part's input points (trainer:1866-1877)
* segmentation IoU (sampled + full-4096 NN-transferred)
* joint-axis angular error vs every moving part's GT axis (trainer:1544-1549)
* joint-axis error recovered from the cross-state relative pose, pairwise
  differential form (``relpose_axis_errors``) — the joint-fit-from-poses
  analogue of the reference's LSQ axis (trainer:2029-2106)
* pivot-offset error |‖pv‖ − gt_offset| (trainer:1536-1542)
* part-pair relative rotation errors, chamfer-L1
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import DataLoader, build_dataset
from ..models import GlobalAlignModel, SlotPoseModel
from ..ops.chamfer import chamfer_l1
from .metrics import (
    matched_seg_iou,
    relative_rotation_errors,
    rot_diff_degree,
)
from .ransac import ransac_fit_r, ransac_fit_t


def _rot_axis_sin(R: np.ndarray):
    """R [..., 3, 3] → (unit rotation axis [..., 3], sin(angle) [...]).

    Axis from the antisymmetric part a = (R₃₂−R₂₃, R₁₃−R₃₁, R₂₁−R₁₂),
    ‖a‖ = 2 sin(θ); direction degrades gracefully (→ noise) as θ→0, which
    callers handle by sin-weighting.
    """
    a = np.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    n = np.linalg.norm(a, axis=-1)
    return a / np.clip(n[..., None], 1e-8, None), 0.5 * n


def relpose_axis_errors(R_rel: np.ndarray, gt_R: np.ndarray):
    """Joint-axis error from the predicted cross-state relative pose.

    For every ordered part pair (p, q), p>q, the differential rotation
    Rd = R_rel[p]·R_rel[q]ᵀ cancels whatever motion the two parts share
    (the residual global-alignment gauge both inherit — mirrors
    ``nn/losses.axis_from_relpose_loss``) and leaves the joint rotation.
    For the synthetic GT this is exact: with state rots M_mov = R1·Rot(ax,θ),
    M_base = R1 and ref rots Rot(ax,θc) / I (data/articulated.py:180-232),
    axis(gt_R[p]·gt_R[q]ᵀ) equals part_axis = R1·ax identically, so every
    pair with relative motion is a valid axis target.  Reference analogue:
    the joint fit from estimated part poses (eval/joint_fit.py; ref
    trainer_unsup_arti_align.py:2029-2106).

    Args:  R_rel, gt_R — [B, P, 3, 3] predicted / GT state-vs-canonical
    relative rotations, part-matched.
    Returns: (axis_err_deg [B·npairs], gt_rel_angle_deg [B·npairs]); the
    axis is sign-folded (|dot|).  Entries with gt_rel_angle≈0 carry no
    axis information — callers sin-weight or threshold on the angle.
    """
    errs, angs = [], []
    for pa in range(R_rel.shape[1]):
        for qa in range(pa):
            Rd_p = np.einsum("bij,bkj->bik", R_rel[:, pa], R_rel[:, qa])
            Rd_g = np.einsum("bij,bkj->bik", gt_R[:, pa], gt_R[:, qa])
            ax_pd, _ = _rot_axis_sin(Rd_p)
            ax_gd, _ = _rot_axis_sin(Rd_g)
            tr_g = np.clip(
                (np.trace(Rd_g, axis1=-2, axis2=-1) - 1) / 2, -1, 1
            )
            angs.append(np.degrees(np.arccos(tr_g)))
            dots_d = np.abs(np.sum(ax_pd * ax_gd, axis=-1))
            errs.append(np.degrees(np.arccos(np.clip(dots_d, 0.0, 1.0))))
    if not errs:
        return np.zeros((0,)), np.zeros((0,))
    return np.concatenate(errs), np.concatenate(angs)

BIG = 1e6


def _masked_bbox_center(xyz: jnp.ndarray, one_hot: jnp.ndarray) -> jnp.ndarray:
    """Per-slot bbox centre of the points carrying each predicted label.

    xyz [B, N, 3]; one_hot [B, N, S] -> [B, S, 3]; zero for empty slots
    (ref trainer:1866-1871: centre of the predicted part's input points).
    """
    m = one_hot[..., None] > 0.5                       # [B, N, S, 1]
    pts = xyz[:, :, None, :]                           # [B, N, 1, 3]
    mn = jnp.min(jnp.where(m, pts, BIG), axis=1)       # [B, S, 3]
    mx = jnp.max(jnp.where(m, pts, -BIG), axis=1)
    center = (mn + mx) / 2.0
    nonempty = jnp.any(m, axis=1)
    return jnp.where(nonempty, center, 0.0)


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
        self._slots_fn = jax.jit(self._slot_outputs)
        self._posed_fn = jax.jit(self._forward_posed)

    # ------------------------------------------------------------------
    def _slot_outputs(self, params, xyz, gt_label=None):
        """One model run (glb ∘ slot): unmatched per-slot world-frame poses.

        Returns R_w [B,S,3,3], T_w [B,S,3] (bbox-centred on each predicted
        slot's input points), labels [B,N], axis_w [B,3], offset_pivot [B],
        transformed pts, chamfer-L1.  With ``cfg.model.force_gt_labels`` the
        caller passes the GT partition and the model is teacher-forced
        (diagnostic: pose quality given a perfect segmentation).
        """
        B = xyz.shape[0]
        glb_R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        glb_T = jnp.zeros((B, 3))
        x_in = xyz
        if self.glb_params is not None:
            g = self.glb_model.apply(self.glb_params, xyz)
            glb_R, glb_T = g["glb_R"], g["glb_T"]
            x_in = g["inv_pts"]
        # Fixed-seed slot-init noise: the reference samples slot noise at
        # EVERY forward, eval included (slot_attention_spec_v2.py:146
        # unconditional torch.randn) — zero noise is out-of-distribution for
        # a model trained with noisy slot inits (observed: the tiny preset's
        # deterministic eval degenerates to the all-one-slot partition while
        # noisy training occupancy is fine).  A constant key keeps eval
        # deterministic across calls while matching the reference semantics.
        _, out = self.model.apply(
            params, x_in, jax.random.PRNGKey(0), gt_label=gt_label
        )

        S = out["attn"].shape[1]
        labels = out["hard_labels"]
        one_hot = jax.nn.one_hot(labels, S, axis=-1)            # [B, N, S]

        # world-frame per-slot poses: x_world = glb_R (R_s c + T_s) + glb_T
        R_w = jnp.einsum("bij,bsjk->bsik", glb_R, out["pred_R"])
        T_w = jnp.einsum("bij,bsj->bsi", glb_R, out["pred_T"]) + glb_T[:, None]
        tp_w = (
            jnp.einsum("bij,bsmj->bsmi", glb_R, out["transformed_pts"])
            + glb_T[:, None, None]
        )
        axis_w = jnp.einsum("bij,bj->bi", glb_R, out["real_defined_axis"])

        # bbox-centring on the predicted part's input points (world frame)
        center = _masked_bbox_center(xyz, one_hot)
        T_w_bbox = T_w - center
        # raw (un-centred) translation + the centre itself are exposed so the
        # evaluator can decompose translation error into head-vs-centring
        # contributions (the predicted-part bbox centre inherits every
        # segmentation mistake; VERDICT r4 weak #3)

        B_, S_, M, _ = tp_w.shape
        cl1 = chamfer_l1(tp_w.reshape(B_, S_ * M, 3), xyz)

        return {
            "R_w": R_w,
            "T_w": T_w_bbox,
            "T_w_raw": T_w,
            "center": center,
            "labels": labels,
            "one_hot": one_hot,
            "slot_counts": one_hot.sum(1),
            "axis_w": axis_w,
            "slot_orbits": out["slot_orbits"],
            "pred_angle": out.get("pred_angle"),
            "offset_pivot": out["offset_pivot_points"],
            "tp_w": tp_w,
            "chamfer_l1": cl1,
        }

    def _forward_posed(self, params, xyz, gt_label, num_parts=None):
        """Posed run + IoU matching against GT parts."""
        P = self.cfg.model.nmasks if num_parts is None else num_parts
        out = self._slot_outputs(
            params, xyz,
            gt_label if self.cfg.model.force_gt_labels else None,
        )
        S = out["one_hot"].shape[-1]
        pred_onehot = out["one_hot"].transpose(0, 2, 1)
        gt_onehot = jax.nn.one_hot(gt_label, P).transpose(0, 2, 1)
        iou, matching = matched_seg_iou(pred_onehot, gt_onehot)  # [B], [B, P]
        out["iou"], out["matching"] = iou, matching
        return out

    def _full_iou(self, out, xyz, oorr_pc, oorr_label, num_parts=None):
        """Full-resolution IoU by NN label transfer (trainer:2180-2210)."""
        from ..ops.sampling import pairwise_sqdist

        d2 = pairwise_sqdist(oorr_pc, xyz)                 # [B, No, N]
        nn = jnp.argmin(d2, axis=-1)
        full_pred = jnp.take_along_axis(out["labels"], nn, axis=1)
        S = self.cfg.model.nmasks
        P = self.cfg.model.nmasks if num_parts is None else num_parts
        pred_oh = jax.nn.one_hot(full_pred, S).transpose(0, 2, 1)
        gt_oh = jax.nn.one_hot(oorr_label, P).transpose(0, 2, 1)
        iou_full, _ = matched_seg_iou(pred_oh, gt_oh)
        return iou_full

    # ------------------------------------------------------------------
    def fit_deltas(self, canon_loader: DataLoader, key, max_batches: int = 50):
        """Pass 1: per-predicted-label RANSAC deltas from canonical runs
        (ref trainer:1294-1350).  Returns (delta_r [S,3,3], delta_t [S,3])."""
        S = self.cfg.model.nmasks
        Rs, Ts, counts = [], [], []
        for i, batch in enumerate(canon_loader):
            if i >= max_batches:
                break
            out = self._slots_fn(
                self.params, jnp.asarray(batch["pc"]),
                jnp.asarray(batch["label"])
                if self.cfg.model.force_gt_labels else None,
            )
            Rs.append(np.asarray(out["R_w"]))
            Ts.append(np.asarray(out["T_w"]))
            counts.append(np.asarray(out["slot_counts"]))
        R_all = np.concatenate(Rs, 0)       # [K, S, 3, 3]
        T_all = np.concatenate(Ts, 0)       # [K, S, 3]
        cnt = np.concatenate(counts, 0)     # [K, S]
        delta_r = np.tile(np.eye(3, dtype=np.float32), (S, 1, 1))
        delta_t = np.zeros((S, 3), dtype=np.float32)
        for s in range(S):
            valid = cnt[:, s] > 0.5
            if valid.sum() < 2:   # empty predicted label: identity delta
                continue
            kr, kt = jax.random.split(jax.random.fold_in(key, s))
            delta_r[s] = np.asarray(
                ransac_fit_r(jnp.asarray(R_all[valid, s]), kr)
            )
            delta_t[s] = np.asarray(
                ransac_fit_t(jnp.asarray(T_all[valid, s]), kt)
            )
        return delta_r, delta_t

    # ------------------------------------------------------------------
    def evaluate(
        self,
        test_loader: DataLoader,
        deltas=None,
        max_batches: int = 100,
    ) -> Dict[str, float]:
        """Pass 2: per-part metrics on the posed test split, with a
        canonical-input model run per batch (ref trainer:1761-2026)."""
        acc = {
            k: []
            for k in (
                "rot", "canon_rot", "trans", "trans2", "iou", "iou_full",
                "cl1", "relrot", "pv", "axis_deg", "ax_rp_err", "ax_rp_ang",
                "rot_axproj", "trans2_cgt",
            )
        }
        for i, batch in enumerate(test_loader):
            if i >= max_batches:
                break
            xyz = jnp.asarray(batch["pc"])
            out = self._posed_fn(
                self.params, xyz, jnp.asarray(batch["label"])
            )
            canon = self._slots_fn(
                self.params, jnp.asarray(batch["canon_pc"]),
                jnp.asarray(batch["canon_label"])
                if self.cfg.model.force_gt_labels else None,
            )
            iou_full = self._full_iou(
                out, xyz, jnp.asarray(batch["oorr_pc"]),
                jnp.asarray(batch["oorr_label"]),
            )
            acc["iou"].append(np.asarray(out["iou"]))
            acc["iou_full"].append(np.asarray(iou_full))
            acc["cl1"].append(np.asarray(out["chamfer_l1"]))

            matching = np.asarray(out["matching"])          # [B, P]
            mi = matching[..., None]
            R_m = np.take_along_axis(np.asarray(out["R_w"]), mi[..., None], 1)
            T_m = np.take_along_axis(np.asarray(out["T_w"]), mi, 1)
            cR_m = np.take_along_axis(np.asarray(canon["R_w"]), mi[..., None], 1)
            cT_m = np.take_along_axis(np.asarray(canon["T_w"]), mi, 1)

            gt_R = np.einsum(
                "bpij,bpkj->bpik",
                np.asarray(batch["part_state_rots"]),
                np.asarray(batch["part_ref_rots"]),
            )
            # real GT translation (trainer:1934-1937)
            gt_T = np.asarray(batch["part_state_trans_bbox"]) - np.einsum(
                "bpij,bpj->bpi", gt_R, np.asarray(batch["part_ref_trans_bbox"])
            )

            # delta-corrected rotation + translation (trainer:1906-1917)
            if deltas is not None:
                dR = deltas[0][matching]                    # [B, P, 3, 3]
                dT = deltas[1][matching]                    # [B, P, 3]
            else:
                dR = np.tile(np.eye(3, dtype=np.float32), matching.shape + (1, 1))
                dT = np.zeros(matching.shape + (3,), dtype=np.float32)
            R_delta = np.einsum("bpij,bpkj->bpik", R_m, dR)
            t_pred_delta = T_m - np.einsum("bpij,bpj->bpi", R_delta, dT)
            # canonical-relative variants (trainer:1891-1912)
            R_canon_rel = np.einsum("bpij,bpkj->bpik", R_m, cR_m)
            t_pred_canon = T_m - np.einsum("bpij,bpj->bpi", R_canon_rel, cT_m)

            acc["rot"].append(
                np.asarray(rot_diff_degree(jnp.asarray(R_delta), jnp.asarray(gt_R)))
            )
            acc["canon_rot"].append(
                np.asarray(
                    rot_diff_degree(jnp.asarray(R_canon_rel), jnp.asarray(gt_R))
                )
            )
            acc["trans"].append(np.linalg.norm(t_pred_delta - gt_T, axis=-1))
            acc["trans2"].append(np.linalg.norm(t_pred_canon - gt_T, axis=-1))

            # --- translation decomposition (VERDICT r4 weak #3) -----------
            # Counterfactual: re-centre BOTH passes' translations on the
            # GT part's bbox instead of the predicted part's.  The gap
            # between trans2 and this number is the segmentation-driven
            # centring contribution; the remainder is the pose path itself.
            def _gt_centers(pts, lbl, P):
                c = np.zeros((pts.shape[0], P, 3), np.float32)
                for b in range(pts.shape[0]):
                    for p in range(P):
                        m = lbl[b] == p
                        if m.any():
                            sel = pts[b][m]
                            c[b, p] = (sel.min(0) + sel.max(0)) / 2.0
                return c

            P_ = matching.shape[1]
            cg_posed = _gt_centers(
                np.asarray(batch["pc"]), np.asarray(batch["label"]), P_
            )
            cg_canon = _gt_centers(
                np.asarray(batch["canon_pc"]),
                np.asarray(batch["canon_label"]), P_,
            )
            Tr_m = np.take_along_axis(np.asarray(out["T_w_raw"]), mi, 1)
            cTr_m = np.take_along_axis(np.asarray(canon["T_w_raw"]), mi, 1)
            t_cgt = (Tr_m - cg_posed) - np.einsum(
                "bpij,bpj->bpi", R_canon_rel, cTr_m - cg_canon
            )
            acc["trans2_cgt"].append(np.linalg.norm(t_cgt - gt_T, axis=-1))

            # --- symmetry-aware rotation (VERDICT r4 item 7) --------------
            # Axis-projected error: how far the predicted rotation carries
            # the GT joint axis from where the GT rotation carries it —
            # invariant to spin about the joint axis, so the near-planar
            # symmetry of parts like the safe door (raw IQR 31-67 deg)
            # cannot dominate it.  Both numbers are reported (the ref's
            # RANSAC carries the analogous axis_mean handling, ransac.py
            # :58-76).  a_mesh = gt_Rᵀ·part_axis == the mesh-frame joint
            # axis for every part (see relpose_axis_errors' frame note).
            ax_w0 = np.asarray(batch["part_axis"])[:, 0]
            ax_w0 = ax_w0 / np.clip(
                np.linalg.norm(ax_w0, axis=-1, keepdims=True), 1e-8, None
            )
            a_mesh = np.einsum("bpji,bj->bpi", gt_R, ax_w0)      # [B, P, 3]
            carried = np.einsum("bpij,bpj->bpi", R_delta, a_mesh)
            dots_ax = np.clip(
                np.sum(carried * ax_w0[:, None], axis=-1), -1.0, 1.0
            )
            acc["rot_axproj"].append(np.degrees(np.arccos(dots_ax)))
            acc["relrot"].append(
                np.asarray(
                    relative_rotation_errors(
                        jnp.asarray(R_delta), jnp.asarray(gt_R)
                    )
                )
            )

            # joint-axis angular error vs EVERY moving part's GT axis
            # (trainer:1544-1549: acos of the mean |dot| per batch)
            gt_axes = np.asarray(batch["part_axis"])        # [B, n_mov, 3]
            gt_axes = gt_axes / np.clip(
                np.linalg.norm(gt_axes, axis=-1, keepdims=True), 1e-8, None
            )
            pred_axis = np.asarray(out["axis_w"])           # [B, 3]
            dots = np.abs(np.sum(pred_axis[:, None, :] * gt_axes, axis=-1))
            acc["axis_deg"].append(
                np.degrees(np.arccos(min(float(dots.mean()), 1.0)))
            )

            # joint axis recovered from the predicted cross-state relative
            # pose, with the partner part's shared motion conjugated out
            # (differential form, mirrors nn/losses.axis_from_relpose_loss).
            # For the synthetic GT this is exact: with state rots
            # M_mov = R1·Rot(ax,θ), M_base = R1 and ref rots Rot(ax,θc) / I
            # (data/articulated.py:180-232), axis(gt_R[p] gt_R[q]ᵀ) equals
            # part_axis = R1·ax identically — so every ordered part pair
            # with relative motion is a valid axis target.  Reference
            # analogue: the joint fit from estimated part poses
            # (eval/joint_fit.py; ref trainer_unsup_arti_align.py:2029-2106).
            rp_err, rp_ang = relpose_axis_errors(R_canon_rel, gt_R)
            acc["ax_rp_err"].append(rp_err)
            acc["ax_rp_ang"].append(rp_ang)

            # pivot offset: |‖pv‖ − gt_offset| (trainer:1536-1542; the
            # reference compares scalar norms, which are glb-frame invariant)
            gt_pv_off = np.asarray(batch["part_pv_offset"])[:, 0]
            acc["pv"].append(
                np.abs(np.asarray(out["offset_pivot"]) - gt_pv_off)
            )

        rot = np.concatenate(acc["rot"], 0)
        canon_rot = np.concatenate(acc["canon_rot"], 0)
        trans = np.concatenate(acc["trans"], 0)
        trans2 = np.concatenate(acc["trans2"], 0)
        t2cgt = np.concatenate(acc["trans2_cgt"], 0)
        rot_axp = np.concatenate(acc["rot_axproj"], 0)
        relrot = np.concatenate(acc["relrot"], 0)
        iou_s = np.concatenate(acc["iou"])
        metrics = {
            # Dispersion context (VERDICT r3 weak #7): all quality claims are
            # medians/means over n_samples test instances — report the count
            # and a robust spread so 60-sample medians read as what they are.
            "n_samples": float(rot.shape[0]),
            "seg_iou": float(np.mean(iou_s)),
            "seg_iou_std": float(np.std(iou_s)),
            "seg_iou_full": float(np.mean(np.concatenate(acc["iou_full"]))),
            "chamfer_l1": float(np.mean(np.concatenate(acc["cl1"]))),
            "axis_err_deg_mean": float(np.mean(acc["axis_deg"])),
            "axis_err_deg_median": float(np.median(acc["axis_deg"])),
            "pv_offset_err_mean": float(np.mean(np.concatenate(acc["pv"]))),
        }
        for p in range(rot.shape[1]):
            metrics[f"rot_err_deg_part{p}_mean"] = float(np.mean(rot[:, p]))
            metrics[f"rot_err_deg_part{p}_median"] = float(np.median(rot[:, p]))
            q25, q75 = np.percentile(rot[:, p], [25.0, 75.0])
            metrics[f"rot_err_deg_part{p}_iqr"] = float(q75 - q25)
            metrics[f"canon_rot_err_deg_part{p}_mean"] = float(
                np.mean(canon_rot[:, p])
            )
            metrics[f"trans_err_part{p}_mean"] = float(np.mean(trans[:, p]))
            metrics[f"trans_err_part{p}_median"] = float(np.median(trans[:, p]))
            metrics[f"trans2_err_part{p}_mean"] = float(np.mean(trans2[:, p]))
            metrics[f"trans2_err_part{p}_median"] = float(
                np.median(trans2[:, p])
            )
            metrics[f"trans2_cgt_err_part{p}_mean"] = float(
                np.mean(t2cgt[:, p])
            )
            metrics[f"rot_axproj_err_deg_part{p}_mean"] = float(
                np.mean(rot_axp[:, p])
            )
            metrics[f"rot_axproj_err_deg_part{p}_median"] = float(
                np.median(rot_axp[:, p])
            )
        for k in range(relrot.shape[1]):
            metrics[f"rel_rot_err_deg_pair{k}_mean"] = float(np.mean(relrot[:, k]))
        if acc["ax_rp_err"]:
            e = np.concatenate(acc["ax_rp_err"])
            a = np.concatenate(acc["ax_rp_ang"])
            w = np.sin(np.radians(a))      # axis ill-defined as rel angle→0
            if w.sum() > 1e-6:
                metrics["axis_err_relpose_deg_mean"] = float(
                    (e * w).sum() / w.sum()
                )
            sel = a > 15.0
            if sel.any():
                metrics["axis_err_relpose_deg_median"] = float(
                    np.median(e[sel])
                )
                metrics["axis_err_relpose_n"] = float(sel.sum())
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
