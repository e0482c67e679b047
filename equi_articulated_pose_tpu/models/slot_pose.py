"""Stage-1 slot pose model — the flagship.

Self-supervised part segmentation (slot attention) + per-part rotation-anchor
pose regression + per-part canonical shape reconstruction, trained purely with
chamfer losses.  Re-design of the reference's
``unsup_seg_so3_pose_conv_pn_{35,38,39,40}_multi_stage.ClsSO3ConvModel``
stage-1 forward (``unsup_..._40:1536-3315``) with every per-(slot, batch)
Python loop replaced by masked, vmapped fixed-shape computation:

* per-slot unshared modules (inv blocks, RT heads, decoders) are `nn.vmap`'d
  over a leading slot axis;
* the ragged per-slot point subsets become hard one-hot masks over the full
  cloud (semantics the reference itself defines in its WithMask blocks);
* slot-orbit selection is a vectorised min/argmin over the [B, S, A] loss
  tensor (slot_single_mode) — no Python loops over batch/anchor/permutation.

Variant coverage (ref models 35/38/39/40) is by configuration: ``nmasks``
(slots), ``joint_type`` ('revolute' quat heads / 'prismatic' translation-only
heads — the drawer model), ``recon_prior`` (decoder family).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..geom import so3 as so3g
from ..nn.blocks import SO3Backbone, make_backbone_specs
from ..nn.containers import SpherePoints, preprocess_input
from ..nn.decoders import (
    DecoderConstantCommon,
    DecoderFC,
    DecoderFCAtlas,
    DecoderFCWithCuboid,
    DecoderFCWithPVP,
    DecoderFCWithPVPAtlas,
    DecoderFCWithPVPConstantCommon,
    DecoderFCWithPVPCuboid,
    cuboid_axis_normal_loss,
    cuboid_fit_loss,
)
from ..nn.heads import SO3PoseHead, SO3PrismaticHead
from ..nn.outblocks import InvOutBlock, InvPPOutBlock
from ..nn.slot_attention import SlotAttention
from ..ops.chamfer import chamfer_sq
from ..ops.sampling import furthest_point_sampling, pairwise_sqdist

BIG = 1e5


class _SlotDecoder(nn.Module):
    """Per-slot canonical shape decoder, selected by recon_prior
    (ref ``unsup_..._40:249-297``).  Returns (pts, pivot, central, cuboid_x,
    cuboid_R); pivot/central default to 0.5 (centre) and the cuboid to a unit
    box when the prior lacks them."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, inv_feat: jnp.ndarray):
        c = self.cfg
        M = c.part_pred_npoints
        feats = (256, 256)
        rp = c.recon_prior
        lead = inv_feat.shape[:-1]
        cub_x = jnp.full(lead + (3,), 1.0)
        cub_R = jnp.broadcast_to(jnp.eye(3), lead + (3, 3))
        pv = cp = jnp.full(lead + (3,), 0.5)
        if rp == 7:
            pts, pv, cp, cub_x, cub_R = DecoderFCWithPVPCuboid(feats, M)(inv_feat)
        elif rp == 6:
            pts, pv, cp = DecoderFCWithPVP(feats, M)(inv_feat)
        elif rp == 5:
            pts, cub_x, cub_R = DecoderFCWithCuboid(feats, M)(inv_feat)
        elif rp == 8:
            pts, pv, cp = DecoderFCWithPVPAtlas(feats, M)(inv_feat)
        elif rp == 9:
            pts, pv, cp = DecoderFCWithPVPConstantCommon(feats, M)(inv_feat)
        elif rp == 4:
            pts = DecoderFCAtlas(feats, M)(inv_feat)
        elif rp == 2:
            pts = DecoderConstantCommon(feats, M)(inv_feat)
        else:
            pts = DecoderFC(feats, M)(inv_feat)
        return pts, pv, cp, cub_x, cub_R


def _slot_vmap(module_cls, num_slots: int, in_axes, remat: bool = False, **kwargs):
    """Per-slot unshared parameters via a leading slot axis.

    ``remat`` rematerialises the module in the backward pass: the per-slot
    full-cloud activations are S x the backbone's ([S, B, N, A, C] — 675 MB
    per tower at 240 product anchors), and storing them for backward is the
    eyeglasses HBM ceiling."""
    cls = nn.remat(module_cls) if remat else module_cls
    return nn.vmap(
        cls,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True},
        in_axes=in_axes,
        out_axes=0,
        axis_size=num_slots,
    )(**kwargs)


class SlotPoseModel(nn.Module):
    cfg: ModelConfig
    axis_name: Optional[str] = None

    def setup(self):
        c = self.cfg
        S = c.nmasks
        specs = make_backbone_specs(
            c.mlps,
            kanchor=c.kpconv_kanchor,
            use_2d=c.use_2d,
            input_num=c.input_num,
            initial_radius_ratio=c.init_radius,
            input_radius=c.input_radius,
            sigma_ratio=c.sigma_ratio,
            n_neighbor=c.n_neighbor,
            use_pose=True,
            permute_modes=c.permute_modes,
            norm=c.norm,
            chunk_a=c.chunk_a,
            compute_dtype=c.compute_dtype,
            fused=c.fused_interconv,
            fused_bwd=c.fused_bwd,
            remat_chunks=c.remat_chunks,
        )
        self.backbone = SO3Backbone(specs=specs, axis_name=self.axis_name)
        self.backbone_sec = SO3Backbone(specs=specs, axis_name=self.axis_name)

        self.inv_out_dim = c.out_mlp[-1]
        self.ppint_outblk = InvPPOutBlock(
            mlp=c.out_mlp, temperature=c.temperature, norm=c.norm,
            axis_name=self.axis_name,
        )
        self.slot_attention = SlotAttention(
            num_slots=S, dim=self.inv_out_dim, iters=c.slot_iters,
            hidden_dim=self.inv_out_dim,
        )

        inv_kw = dict(
            mlp=c.out_mlp, temperature=c.temperature, norm=c.norm,
            axis_name=self.axis_name, use_pointnet=True,
            sel_mode=c.sel_mode,
        )
        # per-slot inv block over the slot's masked points; abs vs relative
        # coordinates per the rel_for_points flag (ref unsup_..._40:209)
        self.slot_outblock = _slot_vmap(
            InvOutBlock, S, in_axes=(None, 0), remat=c.remat_slot_blocks,
            use_abs_pos=not c.rel_for_points, **inv_kw
        )
        # Pair inv block: two-part models feed the whole cloud (ref overrides
        # the pair subset to the full cloud, unsup_..._40:1810-1811); the
        # >=3-slot chain models feed each ADJACENT-slot pair's union mask
        # (ref unsup_..._35:540-571) — S-1 joints, S-1 pair modules.
        n_pair = S - 1 if self.chain_mode else S
        self.pair_slot_outblock = _slot_vmap(
            InvOutBlock, n_pair,
            in_axes=(None, 0 if self.chain_mode else None),
            remat=c.remat_slot_blocks, use_abs_pos=True, **inv_kw
        )
        self.slot_decoder = _slot_vmap(_SlotDecoder, S, in_axes=(0,), cfg=c)
        # pair decoder supplies the pivot point (ref :2014-2020)
        self.pair_slot_decoder = _slot_vmap(
            DecoderFCWithPVP, n_pair, in_axes=(0,), n_features=(256, 256),
            output_pts=2,
        )
        head_kw = dict(mlp=c.out_mlp, norm=c.norm, axis_name=self.axis_name)
        if c.joint_type == "prismatic":
            self.slot_rt_head = _slot_vmap(
                SO3PrismaticHead, S, in_axes=(None, 0),
                remat=c.remat_slot_blocks, **head_kw
            )
        else:
            self.slot_rt_head = _slot_vmap(
                SO3PoseHead,
                S,
                in_axes=(None, 0),
                remat=c.remat_slot_blocks,
                representation=c.representation,
                # pivot-derived translations skip the dense T tower
                # (ref scripts pass --translation=0 for the 38 recipes)
                pred_t=c.pred_t and not self.trans_from_pv,
                pred_axis=c.pred_axis,
                mtx_axis=c.mtx_based_axis_regression,
                **head_kw,
            )
        self.anchors_const = jnp.asarray(
            so3g.get_anchors(240 if c.use_2d else c.kpconv_kanchor)
        )
        if c.axis_reg_stra == 1:
            # running-mean outlier gate over the pivot/axis-line distances
            # (ref unsup_..._38:348-356,1535-1676); cross-step mutable state
            self.avg_pv_dist = self.variable(
                "state", "avg_pv_dist", lambda: jnp.zeros(())
            )
            self.pv_count = self.variable(
                "state", "pv_count", lambda: jnp.zeros(())
            )

    @property
    def trans_from_pv(self) -> bool:
        c = self.cfg
        if c.trans_from_pv is not None:
            return c.trans_from_pv
        return c.representation == "angle" and c.joint_type != "prismatic"

    @property
    def chain_mode(self) -> bool:
        """Transformation-chain pose modeling for >=3 revolute slots (the
        eyeglasses family, ref ``unsup_..._35:846-895``): the middle slot is
        the chain base (identity rotation, translation = its central point),
        every other slot rotates about the shared predicted axis — negated on
        the side below the base — and translates about its own pair pivot."""
        c = self.cfg
        return (
            c.joint_type != "prismatic"
            and c.nmasks >= 3
            and c.representation == "angle"
        )

    # ------------------------------------------------------------------
    def _gate_pv(self, d: jnp.ndarray) -> jnp.ndarray:
        """axis_reg_stra=1 running-mean gate: distances above the running
        average are zeroed (outlier rejection) and the average is updated with
        the surviving mass (ref unsup_..._38:1535-1553).  Identity when
        axis_reg_stra=0."""
        if self.cfg.axis_reg_stra != 1:
            return d
        avg, cnt = self.avg_pv_dist, self.pv_count
        have = cnt.value > 0
        ind = jnp.where(
            have, (d <= avg.value).astype(d.dtype), jnp.ones_like(d)
        )
        dg = d * ind
        n_valid = jnp.sum(ind)
        if self.is_mutable_collection("state") and not self.is_initializing():
            new_avg = (avg.value * cnt.value + jnp.sum(jax.lax.stop_gradient(dg))) / jnp.maximum(
                cnt.value + n_valid, 1.0
            )
            avg.value = new_avg
            cnt.value = cnt.value + n_valid
        return dg

    # ------------------------------------------------------------------
    def _encode(self, xyz, x_list=None, hard_label=None, x_seg=None):
        """Backbone features.  First iteration: encode the raw cloud; later
        iterations: encode each slot's inverse-transformed cloud and select
        per point by the previous hard label (ref :1578-1615).

        ``x_seg`` (the segmentation branch over the ORIGINAL cloud) is
        iteration-invariant — the reference recomputes it identically every
        iteration (``x_seg = M.preprocess_input(ori_pts, ...)`` + backbone_sec,
        _38:515-518,572-576); callers hoist it out of the iteration loop and
        pass it in, saving a full backbone_sec pass per extra iteration."""
        B, N, _ = xyz.shape
        A = 240 if self.cfg.use_2d else self.cfg.kpconv_kanchor
        # Every input cloud here is in its own frame: per-point poses are the
        # identity on the whole active path (true in the reference's shipped
        # configs too).  Passing pose=None lets InterSO3Conv skip the
        # relative-rotation anchor permutation — whose result WOULD be the
        # identity permutation — saving the per-layer [B,M,nn,3,3] pose
        # gathers, rel-rot einsums, and 60-anchor nearest-element snaps.
        seg = None
        if self.cfg.use_art_mode and hard_label is not None:
            seg = hard_label  # seg-aware art-mode convolution (ref :1561-1577)
        if x_list is None:
            # both towers ball-query the SAME cloud at the SAME radii: the
            # feature-independent neighbourhood work (ball query + relative
            # offsets) is computed once and fed to both (roadmap #3); layers
            # sharing (radius, n_neighbor) also reuse each other's
            from ..nn.blocks import precompute_groupings

            groupings = precompute_groupings(xyz, self.backbone.specs)
            x = self.backbone(preprocess_input(xyz, A), seg, groupings)
            if x_seg is None:
                x_seg = self.backbone_sec(
                    preprocess_input(xyz, A), None, groupings
                )
        else:
            S = x_list.shape[0]  # [S, B, N, 3]
            flat = x_list.reshape(S * B, N, 3)
            fx = self.backbone(preprocess_input(flat, A))
            feats = fx.feats.reshape(S, B, N, A, -1)
            sel = hard_label[:, :, None, None, None]  # [B, N, 1, 1, 1]
            feats = jnp.take_along_axis(jnp.moveaxis(feats, 0, 2), sel, axis=2)[
                :, :, 0
            ]  # [B, N, A, C]
            x = SpherePoints(xyz, feats, None)
        if x_seg is None:
            x_seg = self.backbone_sec(preprocess_input(xyz, A))
        return x, x_seg

    # ------------------------------------------------------------------
    def forward_one_iter(
        self,
        xyz: jnp.ndarray,                 # [B, N, 3]
        *,
        x_list: Optional[jnp.ndarray] = None,      # [S, B, N, 3]
        hard_label: Optional[jnp.ndarray] = None,  # [B, N]
        slot_rng: Optional[jax.Array] = None,
        axis_prior: Optional[jnp.ndarray] = None,  # [S, 3] (slot_single_mode=0)
        x_seg: Optional[Any] = None,               # hoisted seg-branch features
        gt_label: Optional[jnp.ndarray] = None,    # [B, N] teacher-forced seg
        step: Optional[jnp.ndarray] = None,        # train step (loss warm-ups)
    ) -> dict[str, Any]:
        c = self.cfg
        B, N, _ = xyz.shape
        S = c.nmasks
        A = 240 if c.use_2d else c.kpconv_kanchor
        M = c.part_pred_npoints
        anchors = self.anchors_const

        x, x_seg = self._encode(xyz, x_list, hard_label, x_seg)

        # --- point grouping ------------------------------------------------
        ppinv, pp_conf = self.ppint_outblk(x_seg)
        temp = None
        if c.attn_temp_steps > 0 and step is not None:
            # linear anneal attn_temp_start -> 1 over attn_temp_steps: soft
            # early assignments keep the slot softmax plastic (the measured
            # step-400 attn_ent collapse freezes the partition before any
            # part-shaping signal can act)
            frac = jnp.clip(step / float(c.attn_temp_steps), 0.0, 1.0)
            temp = c.attn_temp_start + (1.0 - c.attn_temp_start) * frac
        slots, attn_ori = self.slot_attention(ppinv, slot_rng, temp)  # [B,S,N]
        if gt_label is not None:
            # teacher-forced partition (diagnostic): does the objective
            # PREFER the part-aligned assignment once heads/decoders are fit
            # to it?  Sharp-but-soft so the o2r weighting stays well-defined.
            oh_gt = jax.nn.one_hot(gt_label, S, axis=-1).transpose(0, 2, 1)
            attn_ori = 0.98 * oh_gt + 0.02 / S
        hard_labels = jnp.argmax(attn_ori, axis=1)              # [B, N]
        one_hot = jax.nn.one_hot(hard_labels, S, axis=-1)       # [B, N, S]
        masks = jnp.moveaxis(one_hot, -1, 0)                    # [S, B, N]
        slot_counts = one_hot.sum(1)                            # [B, S]
        base_slot = jnp.argmax(slot_counts, axis=-1)            # [B]
        is_base = jax.nn.one_hot(base_slot, S, axis=-1)         # [B, S]

        # --- per-slot inv features, poses, reconstructions -----------------
        # with_part_proposal=0 feeds the whole cloud to the per-slot inv
        # block instead of the slot's masked subset (ref unsup_..._38:735-737)
        inv_masks = masks if c.with_part_proposal else jnp.ones_like(masks)
        slot_inv, _ = self.slot_outblock(x, inv_masks)          # [S, B, C]
        if self.chain_mode:
            # adjacent-slot union masks, one per joint (ref _35:540-571 cats
            # the two slots' point subsets per pair)
            pair_masks = jnp.clip(masks[:-1] + masks[1:], 0.0, 1.0)  # [S-1,B,N]
            pair_inv, _ = self.pair_slot_outblock(x, pair_masks)
        else:
            pair_inv, _ = self.pair_slot_outblock(x, None)      # [S, B, C]
        rt = self.slot_rt_head(x, masks)
        canon, _pv_own, central, cub_x, cub_R = self.slot_decoder(slot_inv)
        _pair_pts, pv, _pc = self.pair_slot_decoder(pair_inv)   # pivot from pair

        canon = jnp.moveaxis(canon, 0, 1) - 0.5                 # [B, S, M, 3]
        pv_points = jnp.moveaxis(pv, 0, 1) - 0.5                # [B, n_pair, 3]
        central_points = jnp.moveaxis(central, 0, 1) - 0.5      # [B, S, 3]
        cub_x = jnp.moveaxis(cub_x, 0, 1)                       # [B, S, 3]
        cub_R = jnp.moveaxis(cub_R, 0, 1)                       # [B, S, 3, 3]

        raw_R = jnp.moveaxis(rt["R"], 0, 1)                     # [B, S, A, r]
        trans_from_pv = self.trans_from_pv
        if "axis" in rt:
            slot_axis = jnp.moveaxis(rt["axis"], 0, 1)          # [B, S, A, 3]
        else:
            slot_axis = jnp.zeros((B, S, A, 3)).at[..., 1].set(1.0)

        # shared defined axis: the angle path uses slot 0's predicted axis
        # (ref unsup_..._38:1096), the quat path slot 1's (ref _40:2195)
        if c.representation == "angle":
            defined_axis = slot_axis[:, 0]                      # [B, A, 3]
        else:
            defined_axis = slot_axis[:, min(1, S - 1)]          # [B, A, 3]

        # rotation matrices (residual, pre-anchor-composition)
        angle = None  # [B, S, A] joint angles (angle path only; telemetry)
        if c.joint_type == "prismatic":
            R_mtx = jnp.broadcast_to(jnp.eye(3), (B, S, A, 3, 3))
        elif c.representation == "angle":
            angle = jax.nn.sigmoid(raw_R[..., 0]) * jnp.pi * c.rot_angle_factor
            ax = jnp.broadcast_to(defined_axis[:, None], (B, S, A, 3))
            if self.chain_mode:
                # chain modeling (ref _35:846-895): the middle slot is the
                # base (zero angle => identity); slots below it rotate about
                # the NEGATED shared axis, slots above about the axis itself
                mid = S // 2
                sidx = jnp.arange(S)
                sign = jnp.where(sidx < mid, -1.0, 1.0)[None, :, None, None]
                keep = (sidx != mid).astype(angle.dtype)[None, :, None]
                R_mtx = so3g.axis_angle_to_matrix(ax * sign, angle * keep)
            else:
                # two-part path: EVERY slot rotates (the reference's
                # base-identity branch is dead code — unsup_..._38:1085
                # `i_s == lbl and i_s != lbl` is always false)
                R_mtx = so3g.axis_angle_to_matrix(ax, angle)
        else:
            # quat path: base slot forced to identity (ref _40:2201-2203)
            R_mtx = so3g.quat_to_matrix(raw_R)                  # [B,S,A,3,3]
            eye = jnp.broadcast_to(jnp.eye(3), R_mtx.shape)
            R_mtx = jnp.where(is_base[:, :, None, None, None] > 0.5, eye, R_mtx)

        # translations: either the dense T head, or derived from the shared
        # pivot point and per-slot central point, T = R(c - pv) + pv
        # (ref unsup_..._38:1193-1200,1246-1252; scripts pass --translation=0)
        pv0 = pv_points[:, 0]                                   # [B, 3]
        if trans_from_pv:
            central_a = jnp.broadcast_to(
                central_points[:, :, None, :], (B, S, A, 3)
            )
            if c.shape_type == "washing_machine":
                # moving slots add the anchor-inverse-rotated slot centroid
                # (ref unsup_..._38:747-753,1232-1239)
                denom = jnp.clip(masks.sum(-1), 1e-6)           # [S, B]
                avg_off = jnp.einsum("sbn,bnj->sbj", masks, xyz) / denom[..., None]
                avg_off = jnp.moveaxis(avg_off, 0, 1)           # [B, S, 3]
                off_a = jnp.einsum("aji,bsj->bsai", anchors, avg_off)
                central_a = central_a + off_a * (
                    1.0 - is_base[:, :, None, None]
                )
            if self.chain_mode:
                # per-slot pair pivot: slot s uses the pivot of joint s when
                # below the base, joint s-1 when above (ref _35:880-889).
                # The base slot's formula degenerates to T = central exactly
                # (R = I => R(c - pv) + pv = c), matching ref _35:858-860.
                mid = S // 2
                sidx = jnp.arange(S)
                pair_idx = jnp.clip(
                    jnp.where(sidx < mid, sidx, sidx - 1), 0, pv_points.shape[1] - 1
                )
                pv_slot = pv_points[:, pair_idx]                # [B, S, 3]
                pv_b = pv_slot[:, :, None, :]
                slot_T = jnp.einsum(
                    "bsaij,bsaj->bsai", R_mtx, central_a - pv_b
                ) + pv_b
            else:
                diff = central_a - pv0[:, None, None, :]
                slot_T = jnp.einsum("bsaij,bsaj->bsai", R_mtx, diff) + pv0[:, None, None, :]
        else:
            slot_T = jnp.moveaxis(rt["T"], 0, 1)                # [B, S, A, 3]
        if c.shape_type == "drawer":
            # the drawer recipe fixes slot 0 (the cabinet): zero translation
            # (ref unsup_..._38:1281-1284 / _39)
            slot_T = slot_T.at[:, 0].set(0.0)

        # anchor composition (ref :2466-2468)
        slot_R_full = jnp.einsum("aij,bsajk->bsaik", anchors, R_mtx)
        slot_T_full = jnp.einsum("aij,bsaj->bsai", anchors, slot_T)

        # optional anchor restriction for the transform orbit: sel_mode_trans
        # fixes the chamfer search to one anchor (ref _38:1286-1290,1313-1317;
        # k=1 — the global alignment already canonicalised the pose)
        if c.sel_mode_trans is not None and c.sel_mode_trans >= 0:
            trans_anchors = jnp.array([c.sel_mode_trans], dtype=jnp.int32)
        else:
            trans_anchors = jnp.arange(A, dtype=jnp.int32)
        K = trans_anchors.shape[0]
        slot_R = slot_R_full[:, :, trans_anchors]               # [B,S,K,3,3]
        slot_T_rot = slot_T_full[:, :, trans_anchors]           # [B,S,K,3]
        R_res_t = R_mtx[:, :, trans_anchors]                    # [B,S,K,3,3]
        T_res_t = slot_T[:, :, trans_anchors]                   # [B,S,K,3]
        defined_axis_t = defined_axis[:, trans_anchors]         # [B,K,3]

        # --- per-(slot, anchor) chamfer -------------------------------------
        # The [B, S, K, M, N] distance tensor is the model's HBM high-water
        # mark (K up to 240 with the 2D product anchors — the eyeglasses
        # batch-size ceiling).  orbit_chunk_k > 0 streams the K axis through
        # a rematerialised lax.map: only [B, S, kc, M, N] is ever resident
        # and the backward recomputes each chunk instead of storing it.
        mask_n = one_hot.transpose(0, 2, 1)[:, :, None, None, :]   # [B,S,1,1,N]
        if c.soft_seg_weights:
            # all-points soft weighting (the reference's commented-out
            # variant, unsup_..._38:1365-1366 "If we use soft weights for all
            # points"): every slot receives o2r gradient at every point, so
            # badly-explained points can migrate across the hard argmax
            # boundary — soft-clustering dynamics for the segmentation, vs
            # the hard-masked default where the argmax partition is frozen
            # unless near-tied logits flip (observed: oven IoU pinned at its
            # init value 0.42 for 2400 steps).
            soft_w = attn_ori[:, :, None, :]
        else:
            soft_w = (one_hot.transpose(0, 2, 1) * attn_ori)[:, :, None, :]
        if c.soft_seg_weights and c.soft_seg_pointwise:
            # mixture-assignment normalisation: sum_n attn*d / N.  The
            # per-slot-mass mean below is minimised by BALANCED clusters
            # (soft-k-means prior) — wrong for skewed categories like oven
            # (GT occupancy [0.81, 0.19]); dividing by the constant point
            # count keeps per-point migration gradients without any
            # cluster-size prior.
            soft_den = jnp.full(soft_w.shape[:-1], float(N))
        else:
            soft_den = jnp.clip(jnp.sum(soft_w, axis=-1), 1e-8)

        def orbit_cd(R_k, T_k):
            """[B,S,k,3,3], [B,S,k,3] -> (recon_to_ori, ori_to_recon) [B,S,k].
            recon->ori restricted to in-slot points (ref :2544-2547);
            ori->recon weighted by hard-mask * attention (ref :2557-2567)."""
            tp = jnp.einsum("bskij,bsmj->bskmi", R_k, canon) + T_k[..., None, :]
            k = R_k.shape[2]
            d2 = pairwise_sqdist(
                tp.reshape(B, S * k, M, 3),
                jnp.broadcast_to(xyz[:, None], (B, S * k, N, 3)),
            ).reshape(B, S, k, M, N)
            r2o = jnp.min(jnp.where(mask_n > 0.5, d2, BIG), axis=-1).mean(-1)
            o2r_n = jnp.min(d2, axis=-2)                           # [B,S,k,N]
            o2r = jnp.sum(o2r_n * soft_w, axis=-1) / soft_den
            return r2o, o2r

        kc = c.orbit_chunk_k
        if kc and K > kc and K % kc == 0:
            Rc = jnp.moveaxis(slot_R.reshape(B, S, K // kc, kc, 3, 3), 2, 0)
            Tc = jnp.moveaxis(slot_T_rot.reshape(B, S, K // kc, kc, 3), 2, 0)
            r2o, o2r = jax.lax.map(
                jax.checkpoint(lambda rt: orbit_cd(rt[0], rt[1])), (Rc, Tc)
            )
            recon_to_ori = jnp.moveaxis(r2o, 0, 2).reshape(B, S, K)
            ori_to_recon = jnp.moveaxis(o2r, 0, 2).reshape(B, S, K)
        else:
            recon_to_ori, ori_to_recon = orbit_cd(slot_R, slot_T_rot)

        orbit_cost = (
            ori_to_recon if c.slot_single_cd else ori_to_recon + recon_to_ori
        )

        # --- orbit selection -------------------------------------------------
        sel_axes = None
        if c.slot_single_mode:
            total = jnp.sum(orbit_cost, axis=1)                     # [B, K]
            orbit = jnp.argmin(total, axis=-1)                      # [B]
            slot_orbits_k = jnp.broadcast_to(orbit[:, None], (B, S))
        elif axis_prior is not None and S > 1:
            from .orbit_select import select_slot_orbits_axis_prior

            slot_weights = slot_counts / jnp.clip(
                slot_counts.sum(-1, keepdims=True), 1e-8
            )
            slot_orbits_k, sel_axes = select_slot_orbits_axis_prior(
                orbit_cost, slot_R, axis_prior, slot_weights
            )
        else:
            slot_orbits_k = jnp.argmin(orbit_cost, axis=-1)         # [B, S]

        # map K-axis indices back to true anchor ids (k<A under sel_mode_trans)
        slot_orbits = trans_anchors[slot_orbits_k]                  # [B, S]

        sel = slot_orbits_k[..., None]
        slot_cost_sel = jnp.take_along_axis(orbit_cost, sel, axis=2)[..., 0]
        indicator = (slot_counts > 0.5).astype(jnp.float32)         # [B, S]
        slot_loss = jnp.sum(slot_cost_sel * indicator, axis=-1)     # [B]

        pred_R = jnp.take_along_axis(slot_R, sel[..., None, None], axis=2)[:, :, 0]
        pred_T = jnp.take_along_axis(slot_T_rot, sel[..., None], axis=2)[:, :, 0]
        # selected transformed points from the selected pose directly — never
        # gather from a full [B, S, K, M, 3] orbit tensor
        tpts_sel = (
            jnp.einsum("bsij,bsmj->bsmi", pred_R, canon) + pred_T[:, :, None, :]
        )                                                           # [B, S, M, 3]
        sel_anchor = anchors[slot_orbits]                           # [B, S, 3, 3]

        # articulation telemetry: the joint angle each slot actually uses at
        # its selected orbit.  If its batch spread is ~0 the model is not
        # articulating (the decoded canonical shape / translations absorb the
        # state change), which simultaneously leaves the predicted joint axis
        # unconstrained AND removes the only gradient channel that aligns
        # slots with rigid parts — the round-3 axis=82deg-at-IoU=1.0 symptom.
        if angle is not None:
            ang_t = angle[:, :, trans_anchors]                      # [B, S, K]
            pred_angle = jnp.take_along_axis(ang_t, sel, axis=2)[..., 0]
        else:
            pred_angle = jnp.zeros((B, S))

        # --- global (whole-shape) chamfer ------------------------------------
        union = (tpts_sel * indicator[..., None, None]).reshape(B, S * M, 3)
        fps_idx = furthest_point_sampling(union, N)
        sampled = jnp.take_along_axis(union, fps_idx[..., None], axis=1)
        g_r2o, g_o2r = chamfer_sq(sampled, xyz)
        glb_loss = (
            g_o2r.mean(-1)
            if c.glb_single_cd
            else g_r2o.mean(-1) + g_o2r.mean(-1)
        )

        loss = (
            glb_loss * c.glb_recon_factor + slot_loss * c.slot_recon_factor
        ).mean()

        # --- pivot & axis supervision (angle path, recon_prior 6-9) ---------
        # The joint axis/pivot receive gradient only through these terms plus
        # the pivot-derived translations; absent them the axis head is
        # untrained (the round-1 90 deg axis error).
        ax_line_sel = jnp.take_along_axis(
            defined_axis_t, slot_orbits_k[:, :1, None], axis=1
        )[:, 0]                                                     # [B, 3]
        if trans_from_pv and c.recon_prior in (6, 7, 8, 9):
            sg = jax.lax.stop_gradient
            # targets for the line terms: central-placed and
            # residual-transformed canonical parts, detached when pred_axis
            # (ref unsup_..._38:1494-1688 / _35:1100-1109)
            R_res_sel = sg(
                jnp.take_along_axis(R_res_t, sel[..., None, None], axis=2)[:, :, 0]
            )                                                       # [B,S,3,3]
            T_res_sel = sg(
                jnp.take_along_axis(T_res_t, sel[..., None], axis=2)[:, :, 0]
            )                                                       # [B,S,3]
            central_tr = sg(canon + central_points[:, :, None, :])  # [B,S,M,3]
            canon_tr = sg(
                jnp.einsum("bsij,bsmj->bsmi", R_res_sel, canon)
                + T_res_sel[:, :, None, :]
            )

            if self.chain_mode:
                n_shift = 7
                joint_len = 0.05                                    # ref _35:1136
            else:
                n_shift = 10
                joint_len = 0.30
            if slot_rng is not None:
                shift_rng = jax.random.fold_in(slot_rng, 17)
                dists = (
                    jax.random.randint(
                        shift_rng, (n_shift,), 1, int(joint_len * 100) + 1
                    ).astype(jnp.float32)
                    / 100.0
                )
            else:  # deterministic eval: even coverage of the joint segment
                dists = (jnp.arange(1, n_shift + 1, dtype=jnp.float32)) * (
                    joint_len / n_shift
                )
            if c.shape_type == "washing_machine":
                dists = dists - joint_len / 2.0
            # all shifted line samples at once (0 plus the n_shift offsets) —
            # one batched min replaces the reference's per-shift Python loop
            # (op-count matters: the degraded-backend mode charges per
            # executed HLO op).  With axis_reg_stra=1 the running-mean gate
            # sees all W shifts against the same pre-step average and updates
            # once per distance family (vs per shift) — same outlier
            # statistics, fewer state updates.
            offs = jnp.concatenate([jnp.zeros((1,)), dists])        # [W]

            if self.chain_mode:
                # per-joint pivot constraints (ref _35:1145-1224): each pair
                # pivot (and its axis-shifted copies) must lie near BOTH
                # adjacent parts' central-placed and residual-transformed
                # reconstructions; weight 0.2, normalised by n_shift/2.
                P = pv_points.shape[1]                              # S - 1
                pv_sh = (
                    pv_points[:, :, None, :]
                    - offs[None, None, :, None] * ax_line_sel[:, None, None, :]
                )                                                   # [B,P,W,3]

                def _pair_term(target):                             # [B,S,M,3]
                    d = jnp.min(
                        jnp.sum(
                            (
                                target[:, None, None]
                                - pv_sh[:, :, :, None, None, :]
                            )
                            ** 2,
                            -1,
                        ),
                        -1,
                    )                                               # [B,P,W,S]
                    ia = jnp.arange(P)
                    d_a = jnp.take_along_axis(
                        d, jnp.broadcast_to(
                            ia[None, :, None, None], d.shape[:3] + (1,)
                        ), axis=3,
                    )[..., 0]
                    d_b = jnp.take_along_axis(
                        d, jnp.broadcast_to(
                            (ia + 1)[None, :, None, None], d.shape[:3] + (1,)
                        ), axis=3,
                    )[..., 0]
                    return self._gate_pv((d_a + d_b) / 2.0).sum((-1, -2)).mean()

                axis_line = _pair_term(central_tr) + _pair_term(canon_tr)
                axis_line = 0.2 * axis_line / (float(n_shift) / 2.0)
                loss = loss + axis_line
            else:
                # (a) each slot's pair-pivot lies on its canonical part
                # (ref unsup_..._38:975-981)
                d_pv_canon = jnp.sum(
                    (pv_points[:, :, None, :] - sg(canon)) ** 2, axis=-1
                )                                                   # [B, S, M]
                pv_canon_cd = self._gate_pv(jnp.min(d_pv_canon, axis=-1))
                pv_canon_loss = pv_canon_cd.sum(-1).mean()

                # (b) the joint line {pv0 - t*axis} passes near both target
                # families (ref unsup_..._38:1494-1688)
                pvs = pv0[:, None, :] - offs[None, :, None] * ax_line_sel[:, None, :]
                d_c = jnp.min(
                    jnp.sum(
                        (central_tr[:, :, None] - pvs[:, None, :, None, :]) ** 2, -1
                    ),
                    -1,
                )                                                   # [B, S, W]
                d_k = jnp.min(
                    jnp.sum(
                        (canon_tr[:, :, None] - pvs[:, None, :, None, :]) ** 2, -1
                    ),
                    -1,
                )
                axis_line = (
                    self._gate_pv(d_c).sum((-1, -2)).mean()
                    + self._gate_pv(d_k).sum((-1, -2)).mean()
                )
                if c.recon_prior == 7:
                    # joint axis orthogonal to the pivot-nearest cuboid face
                    # (ref unsup_..._38:1494-1501, accumulated pre-division)
                    axis_line = axis_line + cuboid_axis_normal_loss(
                        pv_points, central_points, cub_x, cub_R, ax_line_sel
                    ).mean()
                axis_line = axis_line / (float(n_shift) / 4.0)
                loss = loss + pv_canon_loss + axis_line

        if c.recon_prior in (5, 7):
            # cuboid containment of each slot's input points under the
            # selected pose (ref unsup_..._38:1764-1800)
            loss = loss + cuboid_fit_loss(
                pred_R, pred_T, xyz, cub_x, cub_R, one_hot, attn_ori
            ).mean()

        if c.purity_factor > 0.0:
            # confidence (low per-point slot entropy) regulariser; the
            # reference defines it (common_utils.py:67) but never adds it —
            # exposed as an ablation for the segmentation plateau study
            from ..nn.losses import purity_loss

            pf = c.purity_factor
            if c.purity_warmup_steps > 0 and step is not None:
                # keep attention plastic early (config.purity_warmup_steps)
                pf = pf * jnp.clip(
                    step / float(c.purity_warmup_steps), 0.0, 1.0
                )
            loss = loss + pf * purity_loss(attn_ori)
        if c.ov_max_factor > 0.0:
            # anti-collapse: max slot's soft occupancy share above 1/S
            # (ref's commented-out pts_ov_max_percent_loss, unsup_..._35:1560)
            from ..nn.losses import ov_max_percent_loss

            loss = loss + c.ov_max_factor * ov_max_percent_loss(attn_ori)

        # --- per-point poses & next-iteration clouds -------------------------
        pt_R = jnp.take_along_axis(
            pred_R, hard_labels[:, :, None, None], axis=1
        )  # [B, N, 3, 3]
        pt_T = jnp.take_along_axis(pred_T, hard_labels[:, :, None], axis=1)  # [B,N,3]

        pt_R = jax.lax.stop_gradient(pt_R)
        pt_T = jax.lax.stop_gradient(pt_T)
        sR = jax.lax.stop_gradient(pred_R)
        sT = jax.lax.stop_gradient(pred_T)
        # x_s = R_s R_pt^T (p) + (T_s - R_s R_pt^T T_pt)  (ref :3289-3296)
        relR = jnp.einsum("bsij,bnkj->bsnik", sR, pt_R)           # [B,S,N,3,3]
        relT = sT[:, :, None] - jnp.einsum("bsnij,bnj->bsni", relR, pt_T)
        x_next = jnp.einsum("bsnij,bnj->bsni", relR, xyz) + relT  # [B,S,N,3]
        x_next = jnp.moveaxis(x_next, 1, 0)                       # [S,B,N,3]

        # real (world-frame) joint axis (ref :3095-3102)
        real_axis = jnp.einsum("bij,bj->bi", sel_anchor[:, 0], ax_line_sel)
        # pivot-offset scalar exposed for eval (ref _38:1129-1130 uses the
        # plain norm of the shared pivot point)
        offset_pivot = jnp.linalg.norm(pv0, axis=-1)               # [B]

        return {
            "loss": loss,
            "glb_loss": glb_loss.mean(),
            "slot_loss": slot_loss.mean(),
            "recon_l1": 0.5
            * (jnp.sqrt(g_r2o).mean() + jnp.sqrt(g_o2r).mean()),
            "attn": attn_ori,
            "ppinv": ppinv,
            "hard_labels": hard_labels,
            "pred_R": pred_R,
            "pred_T": pred_T,
            "point_R": pt_R,
            "point_T": pt_T,
            "slot_canon": canon,
            "transformed_pts": tpts_sel,
            "pv_points": pv_points,
            "central_points": central_points,
            "slot_orbits": slot_orbits,
            "selected_anchors": sel_anchor,
            "real_defined_axis": real_axis,
            "pred_angle": pred_angle,
            "offset_pivot_points": offset_pivot,
            "base_slot": base_slot,
            "x_next": x_next,
            "x_seg": x_seg,
            "selected_pair_axes": sel_axes,
        }

    # ------------------------------------------------------------------
    def __call__(
        self,
        xyz: jnp.ndarray,
        rngs: Optional[jax.Array] = None,
        axis_prior: Optional[jnp.ndarray] = None,
        gt_label: Optional[jnp.ndarray] = None,
        step: Optional[jnp.ndarray] = None,
    ):
        """Multi-iteration forward (ref ``forward``, :3335-3379).

        Returns (loss, aux-dict of the last iteration).  With an
        ``axis_prior`` (slot_single_mode=0) the aux dict carries
        ``axis_prior_new`` — the sign-aligned EMA update to store in
        train-state (ref update_slot_pair_axis_prior).
        """
        c = self.cfg
        loss = 0.0
        out = None
        x_list = None
        hard_label = None
        for it in range(c.num_iters):
            rng = None
            if rngs is not None:
                rng = jax.random.fold_in(rngs, it)
            out = self.forward_one_iter(
                xyz,
                x_list=x_list,
                hard_label=hard_label,
                slot_rng=rng,
                axis_prior=axis_prior,
                # seg branch runs on the original cloud — iteration-invariant
                # (ref _38:515-518,572-576) — so reuse iteration 0's features
                x_seg=None if out is None else out["x_seg"],
                gt_label=gt_label,
                step=step,
            )
            loss = loss + out["loss"]
            x_list = out["x_next"]
            hard_label = out["hard_labels"]
        if axis_prior is not None and out["selected_pair_axes"] is not None:
            from .orbit_select import update_axis_prior

            out["axis_prior_new"] = update_axis_prior(
                axis_prior, jax.lax.stop_gradient(out["selected_pair_axes"])
            )
        return loss / c.num_iters, out
