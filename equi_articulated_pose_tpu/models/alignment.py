"""Stage-0 global alignment model.

Factors out the global SE(3) pose by reconstructing a canonical shape and
selecting the best of the 60 anchor rotations by chamfer distance
(ref stage-0 forward, ``unsup_..._40:1366-1534``; SURVEY.md §3.2).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..geom import so3 as so3g
from ..nn.blocks import SO3Backbone, make_backbone_specs
from ..nn.containers import SpherePoints, preprocess_input
from ..nn.decoders import DecoderFC
from ..nn.heads import SO3PoseHead
from ..nn.outblocks import InvOutBlock
from ..ops.chamfer import chamfer_sq


class GlobalAlignModel(nn.Module):
    """Outputs a per-sample global rotation/translation and canonical recon.

    Loss is the per-sample min-over-orbit chamfer between the transformed
    canonical reconstruction and the input cloud.
    """

    cfg: ModelConfig
    axis_name: Optional[str] = None

    def setup(self):
        c = self.cfg
        self.backbone = SO3Backbone(
            specs=make_backbone_specs(
                c.mlps,
                kanchor=c.kanchor,
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
            ),
            axis_name=self.axis_name,
        )
        self.outblock = InvOutBlock(
            mlp=c.out_mlp,
            temperature=c.temperature,
            norm=c.norm,
            axis_name=self.axis_name,
        )
        self.rt_head = SO3PoseHead(
            mlp=c.out_mlp,
            representation="quat",
            pred_t=True,
            norm=c.norm,
            axis_name=self.axis_name,
        )
        self.recon_net = DecoderFC((256, 256), c.glb_recon_npoints)
        self.anchors_const = jnp.asarray(so3g.get_anchors(c.kanchor))

    def __call__(self, xyz: jnp.ndarray, train: bool = True):
        """xyz: [B, N, 3] -> dict(loss, glb_R [B,3,3], glb_T [B,3],
        inv_pts [B,N,3], orbit [B], canon [B,M,3])."""
        B, N, _ = xyz.shape
        A = self.cfg.kanchor
        anchors = self.anchors_const

        # identity per-point poses on the active path: pass pose=None so
        # InterSO3Conv skips the (identity) anchor permutation entirely
        x = preprocess_input(xyz, A)
        x = self.backbone(x)

        inv_feat, conf = self.outblock(x, mask=None)
        canon = self.recon_net(inv_feat) - 0.5  # [B, M, 3]

        rt = self.rt_head(x, mask=None)
        quat = rt["R"]  # [B, A, 4]
        R = so3g.quat_to_matrix(quat)                    # [B, A, 3, 3]
        R = jnp.einsum("aij,bajk->baik", anchors, R)     # anchor-composed

        # The reference discards the learned T for stage 0 (unsup_..._40:1437)
        # and uses the input centroid: T_a = mean(xyz).
        centroid = jnp.mean(xyz, axis=1)                 # [B, 3]
        T = jnp.broadcast_to(centroid[:, None], (B, A, 3))

        # transformed recon per anchor: [B, A, M, 3]
        rec = jnp.einsum("baij,bmj->bami", R, canon) + T[:, :, None, :]
        d_rec_to_ori, d_ori_to_rec = chamfer_sq(
            rec, jnp.broadcast_to(xyz[:, None], (B, A, N, 3))
        )
        cd_r2o = d_rec_to_ori.mean(-1)  # [B, A]
        cd_o2r = d_ori_to_rec.mean(-1)  # [B, A]
        glb_cd = cd_o2r if self.cfg.glb_single_cd else (cd_r2o + cd_o2r)

        loss, orbit = jnp.min(glb_cd, axis=-1), jnp.argmin(glb_cd, axis=-1)

        sel = orbit[:, None, None, None]
        glb_R = jnp.take_along_axis(R, sel, axis=1)[:, 0]          # [B, 3, 3]
        glb_T = jnp.take_along_axis(T, orbit[:, None, None], axis=1)[:, 0]
        inv_pts = jnp.einsum("bji,bnj->bni", glb_R, xyz - glb_T[:, None])

        recon_l1 = 0.5 * (
            jnp.sqrt(jnp.take_along_axis(cd_r2o, orbit[:, None], 1))[:, 0]
            + jnp.sqrt(jnp.take_along_axis(cd_o2r, orbit[:, None], 1))[:, 0]
        )

        return {
            "loss": loss.mean(),
            "per_sample_loss": loss,
            "glb_R": glb_R,
            "glb_T": glb_T,
            "inv_pts": inv_pts,
            "orbit": orbit,
            "canon": canon,
            "recon_l1": recon_l1.mean(),
            "anchor_conf": conf,
        }
