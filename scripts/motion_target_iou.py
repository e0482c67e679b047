#!/usr/bin/env python
"""Validate the motion-cluster target quality on REAL pipeline data (CPU).

Before spending chip hours on a motion-pair training arm, measure the upper
bound the loss can teach: the matched IoU of the motion-cluster target q
(nn/motion_pair.py) against GT part labels, on the same synthetic datasets
the chip arms train on — including the random global rotation R1 that
training sees (motion clustering is invariant to it: R1 is shared across the
pair and the EM's global seed fit absorbs it).

Usage: python scripts/motion_target_iou.py [category ...]
"""
import sys

sys.path.insert(0, ".")
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax.numpy as jnp
import jax
import numpy as np

from equi_articulated_pose_tpu.config import get_config
from equi_articulated_pose_tpu.data import DataLoader, build_dataset
from equi_articulated_pose_tpu.eval.metrics import matched_seg_iou
from equi_articulated_pose_tpu.nn.motion_pair import motion_cluster_targets

import argparse

ap = argparse.ArgumentParser()
ap.add_argument("cats", nargs="*",
                default=["oven", "washing_machine", "safe", "laptop", "eyeglasses"])
ap.add_argument("--spatial", type=float, default=0.0,
                help="spatial_weight for the EM (0 = pure motion)")
ap.add_argument("--spatial-tau", type=float, default=0.04)
ap.add_argument("--indep", action="store_true",
                help="independent per-part prismatic states (drawer)")
args = ap.parse_args()
cats = args.cats
B, NBATCH = 4, 8

for cat in cats:
    cfg = get_config(cat)
    cfg = cfg.replace(data=cfg.data.__class__(
        **{**cfg.data.__dict__, "dataset_type": "synthetic",
           "indep_prismatic": args.indep}))
    ds = build_dataset(cfg.data, split="train")
    loader = DataLoader(ds, B, seed=0, shuffle=True, prefetch=0)
    S = cfg.model.nmasks
    ious, gates, accs = [], [], []
    it = iter(loader)
    for bi in range(NBATCH):
        batch = next(it)
        pc = jnp.asarray(batch["pc"])              # [B, N, 3] posed (R1 on)
        cpc = jnp.asarray(batch["canon_pc"])       # [B, N, 3] canonical state
        lbl = np.asarray(batch["label"])           # [B, N]
        q, gate = motion_cluster_targets(
            cpc, pc, S,
            spatial_weight=args.spatial, spatial_tau=args.spatial_tau,
        )
        q_hard = jax.nn.one_hot(jnp.argmax(q, 1), S).transpose(0, 2, 1)
        P = batch["pose_segs"].shape[1]
        gt = jax.nn.one_hot(jnp.asarray(lbl), P).transpose(0, 2, 1)
        iou, _ = matched_seg_iou(q_hard, gt)
        ious.append(np.asarray(iou))
        gates.append(np.asarray(gate))
    ious = np.concatenate(ious)
    gates = np.concatenate(gates)
    print(f"{cat:18s} target IoU mean={ious.mean():.3f} "
          f"p25={np.percentile(ious,25):.3f} p75={np.percentile(ious,75):.3f} "
          f"gate mean={gates.mean():.3f} gate>0.3 frac={(gates>0.3).mean():.2f}",
          flush=True)
