"""Are the learned per-point invariant features part-separable AT ALL?

The round-3 root-cause chain located the segmentation plateau in the loss
dynamics (collapse -> balanced-cluster prior -> unused articulation DoF), but
never asked the layer below: can ANY clustering of the per-point features
(``ppinv`` — the exact tensor slot attention consumes, slot_pose.py
forward_one_iter) recover the GT parts?  Two probes per checkpoint:

  * unsupervised: per-sample k-means (k = nmasks) on l2-normalised ppinv ->
    hungarian-matched IoU vs GT.  >> slot IoU  => the features separate parts
    and the failure is purely the attention/loss dynamics; ~= slot IoU =>
    the features themselves carry no part signal and no weighting recipe can
    fix segmentation (the new-signal conclusion of VERDICT r3 item 1).
  * supervised ceiling: a per-point 1-NN transfer from OTHER samples'
    GT-labelled features (leave-one-out within the eval set) — how much part
    signal a perfect reader could extract from this representation.

Usage: python scripts/diag_feat_cluster.py <stage1-ckpt> [--glb CKPT]
           [--category oven] [--batches 4] [--out json-path]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def kmeans_labels(x, k, iters=60, restarts=4, seed=0):
    """Plain Lloyd with k-means++ init; x [N, C] -> labels [N]."""
    import numpy as np

    rng = np.random.RandomState(seed)
    best, best_obj = None, np.inf
    for r in range(restarts):
        # k-means++ seeding
        idx = [rng.randint(len(x))]
        for _ in range(k - 1):
            d2 = np.min(
                ((x[:, None] - x[idx][None]) ** 2).sum(-1), axis=1
            )
            p = d2 / max(d2.sum(), 1e-12)
            idx.append(rng.choice(len(x), p=p))
        cent = x[idx].copy()
        for _ in range(iters):
            d2 = ((x[:, None] - cent[None]) ** 2).sum(-1)   # [N, k]
            lab = d2.argmin(1)
            new = np.stack([
                x[lab == j].mean(0) if (lab == j).any() else cent[j]
                for j in range(k)
            ])
            if np.allclose(new, cent):
                break
            cent = new
        obj = ((x - cent[lab]) ** 2).sum()
        if obj < best_obj:
            best, best_obj = lab, obj
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--glb", default=None)
    ap.add_argument("--category", default="oven")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from equi_articulated_pose_tpu.config import get_config
    from equi_articulated_pose_tpu.data import DataLoader, build_dataset
    from equi_articulated_pose_tpu.eval.metrics import matched_seg_iou
    from equi_articulated_pose_tpu.models import GlobalAlignModel, SlotPoseModel
    from equi_articulated_pose_tpu.train.checkpoint import load_params_any

    cfg = get_config(args.category)
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, dataset_type="synthetic")
    )
    model = SlotPoseModel(cfg=cfg.model)
    xyz0 = jnp.zeros((1, cfg.model.input_num, 3))
    tgt = jax.jit(model.init)(jax.random.PRNGKey(0), xyz0, jax.random.PRNGKey(1))
    params = load_params_any(args.ckpt, tgt)
    glb_model = glb_params = None
    if args.glb:
        glb_model = GlobalAlignModel(cfg=cfg.model)
        gt = jax.jit(glb_model.init)(jax.random.PRNGKey(0), xyz0)
        glb_params = load_params_any(args.glb, gt)

    ds = build_dataset(cfg.data, split="test")
    loader = DataLoader(ds, args.batch_size, shuffle=False, prefetch=0)

    @jax.jit
    def fwd(xyz, key):
        x = xyz
        if glb_params is not None:
            g = glb_model.apply(glb_params, x)
            x = g["inv_pts"]
        (_, out), _ = model.apply(
            params, x, key, mutable=["batch_stats", "state"]
        )
        return out["ppinv"], out["attn"], out["hard_labels"]

    S = cfg.model.nmasks
    feats, labels, slot_lab = [], [], []
    for bi, batch in enumerate(loader):
        if bi >= args.batches:
            break
        pp, attn, hl = fwd(
            jnp.asarray(batch["pc"]), jax.random.PRNGKey(7)
        )
        feats.append(np.asarray(pp))
        labels.append(np.asarray(batch["label"]))
        slot_lab.append(np.asarray(hl))
    feats = np.concatenate(feats)        # [n, N, C]
    labels = np.concatenate(labels)      # [n, N]
    slot_lab = np.concatenate(slot_lab)  # [n, N]
    n, N, C = feats.shape
    P = int(labels.max()) + 1

    fn = feats / np.clip(
        np.linalg.norm(feats, axis=-1, keepdims=True), 1e-8, None
    )

    def iou_of(pred, k):
        pred_oh = np.eye(k)[pred].T[None]          # [1, k, N]
        gt_oh = np.eye(P)[labels[i]].T[None]       # [1, P, N]
        v, _ = matched_seg_iou(jnp.asarray(pred_oh), jnp.asarray(gt_oh))
        return float(np.asarray(v)[0])

    km_iou, slot_iou, nn_iou = [], [], []
    for i in range(n):
        km = kmeans_labels(fn[i], S, seed=i)
        km_iou.append(iou_of(km, S))
        slot_iou.append(iou_of(slot_lab[i], S))
        # leave-one-out 1-NN transfer from every OTHER sample's labelled pts
        others = [j for j in range(n) if j != i]
        bank = fn[others].reshape(-1, C)
        bank_lab = labels[others].reshape(-1)
        # cosine NN in chunks (bank is ~ (n-1)*N points)
        sim = fn[i] @ bank.T                        # [N, (n-1)N]
        nn_pred = bank_lab[sim.argmax(1)]
        nn_iou.append(iou_of(nn_pred, P))

    res = {
        "ckpt": args.ckpt,
        "category": args.category,
        "n_samples": n,
        "kmeans_iou_mean": float(np.mean(km_iou)),
        "kmeans_iou_median": float(np.median(km_iou)),
        "slot_iou_mean": float(np.mean(slot_iou)),
        "nn_transfer_iou_mean": float(np.mean(nn_iou)),
        "note": "kmeans>>slot => failure is attention/loss dynamics; "
        "kmeans~=slot~=1/P => features carry no part signal",
    }
    print(json.dumps(res, indent=1), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
