"""Baseline segmentation IoU: DGCNN / PointNet++ next to the equivariant model.

The reference imports its DGCNN ``PrimitiveNet`` as a baseline component
(``unsup_..._40:25``, ``SPConvNets/models/DGCNN.py``); it never ships a
baseline training recipe, so the honest comparison is a *supervised* ceiling:
train each baseline with cross-entropy on the same synthetic category the
unsupervised equivariant model is evaluated on, and report hungarian-matched
IoU on the test split (metric identical to the evaluator's,
``loss_util.py:69-160``).

Run (CPU, ~10 min):  python scripts/baseline_iou.py --category oven --steps 300

Prints one JSON line per network.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--category", default="oven")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--npoints", type=int, default=256)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    import optax

    from equi_articulated_pose_tpu.config import get_config
    from equi_articulated_pose_tpu.data import DataLoader, build_dataset
    from equi_articulated_pose_tpu.eval.metrics import matched_seg_iou
    from equi_articulated_pose_tpu.models.baselines import DGCNNSeg, PointNet2Seg
    from equi_articulated_pose_tpu.nn.losses import cross_entropy

    cfg = get_config(args.category)
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset_type="synthetic", npoints=args.npoints
        )
    )
    nparts = cfg.model.nmasks
    train_ds = build_dataset(cfg.data, split="train")
    test_ds = build_dataset(cfg.data, split="test")

    for name, net in (
        ("dgcnn", DGCNNSeg(num_classes=nparts, k=args.k)),
        ("pointnet2", PointNet2Seg(num_classes=nparts)),
    ):
        loader = DataLoader(train_ds, args.batch_size, seed=0)
        it = iter(loader.epochs())
        first = next(it)
        params = net.init(jax.random.PRNGKey(0), jnp.asarray(first["pc"]))
        tx = optax.adam(args.lr)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, xyz, label):
            def loss_fn(p):
                logits = net.apply(p, xyz)
                loss, acc = cross_entropy(logits, label)
                return loss, acc

            (loss, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            upd, opt2 = tx.update(g, opt)
            return optax.apply_updates(params, upd), opt2, loss, acc

        t0 = time.time()
        batch = first
        for i in range(args.steps):
            params, opt, loss, acc = step(
                params, opt, jnp.asarray(batch["pc"]), jnp.asarray(batch["label"])
            )
            batch = next(it)
            if (i + 1) % 100 == 0:
                print(
                    f"# {name} step {i+1}: loss={float(loss):.4f} "
                    f"acc={float(acc):.4f} ({time.time()-t0:.0f}s)",
                    file=sys.stderr,
                )

        @jax.jit
        def infer(params, xyz):
            return jnp.argmax(net.apply(params, xyz), axis=-1)

        ious = []
        tl = DataLoader(test_ds, args.batch_size, shuffle=False, prefetch=0)
        for bi, batch in enumerate(tl):
            if bi >= 25:
                break
            pred = infer(params, jnp.asarray(batch["pc"]))
            pred_oh = jax.nn.one_hot(pred, nparts).transpose(0, 2, 1)
            gt_oh = jax.nn.one_hot(
                jnp.asarray(batch["label"]), nparts
            ).transpose(0, 2, 1)
            iou, _ = matched_seg_iou(pred_oh, gt_oh)
            ious.append(np.asarray(iou))
        print(
            json.dumps(
                {
                    "baseline": name,
                    "category": args.category,
                    "supervised_steps": args.steps,
                    "seg_iou": round(float(np.concatenate(ious).mean()), 4),
                }
            )
        )


if __name__ == "__main__":
    main()
