"""Degenerate one-slot segmentation IoU per category (CPU, ~1 min each).

The round-3/4 'one-slot bar' (0.4241) was measured on OVEN; this computes
the same bar for every category with the evaluator's own metric and data
plumbing (`matched_seg_iou`, same test split, same 15x4 batches as the
shipped evals), so breakthrough claims compare against the right number.
Usage:  python scripts/oneslot_iou.py [--categories safe oven ...]
Prints one JSON line per category with the 380-pt and full-cloud scores.
"""
from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--categories",
        nargs="*",
        default=["oven", "safe", "laptop", "washing_machine", "drawer", "eyeglasses"],
    )
    ap.add_argument("--max-batches", type=int, default=15)
    ap.add_argument("--batch-size", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from equi_articulated_pose_tpu.config import get_config
    from equi_articulated_pose_tpu.data import DataLoader, build_dataset
    from equi_articulated_pose_tpu.eval.metrics import matched_seg_iou

    for cat in args.categories:
        import dataclasses

        cfg = get_config(cat)
        data_cfg = dataclasses.replace(cfg.data, dataset_type="synthetic")
        ds = build_dataset(data_cfg, split="test")
        loader = DataLoader(ds, args.batch_size, shuffle=False, prefetch=0)
        S = cfg.model.nmasks
        ious, ious_full = [], []
        for i, batch in enumerate(loader):
            if i >= args.max_batches:
                break
            for pts_key, lab_key, sink in (
                ("pc", "label", ious),
                ("oorr_pc", "oorr_label", ious_full),
            ):
                lab = jnp.asarray(batch[lab_key])
                B, N = lab.shape
                pred_oh = jnp.zeros((B, S, N)).at[:, 0, :].set(1.0)
                gt_oh = jax.nn.one_hot(lab, S).transpose(0, 2, 1)
                iou, _ = matched_seg_iou(pred_oh, gt_oh)
                sink.append(np.asarray(iou))
        print(
            json.dumps(
                {
                    "category": cat,
                    "one_slot_seg_iou": round(float(np.mean(np.concatenate(ious))), 4),
                    "one_slot_seg_iou_full": round(
                        float(np.mean(np.concatenate(ious_full))), 4
                    ),
                    "n_samples": int(sum(x.shape[0] for x in ious)),
                    "slots": S,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
