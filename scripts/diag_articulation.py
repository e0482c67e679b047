"""Articulation-tracking diagnostic.

Question (round 3): with teacher-forced GT labels the oven run reaches
rot_err part1 = 9 deg yet axis_err = 82 deg.  Under slot_single_mode the
model's moving-slot rotation is R1 = A * Rot(ax, th1), so IF th1 tracks the
GT door angle across states, the physical rotation axis A*ax must align with
the GT axis and both numbers cannot hold at once.  The resolution must be
that th1 barely varies (the RANSAC delta then absorbs a near-constant R1 and
the 9 deg is just the spread of the GT state rotations about their mean,
leaving the predicted axis unconstrained).

This script measures it directly on a trained checkpoint: for each test
sample run the model on the POSED and the CANONICAL clouds and compare

  rel-R   = R1_posed @ R1_canon^T        (per matched part)
  gt-rel  = R_state @ R_ref^T            (the GT articulation)

reporting (a) the rotation-angle correlation between rel-R and gt-rel,
(b) the angular error of rel-R's rotation AXIS vs the GT joint axis, and
(c) the reported real_defined_axis error for the same samples.

If angle-correlation is ~0 the model is not articulating (axis genuinely
unconstrained -> training-signal problem); if it is high but (c) is large,
the axis plumbing/metric is at fault (reference semantics:
``trainer_unsup_arti_align.py:1544-1549``, ``..._38:1846``).

Usage:
  python scripts/diag_articulation.py --ckpt ckpt_r3/ovengt_stage1.msgpack \
      --ckpt-glb ckpt_r2/oven_stage0.msgpack --category oven [--gt-labels] \
      [--batches 3] [--cpu]
"""
from __future__ import annotations

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--ckpt-glb", default=None)
    ap.add_argument("--category", default="oven")
    ap.add_argument("--gt-labels", action="store_true",
                    help="teacher-force the GT partition (diagnostic ckpts)")
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("--chip", dest="cpu", action="store_false")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "/root/repo")
    from equi_articulated_pose_tpu.config import get_config
    from equi_articulated_pose_tpu.data import DataLoader, build_dataset
    from equi_articulated_pose_tpu.eval.evaluator import Evaluator
    from equi_articulated_pose_tpu.models import GlobalAlignModel, SlotPoseModel
    from equi_articulated_pose_tpu.train.checkpoint import load_params_any

    cfg = get_config(args.category)
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, dataset_type="synthetic"))
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, force_gt_labels=bool(args.gt_labels)))
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, batch_size=args.batch_size))

    model = SlotPoseModel(cfg=cfg.model)
    xyz0 = jnp.zeros((1, cfg.model.input_num, 3))
    tgt = jax.jit(model.init)(jax.random.PRNGKey(0), xyz0, jax.random.PRNGKey(1))
    params = load_params_any(args.ckpt, tgt)
    glb_model = glb_params = None
    if args.ckpt_glb:
        glb_model = GlobalAlignModel(cfg=cfg.model)
        gt = jax.jit(glb_model.init)(jax.random.PRNGKey(0), xyz0)
        glb_params = load_params_any(args.ckpt_glb, gt)
    ev = Evaluator(cfg, model, params, glb_model, glb_params)

    test = build_dataset(cfg.data, split="test")
    loader = DataLoader(test, args.batch_size, shuffle=False, prefetch=0)

    def rot_angle_axis(R):
        """R [..., 3, 3] -> (deg angle, unit axis [..., 3])."""
        tr = np.clip((np.trace(R, axis1=-2, axis2=-1) - 1) / 2, -1, 1)
        ang = np.degrees(np.arccos(tr))
        ax = np.stack([
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ], axis=-1)
        n = np.linalg.norm(ax, axis=-1, keepdims=True)
        return ang, ax / np.clip(n, 1e-8, None)

    rows = []
    for i, batch in enumerate(loader):
        if i >= args.batches:
            break
        lbl = jnp.asarray(batch["label"])
        clbl = jnp.asarray(batch["canon_label"])
        posed = ev._posed_fn(params, jnp.asarray(batch["pc"]), lbl)
        canon = ev._slots_fn(
            params, jnp.asarray(batch["canon_pc"]),
            clbl if cfg.model.force_gt_labels else None)

        matching = np.asarray(posed["matching"])                    # [B, P]
        mi = matching[..., None, None]
        Rp = np.take_along_axis(np.asarray(posed["R_w"]), mi, 1)    # [B,P,3,3]
        Rc = np.take_along_axis(np.asarray(canon["R_w"]), mi, 1)
        rel = np.einsum("bpij,bpkj->bpik", Rp, Rc)

        gt_rel = np.einsum("bpij,bpkj->bpik",
                           np.asarray(batch["part_state_rots"]),
                           np.asarray(batch["part_ref_rots"]))

        ang_p, ax_p = rot_angle_axis(rel)
        ang_g, ax_g = rot_angle_axis(gt_rel)
        gt_axis = np.asarray(batch["part_axis"])[:, 0]              # [B, 3]
        gt_axis = gt_axis / np.clip(
            np.linalg.norm(gt_axis, axis=-1, keepdims=True), 1e-8, None)
        pred_axis = np.asarray(posed["axis_w"])                     # [B, 3]

        orb_p = np.asarray(posed["slot_orbits"])            # [B, S]
        orb_c = np.asarray(canon["slot_orbits"])
        th_p = np.degrees(np.asarray(posed["pred_angle"]))  # [B, S]
        th_c = np.degrees(np.asarray(canon["pred_angle"]))

        for b in range(ang_p.shape[0]):
            row = {
                "pred_dtheta": [float(a) for a in ang_p[b]],
                "gt_dtheta": [float(a) for a in ang_g[b]],
                "orbit_posed": int(orb_p[b, 0]),
                "orbit_canon": int(orb_c[b, 0]),
                "theta_posed": [float(a) for a in th_p[b]],
                "theta_canon": [float(a) for a in th_c[b]],
                # angle between the moving part's rel-rot axis and GT axis
                "relrot_axis_err": [
                    float(np.degrees(np.arccos(
                        min(abs(float(np.dot(ax_p[b, p], gt_axis[b]))), 1.0))))
                    for p in range(ang_p.shape[1])
                ],
                "reported_axis_err": float(np.degrees(np.arccos(
                    min(abs(float(np.dot(pred_axis[b], gt_axis[b]))), 1.0)))),
            }
            rows.append(row)
        print(f"batch {i} done", flush=True)

    P = len(rows[0]["pred_dtheta"])
    print("\nper-sample table (pred_dtheta / gt_dtheta per part; axis errs):")
    for r in rows:
        pd = "/".join(f"{a:6.1f}" for a in r["pred_dtheta"])
        gd = "/".join(f"{a:6.1f}" for a in r["gt_dtheta"])
        ae = "/".join(f"{a:5.1f}" for a in r["relrot_axis_err"])
        tp = "/".join(f"{a:5.1f}" for a in r["theta_posed"])
        tc = "/".join(f"{a:5.1f}" for a in r["theta_canon"])
        print(f"  pred {pd} | gt {gd} | relrot-ax {ae} "
              f"| rep-ax {r['reported_axis_err']:5.1f} "
              f"| orbit {r['orbit_posed']:2d}/{r['orbit_canon']:2d} "
              f"| theta {tp} vs {tc}")

    import numpy as _np
    for p in range(P):
        x = _np.array([r["pred_dtheta"][p] for r in rows])
        y = _np.array([r["gt_dtheta"][p] for r in rows])
        c = float(_np.corrcoef(x, y)[0, 1]) if x.std() > 1e-6 else 0.0
        print(f"part {p}: pred_dtheta mean {x.mean():.1f} std {x.std():.1f}; "
              f"gt mean {y.mean():.1f} std {y.std():.1f}; corr {c:.3f}; "
              f"relrot-axis-err med "
              f"{_np.median([r['relrot_axis_err'][p] for r in rows]):.1f}")
    print(f"reported-axis-err mean "
          f"{_np.mean([r['reported_axis_err'] for r in rows]):.1f}")


if __name__ == "__main__":
    main()
