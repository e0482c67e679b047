#!/usr/bin/env python
"""CLI entry point — the analog of the reference's
``run_unsup_arti_align.py`` + ``scripts/train/*.sh`` recipes.

Examples:
    # stage 0 (global alignment) then stage 1 for the oven recipe
    python run.py train --category oven --stage 0 --steps 2000
    python run.py train --category oven --stage 1 --steps 20000 \
        --resume-glb ckpt/oven_stage0.msgpack

    # two-pass evaluation with RANSAC delta fitting
    python run.py eval --category oven --ckpt ckpt/oven_stage1.msgpack

    # quick synthetic-data smoke run (no external data needed)
    python run.py train --category oven --dataset synthetic --steps 50
"""
from __future__ import annotations

import argparse
import dataclasses
import os


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--category", default="oven",
                        help="preset name (oven, washing_machine, laptop, safe,"
                             " eyeglasses, drawer, laptop_partial, laptop_hoi4d)")
        sp.add_argument("--dataset", default=None,
                        help="override dataset_type (synthetic | motion | "
                             "motion_partial | hoi4d | sapien)")
        sp.add_argument("--data-path", default="./data")
        sp.add_argument("--indep-prismatic", action="store_true",
                        help="sample each prismatic part's opening"
                             " independently (drawer: restores the"
                             " between-part motion signal the motion-pair"
                             " teacher needs; default keeps the tied grid"
                             " so earlier drawer rows stay comparable)")
        sp.add_argument("--batch-size", type=int, default=None)
        sp.add_argument("--ckpt-dir", default="./ckpt")
        sp.add_argument("--compute-dtype", default=None,
                        help="float32 | bfloat16")
        sp.add_argument("--chunk-a", type=int, default=None)
        sp.add_argument("--fused", action="store_true",
                        help="fused Pallas inter-conv kernel (TPU)")
        sp.add_argument("--fused-bwd", action="store_true",
                        help="fully-fused Pallas backward for the inter conv")
        sp.add_argument("--force-gt-labels", action="store_true",
                        help="DIAGNOSTIC: teacher-force the slot partition "
                             "to the GT segmentation")
        sp.add_argument("--no-remat-chunks", action="store_true",
                        help="keep anchor-chunk activations for backward "
                             "instead of rematerialising (fewer executed ops,"
                             " more HBM)")
        sp.add_argument("--purity-factor", type=float, default=None,
                        help="weight of the slot-confidence (purity) loss")
        sp.add_argument("--purity-warmup", type=int, default=None,
                        help="linear warm-up steps for --purity-factor (keeps"
                             " attention plastic early; 0 = off)")
        sp.add_argument("--ov-max-factor", type=float, default=None,
                        help="weight of the anti-collapse max-slot-occupancy loss")
        sp.add_argument("--axis-from-relpose", type=float, default=None,
                        help="weight of the cross-state relative-pose axis"
                             " supervision; without --canon-consist this is"
                             " the distill-only mode (axis head follows the"
                             " relpose target, pose path untouched)")
        sp.add_argument("--canon-consist", type=float, default=None,
                        help="weight of the cross-state canonical-consistency"
                             " loss (pairs each posed cloud with its"
                             " canonical-state twin; forces the joint motion"
                             " into theta*axis instead of the decoder)")
        sp.add_argument("--motion-pair-factor", type=float, default=None,
                        help="weight of the motion-based attention pairing"
                             " loss: cluster cross-state point motion into S"
                             " rigid transforms and CE the slot attention"
                             " toward the matched clusters (the first signal"
                             " that acts ON the attention)")
        sp.add_argument("--motion-pair-tau", type=float, default=None,
                        help="softmin temperature for the motion-cluster EM")
        sp.add_argument("--motion-pair-spatial", type=float, default=None,
                        help="spatial-coherence weight for the motion EM:"
                             " separates parts with identical motions but"
                             " disjoint extents (drawer)")
        sp.add_argument("--motion-pair-corr", default=None,
                        choices=("index", "feat"),
                        help="cross-state correspondence: shared FPS indices"
                             " (complete synthetic clouds) or feature-space"
                             " 1-NN (partial/real scans)")
        sp.add_argument("--attn-temp-start", type=float, default=None,
                        help="initial slot-attention softmax temperature"
                             " (anneals linearly to 1 over --attn-temp-steps)")
        sp.add_argument("--attn-temp-steps", type=int, default=None,
                        help="steps to anneal the attention temperature over"
                             " (0 = off)")
        sp.add_argument("--soft-seg-weights", action="store_true",
                        help="weight the slot->orig chamfer by full soft "
                             "attention (soft-clustering segmentation dynamics)")
        sp.add_argument("--soft-seg-pointwise", action="store_true",
                        help="with --soft-seg-weights: normalise by point "
                             "count (mixture loss, no balanced-cluster prior)"
                             " instead of per-slot attention mass")
        sp.add_argument("--orbit-chunk-k", type=int, default=None,
                        help="stream the per-(slot,anchor) chamfer over "
                             "anchor chunks of this size (bounds HBM)")

    t = sub.add_parser("train")
    common(t)
    t.add_argument("--stage", type=int, default=1, choices=(0, 1))
    t.add_argument("--steps", type=int, default=None)
    t.add_argument("--lr", type=float, default=None)
    t.add_argument("--resume", default=None)
    t.add_argument("--resume-glb", default=None,
                   help="stage-0 checkpoint for frozen pre-alignment")
    t.add_argument("--no-global-rot", action="store_true")
    t.add_argument("--steps-per-call", type=int, default=None,
                   help="optimizer steps per jitted dispatch (amortises RPC"
                        " overhead on relayed TPU backends)")
    t.add_argument("--block-every", type=int, default=None,
                   help="async dispatches kept in flight before blocking"
                        " (hides per-RPC latency; 1 = synchronous)")
    t.add_argument("--eval-freq", type=int, default=None,
                   help="in-train eval period in steps (0 disables)")
    t.add_argument("--log-freq", type=int, default=None)
    t.add_argument("--axis-reg-stra", type=int, default=None,
                   help="1 = running-mean outlier gate on pivot/axis-line"
                        " distances (ref --axis-reg-stra)")

    e = sub.add_parser("eval")
    common(e)
    e.add_argument("--ckpt", required=True)
    e.add_argument("--ckpt-glb", default=None)
    e.add_argument("--max-batches", type=int, default=50)
    e.add_argument("--data-seed", type=int, default=None,
                   help="override the test dataset's shape seed (repeat-seed "
                        "evals: fresh val shapes, identical compiled step)")
    return p


def _make_cfg(args):
    from equi_articulated_pose_tpu.config import get_config

    cfg = get_config(args.category)
    data_kw = {"dataset_path": args.data_path}
    if args.dataset:
        data_kw["dataset_type"] = args.dataset
    if getattr(args, "indep_prismatic", False):
        data_kw["indep_prismatic"] = True
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, **data_kw), model_dir=args.ckpt_dir
    )
    model_kw = {}
    if args.compute_dtype:
        model_kw["compute_dtype"] = args.compute_dtype
    if args.chunk_a is not None:
        model_kw["chunk_a"] = args.chunk_a
    if getattr(args, "fused", False):
        model_kw["fused_interconv"] = True
    if getattr(args, "fused_bwd", False):
        model_kw["fused_interconv"] = True
        model_kw["fused_bwd"] = True
    if getattr(args, "force_gt_labels", False):
        model_kw["force_gt_labels"] = True
    if getattr(args, "axis_reg_stra", None) is not None:
        model_kw["axis_reg_stra"] = args.axis_reg_stra
    if getattr(args, "no_remat_chunks", False):
        model_kw["remat_chunks"] = False
    if getattr(args, "purity_factor", None) is not None:
        model_kw["purity_factor"] = args.purity_factor
    if getattr(args, "purity_warmup", None) is not None:
        model_kw["purity_warmup_steps"] = args.purity_warmup
    if getattr(args, "ov_max_factor", None) is not None:
        model_kw["ov_max_factor"] = args.ov_max_factor
    if getattr(args, "canon_consist", None) is not None:
        model_kw["canon_consist_factor"] = args.canon_consist
    if getattr(args, "axis_from_relpose", None) is not None:
        model_kw["axis_from_relpose"] = args.axis_from_relpose
    if getattr(args, "motion_pair_factor", None) is not None:
        model_kw["motion_pair_factor"] = args.motion_pair_factor
    if getattr(args, "motion_pair_tau", None) is not None:
        model_kw["motion_pair_tau"] = args.motion_pair_tau
    if getattr(args, "motion_pair_spatial", None) is not None:
        model_kw["motion_pair_spatial"] = args.motion_pair_spatial
    if getattr(args, "motion_pair_corr", None) is not None:
        model_kw["motion_pair_corr"] = args.motion_pair_corr
    if getattr(args, "attn_temp_start", None) is not None:
        model_kw["attn_temp_start"] = args.attn_temp_start
    if getattr(args, "attn_temp_steps", None) is not None:
        model_kw["attn_temp_steps"] = args.attn_temp_steps
    if getattr(args, "soft_seg_weights", False):
        model_kw["soft_seg_weights"] = True
    if getattr(args, "soft_seg_pointwise", False):
        model_kw["soft_seg_pointwise"] = True
    if getattr(args, "orbit_chunk_k", None) is not None:
        model_kw["orbit_chunk_k"] = args.orbit_chunk_k
    if model_kw:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, **model_kw))
    train_kw = {}
    if args.batch_size:
        train_kw["batch_size"] = args.batch_size
    if getattr(args, "lr", None):
        train_kw["init_lr"] = args.lr
    if getattr(args, "steps", None):
        train_kw["num_iterations"] = args.steps
    if getattr(args, "no_global_rot", False):
        train_kw["global_rot"] = False
    if getattr(args, "steps_per_call", None):
        train_kw["steps_per_call"] = args.steps_per_call
    if getattr(args, "block_every", None):
        train_kw["block_every"] = args.block_every
    if getattr(args, "eval_freq", None) is not None:
        train_kw["eval_freq"] = args.eval_freq
    if getattr(args, "log_freq", None):
        train_kw["log_freq"] = args.log_freq
    if train_kw:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **train_kw))
    return cfg


def _enable_compile_cache():
    """Persistent XLA compilation cache: stage-1 compiles take ~8 min on the
    relayed TPU backend, and the resumable-ladder retry pattern (kill a
    degraded session, resume from the last periodic checkpoint) recompiles
    the identical executable each restart without this."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass  # older jax without the knobs — cache is an optimisation only


def main():
    args = build_argparser().parse_args()
    cfg = _make_cfg(args)
    _enable_compile_cache()

    if args.cmd == "train":
        import jax

        from equi_articulated_pose_tpu.train import Trainer
        from equi_articulated_pose_tpu.train.checkpoint import save_checkpoint

        tr = Trainer(cfg, stage=args.stage)
        # datasets via loader are built in the trainer; resume options:
        if args.resume_glb:
            tr.load_glb(args.resume_glb)
        params = None
        if args.resume:
            first = next(iter(tr.loader))
            tr.init_params(first)
            tr.resume(args.resume)
        params = tr.train(num_steps=cfg.train.num_iterations)
        out = os.path.join(
            cfg.model_dir, f"{cfg.data.shape_type}_stage{args.stage}.msgpack"
        )
        save_checkpoint(out, jax.device_get(params))
        print(f"saved final checkpoint: {out}")

    elif args.cmd == "eval":
        import jax
        import jax.numpy as jnp

        from equi_articulated_pose_tpu.eval.evaluator import Evaluator
        from equi_articulated_pose_tpu.data import DataLoader, build_dataset
        from equi_articulated_pose_tpu.models import GlobalAlignModel, SlotPoseModel
        from equi_articulated_pose_tpu.train.checkpoint import load_params_any

        model = SlotPoseModel(cfg=cfg.model)
        xyz = jnp.zeros((1, cfg.model.input_num, 3))
        tgt = jax.jit(model.init)(jax.random.PRNGKey(0), xyz, jax.random.PRNGKey(1))
        params = load_params_any(args.ckpt, tgt)
        glb_model = glb_params = None
        if args.ckpt_glb:
            glb_model = GlobalAlignModel(cfg=cfg.model)
            gt = jax.jit(glb_model.init)(jax.random.PRNGKey(0), xyz)
            glb_params = load_params_any(args.ckpt_glb, gt)
        ev = Evaluator(cfg, model, params, glb_model, glb_params)

        canon = build_dataset(cfg.data, split="train", canonical_input=True)
        deltas = ev.fit_deltas(
            DataLoader(canon, cfg.train.batch_size, shuffle=False, prefetch=0),
            jax.random.PRNGKey(0),
            args.max_batches,
        )
        seed_kw = {} if args.data_seed is None else {"seed": args.data_seed}
        test = build_dataset(cfg.data, split="test", **seed_kw)
        metrics = ev.evaluate(
            DataLoader(test, cfg.train.batch_size, shuffle=False, prefetch=0),
            deltas,
            args.max_batches,
        )
        for k in sorted(metrics):
            print(f"{k}: {metrics[k]:.4f}")


if __name__ == "__main__":
    main()
