"""A/B harness for step-time experiments on the oven380 b4 train step.

Usage: python scripts/bench_ab.py [--no-remat] [--fused] [--chunk-a N]
       [--iters N] [--batch N]

Prints one JSON line with sec/step (execution-forced timing — the relayed
backend needs a device_get per iteration, see bench.py).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--fused-bwd", action="store_true",
                    help="fully-fused Pallas backward (implies --fused)")
    ap.add_argument("--chunk-a", type=int, default=12)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--category", default="oven")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".jax_cache",
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    import optax

    from equi_articulated_pose_tpu.config import get_config
    from equi_articulated_pose_tpu.models import SlotPoseModel

    cfg = get_config(args.category).model
    cfg = dataclasses.replace(
        cfg,
        compute_dtype="bfloat16",
        chunk_a=args.chunk_a,
        remat_chunks=not args.no_remat,
        fused_interconv=args.fused or args.fused_bwd,
        fused_bwd=args.fused_bwd,
    )
    model = SlotPoseModel(cfg=cfg)
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(args.batch, cfg.input_num, 3).astype(np.float32) * 0.3)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), xyz[:1], jax.random.PRNGKey(1))
    tx = optax.adam(1e-4)
    opt_state = tx.init(params["params"])

    @jax.jit
    def train_step(variables, opt_state, xyz, key):
        rest = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            (loss, out), mstate = model.apply(
                {"params": p, **rest}, xyz, key, mutable=["batch_stats"]
            )
            return loss, mstate

        (loss, mstate), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        updates, opt_state2 = tx.update(grads, opt_state, variables["params"])
        params2 = jax.tree_util.tree_map(
            lambda p, u: p + u, variables["params"], updates
        )
        return {"params": params2, **mstate}, opt_state2, loss

    key = jax.random.PRNGKey(2)
    t0 = time.perf_counter()
    params, opt_state, loss = train_step(params, opt_state, xyz, key)
    float(np.asarray(jax.device_get(loss)).mean())
    compile_s = time.perf_counter() - t0

    # HLO op count of the compiled step (graph-size proxy for the
    # degraded-mode per-op overhead)
    try:
        lowered = train_step.lower(params, opt_state, xyz, key)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        n_ops = sum(
            1 for ln in hlo.splitlines() if "=" in ln and not ln.lstrip().startswith("//")
        )
    except Exception:
        n_ops = -1

    t0 = time.perf_counter()
    for i in range(args.iters):
        params, opt_state, loss = train_step(
            params, opt_state, xyz, jax.random.fold_in(key, i)
        )
        float(np.asarray(jax.device_get(loss)).mean())
    sps = (time.perf_counter() - t0) / args.iters
    print(
        json.dumps(
            {
                "config": {
                    "remat": not args.no_remat,
                    "fused": args.fused or args.fused_bwd,
                    "fused_bwd": args.fused_bwd,
                    "chunk_a": args.chunk_a,
                    "batch": args.batch,
                },
                "sec_per_step": round(sps, 4),
                "compile_s": round(compile_s, 1),
                "hlo_ops": n_ops,
                "loss": round(float(np.asarray(jax.device_get(loss)).mean()), 5),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
