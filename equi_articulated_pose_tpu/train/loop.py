"""Training driver — the TPU analog of ``trainer_unsup_arti_align.py``.

Two-stage protocol (SURVEY.md §3.1/§5.4):

* stage 0 — train ``GlobalAlignModel`` on canonical-ish inputs to factor out
  the global pose;
* stage 1 — train ``SlotPoseModel``; when ``global_rot`` is on, every batch is
  first pre-aligned by the FROZEN stage-0 model (inverse global transform),
  inside the same jitted step (ref trainer:594-618).

Data parallelism is one jitted shard_map step over the device mesh: batch
sharded, grads/metrics/norm-stats pmean'd (vs DDP + SyncBN + manual
all_reduce).
"""
from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data import DataLoader, build_dataset
from ..eval.metrics import matched_seg_iou
from ..models import GlobalAlignModel, SlotPoseModel
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.dp import make_dp_train_step, per_device_rngs, replicate, shard_batch
from ..parallel.mesh import DATA_AXIS, make_mesh
from ..utils import Logger, Summary, Timer
from .checkpoint import load_checkpoint, safe_load_common, save_checkpoint
from .schedule import PlateauState, make_optimizer


class Trainer:
    def __init__(self, cfg: Config, stage: int = 1, mesh=None, log_dir: Optional[str] = None):
        self.cfg = cfg
        self.stage = stage
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_dev = self.mesh.shape[DATA_AXIS]
        self.log = Logger(log_dir)
        self.summary = Summary()
        self.log_dir = log_dir or os.path.join(cfg.model_dir, cfg.experiment_id)

        assert cfg.train.batch_size % self.n_dev == 0, (
            f"batch {cfg.train.batch_size} not divisible by {self.n_dev} devices"
        )

        axis = DATA_AXIS if self.n_dev > 1 else None
        cls = GlobalAlignModel if stage == 0 else SlotPoseModel
        self.model = cls(cfg=cfg.model, axis_name=axis)
        # axis-free twin for parameter init (pmean is unbound outside shard_map)
        self._init_model = cls(cfg=cfg.model, axis_name=None)
        self.glb_model = GlobalAlignModel(cfg=cfg.model, axis_name=axis)
        self._init_glb_model = GlobalAlignModel(cfg=cfg.model, axis_name=None)
        self.glb_params = None

        self.optimizer = make_optimizer(
            cfg.train.init_lr, cfg.train.lr_type, cfg.train.decay_rate,
            cfg.train.decay_step,
        )
        # loss-plateau lr adjustment (ref adjust_lr_by_loss, trainer:1119-1131)
        self.plateau = (
            PlateauState(cfg.train.init_lr, cfg.train.decay_rate)
            if cfg.train.lr_type == "plateau"
            else None
        )

        self.dataset = build_dataset(cfg.data, split="train")
        self.loader = DataLoader(
            self.dataset, cfg.train.batch_size, seed=cfg.train.seed
        )

        self._step_fn = None
        self.params = None
        self.opt_state = None
        self.axis_prior = None     # slot_single_mode=0 EMA; part of train state
        self.rng = jax.random.PRNGKey(cfg.train.seed)

    # ------------------------------------------------------------------
    def init_params(self, sample_batch):
        xyz = jnp.asarray(sample_batch["pc"][: max(2, self.n_dev)])
        if self.stage == 0:
            self.params = jax.jit(self._init_model.init)(jax.random.PRNGKey(0), xyz)
        else:
            self.params = jax.jit(self._init_model.init)(
                jax.random.PRNGKey(0), xyz, jax.random.PRNGKey(1)
            )
        self.opt_state = self.optimizer.init(self.params["params"])
        n_params = sum(
            np.prod(l.shape) for l in jax.tree_util.tree_leaves(self.params)
        )
        self.log.info(f"stage-{self.stage} model: {n_params/1e6:.2f}M params")

    def load_glb(self, path: str):
        """Load a frozen stage-0 checkpoint for pre-alignment
        (--resume-path-glb).

        Accepts both weight-only finals and full-train-state periodic
        checkpoints: resumable ladders harvest the latest periodic save when
        a stage-0 run is cut by a deadline, and that file carries
        params+opt_state+step.  ``load_params_any`` unwraps it; the previous
        strict ``load_checkpoint`` refused (0/92 leaves restored — the
        round-5 partlap stage-1 failure)."""
        from .checkpoint import load_params_any

        xyz = jnp.zeros((2, self.cfg.model.input_num, 3))
        tgt = self._init_glb_model.init(jax.random.PRNGKey(0), xyz)
        self.glb_params = load_params_any(path, tgt)
        self.log.info(f"loaded stage-0 weights from {path}")

    def resume(self, path: str):
        from .checkpoint import is_train_state, load_train_state

        if is_train_state(path):
            # full train state: params + Adam moments + schedule position
            # (the count inside opt_state), so resumed runs continue the lr
            # decay instead of jolting back to full lr
            self.params, self.opt_state, st, prior = load_train_state(
                path, jax.device_get(self.params), jax.device_get(self.opt_state)
            )
            if prior is not None:
                self.axis_prior = prior
            # warm-up schedules (purity_warmup_steps) must not re-ramp on
            # resume: offset the shipped step counter by the restored step
            self._step_offset = int(st)
            self.log.info(f"resumed full train state (step {st}) from {path}")
            return
        src = load_checkpoint(path, jax.device_get(self.params))
        self.params, n = safe_load_common(self.params, src)
        self.log.info(f"resumed {n} tensors from {path}")

    # ------------------------------------------------------------------
    def _loss_fn(self, params, batch, rng, axis_prior=None):
        xyz = batch["pc"]
        if self.stage == 0:
            out, mstate = self.model.apply(
                params, xyz, mutable=["batch_stats", "state"]
            )
            metrics = {"recon_l1": out["recon_l1"]}
            return out["loss"], (metrics, mstate)
        # stage 1: optional frozen pre-alignment (ref trainer:594-618).
        # The frozen model runs in eval mode (running norm stats), matching
        # the reference's glb_stage_model.eval().
        if self.glb_params is not None and self.cfg.train.global_rot:
            g = self.glb_model.apply(jax.lax.stop_gradient(self.glb_params), xyz)
            xyz = jax.lax.stop_gradient(g["inv_pts"])
        step_c = batch.get("step_count")
        if step_c is not None:
            step_c = step_c[0]
        (loss, out), mstate = self.model.apply(
            params, xyz, rng, axis_prior,
            gt_label=(
                batch["label"] if self.cfg.model.force_gt_labels else None
            ),
            step=step_c,
            mutable=["batch_stats", "state"],
        )
        metrics = {
            "glb_loss": out["glb_loss"],
            "slot_loss": out["slot_loss"],
            "recon_l1": out["recon_l1"],
        }
        mc = self.cfg.model
        if mc.needs_canon_pair:
            # cross-state canonical consistency (config.py docstring): run
            # the same forward on the paired canonical-state cloud — same
            # rng, so the slot queries (and hence slot indices) correspond —
            # and tie the two decoded canonical shapes together.  The canon
            # pass's norm/state mutations are discarded: running stats track
            # the posed distribution only.
            #
            # axis_from_relpose WITHOUT canon_consist is the distill-only
            # mode (round-4): the canonical twin forward still runs (forward
            # only, stop-grad) to provide the cross-state relative-pose axis
            # target, but no consistency penalty touches the pose path — the
            # measured failure of theta-forcing (ovengt2: head and relpose
            # both lock to ~60 deg) was the canon-consistency pull, while the
            # unforced run's poses carry a 23.9-deg-recoverable axis
            # (RESULTS r3 item 15).  Here only the axis head follows that
            # target.
            from ..nn.losses import canon_consistency_loss

            cxyz = batch["canon_pc"]
            if self.glb_params is not None and self.cfg.train.global_rot:
                gc = self.glb_model.apply(
                    jax.lax.stop_gradient(self.glb_params), cxyz
                )
                cxyz = jax.lax.stop_gradient(gc["inv_pts"])

            # the canonical twin FORWARD is only needed by losses that
            # consume its outputs; motion_pair with index correspondence
            # needs just the pre-aligned cloud pair
            needs_canon_fwd = (
                mc.canon_consist_factor > 0.0
                or mc.axis_from_relpose > 0.0
                or (mc.motion_pair_factor > 0.0
                    and mc.motion_pair_corr == "feat")
            )
            cout = None
            if needs_canon_fwd:
                # One-sided (target-network style): holding BOTH forwards'
                # residuals for backward exceeds HBM (17.5G vs 15.75G at oven
                # b4), and wrapping the canon pass in jax.checkpoint leaks
                # tracers through the nested remat inside the chunked/fused
                # conv backward.  stop_gradient instead: the canon pass is
                # forward-only (XLA stores no residuals for it), and the
                # posed decodes are pulled toward the per-instance
                # canonical-state target — which still removes the
                # state-absorbing degeneracy, since the target cannot chase
                # the posed decode back.
                (_cl, cout), _ = self.model.apply(
                    params, cxyz, rng, axis_prior,
                    gt_label=(
                        batch["canon_label"]
                        if self.cfg.model.force_gt_labels
                        else None
                    ),
                    mutable=["batch_stats", "state"],
                )
            if mc.canon_consist_factor > 0.0 or mc.axis_from_relpose > 0.0:
                ctgt = jax.lax.stop_gradient({
                    k: cout[k]
                    for k in ("slot_canon", "pv_points", "central_points",
                              "pred_R")
                })
            if mc.canon_consist_factor > 0.0:
                consist = canon_consistency_loss(out, ctgt)
                loss = loss + mc.canon_consist_factor * consist
                metrics["consist"] = jax.lax.stop_gradient(consist)
            if mc.axis_from_relpose > 0.0:
                from ..nn.losses import axis_from_relpose_loss

                ax_rel = axis_from_relpose_loss(
                    out["pred_R"], ctgt["pred_R"], out["real_defined_axis"],
                    base_slot=out["base_slot"],
                )
                loss = loss + mc.axis_from_relpose * ax_rel
                metrics["ax_rel"] = jax.lax.stop_gradient(ax_rel)
            if mc.motion_pair_factor > 0.0:
                from ..nn.motion_pair import (
                    feature_correspondence,
                    motion_pair_attention_loss,
                )

                if mc.motion_pair_corr == "feat":
                    corr = feature_correspondence(
                        jax.lax.stop_gradient(out["ppinv"]),
                        jax.lax.stop_gradient(cout["ppinv"]),
                        cxyz,
                    )
                else:  # 'index': complete clouds share FPS indices
                    corr = cxyz
                mp_loss, mp_q = motion_pair_attention_loss(
                    out["attn"], xyz, corr,
                    em_iters=mc.motion_pair_em_iters,
                    tau=mc.motion_pair_tau,
                    spatial_weight=mc.motion_pair_spatial,
                    spatial_tau=mc.motion_pair_spatial_tau,
                )
                loss = loss + mc.motion_pair_factor * mp_loss
                metrics["mp"] = jax.lax.stop_gradient(mp_loss)
                # target-quality telemetry: IoU of the motion-cluster target
                # itself vs GT — an upper bound on what the loss can teach
                mp_hard = jax.nn.one_hot(
                    jnp.argmax(mp_q, axis=1), mc.nmasks
                ).transpose(0, 2, 1)
                gt_oh = jax.nn.one_hot(
                    batch["label"], batch["pose_segs"].shape[1]
                ).transpose(0, 2, 1)
                mt_iou, _ = matched_seg_iou(mp_hard, gt_oh)
                metrics["mt_iou"] = jax.lax.stop_gradient(mt_iou.mean())
        # segmentation IoU vs GT (logging only; ref trainer:657-735)
        S = self.cfg.model.nmasks
        pred_onehot = jax.nn.one_hot(out["hard_labels"], S).transpose(0, 2, 1)
        P = batch["pose_segs"].shape[1]
        gt_onehot = jax.nn.one_hot(batch["label"], P).transpose(0, 2, 1)
        iou, _ = matched_seg_iou(pred_onehot, gt_onehot)
        metrics["iou"] = jax.lax.stop_gradient(iou.mean())
        # slot-collapse diagnostics: if one slot swallows (almost) every
        # point, IoU pins near 1/num_parts — these three scalars tell that
        # story per log window (round-2 review: the 0.42 plateau was
        # undiagnosable without them)
        occ = pred_onehot.mean(-1)                       # [B, S] occupancy
        metrics["occ_min"] = jax.lax.stop_gradient(occ.min(-1).mean())
        metrics["empty_slots"] = jax.lax.stop_gradient(
            (occ <= 0.0).astype(jnp.float32).mean()
        )
        attn = out["attn"]                               # [B, S, N]
        p = attn / jnp.clip(attn.sum(1, keepdims=True), 1e-8)
        ent = -jnp.sum(p * jnp.log(jnp.clip(p, 1e-8)), axis=1)
        metrics["attn_ent"] = jax.lax.stop_gradient(
            ent.mean() / jnp.log(float(self.cfg.model.nmasks))
        )
        # articulation telemetry: batch spread (deg) of the selected joint
        # angle, max over slots.  ~0 means the articulation DoF is unused —
        # the state change is being absorbed by the per-sample decoded canon
        # shape/translation instead, leaving the joint axis unconstrained.
        if "pred_angle" in out:
            ang = jnp.degrees(out["pred_angle"])     # [B, S]
            metrics["ang_spread"] = jax.lax.stop_gradient(
                (ang.max(0) - ang.min(0)).max()
            )
        if axis_prior is not None:
            return loss, (
                metrics,
                out.get("axis_prior_new", axis_prior),
                mstate,
            )
        return loss, (metrics, mstate)

    @property
    def _uses_axis_prior(self) -> bool:
        return self.stage == 1 and not self.cfg.model.slot_single_mode

    @property
    def _k_per_call(self) -> int:
        return max(1, self.cfg.train.steps_per_call) if not self._uses_axis_prior else 1

    def _build_step(self):
        if self._uses_axis_prior:
            from ..parallel.dp import make_dp_train_step_with_state

            self._step_fn = make_dp_train_step_with_state(
                lambda p, st, b, r: self._loss_fn(p, b, r, axis_prior=st),
                self.optimizer,
                self.mesh,
                DATA_AXIS,
            )
        elif self._k_per_call > 1:
            from ..parallel.dp import make_dp_multi_train_step

            self._step_fn = make_dp_multi_train_step(
                self._loss_fn, self.optimizer, self.mesh, DATA_AXIS
            )
        else:
            self._step_fn = make_dp_train_step(
                self._loss_fn, self.optimizer, self.mesh, DATA_AXIS
            )

    # ------------------------------------------------------------------
    def train(self, num_steps: Optional[int] = None):
        cfg = self.cfg
        num_steps = num_steps or cfg.train.num_iterations
        it = iter(self.loader.epochs())
        first = next(it)
        if self.params is None:
            self.init_params(first)
        if self._step_fn is None:
            self._build_step()
        params = replicate(self.params, self.mesh)
        opt_state = replicate(self.opt_state, self.mesh)
        axis_prior = None
        if self._uses_axis_prior:
            # resumed EMA if the checkpoint carried one, else the +y default
            init_prior = (
                jnp.asarray(self.axis_prior)
                if self.axis_prior is not None
                else jnp.tile(
                    jnp.array([[0.0, 1.0, 0.0]]), (self.cfg.model.nmasks, 1)
                )
            )
            axis_prior = replicate(init_prior, self.mesh)

        # Only ship what the step consumes — the full sample dict includes
        # dense eval-only arrays (oorr clouds, per-point poses) whose per-step
        # host->device transfer dominates wall clock on relayed TPU setups.
        step_keys = ("pc",) if self.stage == 0 else ("pc", "label", "pose_segs")
        if self.stage == 1 and self.cfg.model.needs_canon_pair:
            step_keys = step_keys + ("canon_pc", "canon_label")
        # warm-up schedules need the global step inside the jitted loss;
        # shipped as a per-sample field so batch sharding stays uniform
        ship_step = self.stage == 1 and self.cfg.model.needs_step

        timer = Timer()
        K = self._k_per_call
        batch = first
        step = 0
        last_log = last_save = last_eval = 0
        last_log_step = 0
        # wall-clock breakdown per log window: host data wait vs device wait
        t_data = t_block = 0.0
        while step < num_steps:
            self.rng, sub = jax.random.split(self.rng)
            if K > 1:
                group = [batch]
                _t0 = time.perf_counter()
                while len(group) < K:
                    group.append(next(it))
                t_data += time.perf_counter() - _t0
                stacked = {
                    k: np.stack([np.asarray(b[k]) for b in group])
                    for k in step_keys
                }
                if ship_step:
                    # each scanned microstep carries its own index so warm-up
                    # ramps stay linear per step (not piecewise-constant in K)
                    base = step + getattr(self, "_step_offset", 0)
                    stacked["step_count"] = np.broadcast_to(
                        (base + np.arange(K, dtype=np.int32))[:, None],
                        (K, cfg.train.batch_size),
                    ).copy()
                sb = jax.device_put(
                    stacked,
                    NamedSharding(self.mesh, P(None, DATA_AXIS)),
                )
                rngs = jax.vmap(
                    lambda r: per_device_rngs(r, self.mesh)
                )(jax.random.split(sub, K))
                rngs = jax.device_put(
                    rngs, NamedSharding(self.mesh, P(None, DATA_AXIS))
                )
                params, opt_state, metrics = self._step_fn(
                    params, opt_state, sb, rngs
                )
            else:
                d = {k: jnp.asarray(batch[k]) for k in step_keys}
                if ship_step:
                    d["step_count"] = jnp.full(
                        (cfg.train.batch_size,),
                        step + getattr(self, "_step_offset", 0), jnp.int32,
                    )
                sb = shard_batch(d, self.mesh)
                rngs = per_device_rngs(sub, self.mesh)
                if self._uses_axis_prior:
                    params, axis_prior, opt_state, metrics = self._step_fn(
                        params, axis_prior, opt_state, sb, rngs
                    )
                else:
                    params, opt_state, metrics = self._step_fn(
                        params, opt_state, sb, rngs
                    )
            # Bounded dispatch pipeline: an *unbounded* async queue degrades
            # on relayed TPU backends (r1: 4.2s/step unblocked vs 0.07s/step
            # blocked), but when the relay itself is in a slow-RPC mode
            # (~4s round-trip regardless of compute) a small in-flight window
            # hides that latency.  block_every=1 is the classic synchronous
            # stepping; N keeps at most N dispatches outstanding.
            step += K
            if (step // K) % max(1, cfg.train.block_every) == 0 or step >= num_steps:
                _t0 = time.perf_counter()
                jax.block_until_ready(metrics["loss"])
                t_block += time.perf_counter() - _t0
            if self.plateau is not None:
                cur = float(np.asarray(jax.device_get(metrics["loss"])).mean())
                prev_lr = self.plateau.lr
                new_lr = self.plateau.update(cur)
                if new_lr != prev_lr:
                    self.log.info(f"plateau: lr -> {new_lr:.3e}")
                    opt_state = opt_state._replace(
                        hyperparams={
                            **opt_state.hyperparams,
                            "learning_rate": replicate(
                                jnp.asarray(new_lr, dtype=jnp.float32),
                                self.mesh,
                            ),
                        }
                    )
            if (
                cfg.train.eval_freq > 0
                and self.stage == 1
                and step // cfg.train.eval_freq > last_eval
            ):
                last_eval = step // cfg.train.eval_freq
                try:
                    em = self.run_in_train_eval(params)
                    self.log.info(
                        "eval@%d: %s"
                        % (
                            step,
                            " ".join(f"{k}={v:.4f}" for k, v in sorted(em.items())),
                        )
                    )
                except Exception as e:  # pragma: no cover
                    self.log.info(f"in-train eval failed: {e}")
            if step // cfg.train.log_freq > last_log or step <= K:
                m = jax.device_get(metrics)
                nst = max(1, step - last_log_step)
                self.summary.update(
                    time=timer.tick() / nst,
                    **{k: float(np.asarray(v).mean()) for k, v in m.items()},
                )
                self.log.info(
                    f"step {step}: {self.summary.format()}"
                    f" [data {t_data/nst:.3f}s/st, block {t_block/nst:.3f}s/st]"
                )
                # Opportunistic healthy-mode flag: the relayed backend is
                # bimodal per session; a fetched stage-1 step under 0.5 s
                # means THIS process landed in the healthy mode, and the
                # ladder should grab the pending healthy-mode bench/A-B
                # (VERDICT r3 item 4) between stages.
                if (self.stage == 1 and step >= 20
                        and self.summary._vals.get("time", 9.9) < 0.5):
                    # pid-suffixed so concurrent trainers' flags stay
                    # attributable (a degraded ladder must not consume a
                    # different healthy process's flag); the un-suffixed
                    # legacy path is kept for older ladder scripts
                    line = (
                        f"{time.time()} {self.summary._vals['time']:.4f}"
                        f" pid={os.getpid()} log_dir={self.log_dir}\n"
                    )
                    for mp in ("/tmp/healthy_mode_observed",
                               f"/tmp/healthy_mode_observed.{os.getpid()}"):
                        try:
                            with open(mp, "w") as fh:
                                fh.write(line)
                        except OSError:
                            pass
                t_data = t_block = 0.0
                last_log = step // cfg.train.log_freq
                last_log_step = step
            if step // cfg.train.save_freq > last_save:
                self.save(params, step, opt_state, axis_prior)
                last_save = step // cfg.train.save_freq
            _t0 = time.perf_counter()
            batch = next(it)
            t_data += time.perf_counter() - _t0

        self.params = params
        self.opt_state = opt_state
        self.axis_prior = axis_prior
        return params

    def run_in_train_eval(self, params, max_batches: int = 5):
        """Light two-pass eval at eval_freq (wired; ref leaves eval manual).

        Uses few batches so the train loop is not stalled; reports the key
        parity metrics (IoU / rot / trans / axis)."""
        from ..eval.evaluator import Evaluator

        if not hasattr(self, "_eval_ctx"):
            canon_ds = build_dataset(
                self.cfg.data, split="train", canonical_input=True
            )
            test_ds = build_dataset(self.cfg.data, split="test")
            bs = self.cfg.train.batch_size
            self._eval_ctx = (
                DataLoader(canon_ds, bs, shuffle=False, prefetch=0),
                DataLoader(test_ds, bs, shuffle=False, prefetch=0),
                SlotPoseModel(cfg=self.cfg.model),
                GlobalAlignModel(cfg=self.cfg.model)
                if self.glb_params is not None
                else None,
            )
        canon_loader, test_loader, eval_model, eval_glb = self._eval_ctx
        ev = Evaluator(
            self.cfg, eval_model, jax.device_get(params), eval_glb,
            self.glb_params,
        )
        deltas = ev.fit_deltas(
            canon_loader, jax.random.PRNGKey(0), max_batches=max_batches
        )
        m = ev.evaluate(test_loader, deltas, max_batches=max_batches)
        keep = (
            "seg_iou", "axis_err_deg_mean", "axis_err_relpose_deg_mean",
            "pv_offset_err_mean", "chamfer_l1",
        )
        out = {k: m[k] for k in keep if k in m}
        for k, v in m.items():
            if k.startswith("rot_err_deg_part") and k.endswith("_mean"):
                out[k] = v
            if k.startswith("trans_err_part") and k.endswith("_mean"):
                out[k] = v
        return out

    def save(self, params, step: int, opt_state=None, axis_prior=None):
        # cumulative step across chained resumes: a resume->save->resume
        # chain must not reset warm-up offsets / step accounting
        step = step + getattr(self, "_step_offset", 0)
        path = os.path.join(
            self.log_dir, "ckpt", f"{self.cfg.experiment_id}_stage{self.stage}_net_Iter{step}.msgpack"
        )
        if opt_state is not None:
            from .checkpoint import save_train_state

            save_train_state(path, params, opt_state, step, axis_prior)
        else:
            save_checkpoint(path, params)
        self.log.info(f"saved checkpoint {path}")
