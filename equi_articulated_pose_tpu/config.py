"""Typed configuration tree.

Replaces the reference's HierarchyArgmentParser flag groups
(``SPConvNets/options.py``, ``vgtk/vgtk/app/parse_config.py``) with dataclasses.
Category presets reproduce the shipped ``scripts/train/*.sh`` flag sets.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass(frozen=True)
class ModelConfig:
    # architecture (ref build_model, unsup_..._40:3387-3650)
    kanchor: int = 60
    kpconv_kanchor: int = 60
    input_num: int = 512
    nmasks: int = 2                      # number of slots / parts
    mlps: Tuple[Tuple[int, ...], ...] = ((64,), (128,), (512,))
    out_mlp: Tuple[int, ...] = (256,)
    init_radius: float = 0.2
    input_radius: float = 0.4
    sigma_ratio: float = 0.5
    n_neighbor: int = 32
    temperature: float = 3.0
    norm: str = "batch"
    compute_dtype: str = "float32"
    chunk_a: int = 0                     # anchor chunking for inter conv
    fused_interconv: bool = False        # fused Pallas inter-conv kernel
    fused_bwd: bool = False              # fully-fused Pallas backward (needs fused_interconv)
    force_gt_labels: bool = False        # DIAGNOSTIC: teacher-force seg to GT
    # rematerialise the anchor-chunk loop in the backward pass (memory vs
    # recompute).  False trades HBM for ~1/3 fewer executed ops per inter
    # conv — the right trade when per-op overhead dominates (OPTIMIZATION.md
    # degraded-mode diagnosis), or when memory headroom allows
    remat_chunks: bool = True

    # behaviour (equi_settings group)
    num_iters: int = 2
    part_pred_npoints: int = 128
    recon_prior: int = 6
    glb_recon_npoints: int = 512
    shape_type: str = "oven"
    joint_type: str = "revolute"         # 'revolute' | 'prismatic'
    slot_iters: int = 7
    pred_axis: bool = True
    pred_t: bool = True
    representation: str = "quat"
    # derive slot translations from the predicted pivot/central points
    # (T = R(c - pv) + pv, ref unsup_..._38:1193-1200); None = follow the
    # representation ('angle' => True, the model-38 two-part path)
    trans_from_pv: Optional[bool] = None
    glb_recon_factor: float = 1.0
    slot_recon_factor: float = 0.5
    glb_single_cd: bool = False
    slot_single_cd: bool = False
    slot_single_mode: bool = True
    sel_mode_trans: Optional[int] = None
    # take anchor sel_mode's equivariant feature as the slot/pair inv feature
    # (ref --sel-mode; eyeglasses passes 29)
    sel_mode: Optional[int] = None
    # rematerialise the per-slot vmapped towers (inv blocks, RT heads) in
    # backward: their [S, B, N, A, C] activations are S x the backbone's and
    # set the HBM ceiling with 240 product anchors
    remat_slot_blocks: bool = False
    # stream the per-(slot, anchor) chamfer over anchor-orbit chunks of this
    # size (rematerialised): bounds the [B, S, K, M, N] distance tensor that
    # sets the batch-size ceiling with 240 product anchors; 0 = off
    orbit_chunk_k: int = 0
    use_art_mode: bool = False
    use_2d: bool = False                 # product-anchor (60x4) backbone
    with_part_proposal: bool = True
    rel_for_points: bool = False
    permute_modes: int = 1
    rot_angle_factor: float = 0.5
    axis_reg_stra: int = 0
    # weight of the slot-assignment confidence loss (low entropy over slots
    # per point, ref common_utils.py:67); 0 disables — the reference ships it
    # defined but unreferenced, exposed here as an ablation knob for the
    # segmentation-quality study (RESULTS.md)
    purity_factor: float = 0.0
    # linear warm-up horizon for purity_factor (0 = no warm-up).  Round-4
    # motivation: with purity active from step 0 the attention softmax
    # saturates within ~400 steps (attn_ent 0.93 -> 0.002 measured on the
    # oven b2 run) and the partition FREEZES before any part-alignment
    # signal can act; ramping purity over this many steps keeps attention
    # plastic while the pose/recon heads converge, then locks confidence.
    purity_warmup_steps: int = 0
    # anti-collapse occupancy regulariser: penalise the max slot's soft point
    # share above 1/S.  The reference carries the same term commented out
    # ("encourage entropy", unsup_..._35:1560 / _38:2014); 0 disables.
    ov_max_factor: float = 0.0
    # weight the slot->orig chamfer by the full soft attention instead of
    # hard-mask * attention (ref's commented alternative, unsup_..._38:1366)
    soft_seg_weights: bool = False
    # with soft_seg_weights: normalise the o2r term by the POINT count
    # instead of the per-slot attention mass.  The per-slot mean (ref's
    # formulation) is minimised by balanced clusters (soft-k-means size
    # prior) — measurably wrong for skewed categories (oven GT occupancy
    # [0.81, 0.19]; the balanced run's partition was uncorrelated with the
    # parts).  Dividing by N instead yields the true mixture-assignment
    # loss sum_n attn[s,n]*d_s(n)/N: every point still carries a migration
    # gradient (anti-collapse) but no cluster-size prior exists.
    soft_seg_pointwise: bool = False
    # spherical-cap (near-vertical) axis parameterisation
    # (--mtx-based-axis-regression, eyeglasses recipe)
    mtx_based_axis_regression: bool = False
    # cross-state canonical-consistency weight.  Round-3 diagnosis
    # (scripts/diag_articulation.py on the teacher-forced oven ckpt): the
    # predicted joint angle is ~constant across articulation states (0.2 deg
    # spread) — the per-sample decoded canonical shape absorbs the joint
    # motion, which satisfies every chamfer term while leaving the predicted
    # axis unconstrained (axis 82 deg at IoU 1.0) and removing the gradient
    # channel that aligns slots with rigid parts.  With factor > 0 the
    # trainer runs the stage-1 forward on the paired canonical-state cloud
    # (``canon_pc`` — the reference's datasets expose the same pair as
    # ``ori_pc``/``canon_pc``, MotionDataset.py) and penalises per-slot
    # chamfer between the two decoded canonical shapes plus pivot/central
    # drift, forcing the articulation to be explained by theta*axis instead.
    canon_consist_factor: float = 0.0
    # axis supervision from the relative predicted pose across articulation
    # states.  Works with OR without canon_consist_factor: with it, the
    # articulation is forced through theta*axis (measured to lock a wrong
    # axis at short horizons — RESULTS r3 item 15); without it ("distill-only"
    # mode) the canonical twin forward runs forward-only and ONLY the axis
    # head follows the cross-state relative-pose target, leaving the pose
    # path untouched.
    # Once the decoded canonical shapes are tied across states, the relative
    # pose rel_R = R_posed @ R_canon^T of a slot must equal the TRUE joint
    # motion for the chamfer terms to hold — so rel_R's rotation axis is an
    # unsupervised target for the predicted joint axis, available even while
    # the per-anchor angle head is degenerate (the orbit SELECTION carries
    # the articulation discretely).  Weighted by sin(rel angle) (= |antisym
    # part|/2): near-canonical pairs contribute nothing, so early-training
    # noise self-gates.  Target is stop-gradient'd; only the axis head moves.
    axis_from_relpose: float = 0.0
    # motion-based attention pairing (nn/motion_pair.py): cluster the
    # cross-state point motion into S rigid transforms (EM over weighted
    # Kabsch fits) and cross-entropy the slot attention toward the matched
    # clusters.  The FIRST loss that acts on the attention matrix itself —
    # the round-3/4 collapse diagnosis showed pose-path losses never reach
    # it.  0 disables.
    motion_pair_factor: float = 0.0
    # softmin temperature (squared-distance units on the bbox-normalised
    # cloud) for the EM reassignment and the articulation gate
    motion_pair_tau: float = 2.5e-3
    motion_pair_em_iters: int = 4
    # spatial-coherence term for the EM (nn/motion_pair.py): separates parts
    # with IDENTICAL motions but disjoint extents (drawer: the multi-sample
    # grid translates every drawer by the same distance — pure motion
    # clustering merges them).  0 keeps the pure-motion teacher (and its
    # traced HLO) unchanged.
    motion_pair_spatial: float = 0.0
    motion_pair_spatial_tau: float = 0.04
    # correspondence source: 'index' (complete synthetic clouds share FPS
    # indices across states — data/articulated.py) | 'feat' (1-NN in the
    # rotation-invariant ppinv feature space; partial/real scans)
    motion_pair_corr: str = "index"
    # slot-attention temperature annealing: softmax logits are divided by a
    # temperature that decays linearly attn_temp_start -> 1 over
    # attn_temp_steps train steps.  Keeps the attention plastic past the
    # measured step-400 saturation (attn_ent ~1e-5) so early part-shaping
    # signals (motion_pair) can still re-partition; 0 steps = off.
    attn_temp_start: float = 1.0
    attn_temp_steps: int = 0

    @property
    def needs_step(self) -> bool:
        """True when the jitted loss consumes the global step counter."""
        return self.purity_warmup_steps > 0 or self.attn_temp_steps > 0

    @property
    def needs_canon_pair(self) -> bool:
        """True when the train step consumes the paired canonical-state
        cloud."""
        return (
            self.canon_consist_factor > 0.0
            or self.axis_from_relpose > 0.0
            or self.motion_pair_factor > 0.0
        )


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8
    init_lr: float = 1e-4
    # 'exp_decay' | 'step' (x rate every decay_step, ref --lr-adjust=2) |
    # 'plateau' (ref --lr-adjust=1) | 'constant'
    lr_type: str = "exp_decay"
    decay_rate: float = 0.7
    decay_step: int = 20000
    num_iterations: int = 1_000_000
    # optimizer steps executed per jitted dispatch (lax.scan): amortises the
    # per-call RPC overhead of relayed TPU backends; 1 = classic stepping
    steps_per_call: int = 1
    # dispatches kept in flight before blocking: 1 = synchronise every call
    # (safest); N > 1 pipelines N async dispatches to hide the relayed
    # backend's per-RPC round-trip latency when the relay can overlap them
    block_every: int = 1
    save_freq: int = 200
    log_freq: int = 20
    eval_freq: int = 2000
    seed: int = 2913
    global_rot: bool = True              # pre-align with frozen stage-0 model
    resume_path: Optional[str] = None
    resume_path_glb: Optional[str] = None


@dataclass(frozen=True)
class DataConfig:
    dataset_path: str = "./data"
    dataset_type: str = "motion"         # motion | motion_partial | hoi4d | hoi4d_partial | sapien | synthetic
    shape_type: str = "oven"
    npoints: int = 512
    global_rot_mode: str = "random"      # 'random' | 'anchor' | 'none'
    use_multi_sample: bool = True
    n_samples: int = 100
    partial: bool = False
    num_workers: int = 4
    # sample each prismatic part's opening independently per sample instead
    # of the tied multi-sample grid (drawer: restores the between-part
    # motion signal; opt-in to keep earlier drawer rows comparable)
    indep_prismatic: bool = False


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    run_mode: str = "train"
    experiment_id: str = "playground"
    model_dir: str = "./ckpt"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _cfg(shape_type: str, *, nmasks: int, input_num: int, joint_type="revolute",
         recon_prior=6, num_iters=2, dataset_type="motion", **model_kw) -> Config:
    return Config(
        model=ModelConfig(
            shape_type=shape_type,
            nmasks=nmasks,
            input_num=input_num,
            joint_type=joint_type,
            recon_prior=recon_prior,
            num_iters=num_iters,
            **model_kw,
        ),
        # all shipped recipes use --lr-adjust=2 --n-dec-steps=1000 (x0.7)
        train=TrainConfig(lr_type="step", decay_step=1000, decay_rate=0.7),
        data=DataConfig(shape_type=shape_type, npoints=input_num,
                        dataset_type=dataset_type,
                        partial="partial" in dataset_type),
    )


# Category presets — replicate scripts/train/*.sh flag sets (SURVEY.md S1/S2).
# The use_equi=38 two-part categories use the angle-about-predicted-axis
# representation with pivot-derived translations (the reference 38 model has
# no quaternion path; scripts pass --translation=0).
PRESETS: dict[str, Config] = {
    # use_equi=38 two-part revolute categories (scripts/train/{oven,
    # washing_machine,laptop_syn,safe}.sh).  fused_interconv on by default:
    # the Pallas forward + chunked-XLA backward measured 3.38 s/step vs 4.03
    # unfused on the degraded relay (scripts/bench_ab.py, r3); it only
    # engages on real TPU with the identity anchor permutation, which is
    # this family's active path.
    "oven": _cfg("oven", nmasks=2, input_num=380, representation="angle",
                 fused_interconv=True),
    "washing_machine": _cfg("washing_machine", nmasks=2, input_num=380,
                            representation="angle", fused_interconv=True),
    "laptop": _cfg("laptop", nmasks=2, input_num=512, num_iters=1,
                   part_pred_npoints=256, representation="angle",
                   fused_interconv=True),
    "safe": _cfg("safe", nmasks=2, input_num=380, representation="angle",
                 sel_mode_trans=18, fused_interconv=True),
    # use_equi=35: eyeglasses, 3 slots / 2 revolute joints, 2D product
    # anchors, chain pose modeling (scripts/train/eyeglasses.sh: --use-2d=1
    # --num-iters=1 --translation=0 --sel-mode=29 --mtx-based-axis-regression;
    # --translation=0 means NO dense T tower — translations derive from the
    # chain's pair pivots, so the representation is the angle-about-axis one)
    "eyeglasses": _cfg("eyeglasses", nmasks=3, input_num=480, num_iters=1,
                       part_pred_npoints=100, use_2d=True,
                       representation="angle", sel_mode=29,
                       mtx_based_axis_regression=True, orbit_chunk_k=60,
                       remat_slot_blocks=True),
    # use_equi=39: drawer, prismatic, 4 slots.  The S=4 per-slot towers and
    # the [B,S,K,M,N] orbit chamfer are drawer's HBM high-water marks (the
    # round-3 b4 soft-seg extension OOMed 16 GB); give it the same streaming
    # treatment the eyeglasses preset carries — remat'd slot towers +
    # anchor-chunked orbit chamfer (value/grad-exact, tests/test_r3_optim.py).
    "drawer": _cfg("drawer", nmasks=4, input_num=512, joint_type="prismatic",
                   dataset_type="sapien", orbit_chunk_k=12,
                   remat_slot_blocks=True),
    # drawer with the 2D product-anchor backbone (ref --use-2d=1)
    "drawer_2d": _cfg("drawer", nmasks=4, input_num=512, joint_type="prismatic",
                      dataset_type="sapien", use_2d=True, orbit_chunk_k=60,
                      remat_slot_blocks=True),
    # partial-view / real-scan variants (scripts/train/partial_laptop_syn.sh,
    # laptop_real.sh)
    "laptop_partial": _cfg("laptop", nmasks=2, input_num=380, num_iters=1,
                           dataset_type="motion_partial", recon_prior=9,
                           representation="angle", sel_mode_trans=14),
    "laptop_hoi4d": _cfg("laptop", nmasks=2, input_num=380,
                         dataset_type="hoi4d", representation="angle"),
    # CPU-runnable mid-scale oven: big enough for part discovery (the 64-pt
    # tiny preset cannot segment at all — see RESULTS round-3 #7), small
    # enough for ~sec-scale CPU steps; used by the seg-loss A/B harness.
    "mid": _cfg("oven", nmasks=2, input_num=192,
                mlps=((32,), (64,), (128,)), out_mlp=(128,),
                part_pred_npoints=64, glb_recon_npoints=192,
                representation="angle"),
    "tiny": _cfg("oven", nmasks=2, input_num=64,
                 mlps=((16,), (32,)), out_mlp=(32,), num_iters=1,
                 part_pred_npoints=16, glb_recon_npoints=32,
                 representation="angle"),
    # quat-path twin of 'tiny' (the model-40 rotation branch) for tests
    "tiny_quat": _cfg("oven", nmasks=2, input_num=64,
                      mlps=((16,), (32,)), out_mlp=(32,), num_iters=1,
                      part_pred_npoints=16, glb_recon_npoints=32),
}


def get_config(name: str) -> Config:
    if name not in PRESETS:
        raise ValueError(
            f"unknown category preset {name!r}; available: {sorted(PRESETS)}"
        )
    return PRESETS[name]
