#!/bin/bash
# Round-3 ladder, phase D (fresh container 2026-08-17 22:30 UTC; ckpt_r3 from
# the earlier session was not committed, so stages restart from scratch —
# ckpt_r2 checkpoints ARE committed and provide the stage-0 inputs).
#
# Additions over r3c:
#   A. fused-backward chip A/B FIRST (validates the Mosaic lowering of the
#      fully-fused Pallas backward, OPTIMIZATION.md #7); if it beats the
#      default fused-forward config and produces a finite loss, the whole
#      ladder trains with --fused-bwd.
#   B. teacher-forced GT-partition diagnostic after the oven pointwise run
#      (--force-gt-labels): the pose-given-perfect-seg upper bound that
#      separates pose-head quality from the segmentation problem.
#   C. drawer stage-1 extension + eval (VERDICT #4 asks for drawer at real
#      length; round 2 stopped at 400 smoke steps).
#
# Priority order for chip time:
#   0. fused-bwd A/B             (~30-60 min, compile-dominated)
#   1. oven stage-1 POINTWISE    (decisive balanced-prior experiment) + eval
#   2. oven GT-labels diagnostic + eval
#   3. eyeglasses 2400 (chain + anti-collapse; VERDICT #4) + eval
#   4. laptop two-stage + eval   (VERDICT #8)
#   5. safe two-stage + eval     (VERDICT #8)
#   6. drawer stage-1 extension + eval
set -x
cd /root/repo
mkdir -p ckpt_r3 logs_r3
PCKPT=ckpt_r3/playground/ckpt

wait_relay () {
  until timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "[$(date +%H:%M:%S)] relay down; waiting" >> logs_r3/ladder_r3d.log
    sleep 120
  done
}

if [ -f /tmp/train_run.pid ]; then
  while kill -0 "$(cat /tmp/train_run.pid)" 2>/dev/null; do sleep 20; done
fi
echo $$ > /tmp/train_run.pid

# train_stage <bookkeeping-name> <cli-category> <stage> <target-steps> <bs> extra...
# The bookkeeping name keys the log + cumulative-resume files; the CLI
# category must be a real config preset (r3c passed the bookkeeping name as
# --category, which get_config rejects — fixed here).  The trainer writes
# ckpt_r3/<cli-category>_stage<stage>.msgpack on completion; we move it to
# the bookkeeping name when they differ.
train_stage () {
  local name=$1 cat=$2 stage=$3 target=$4 bs=$5; shift 5
  local final="ckpt_r3/${name}_stage${stage}.msgpack"
  local produced="ckpt_r3/${cat}_stage${stage}.msgpack"
  local cum_ck="ckpt_r3/${name}_stage${stage}_resume.msgpack"
  local cum_f="ckpt_r3/${name}_stage${stage}.steps"
  local att
  for att in 1 2 3 4 5 6 7 8; do
    [ -f "$final" ] && return 0
    wait_relay
    local done=0
    [ -f "$cum_f" ] && done=$(cat "$cum_f")
    local todo=$((target - done))
    if [ "$todo" -le 0 ]; then cp "$cum_ck" "$final"; return 0; fi
    local res=()
    [ -f "$cum_ck" ] && res=(--resume "$cum_ck")
    rm -rf "$PCKPT"
    timeout 14400 python run.py train --category "$cat" --dataset synthetic \
        --stage "$stage" --steps "$todo" --batch-size "$bs" "${res[@]}" "$@" \
        --compute-dtype bfloat16 --chunk-a 12 --ckpt-dir ckpt_r3 \
        >> "logs_r3/${name}_stage${stage}.log" 2>&1
    if [ -f "$produced" ]; then
      [ "$final" != "$produced" ] && mv "$produced" "$final"
      return 0
    fi
    local latest
    latest=$(ls -v "$PCKPT"/playground_stage${stage}_net_Iter*.msgpack 2>/dev/null | tail -1)
    if [ -n "$latest" ]; then
      local it=${latest##*Iter}; it=${it%.msgpack}
      done=$((done + it))
      echo "$done" > "$cum_f"
      cp "$latest" "$cum_ck"
    fi
  done
  return 1
}

# ---- 0. fused-backward chip A/B --------------------------------------------
FB=""
if [ ! -s logs_r3/ab_fusedbwd.json ]; then
  wait_relay
  { timeout 3600 python scripts/bench_ab.py --fused --iters 8
    timeout 3600 python scripts/bench_ab.py --fused-bwd --iters 8
  } > logs_r3/ab_fusedbwd.json 2> logs_r3/ab_fusedbwd.err
fi
FB=$(python - <<'EOF'
import json
rows = []
try:
    for ln in open("logs_r3/ab_fusedbwd.json"):
        ln = ln.strip()
        if ln.startswith("{"):
            rows.append(json.loads(ln))
except FileNotFoundError:
    pass
fwd = next((r for r in rows if not r["config"].get("fused_bwd")), None)
bwd = next((r for r in rows if r["config"].get("fused_bwd")), None)
import math
if fwd and bwd and math.isfinite(bwd["loss"]) and \
   bwd["sec_per_step"] < fwd["sec_per_step"]:
    print("--fused-bwd")
EOF
)
echo "fused-bwd verdict: '$FB'" >> logs_r3/ladder_r3d.log

# ---- 1. oven pointwise (fresh stage-1) -------------------------------------
if [ ! -f ckpt_r3/ovenpw_stage1.msgpack ]; then
  train_stage ovenpw oven 1 1200 4 $FB \
      --eval-freq 400 --soft-seg-weights --soft-seg-pointwise --ov-max-factor 1.0 \
      --axis-reg-stra 1 --resume-glb ckpt_r2/oven_stage0.msgpack
fi
if [ -f ckpt_r3/ovenpw_stage1.msgpack ] && [ ! -s logs_r3/ovenpw_eval.log ]; then
  wait_relay
  timeout 4800 python run.py eval --category oven --dataset synthetic \
      --ckpt ckpt_r3/ovenpw_stage1.msgpack --ckpt-glb ckpt_r2/oven_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      > logs_r3/ovenpw_eval.log 2>&1
fi

# ---- 2. oven teacher-forced GT-partition diagnostic ------------------------
if [ ! -f ckpt_r3/ovengt_stage1.msgpack ]; then
  train_stage ovengt oven 1 800 4 $FB \
      --eval-freq 400 --force-gt-labels --axis-reg-stra 1 \
      --resume-glb ckpt_r2/oven_stage0.msgpack
fi
if [ -f ckpt_r3/ovengt_stage1.msgpack ] && [ ! -s logs_r3/ovengt_eval.log ]; then
  wait_relay
  timeout 4800 python run.py eval --category oven --dataset synthetic \
      --ckpt ckpt_r3/ovengt_stage1.msgpack --ckpt-glb ckpt_r2/oven_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      --force-gt-labels \
      > logs_r3/ovengt_eval.log 2>&1
fi

# ---- 3. eyeglasses with anti-collapse --------------------------------------
if [ ! -f ckpt_r3/eyeglasses_stage1.msgpack ]; then
  train_stage eyeglasses eyeglasses 1 2400 2 $FB \
      --eval-freq 800 --orbit-chunk-k 30 --ov-max-factor 1.0 \
      --soft-seg-weights \
      --resume-glb ckpt_r2/eyeglasses_stage0.msgpack
fi
if [ -f ckpt_r3/eyeglasses_stage1.msgpack ] && [ ! -s logs_r3/eyeglasses_eval.log ]; then
  wait_relay
  timeout 4800 python run.py eval --category eyeglasses --dataset synthetic \
      --ckpt ckpt_r3/eyeglasses_stage1.msgpack \
      --ckpt-glb ckpt_r2/eyeglasses_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --orbit-chunk-k 30 \
      --batch-size 2 --max-batches 15 \
      > logs_r3/eyeglasses_eval.log 2>&1
fi

# ---- 4. laptop two-stage ---------------------------------------------------
train_stage laptop laptop 0 1500 4 $FB
train_stage laptop laptop 1 1600 4 $FB \
    --eval-freq 800 --soft-seg-weights --ov-max-factor 1.0 \
    --resume-glb ckpt_r3/laptop_stage0.msgpack
if [ -f ckpt_r3/laptop_stage1.msgpack ] && [ ! -s logs_r3/laptop_eval.log ]; then
  wait_relay
  timeout 4800 python run.py eval --category laptop --dataset synthetic \
      --ckpt ckpt_r3/laptop_stage1.msgpack --ckpt-glb ckpt_r3/laptop_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      > logs_r3/laptop_eval.log 2>&1
fi

# ---- 5. safe two-stage (skewed GT [0.82,0.18] -> pointwise) ----------------
train_stage safe safe 0 1500 4 $FB
train_stage safe safe 1 1600 4 $FB \
    --eval-freq 800 --soft-seg-weights --soft-seg-pointwise --ov-max-factor 1.0 \
    --resume-glb ckpt_r3/safe_stage0.msgpack
if [ -f ckpt_r3/safe_stage1.msgpack ] && [ ! -s logs_r3/safe_eval.log ]; then
  wait_relay
  timeout 4800 python run.py eval --category safe --dataset synthetic \
      --ckpt ckpt_r3/safe_stage1.msgpack --ckpt-glb ckpt_r3/safe_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      > logs_r3/safe_eval.log 2>&1
fi

# ---- 6. drawer stage-1 extension (from the round-2 400-step ckpt) ----------
if [ ! -f ckpt_r3/drawer_stage1.msgpack ]; then
  [ ! -f ckpt_r3/drawer_stage1_resume.msgpack ] && \
    cp ckpt_r2/drawer_stage1.msgpack ckpt_r3/drawer_stage1_resume.msgpack && \
    echo 400 > ckpt_r3/drawer_stage1.steps
  train_stage drawer drawer 1 1600 4 $FB \
      --eval-freq 800 --soft-seg-weights --ov-max-factor 1.0 \
      --resume-glb ckpt_r2/drawer_stage0.msgpack
fi
if [ -f ckpt_r3/drawer_stage1.msgpack ] && [ ! -s logs_r3/drawer_eval.log ]; then
  wait_relay
  timeout 4800 python run.py eval --category drawer --dataset synthetic \
      --ckpt ckpt_r3/drawer_stage1.msgpack --ckpt-glb ckpt_r2/drawer_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      > logs_r3/drawer_eval.log 2>&1
fi

echo R3D-LADDER-DONE
