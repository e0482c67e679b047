#!/bin/bash
# Round-3 training ladder.
#
# Chip budget (degraded relay mode, ~4 s per stage-1 step — see
# OPTIMIZATION.md "relay execution modes"):
#   1. oven stage-1 segmentation fix (fresh run, starvation hinge +
#      full-soft o2r weighting) — the #1 quality item (VERDICT #3): every
#      prior stage-1 run COLLAPSED to one slot (diag: entropy 0.0000,
#      occupancy [1,0]; IoU 0.4241 == the all-one-slot score).
#   2. eyeglasses stage-1 relaunch with the same fix: the un-regularised
#      chain run collapsed the same way (attn_ent 0.75->0.09, empty_slots
#      0.05->0.56, IoU 0.23->0.15 by step 600).
#   3. laptop two-stage + eval (VERDICT #8).
#   4. safe two-stage + eval (VERDICT #8; sel_mode_trans=18 preset).
#
# Resumable: cumulative ckpt + .steps counter per (cat, stage); aborts cost
# at most the periodic-save window.
set -x
cd /root/repo
mkdir -p ckpt_r3 logs_r3
PCKPT=ckpt_r3/playground/ckpt

# wait for any in-flight run to release the chip
if [ -f /tmp/train_run.pid ]; then
  while kill -0 "$(cat /tmp/train_run.pid)" 2>/dev/null; do sleep 20; done
fi
echo $$ > /tmp/train_run.pid

shape_of () {
  python - "$1" <<'EOF'
import sys
from equi_articulated_pose_tpu.config import get_config
print(get_config(sys.argv[1]).data.shape_type)
EOF
}

# train_stage cat shape stage target bs extra-args...
train_stage () {
  local cat=$1 shape=$2 stage=$3 target=$4 bs=$5; shift 5
  local final="ckpt_r3/${shape}_stage${stage}.msgpack"
  local cum_ck="ckpt_r3/${cat}_stage${stage}_resume.msgpack"
  local cum_f="ckpt_r3/${cat}_stage${stage}.steps"
  local att
  for att in 1 2 3 4 5 6; do
    [ -f "$final" ] && return 0
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
        >> "logs_r3/${cat}_stage${stage}.log" 2>&1
    if [ -f "ckpt_r3/${shape}_stage${stage}.msgpack" ]; then
      [ "$shape" != "$cat" ] && mv "ckpt_r3/${shape}_stage${stage}.msgpack" "$final" 2>/dev/null
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

# ---- 1. oven segmentation fix (fresh stage-1) ------------------------------
# Diagnosis (diag script vs ckpt_r2/oven_stage1_axisreg): the trained oven
# attention is FULLY collapsed — entropy 0.0000, occupancy [1,0] — and the
# pinned eval IoU 0.4241 is exactly the all-points-in-one-slot score.  Once
# the softmax saturates every attention gradient vanishes, so the fix
# (starvation hinge + full-soft o2r weighting) must run from step 0.
if [ ! -f ckpt_r3/oven_stage1.msgpack ]; then
  train_stage oven oven 1 1200 4 \
      --eval-freq 400 --soft-seg-weights --ov-max-factor 1.0 \
      --axis-reg-stra 1 --resume-glb ckpt_r2/oven_stage0.msgpack
  timeout 4800 python run.py eval --category oven --dataset synthetic \
      --ckpt ckpt_r3/oven_stage1.msgpack --ckpt-glb ckpt_r2/oven_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      > logs_r3/oven_segfix_eval.log 2>&1
fi

# ---- 2. eyeglasses with anti-collapse --------------------------------------
if [ ! -f ckpt_r3/eyeglasses_stage1.msgpack ]; then
  train_stage eyeglasses eyeglasses 1 2400 2 \
      --eval-freq 800 --orbit-chunk-k 30 --ov-max-factor 1.0 \
      --soft-seg-weights \
      --resume-glb ckpt_r2/eyeglasses_stage0.msgpack
  timeout 4800 python run.py eval --category eyeglasses --dataset synthetic \
      --ckpt ckpt_r3/eyeglasses_stage1.msgpack \
      --ckpt-glb ckpt_r2/eyeglasses_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --orbit-chunk-k 30 \
      --batch-size 2 --max-batches 15 \
      > logs_r3/eyeglasses_eval.log 2>&1
fi

# ---- 3. laptop two-stage ---------------------------------------------------
train_stage laptop laptop 0 1500 4
train_stage laptop laptop 1 1600 4 \
    --eval-freq 800 --soft-seg-weights --ov-max-factor 1.0 \
    --resume-glb ckpt_r3/laptop_stage0.msgpack
timeout 4800 python run.py eval --category laptop --dataset synthetic \
    --ckpt ckpt_r3/laptop_stage1.msgpack --ckpt-glb ckpt_r3/laptop_stage0.msgpack \
    --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
    > logs_r3/laptop_eval.log 2>&1

# ---- 4. safe two-stage -----------------------------------------------------
train_stage safe safe 0 1500 4
train_stage safe safe 1 1600 4 \
    --eval-freq 800 --soft-seg-weights --ov-max-factor 1.0 \
    --resume-glb ckpt_r3/safe_stage0.msgpack
timeout 4800 python run.py eval --category safe --dataset synthetic \
    --ckpt ckpt_r3/safe_stage1.msgpack --ckpt-glb ckpt_r3/safe_stage0.msgpack \
    --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
    > logs_r3/safe_eval.log 2>&1

echo R3-LADDER-DONE
