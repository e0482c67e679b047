#!/bin/bash
# Round-3 ladder, phase B (launch after the eyeglasses stage of
# train_ladder_r3.sh completes and that ladder is stopped).
#
#   1. oven stage-1 with POINTWISE soft weighting — the decisive experiment
#      for the balanced-cluster-prior diagnosis (RESULTS.md round-3): the
#      per-slot-mass soft o2r settled at occupancy [0.6,0.4] vs GT
#      [0.81,0.19] with a part-uncorrelated boundary; the mixture
#      normalisation keeps migration gradients without the size prior.
#   2. laptop two-stage (GT 50/50 — balanced; plain soft weighting fine).
#   3. safe two-stage (GT [0.82,0.18] — skewed; seg flags via SAFE_SEG_FLAGS,
#      chosen from the tinyseg CPU A/B verdict).
set -x
cd /root/repo
mkdir -p ckpt_r3 logs_r3
PCKPT=ckpt_r3/playground/ckpt
SAFE_SEG_FLAGS=${SAFE_SEG_FLAGS:---soft-seg-weights --soft-seg-pointwise --ov-max-factor 1.0}
OVEN_SEG_FLAGS=${OVEN_SEG_FLAGS:---soft-seg-weights --soft-seg-pointwise --ov-max-factor 1.0}

if [ -f /tmp/train_run.pid ]; then
  while kill -0 "$(cat /tmp/train_run.pid)" 2>/dev/null; do sleep 20; done
fi
echo $$ > /tmp/train_run.pid

# train_stage cat shape stage target bs extra-args...   (same as ladder r3)
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

# ---- 1. oven pointwise (fresh stage-1; own bookkeeping names) --------------
if [ ! -f ckpt_r3/ovenpw_stage1.msgpack ]; then
  # archive the phase-A (soft-mean) artifact so train_stage's completion
  # check and run.py's shape-named output can't collide with this run
  [ -f ckpt_r3/oven_stage1.msgpack ] \
    && mv ckpt_r3/oven_stage1.msgpack ckpt_r3/oven_stage1_softmean.msgpack
  train_stage ovenpw oven 1 1200 4 \
      --eval-freq 400 $OVEN_SEG_FLAGS \
      --axis-reg-stra 1 --resume-glb ckpt_r2/oven_stage0.msgpack
  # train_stage writes ckpt_r3/oven_stage1.msgpack (shape name); rename so
  # it cannot clash with the phase-A soft-mean run's artifact
  [ -f ckpt_r3/oven_stage1.msgpack ] && [ ! -f ckpt_r3/ovenpw_stage1.msgpack ] \
    && mv ckpt_r3/oven_stage1.msgpack ckpt_r3/ovenpw_stage1.msgpack
  timeout 4800 python run.py eval --category oven --dataset synthetic \
      --ckpt ckpt_r3/ovenpw_stage1.msgpack --ckpt-glb ckpt_r2/oven_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      > logs_r3/ovenpw_eval.log 2>&1
fi

# ---- 2. laptop two-stage ---------------------------------------------------
train_stage laptop laptop 0 1500 4
train_stage laptop laptop 1 1600 4 \
    --eval-freq 800 --soft-seg-weights --ov-max-factor 1.0 \
    --resume-glb ckpt_r3/laptop_stage0.msgpack
timeout 4800 python run.py eval --category laptop --dataset synthetic \
    --ckpt ckpt_r3/laptop_stage1.msgpack --ckpt-glb ckpt_r3/laptop_stage0.msgpack \
    --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
    > logs_r3/laptop_eval.log 2>&1

# ---- 3. safe two-stage -----------------------------------------------------
train_stage safe safe 0 1500 4
train_stage safe safe 1 1600 4 \
    --eval-freq 800 $SAFE_SEG_FLAGS \
    --resume-glb ckpt_r3/safe_stage0.msgpack
timeout 4800 python run.py eval --category safe --dataset synthetic \
    --ckpt ckpt_r3/safe_stage1.msgpack --ckpt-glb ckpt_r3/safe_stage0.msgpack \
    --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
    > logs_r3/safe_eval.log 2>&1

echo R3B-LADDER-DONE
