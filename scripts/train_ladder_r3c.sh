#!/bin/bash
# Round-3 ladder, consolidated (replaces the stopped train_ladder_r3.sh and
# the un-launched r3b after the 19:12 relay outage burned the oven stage's
# retry attempts).  Priority order for the remaining chip time:
#   0. oven soft-mean eval (ckpt synthesised from the step-800 resume state)
#   1. oven stage-1 POINTWISE run — the decisive balanced-prior experiment
#   2. eyeglasses 2400 (chain + anti-collapse; VERDICT #4)
#   3. laptop two-stage, 4. safe two-stage (VERDICT #8)
#
# Robustness: every attempt first waits for the relay to answer a probe, so
# outages pause the ladder instead of burning its bounded retries; the
# separate watchdog (scripts/watchdog.sh) bounds mid-run hangs.
set -x
cd /root/repo
mkdir -p ckpt_r3 logs_r3
PCKPT=ckpt_r3/playground/ckpt

wait_relay () {
  until timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "[$(date +%H:%M:%S)] relay down; waiting" >> logs_r3/ladder_r3c.log
    sleep 120
  done
}

if [ -f /tmp/train_run.pid ]; then
  while kill -0 "$(cat /tmp/train_run.pid)" 2>/dev/null; do sleep 20; done
fi
echo $$ > /tmp/train_run.pid

train_stage () {
  local cat=$1 shape=$2 stage=$3 target=$4 bs=$5; shift 5
  local final="ckpt_r3/${shape}_stage${stage}.msgpack"
  local cum_ck="ckpt_r3/${cat}_stage${stage}_resume.msgpack"
  local cum_f="ckpt_r3/${cat}_stage${stage}.steps"
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

# ---- 0. oven soft-mean eval (step-800 params) ------------------------------
if [ ! -s logs_r3/oven_segfix_eval.log ] && [ -f ckpt_r3/oven_stage1.msgpack ]; then
  wait_relay
  timeout 4800 python run.py eval --category oven --dataset synthetic \
      --ckpt ckpt_r3/oven_stage1.msgpack --ckpt-glb ckpt_r2/oven_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      > logs_r3/oven_segfix_eval.log 2>&1
fi
# archive the soft-mean artifact; the pointwise run writes the shape name
[ -f ckpt_r3/oven_stage1.msgpack ] && [ ! -f ckpt_r3/oven_stage1_softmean.msgpack ] \
  && mv ckpt_r3/oven_stage1.msgpack ckpt_r3/oven_stage1_softmean.msgpack

# ---- 1. oven pointwise (fresh stage-1) -------------------------------------
if [ ! -f ckpt_r3/ovenpw_stage1.msgpack ]; then
  train_stage ovenpw oven 1 1200 4 \
      --eval-freq 400 --soft-seg-weights --soft-seg-pointwise --ov-max-factor 1.0 \
      --axis-reg-stra 1 --resume-glb ckpt_r2/oven_stage0.msgpack
  [ -f ckpt_r3/oven_stage1.msgpack ] && mv ckpt_r3/oven_stage1.msgpack ckpt_r3/ovenpw_stage1.msgpack
  wait_relay
  timeout 4800 python run.py eval --category oven --dataset synthetic \
      --ckpt ckpt_r3/ovenpw_stage1.msgpack --ckpt-glb ckpt_r2/oven_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      > logs_r3/ovenpw_eval.log 2>&1
fi

# ---- 2. eyeglasses with anti-collapse --------------------------------------
if [ ! -f ckpt_r3/eyeglasses_stage1.msgpack ]; then
  train_stage eyeglasses eyeglasses 1 2400 2 \
      --eval-freq 800 --orbit-chunk-k 30 --ov-max-factor 1.0 \
      --soft-seg-weights \
      --resume-glb ckpt_r2/eyeglasses_stage0.msgpack
  wait_relay
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
wait_relay
timeout 4800 python run.py eval --category laptop --dataset synthetic \
    --ckpt ckpt_r3/laptop_stage1.msgpack --ckpt-glb ckpt_r3/laptop_stage0.msgpack \
    --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
    > logs_r3/laptop_eval.log 2>&1

# ---- 4. safe two-stage (skewed GT [0.82,0.18] -> pointwise) ----------------
train_stage safe safe 0 1500 4
train_stage safe safe 1 1600 4 \
    --eval-freq 800 --soft-seg-weights --soft-seg-pointwise --ov-max-factor 1.0 \
    --resume-glb ckpt_r3/safe_stage0.msgpack
wait_relay
timeout 4800 python run.py eval --category safe --dataset synthetic \
    --ckpt ckpt_r3/safe_stage1.msgpack --ckpt-glb ckpt_r3/safe_stage0.msgpack \
    --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
    > logs_r3/safe_eval.log 2>&1

echo R3C-LADDER-DONE
