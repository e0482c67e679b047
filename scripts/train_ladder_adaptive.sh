#!/bin/bash
# Adaptive training ladder (round-3+): measures the relay's execution mode
# first (OPTIMIZATION.md "relay execution modes" — ~0.09 s/step healthy vs
# ~4.2 s/step degraded, uniform per session), then sizes per-category step
# budgets to fit BUDGET_H hours of wall clock.  Same resumable bookkeeping
# as train_ladder_r2d.sh (cumulative .steps + full-train-state resume).
#
# Usage: BUDGET_H=8 bash scripts/train_ladder_adaptive.sh
set -x
cd /root/repo
mkdir -p ckpt_r2 logs_r2
PCKPT=ckpt_r2/playground/ckpt
BUDGET_H=${BUDGET_H:-8}

# ---- probe the execution mode (honest fetch-per-iter timing) -------------
PCS=$(timeout 2400 python bench.py --worker 2>/dev/null \
      | grep '"metric"' | python3 -c "import sys,json; print(json.load(sys.stdin)['value'])" \
      || echo 1.0)
# stage-1 seconds/step at batch 4
SPS=$(python3 -c "print(max(4.0/max($PCS,0.05), 0.05))")
echo "probe: $PCS pc/s -> $SPS s/step (stage-1, batch 4)"

# total step budget across stage-1 runs, leaving ~25% for stage-0s + evals
TOTAL_S1=$(python3 -c "print(int($BUDGET_H*3600*0.75/$SPS))")
# split: oven 35%, wm 25%, eyeglasses 20%, drawer 20%; cap at 12k each
steps_for () { python3 -c "print(min(12000, max(400, int($TOTAL_S1*$1))))"; }
OVEN_S1=$(steps_for 0.35); WM_S1=$(steps_for 0.25)
EYE_S1=$(steps_for 0.20); DRAWER_S1=$(steps_for 0.20)
echo "budgets: oven=$OVEN_S1 wm=$WM_S1 eyeglasses=$EYE_S1 drawer=$DRAWER_S1"

shape_of () {
  python - "$1" <<'EOF'
import sys
from equi_articulated_pose_tpu.config import get_config
print(get_config(sys.argv[1]).data.shape_type)
EOF
}

train_stage () {
  local cat=$1 shape=$2 stage=$3 target=$4 bs=$5; shift 5
  local final="ckpt_r2/${shape}_stage${stage}.msgpack"
  local cum_ck="ckpt_r2/${cat}_stage${stage}_resume.msgpack"
  local cum_f="ckpt_r2/${cat}_stage${stage}.steps"
  local att
  for att in 1 2 3 4 5 6 7 8; do
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
        --compute-dtype bfloat16 --chunk-a 12 --ckpt-dir ckpt_r2 \
        >> "logs_r2/${cat}_stage${stage}.log" 2>&1
    if [ -f "$final" ]; then return 0; fi
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

run_cat () {
  local cat=$1 s0_steps=$2 s1_steps=$3 bs=$4; shift 4
  local shape
  shape=$(shape_of "$cat")
  train_stage "$cat" "$shape" 0 "$s0_steps" "$bs" --no-global-rot --steps-per-call 8 \
    || return 1
  train_stage "$cat" "$shape" 1 "$s1_steps" "$bs" \
      --resume-glb "ckpt_r2/${shape}_stage0.msgpack" --eval-freq 0 "$@" \
    || return 1
  timeout 4800 python run.py eval --category "$cat" --dataset synthetic \
      --ckpt "ckpt_r2/${shape}_stage1.msgpack" \
      --ckpt-glb "ckpt_r2/${shape}_stage0.msgpack" \
      --compute-dtype bfloat16 --chunk-a 12 \
      --batch-size "$bs" --max-batches 15 \
      > "logs_r2/${cat}_eval.log" 2>&1
}

# round-3 experiment: pin the axis gauge with the running-mean gate
run_cat oven 2000 "$OVEN_S1" 4 --axis-reg-stra 1
run_cat washing_machine 2000 "$WM_S1" 4 --axis-reg-stra 1
run_cat eyeglasses 1500 "$EYE_S1" 2
run_cat drawer 1500 "$DRAWER_S1" 4
echo LADDER-DONE
