#!/bin/bash
# Round-2 training ladder, revision D.
#
# Diagnosis that sized this revision (see OPTIMIZATION.md "relay execution
# modes"): the relayed axon backend is stuck in its degraded mode tonight —
# every REAL stage-1 step costs ~4.2 s regardless of dispatch strategy
# (K-step scan, async pipelining and donation were all measured; the cost is
# per executed step body).  Step budgets below fit that rate into the round's
# remaining wall clock, prioritising one full two-part category (oven), then
# washing_machine, then short eyeglasses/drawer runs for family coverage.
#
# Resumability: every attempt resumes from a cumulative checkpoint and a
# .steps counter, so aborts / kills cost at most the 200-step save window.
set -x
cd /root/repo
mkdir -p ckpt_r2 logs_r2
PCKPT=ckpt_r2/playground/ckpt

if [ -f /tmp/train_run.pid ]; then
  while kill -0 "$(cat /tmp/train_run.pid)" 2>/dev/null; do sleep 20; done
fi

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
    # crashed / timed out: fold the latest periodic ckpt into the cumulative
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
  local cat=$1 s0_steps=$2 s1_steps=$3 bs=$4
  local shape
  shape=$(shape_of "$cat")
  # stage 0: multi-step dispatch amortises fine at stage-0 size
  train_stage "$cat" "$shape" 0 "$s0_steps" "$bs" --no-global-rot --steps-per-call 8 \
    || return 1
  # stage 1: K=1 (scan does not amortise the degraded per-body cost),
  # no in-train eval (each eval pays fresh compiles + degraded batches)
  train_stage "$cat" "$shape" 1 "$s1_steps" "$bs" \
      --resume-glb "ckpt_r2/${shape}_stage0.msgpack" --eval-freq 0 \
    || return 1
  timeout 4800 python run.py eval --category "$cat" --dataset synthetic \
      --ckpt "ckpt_r2/${shape}_stage1.msgpack" \
      --ckpt-glb "ckpt_r2/${shape}_stage0.msgpack" \
      --compute-dtype bfloat16 --chunk-a 12 \
      --batch-size "$bs" --max-batches 15 \
      > "logs_r2/${cat}_eval.log" 2>&1
}

run_cat oven 2000 2400 4
run_cat washing_machine 2000 1200 4
run_cat eyeglasses 1500 400 2
run_cat drawer 1500 400 4
echo LADDER-DONE
