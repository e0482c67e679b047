#!/bin/bash
# Round-2 training ladder, revision C.
#
# Lessons from revisions A/B:
#   * stage-0 is reliable with --steps-per-call 8 (6.6 s/call < backend RPC
#     deadline) — keep it.
#   * stage-1's scan-of-8 graph gets ABORTED by the relayed TPU backend
#     (logs_r2/oven_stage1.log) — dispatch stage-1 single-step and make every
#     stage-1 run resumable from the periodic Iter checkpoints so an abort or
#     a degraded session costs at most the 200-step save window, not the run.
#   * all presets share experiment_id "playground", so the periodic-ckpt dir
#     is cleaned between categories to avoid cross-category resume mixups.
set -x
cd /root/repo
mkdir -p ckpt_r2 logs_r2
PCKPT=ckpt_r2/playground/ckpt

# Wait for any in-flight training process from a previous ladder revision.
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

run_cat () {
  local cat=$1 s0_steps=$2 s1_steps=$3 bs=$4
  local shape
  shape=$(shape_of "$cat")
  rm -rf "$PCKPT"

  # ---- stage 0 (multi-step dispatch; one retry with resume) ----
  local att
  for att in 1 2; do
    [ -f "ckpt_r2/${shape}_stage0.msgpack" ] && break
    local res=()
    local latest
    latest=$(ls -v "$PCKPT"/playground_stage0_net_Iter*.msgpack 2>/dev/null | tail -1)
    local todo=$s0_steps
    if [ -n "$latest" ]; then
      local it=${latest##*Iter}; it=${it%.msgpack}
      todo=$((s0_steps - it))
      res=(--resume "$latest")
      if [ "$todo" -le 0 ]; then cp "$latest" "ckpt_r2/${shape}_stage0.msgpack"; break; fi
    fi
    timeout 5400 python run.py train --category "$cat" --dataset synthetic --stage 0 \
        --steps "$todo" --batch-size "$bs" --no-global-rot \
        --steps-per-call 8 "${res[@]}" \
        --compute-dtype bfloat16 --chunk-a 12 --ckpt-dir ckpt_r2 \
        >> "logs_r2/${cat}_stage0.log" 2>&1
  done
  rm -rf "$PCKPT"

  # ---- stage 1 (single-step dispatch; retry + resume loop) ----
  for att in 1 2 3 4 5 6; do
    [ -f "ckpt_r2/${shape}_stage1.msgpack" ] && break
    local res=()
    local latest
    latest=$(ls -v "$PCKPT"/playground_stage1_net_Iter*.msgpack 2>/dev/null | tail -1)
    local todo=$s1_steps
    if [ -n "$latest" ]; then
      local it=${latest##*Iter}; it=${it%.msgpack}
      todo=$((s1_steps - it))
      res=(--resume "$latest")
      if [ "$todo" -le 0 ]; then cp "$latest" "ckpt_r2/${shape}_stage1.msgpack"; break; fi
    fi
    timeout 10800 python run.py train --category "$cat" --dataset synthetic --stage 1 \
        --steps "$todo" --batch-size "$bs" \
        --resume-glb "ckpt_r2/${shape}_stage0.msgpack" "${res[@]}" \
        --compute-dtype bfloat16 --chunk-a 12 --ckpt-dir ckpt_r2 \
        >> "logs_r2/${cat}_stage1.log" 2>&1
  done
  rm -rf "$PCKPT"

  # ---- eval ----
  [ -f "ckpt_r2/${shape}_stage1.msgpack" ] && \
  timeout 3600 python run.py eval --category "$cat" --dataset synthetic \
      --ckpt "ckpt_r2/${shape}_stage1.msgpack" \
      --ckpt-glb "ckpt_r2/${shape}_stage0.msgpack" \
      --compute-dtype bfloat16 --chunk-a 12 \
      --batch-size "$bs" --max-batches 25 \
      > "logs_r2/${cat}_eval.log" 2>&1
}

run_cat oven 2000 10000 4
run_cat washing_machine 2000 10000 4
run_cat eyeglasses 1500 6000 2
run_cat drawer 1500 6000 4
echo LADDER-DONE
