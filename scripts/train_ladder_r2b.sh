#!/bin/bash
# Round-2 training ladder, revision B: multi-step dispatch (8 steps/call) to
# amortise the relayed-backend RPC overhead.  Skips stages whose final
# checkpoint already exists, so it is resumable.
set -x
cd /root/repo
mkdir -p ckpt_r2 logs_r2

run_cat () {
  local cat=$1 s0_steps=$2 s1_steps=$3 bs=$4
  local shape
  shape=$(python - "$cat" <<'EOF'
import sys
from equi_articulated_pose_tpu.config import get_config
print(get_config(sys.argv[1]).data.shape_type)
EOF
)
  if [ ! -f "ckpt_r2/${shape}_stage0.msgpack" ]; then
    python run.py train --category "$cat" --dataset synthetic --stage 0 \
        --steps "$s0_steps" --batch-size "$bs" --no-global-rot \
        --steps-per-call 8 \
        --compute-dtype bfloat16 --chunk-a 12 --ckpt-dir ckpt_r2 \
        > "logs_r2/${cat}_stage0.log" 2>&1
  fi
  if [ ! -f "ckpt_r2/${shape}_stage1.msgpack" ]; then
    python run.py train --category "$cat" --dataset synthetic --stage 1 \
        --steps "$s1_steps" --batch-size "$bs" \
        --steps-per-call 8 \
        --resume-glb "ckpt_r2/${shape}_stage0.msgpack" \
        --compute-dtype bfloat16 --chunk-a 12 --ckpt-dir ckpt_r2 \
        > "logs_r2/${cat}_stage1.log" 2>&1
  fi
  python run.py eval --category "$cat" --dataset synthetic \
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
