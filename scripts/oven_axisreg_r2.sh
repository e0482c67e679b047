#!/bin/bash
# Post-tail experiment: fresh UNINTERRUPTED oven stage-1 with the
# axis_reg_stra=1 running-mean gate (the round-2 drift fix experiment).
# Periodic Iter checkpoints now carry full train state, so if the round
# ends mid-run the next round resumes without an lr jolt.
set -x
cd /root/repo
if [ -f /tmp/tail.pid ]; then
  while kill -0 "$(cat /tmp/tail.pid)" 2>/dev/null; do sleep 20; done
fi
rm -rf ckpt_r2/playground/ckpt
mv ckpt_r2/oven_stage1.msgpack ckpt_r2/oven_stage1_r2main.msgpack 2>/dev/null
timeout 28800 python run.py train --category oven --dataset synthetic \
    --stage 1 --steps 2400 --batch-size 4 --eval-freq 0 --axis-reg-stra 1 \
    --resume-glb ckpt_r2/oven_stage0.msgpack \
    --compute-dtype bfloat16 --chunk-a 12 --ckpt-dir ckpt_r2 \
    > logs_r2/oven_axisreg_stage1.log 2>&1
if [ -f ckpt_r2/oven_stage1.msgpack ]; then
  mv ckpt_r2/oven_stage1.msgpack ckpt_r2/oven_stage1_axisreg.msgpack
  timeout 4800 python run.py eval --category oven --dataset synthetic \
      --ckpt ckpt_r2/oven_stage1_axisreg.msgpack \
      --ckpt-glb ckpt_r2/oven_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      > logs_r2/oven_axisreg_eval.log 2>&1
fi
mv ckpt_r2/oven_stage1_r2main.msgpack ckpt_r2/oven_stage1.msgpack 2>/dev/null
echo OVEN-AXISREG-DONE
