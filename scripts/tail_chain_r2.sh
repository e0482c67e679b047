#!/bin/bash
# Round-2 tail: after the in-flight eyeglasses stage-1 finishes, eval it,
# then drawer stage-0/1 + eval. Kept separate from the ladder for the
# round's final stretch.
set -x
cd /root/repo
if [ -f /tmp/train_run.pid ]; then
  while kill -0 "$(cat /tmp/train_run.pid)" 2>/dev/null; do sleep 15; done
fi
[ -f ckpt_r2/eyeglasses_stage1.msgpack ] && \
timeout 4800 python run.py eval --category eyeglasses --dataset synthetic \
    --ckpt ckpt_r2/eyeglasses_stage1.msgpack \
    --ckpt-glb ckpt_r2/eyeglasses_stage0.msgpack \
    --compute-dtype bfloat16 --chunk-a 12 --batch-size 1 --max-batches 15 \
    > logs_r2/eyeglasses_eval.log 2>&1

rm -rf ckpt_r2/playground/ckpt
timeout 7200 python run.py train --category drawer --dataset synthetic \
    --stage 0 --steps 1500 --batch-size 4 --no-global-rot --steps-per-call 8 \
    --compute-dtype bfloat16 --chunk-a 12 --ckpt-dir ckpt_r2 \
    > logs_r2/drawer_stage0.log 2>&1
rm -rf ckpt_r2/playground/ckpt
timeout 7200 python run.py train --category drawer --dataset synthetic \
    --stage 1 --steps 400 --batch-size 2 --eval-freq 0 \
    --resume-glb ckpt_r2/drawer_stage0.msgpack \
    --compute-dtype bfloat16 --chunk-a 12 --ckpt-dir ckpt_r2 \
    > logs_r2/drawer_stage1.log 2>&1
[ -f ckpt_r2/drawer_stage1.msgpack ] && \
timeout 4800 python run.py eval --category drawer --dataset synthetic \
    --ckpt ckpt_r2/drawer_stage1.msgpack \
    --ckpt-glb ckpt_r2/drawer_stage0.msgpack \
    --compute-dtype bfloat16 --chunk-a 12 --batch-size 2 --max-batches 15 \
    > logs_r2/drawer_eval.log 2>&1
echo TAIL-DONE
