#!/bin/bash
# Round-3 wrap-up chip work, gated on the r3i ladder exiting (or its 09:05
# deadline passing and the chip going quiet).  Runs the two remaining
# chip-exclusive items before the driver's round-end bench:
#   1. fused-backward A/B (VERDICT #5 done-criterion: measured step-time
#      delta; fwd-only arm cached at 2.94 s/step, logs_r3/ab_fusedbwd2.json)
#   2. eyeglasses eval with the new axis_err_relpose metric
# Everything is timeout-bounded so the chip is free again well before the
# round ends (~10:20).
set -x
cd /root/repo
LADDER_PID=${1:?usage: post_ladder_r3.sh <ladder-pid>}
# hard stop: the driver benches on this chip at round end (~10:20); every
# step is skipped once past the cutoff and bounded so it cannot straddle it
END_EPOCH=${END_EPOCH:-$(date -u -d '2026-08-18 10:02' +%s)}
left () { echo $(( END_EPOCH - $(date +%s) )); }
brun () {  # brun <soft-timeout> cmd...  — min(soft, time-left)
  local t=$1; shift
  local rem; rem=$(left)
  [ "$rem" -le 120 ] && return 1
  [ "$t" -gt "$rem" ] && t=$rem
  timeout "$t" "$@"
}

while kill -0 "$LADDER_PID" 2>/dev/null; do sleep 30; done
# let any straggler trainer the ladder spawned wind down (detection only —
# the ladder's own timeout wrappers do the killing)
sleep 60
while ps -eo cmd | grep -q "[r]un.py"; do sleep 30; done

# 1. fused-backward A/B (one arm; the baseline arm is cached)
brun 2400 python scripts/bench_ab.py --fused-bwd --iters 10 \
    > logs_r3/ab_fusedbwd3.json 2> logs_r3/ab_fusedbwd3.err

# 2. eyeglasses relpose eval (same flags as logs_r3/eyeglasses_eval.log so
# the compile is cached and rows are comparable)
brun 1500 python run.py eval --category eyeglasses --dataset synthetic \
    --ckpt ckpt_r3/eyeglasses_stage1.msgpack \
    --ckpt-glb ckpt_r2/eyeglasses_stage0.msgpack \
    --compute-dtype bfloat16 --chunk-a 12 --orbit-chunk-k 30 \
    --batch-size 2 --max-batches 8 \
    > logs_r3/eyeglasses_relpose_eval.log 2>&1

# 3. laptop eval — final ckpt if the ladder finished, else the last resume
LCK=ckpt_r3/laptop_stage1.msgpack
[ -f "$LCK" ] || LCK=ckpt_r3/laptop_stage1_resume.msgpack
if [ -f "$LCK" ] && ! grep -q seg_iou logs_r3/laptop_eval.log 2>/dev/null; then
  brun 1500 python run.py eval --category laptop --dataset synthetic \
      --ckpt "$LCK" \
      --ckpt-glb ckpt_r3/laptop_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      > logs_r3/laptop_eval.log 2>&1
fi

echo POST-LADDER-DONE
