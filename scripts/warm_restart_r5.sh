#!/bin/bash
# Round-5 experiment 1 (zero new code): test the warm-restart-plasticity
# hypothesis from RESULTS.md finding 11 on OVEN.
#
# Observation: the safe stage-1 extension that broke the one-slot IoU band
# (0.377 -> 0.492) resumed WEIGHT-ONLY — fresh Adam moments, LR schedule
# restarted — while every flat oven extension resumed full train state.
# attn_ent rose 4x during the climb: the saturated attention regained
# plasticity exactly when the moments reset.
#
# Arm A (warm restart): strip the ovenhp checkpoint to weights via
#   load_params_any -> save_checkpoint, resume THAT (weight-only path,
#   fresh moments, full LR), 2000 steps.
# Control: plain full-state resume of the same checkpoint, 2000 steps
#   (this is exactly what rounds 3-4 ran; its IoU slope is ~0, see
#   logs_r4/ovenhp_stage1.log steps 3600-6400).
# Readout: train-IoU slope + 15-batch eval IoU.  If A climbs, the lever is
# optimizer plasticity, not safe geometry — and applies to every category.
set -x
cd /root/repo
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH explicitly (epoch seconds)}
left () { echo $(( DEADLINE_EPOCH - $(date +%s) )); }
[ "$(left)" -le 0 ] && { echo "FATAL: deadline passed" >&2; exit 1; }
mkdir -p ckpt_r5 logs_r5
PCKPT=ckpt_r5/playground/ckpt

SRC=ckpt_r4/ovenhp_stage1_resume.msgpack
[ -f "$SRC" ] || SRC=ckpt_r4/ovenhp_stage1_partial.msgpack

# strip to weights (drops opt_state/step -> weight-only resume path)
python - "$SRC" ckpt_r5/ovenwr_seed.msgpack <<'EOF'
import sys
from flax import serialization
raw = serialization.msgpack_restore(open(sys.argv[1], "rb").read())
weights = raw["params"] if "opt_state" in raw and "params" in raw else raw
open(sys.argv[2], "wb").write(serialization.to_bytes(weights))
print("stripped", sys.argv[1], "->", sys.argv[2])
EOF

t=$(( $(left) - 2100 )); [ "$t" -gt 10800 ] && t=10800
if [ "$t" -gt 600 ]; then
  rm -f ckpt_r5/oven_stage1.msgpack
  timeout "$t" python run.py train --category oven --dataset synthetic \
    --stage 1 --steps 2000 --batch-size 2 \
    --resume ckpt_r5/ovenwr_seed.msgpack \
    --eval-freq 500 --log-freq 100 \
    --ov-max-factor 1.0 --purity-factor 1.0 --axis-reg-stra 1 \
    --resume-glb ckpt_r2/oven_stage0.msgpack \
    --compute-dtype bfloat16 --chunk-a 12 --ckpt-dir ckpt_r5 \
    >> logs_r5/ovenwr_stage1.log 2>&1
  ck=ckpt_r5/oven_stage1.msgpack
  if [ ! -f "$ck" ]; then
    ck=$(ls -v "$PCKPT"/playground_stage1_net_Iter*.msgpack 2>/dev/null | tail -1)
  fi
  if [ -n "$ck" ] && [ -f "$ck" ] && [ "$(left)" -gt 300 ]; then
    cp "$ck" ckpt_r5/ovenwr_stage1_resume.msgpack
    timeout $(( $(left) - 120 )) python run.py eval --category oven --dataset synthetic \
      --ckpt ckpt_r5/ovenwr_stage1_resume.msgpack --ckpt-glb ckpt_r2/oven_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      > logs_r5/ovenwr_eval.log 2>&1
  fi
  rm -rf "$PCKPT"
fi
echo R5-WARMRESTART-DONE
