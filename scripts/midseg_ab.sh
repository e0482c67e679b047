#!/bin/bash
# CPU A/B at the 'mid' scale (192 pts, M=64, 3-layer backbone) for the
# part-discovery question.  The tiny preset (64 pts) provably cannot
# segment regardless of loss variant (RESULTS round-3 #7); mid restores the
# recon-capacity pressure (N/M = 3, like the real 380/128 recipes) that is
# the only gradient channel aligning slot attention with parts.
# Usage: bash scripts/midseg_ab.sh [outdir]
set -e
cd /root/repo
OUT=${1:-/tmp/midseg}
mkdir -p "$OUT"
STEPS=${STEPS:-1200}

run_cpu () {
  local name=$1; shift
  [ -f "$OUT/$name.log" ] && { echo "skip $name (log exists)"; return 0; }
  nice -n 19 python - "$@" > "$OUT/$name.log" 2>&1 <<'EOF'
import sys, jax
jax.config.update("jax_platforms", "cpu")
sys.argv = ["run.py"] + sys.argv[1:]
import run; run.main()
EOF
  echo "done $name"
}

# shared stage-0 global-alignment checkpoint
if [ ! -f "$OUT/oven_stage0.msgpack" ]; then
  run_cpu stage0 train --category mid --dataset synthetic --stage 0 \
      --steps 500 --batch-size 4 --ckpt-dir "$OUT"
fi

G="--resume-glb $OUT/oven_stage0.msgpack"

# B: reference-default hard-masked weights + starvation hinge
run_cpu B_hard_hinge train --category mid --dataset synthetic --stage 1 \
    --steps "$STEPS" --batch-size 4 --eval-freq 300 --log-freq 40 $G \
    --ov-max-factor 1.0 --ckpt-dir "$OUT/B"

# E: pointwise soft weights (mixture loss) + hinge — the shipped r3 recipe
run_cpu E_pointwise train --category mid --dataset synthetic --stage 1 \
    --steps "$STEPS" --batch-size 4 --eval-freq 300 --log-freq 40 $G \
    --soft-seg-weights --soft-seg-pointwise --ov-max-factor 1.0 --ckpt-dir "$OUT/E"

# P: hard weights + hinge + purity loss (nn/losses.purity_loss; the VERDICT-
# requested ablation — the reference computes it in common_utils.py:67)
run_cpu P_purity train --category mid --dataset synthetic --stage 1 \
    --steps "$STEPS" --batch-size 4 --eval-freq 300 --log-freq 40 $G \
    --ov-max-factor 1.0 --purity-factor 1.0 --ckpt-dir "$OUT/P"

echo MIDSEG-AB-DONE
