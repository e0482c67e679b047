#!/bin/bash
# CPU A/B platform for the stage-1 segmentation question (VERDICT #3).
#
# The 'tiny' preset (64 pts, 2 slots, small mlps) trains at ~1 s/step on the
# host CPU, so segmentation-loss variants can be compared in minutes without
# touching the TPU chip (which the round-3 ladder occupies for hours).
# Usage: bash scripts/tinyseg_ab.sh [outdir]
set -e
cd /root/repo
OUT=${1:-/tmp/tinyseg}
mkdir -p "$OUT"
STEPS=${STEPS:-800}

run_cpu () {
  local name=$1; shift
  [ -f "$OUT/$name.log" ] && { echo "skip $name (log exists)"; return 0; }
  python - "$@" > "$OUT/$name.log" 2>&1 <<'EOF'
import sys, jax
jax.config.update("jax_platforms", "cpu")
sys.argv = ["run.py"] + sys.argv[1:]
import run; run.main()
EOF
  echo "done $name"
}

# shared stage-0 global-alignment checkpoint
if [ ! -f "$OUT/oven_stage0.msgpack" ]; then
  run_cpu stage0 train --category tiny --dataset synthetic --stage 0 \
      --steps 300 --batch-size 4 --ckpt-dir "$OUT"
fi

G="--resume-glb $OUT/oven_stage0.msgpack"

# A: the current chip-run recipe (all-points soft weights + starvation hinge)
run_cpu A_soft_hinge train --category tiny --dataset synthetic --stage 1 \
    --steps "$STEPS" --batch-size 4 --eval-freq 200 $G \
    --soft-seg-weights --ov-max-factor 1.0 --ckpt-dir "$OUT/A"

# B: reference-default hard-masked weights + starvation hinge only
run_cpu B_hard_hinge train --category tiny --dataset synthetic --stage 1 \
    --steps "$STEPS" --batch-size 4 --eval-freq 200 $G \
    --ov-max-factor 1.0 --ckpt-dir "$OUT/B"

# C: no regulariser control (expected: slot collapse as on-chip)
run_cpu C_noreg train --category tiny --dataset synthetic --stage 1 \
    --steps "$STEPS" --batch-size 4 --eval-freq 200 $G --ckpt-dir "$OUT/C"

# D: soft + hinge + purity loss (common_utils.py:67 analogue)
run_cpu D_purity train --category tiny --dataset synthetic --stage 1 \
    --steps "$STEPS" --batch-size 4 --eval-freq 200 $G \
    --soft-seg-weights --ov-max-factor 1.0 --purity-factor 1.0 --ckpt-dir "$OUT/D"

echo TINYSEG-AB-DONE
