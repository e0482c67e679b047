#!/bin/bash
# Variant E for the CPU seg A/B (runs after tinyseg_ab.sh finishes):
# pointwise-normalised soft weighting — the mixture-assignment loss with no
# balanced-cluster prior (--soft-seg-pointwise).  See scripts/tinyseg_ab.sh.
set -e
cd /root/repo
OUT=${1:-/tmp/tinyseg}
STEPS=${STEPS:-800}
# wait for the main A/B driver
while kill -0 "$(cat /tmp/tinyseg.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
[ -f "$OUT/E_pointwise.log" ] && exit 0
python - train --category tiny --dataset synthetic --stage 1 \
    --steps "$STEPS" --batch-size 4 --eval-freq 200 \
    --resume-glb "$OUT/oven_stage0.msgpack" \
    --soft-seg-weights --soft-seg-pointwise --ov-max-factor 1.0 \
    --ckpt-dir "$OUT/E" > "$OUT/E_pointwise.log" 2>&1 <<'EOF'
import sys, jax
jax.config.update("jax_platforms", "cpu")
sys.argv = ["run.py"] + sys.argv[1:]
import run; run.main()
EOF
echo TINYSEG-E-DONE
