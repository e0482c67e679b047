#!/usr/bin/env bash
# Category training recipes — analog of the reference's scripts/train/*.sh.
# Each runs stage 0 then stage 1 with the preset flags baked into
# equi_articulated_pose_tpu/config.py PRESETS.
set -euo pipefail
CAT=${1:-oven}
DATA=${2:-./data}
STEPS0=${STEPS0:-2000}
STEPS1=${STEPS1:-20000}

python run.py train --category "$CAT" --data-path "$DATA" --stage 0 --steps "$STEPS0" \
    --compute-dtype bfloat16 --chunk-a 12
python run.py train --category "$CAT" --data-path "$DATA" --stage 1 --steps "$STEPS1" \
    --compute-dtype bfloat16 --chunk-a 12 \
    --resume-glb "ckpt/${CAT}_stage0.msgpack"
python run.py eval --category "$CAT" --data-path "$DATA" \
    --ckpt "ckpt/${CAT}_stage1.msgpack" --ckpt-glb "ckpt/${CAT}_stage0.msgpack"
