#!/bin/bash
# Round-5 ladder.  Priorities (VERDICT r4 "Next round"):
#   0. bench gate + healthy-window grab (unchanged discipline: first healthy
#      window -> bench + 3-arm fused A/B before training eats it).
#   1. ovenmp/wmmp: motion-based attention pairing arms FROM SCRATCH on the
#      two categories still below their one-slot bars (VERDICT #1/item 2).
#      Target teacher quality measured on real data first
#      (scripts/motion_target_iou.py): oven 0.79 / wm 0.80 mean IoU.
#   2. safemp: motion-pair warm arm on the safe 0.492 breakthrough ckpt
#      (teacher 0.91) — can it push past 0.6?
#   3. partial: first partial-view two-stage pipeline on chip (VERDICT #4):
#      laptop_partial preset over the synthetic rasterizer path.
#   4. laptopax: axis-from-relpose distill at matched horizon (VERDICT #5).
#   5. ovenmpw: motion-pair rescue of the trained ovenhp ckpt (weight-only).
# The warm-restart arm (scripts/warm_restart_r5.sh) runs FIRST, standalone;
# this ladder waits for it.
set -x
cd /root/repo
mkdir -p ckpt_r5 logs_r5
PCKPT=ckpt_r5/playground/ckpt
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH explicitly (epoch seconds)}

left () { echo $(( DEADLINE_EPOCH - $(date +%s) )); }
over () { [ "$(left)" -le 180 ]; }

if [ "$(left)" -le 0 ]; then
  echo "FATAL: DEADLINE_EPOCH ($DEADLINE_EPOCH) already passed" >&2
  exit 1
fi

wait_relay () {
  until timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    over && exit 0
    echo "[$(date +%H:%M:%S)] relay down; waiting" >> logs_r5/ladder_r5.log
    sleep 60
  done
}

brun () {
  local t=$1; shift
  local rem; rem=$(left)
  [ "$rem" -le 180 ] && return 1
  [ "$t" -gt "$rem" ] && t=$rem
  timeout "$t" "$@"
}

echo $$ > /tmp/train_run_r5.pid

# watchdog for the relay's mid-RPC hang mode (exact-cmdline matching only)
if [ ! -f /tmp/watchdog_r5.pid ] || ! kill -0 "$(cat /tmp/watchdog_r5.pid)" 2>/dev/null; then
  nohup bash scripts/watchdog.sh /root/repo/logs_r5 1500 >/dev/null 2>&1 &
  echo $! > /tmp/watchdog_r5.pid
fi

# ---- wait for the standalone warm-restart arm to release the chip ---------
if [ -f /tmp/r5_wr.pid ]; then
  while kill -0 "$(cat /tmp/r5_wr.pid)" 2>/dev/null; do
    over && exit 0
    sleep 60
  done
fi

maybe_healthy_ab () {
  # Triggered by the trainer's healthy-mode marker (pid-suffixed or legacy).
  local hit=0 f
  for f in /tmp/healthy_mode_observed /tmp/healthy_mode_observed.*; do
    [ -f "$f" ] && { hit=1; rm -f "$f"; }
  done
  [ "$hit" = 1 ] || return 0
  [ -s logs_r5/ab_healthy_bwd.json ] && return 0
  over && return 0
  wait_relay
  brun 900 python scripts/bench_ab.py --iters 30 \
      > logs_r5/ab_healthy_xla.json 2> logs_r5/ab_healthy_xla.err
  brun 900 python scripts/bench_ab.py --fused --iters 30 \
      > logs_r5/ab_healthy_fwd.json 2> logs_r5/ab_healthy_fwd.err
  brun 900 python scripts/bench_ab.py --fused-bwd --iters 30 \
      > logs_r5/ab_healthy_bwd.json 2> logs_r5/ab_healthy_bwd.err
  local sps
  sps=$(python - <<'EOF'
import json
try:
    print(json.load(open("logs_r5/ab_healthy_bwd.json")).get("sec_per_step", 99))
except Exception:
    print(99)
EOF
)
  if python -c "import sys; sys.exit(0 if float('$sps') > 1.0 else 1)"; then
    for f in logs_r5/ab_healthy_*.json; do mv "$f" "$f.degraded"; done
  else
    brun 900 python bench.py > logs_r5/bench_healthy.json 2>> logs_r5/bench.err
  fi
}

strip_weights () {  # <src> <dst>: full train state -> weight-only resume
  python - "$1" "$2" <<'EOF'
import sys
from flax import serialization
raw = serialization.msgpack_restore(open(sys.argv[1], "rb").read())
weights = raw["params"] if "opt_state" in raw and "params" in raw else raw
open(sys.argv[2], "wb").write(serialization.to_bytes(weights))
print("stripped", sys.argv[1], "->", sys.argv[2])
EOF
}

harvest () {  # <name> <stage>
  local name=$1 stage=$2
  local cum_ck="ckpt_r5/${name}_stage${stage}_resume.msgpack"
  local cum_f="ckpt_r5/${name}_stage${stage}.steps"
  local latest
  latest=$(ls -v "$PCKPT"/playground_stage${stage}_net_Iter*.msgpack 2>/dev/null | tail -1)
  if [ -n "$latest" ]; then
    local it=${latest##*Iter}; it=${it%.msgpack}
    # the Iter index is already cumulative across resumes (loop.py save
    # offsets by the restored step), so record it directly
    echo "$it" > "$cum_f"
    cp "$latest" "$cum_ck"
    cp "$latest" "ckpt_r5/${name}_stage${stage}_partial.msgpack"
  fi
  rm -rf "$PCKPT"
}

train_stage () {  # <name> <cli-category> <stage> <target-steps> <bs> <budget-s> extra...
  local name=$1 cat=$2 stage=$3 target=$4 bs=$5 budget=$6; shift 6
  local final="ckpt_r5/${name}_stage${stage}.msgpack"
  local produced="ckpt_r5/${cat}_stage${stage}.msgpack"
  local cum_ck="ckpt_r5/${name}_stage${stage}_resume.msgpack"
  local cum_f="ckpt_r5/${name}_stage${stage}.steps"
  local t_end=$(( $(date +%s) + budget ))
  local att
  for att in 1 2 3 4; do
    [ -f "$final" ] && return 0
    over && return 1
    maybe_healthy_ab
    local rem_budget=$(( t_end - $(date +%s) ))
    [ "$rem_budget" -le 120 ] && break
    wait_relay
    harvest "$name" "$stage"
    local done=0
    [ -f "$cum_f" ] && done=$(cat "$cum_f")
    local todo=$((target - done))
    if [ "$todo" -le 0 ]; then
      if [ -f "$cum_ck" ]; then cp "$cum_ck" "$final" && return 0; fi
      echo "$name stage$stage: steps file says done but no resume ckpt — retraining" >> logs_r5/ladder_r5.log
      todo=$target; echo 0 > "$cum_f"
    fi
    local res=()
    [ -f "$cum_ck" ] && res=(--resume "$cum_ck")
    rm -f "$produced"
    brun "$rem_budget" python run.py train --category "$cat" --dataset synthetic \
        --stage "$stage" --steps "$todo" --batch-size "$bs" "${res[@]}" "$@" \
        --compute-dtype bfloat16 --chunk-a 12 --ckpt-dir ckpt_r5 \
        >> "logs_r5/${name}_stage${stage}.log" 2>&1
    if [ -f "$produced" ]; then
      [ "$final" != "$produced" ] && mv "$produced" "$final"
      echo "$target" > "$cum_f"
      cp "$final" "$cum_ck"
      rm -rf "$PCKPT"
      return 0
    fi
    harvest "$name" "$stage"
  done
  return 1
}

run_eval () {  # <log-name> <cli-category> <ckpt> <glb> extra...
  local log=$1 cat=$2 ck=$3 glb=$4; shift 4
  [ -f "$ck" ] || ck="${ck%.msgpack}_resume.msgpack"
  [ -f "$ck" ] || return 0
  grep -q seg_iou "logs_r5/${log}.log" 2>/dev/null && return 0
  wait_relay
  brun 2700 python run.py eval --category "$cat" --dataset synthetic \
      --ckpt "$ck" --ckpt-glb "$glb" \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      "$@" > "logs_r5/${log}.log" 2>&1
}

MP_FLAGS=(--motion-pair-factor 1.0 --attn-temp-start 4.0 --attn-temp-steps 1200
          --purity-factor 1.0 --purity-warmup 1500 --ov-max-factor 1.0
          --axis-reg-stra 1)

# ---- 1. ovenmp: motion-pair from scratch ------------------------------------
train_stage ovenmp oven 1 2400 2 10800 \
    --resume-glb ckpt_r2/oven_stage0.msgpack \
    --eval-freq 600 --log-freq 100 "${MP_FLAGS[@]}"
run_eval ovenmp_eval oven ckpt_r5/ovenmp_stage1.msgpack ckpt_r2/oven_stage0.msgpack

# ---- 2. wmmp ----------------------------------------------------------------
train_stage wmmp washing_machine 1 2400 2 10800 \
    --resume-glb ckpt_r2/washing_machine_stage0.msgpack \
    --eval-freq 600 --log-freq 100 "${MP_FLAGS[@]}"
run_eval wmmp_eval washing_machine ckpt_r5/wmmp_stage1.msgpack \
    ckpt_r2/washing_machine_stage0.msgpack

# ---- 3. safemp: warm from the 0.492 breakthrough ckpt -----------------------
if [ ! -f ckpt_r5/safemp_seed.msgpack ] && [ -f ckpt_r4/safe_stage1_resume.msgpack ]; then
  strip_weights ckpt_r4/safe_stage1_resume.msgpack ckpt_r5/safemp_seed.msgpack
fi
if [ -f ckpt_r5/safemp_seed.msgpack ] && [ ! -f ckpt_r5/safemp_stage1.steps ]; then
  # seed the cumulative resume so train_stage's first attempt warm-starts
  cp ckpt_r5/safemp_seed.msgpack ckpt_r5/safemp_stage1_resume.msgpack
  echo 0 > ckpt_r5/safemp_stage1.steps
fi
train_stage safemp safe 1 1600 2 7200 \
    --resume-glb ckpt_r4/safe_stage0_resume.msgpack \
    --eval-freq 400 --log-freq 100 "${MP_FLAGS[@]}"
run_eval safemp_eval safe ckpt_r5/safemp_stage1.msgpack \
    ckpt_r4/safe_stage0_resume.msgpack

# ---- 4. partial-view laptop two-stage (first ever on chip) ------------------
train_stage partlap laptop_partial 0 800 4 5400 --eval-freq 0 --log-freq 100
if [ -f ckpt_r5/partlap_stage0.msgpack ]; then
  train_stage partlap laptop_partial 1 1600 2 7200 \
      --resume-glb ckpt_r5/partlap_stage0.msgpack \
      --eval-freq 400 --log-freq 100 \
      --purity-factor 1.0 --purity-warmup 1500 --ov-max-factor 1.0 \
      --motion-pair-factor 1.0 --motion-pair-corr feat \
      --attn-temp-start 4.0 --attn-temp-steps 1200
  run_eval partlap_eval laptop_partial ckpt_r5/partlap_stage1.msgpack \
      ckpt_r5/partlap_stage0.msgpack
fi

# ---- 5. laptop axis-from-relpose at matched horizon --------------------------
if [ ! -f ckpt_r5/laptopax_stage1_resume.msgpack ] && [ -f ckpt_r3/laptop_stage1.msgpack ]; then
  cp ckpt_r3/laptop_stage1.msgpack ckpt_r5/laptopax_stage1_resume.msgpack
  echo 0 > ckpt_r5/laptopax_stage1.steps
fi
train_stage laptopax laptop 1 2400 2 9000 \
    --resume-glb ckpt_r3/laptop_stage0.msgpack \
    --eval-freq 600 --log-freq 100 \
    --axis-from-relpose 0.3 --ov-max-factor 1.0
run_eval laptopax_eval laptop ckpt_r5/laptopax_stage1.msgpack \
    ckpt_r3/laptop_stage0.msgpack

# ---- 6. ovenmpw: motion-pair rescue of the trained ovenhp ckpt ---------------
if [ ! -f ckpt_r5/ovenmpw_stage1.steps ] && [ -f ckpt_r5/ovenwr_seed.msgpack ]; then
  cp ckpt_r5/ovenwr_seed.msgpack ckpt_r5/ovenmpw_stage1_resume.msgpack
  echo 0 > ckpt_r5/ovenmpw_stage1.steps
fi
train_stage ovenmpw oven 1 1200 2 5400 \
    --resume-glb ckpt_r2/oven_stage0.msgpack \
    --eval-freq 400 --log-freq 100 "${MP_FLAGS[@]}"
run_eval ovenmpw_eval oven ckpt_r5/ovenmpw_stage1.msgpack ckpt_r2/oven_stage0.msgpack

echo R5-LADDER-DONE >> logs_r5/ladder_r5.log
echo R5-LADDER-DONE
