#!/bin/bash
# Round-3 ladder, phase J — the HEALTHY-MODE window (first since round 1).
# Probe at 12:25 UTC: 0.05 s per fetched execution (degraded sessions: ~1 s
# fixed overhead per execution).  Priorities while the window lasts:
#   1. ovenhp LONG: the round-4 candidate seg recipe (hard argmax weights +
#      starvation hinge + purity), 6000 stage-1 steps — the first run at a
#      horizon that can discriminate seg recipes (every degraded-mode run was
#      cut at <=2400).  In-train eval every 500 tracks the IoU trajectory.
#   2. full ovenhp eval (15 batches).
#   3. fused-backward A/B, both arms back-to-back (VERDICT #5's missing
#      healthy-mode measurement).
#   4. safe two-stage (the one category with zero runs; VERDICT #8).
#   5. drawer stage-1 extension at the r2 argmax weighting (the soft-seg
#      variant OOMs at batch 4; RESULTS r3 item 12).
# Everything is deadline-gated so the chip is free before the driver's
# round-end bench.
set -x
cd /root/repo
mkdir -p ckpt_r3 logs_r3
PCKPT=ckpt_r3/playground/ckpt
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(date -u -d '2026-08-18 13:00' +%s)}

left () { echo $(( DEADLINE_EPOCH - $(date +%s) )); }
over () { [ "$(left)" -le 180 ]; }

wait_relay () {
  until timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    over && exit 0
    echo "[$(date +%H:%M:%S)] relay down; waiting" >> logs_r3/ladder_r3j.log
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

echo $$ > /tmp/train_run.pid

train_stage () {  # <bookkeeping-name> <cli-category> <stage> <target> <bs> extra...
  local name=$1 cat=$2 stage=$3 target=$4 bs=$5; shift 5
  local final="ckpt_r3/${name}_stage${stage}.msgpack"
  local produced="ckpt_r3/${cat}_stage${stage}.msgpack"
  local cum_ck="ckpt_r3/${name}_stage${stage}_resume.msgpack"
  local cum_f="ckpt_r3/${name}_stage${stage}.steps"
  local att
  for att in 1 2 3; do
    [ -f "$final" ] && return 0
    over && return 1
    wait_relay
    local done=0
    [ -f "$cum_f" ] && done=$(cat "$cum_f")
    local todo=$((target - done))
    if [ "$todo" -le 0 ]; then cp "$cum_ck" "$final"; return 0; fi
    local res=()
    [ -f "$cum_ck" ] && res=(--resume "$cum_ck")
    rm -rf "$PCKPT"
    brun 14400 python run.py train --category "$cat" --dataset synthetic \
        --stage "$stage" --steps "$todo" --batch-size "$bs" "${res[@]}" "$@" \
        --compute-dtype bfloat16 --chunk-a 12 --ckpt-dir ckpt_r3 \
        >> "logs_r3/${name}_stage${stage}.log" 2>&1
    if [ -f "$produced" ]; then
      [ "$final" != "$produced" ] && mv "$produced" "$final"
      return 0
    fi
    local latest
    latest=$(ls -v "$PCKPT"/playground_stage${stage}_net_Iter*.msgpack 2>/dev/null | tail -1)
    if [ -n "$latest" ]; then
      local it=${latest##*Iter}; it=${it%.msgpack}
      done=$((done + it))
      echo "$done" > "$cum_f"
      cp "$latest" "$cum_ck"
    fi
  done
  return 1
}

run_eval () {  # <log-name> <cli-category> <ckpt> <glb> extra...
  local log=$1 cat=$2 ck=$3 glb=$4; shift 4
  [ -f "$ck" ] || ck="${ck%.msgpack}_resume.msgpack"
  [ -f "$ck" ] || return 0
  grep -q seg_iou "logs_r3/${log}.log" 2>/dev/null && return 0
  wait_relay
  brun 2400 python run.py eval --category "$cat" --dataset synthetic \
      --ckpt "$ck" --ckpt-glb "$glb" \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      "$@" > "logs_r3/${log}.log" 2>&1
}

# ---- 1. ovenhp long run: hard weights + hinge + purity, 6000 steps ---------
# The 420-step probe (logs_r3/ovenhp_stage1.log, degraded session) held
# occupancy healthy (occ_min 0.37, empty 0) but sat in the 0.40 IoU band;
# RESULTS item 12's conclusion was that <=2k-step horizons cannot separate
# recipes.  This is the long-horizon run.
train_stage ovenhp oven 1 6000 4 \
    --eval-freq 500 --log-freq 100 \
    --ov-max-factor 1.0 --purity-factor 1.0 --axis-reg-stra 1 \
    --resume-glb ckpt_r2/oven_stage0.msgpack
run_eval ovenhp_eval oven ckpt_r3/ovenhp_stage1.msgpack ckpt_r2/oven_stage0.msgpack

# ---- 2. fused-backward A/B, healthy mode, both arms back-to-back -----------
if ! over && [ ! -f logs_r3/ab_healthy_fwd.json ]; then
  wait_relay
  brun 700 python scripts/bench_ab.py --fused --iters 30 \
      > logs_r3/ab_healthy_fwd.json 2> logs_r3/ab_healthy_fwd.err
  brun 700 python scripts/bench_ab.py --fused-bwd --iters 30 \
      > logs_r3/ab_healthy_bwd.json 2> logs_r3/ab_healthy_bwd.err
fi

# ---- 3. safe two-stage (the last uncovered category) ------------------------
train_stage safe safe 0 1200 4
train_stage safe safe 1 1200 4 \
    --eval-freq 400 --log-freq 100 \
    --ov-max-factor 1.0 --purity-factor 1.0 --axis-reg-stra 1 \
    --resume-glb ckpt_r3/safe_stage0.msgpack
run_eval safe_eval safe ckpt_r3/safe_stage1.msgpack ckpt_r3/safe_stage0.msgpack

# ---- 4. drawer stage-1 extension (argmax weighting — fits batch 4) ----------
if [ ! -f ckpt_r3/drawerx_stage1.msgpack ]; then
  if [ ! -f ckpt_r3/drawerx_stage1_resume.msgpack ]; then
    cp ckpt_r2/drawer_stage1.msgpack ckpt_r3/drawerx_stage1_resume.msgpack
    echo 400 > ckpt_r3/drawerx_stage1.steps
  fi
  train_stage drawerx drawer 1 1600 4 \
      --eval-freq 400 --log-freq 100 --ov-max-factor 1.0 \
      --resume-glb ckpt_r2/drawer_stage0.msgpack
fi
run_eval drawerx_eval drawer ckpt_r3/drawerx_stage1.msgpack ckpt_r2/drawer_stage0.msgpack

echo R3J-LADDER-DONE
