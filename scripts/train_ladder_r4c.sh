#!/bin/bash
# Round-4 phase B: extension window after the main ladder's six stages.
#   1. ovenccw — the round-4 synthesis arm: canonical-consistency (the
#      cross-state aligning signal) + purity WARM-UP (attention stays
#      plastic while pose/recon converge, instead of saturating by step
#      ~400 — RESULTS r4) + starvation hinge + axis-reg.  Fresh run.
#   2. ovencc extension to 4000 steps (if its 2000-step eval is promising).
#   3. ovenhp extension (the long-horizon discriminator) with the leftover
#      window.
#   4. cache-priming bench run so the driver's round-end bench compiles
#      nothing (the persistent cache is keyed on the FINAL code).
# Reuses the main ladder's train_stage/harvest/run_eval conventions.
set -x
cd /root/repo
mkdir -p ckpt_r4 logs_r4
PCKPT=ckpt_r4/playground/ckpt
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(date -u -d '2026-08-19 10:10' +%s)}

left () { echo $(( DEADLINE_EPOCH - $(date +%s) )); }
over () { [ "$(left)" -le 180 ]; }

if [ "$(left)" -le 0 ]; then
  echo "FATAL: DEADLINE_EPOCH already passed" >&2
  exit 1
fi

wait_relay () {
  until timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    over && exit 0
    echo "[$(date +%H:%M:%S)] relay down; waiting" >> logs_r4/ladder_r4c.log
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

harvest () {
  local name=$1 stage=$2
  local cum_ck="ckpt_r4/${name}_stage${stage}_resume.msgpack"
  local cum_f="ckpt_r4/${name}_stage${stage}.steps"
  local latest
  latest=$(ls -v "$PCKPT"/playground_stage${stage}_net_Iter*.msgpack 2>/dev/null | tail -1)
  if [ -n "$latest" ]; then
    local it=${latest##*Iter}; it=${it%.msgpack}
    local done=0; [ -f "$cum_f" ] && done=$(cat "$cum_f")
    echo $((done + it)) > "$cum_f"
    cp "$latest" "$cum_ck"
    cp "$latest" "ckpt_r4/${name}_stage${stage}_partial.msgpack"
  fi
  rm -rf "$PCKPT"
}

train_stage () {  # <name> <cli-category> <stage> <target-steps> <bs> <budget-s> extra...
  local name=$1 cat=$2 stage=$3 target=$4 bs=$5 budget=$6; shift 6
  local final="ckpt_r4/${name}_stage${stage}.msgpack"
  local produced="ckpt_r4/${cat}_stage${stage}.msgpack"
  local cum_ck="ckpt_r4/${name}_stage${stage}_resume.msgpack"
  local cum_f="ckpt_r4/${name}_stage${stage}.steps"
  local t_end=$(( $(date +%s) + budget ))
  local att
  for att in 1 2 3 4; do
    [ -f "$final" ] && return 0
    over && return 1
    local rem_budget=$(( t_end - $(date +%s) ))
    [ "$rem_budget" -le 120 ] && break
    wait_relay
    harvest "$name" "$stage"
    local done=0
    [ -f "$cum_f" ] && done=$(cat "$cum_f")
    local todo=$((target - done))
    if [ "$todo" -le 0 ]; then
      if [ -f "$cum_ck" ]; then cp "$cum_ck" "$final" && return 0; fi
      todo=$target; echo 0 > "$cum_f"
    fi
    local res=()
    [ -f "$cum_ck" ] && res=(--resume "$cum_ck")
    rm -f "$produced"
    brun "$rem_budget" python run.py train --category "$cat" --dataset synthetic \
        --stage "$stage" --steps "$todo" --batch-size "$bs" "${res[@]}" "$@" \
        --compute-dtype bfloat16 --chunk-a 12 --ckpt-dir ckpt_r4 \
        >> "logs_r4/${name}_stage${stage}.log" 2>&1
    if [ -f "$produced" ]; then
      [ "$final" != "$produced" ] && mv "$produced" "$final"
      echo "$target" > "$cum_f"
      cp "$final" "$cum_ck"
      return 0
    fi
    harvest "$name" "$stage"
  done
  return 1
}

run_eval () {
  local log=$1 cat=$2 ck=$3 glb=$4; shift 4
  [ -f "$ck" ] || ck="${ck%.msgpack}_resume.msgpack"
  [ -f "$ck" ] || return 0
  grep -q seg_iou "logs_r4/${log}.log" 2>/dev/null && return 0
  wait_relay
  brun 2700 python run.py eval --category "$cat" --dataset synthetic \
      --ckpt "$ck" --ckpt-glb "$glb" \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      "$@" > "logs_r4/${log}.log" 2>&1
}

# ---- 1. ovenad: distill-only relpose-axis arm (VERDICT #7), shortened ----
train_stage ovenad oven 1 1000 2 3000 \
    --eval-freq 500 --log-freq 100 \
    --ov-max-factor 1.0 --purity-factor 1.0 --axis-reg-stra 1 \
    --axis-from-relpose 1.0 \
    --resume-glb ckpt_r2/oven_stage0.msgpack
run_eval ovenad_eval oven ckpt_r4/ovenad_stage1.msgpack ckpt_r2/oven_stage0.msgpack

# ---- 2. ovenccw: canon-consist + purity warm-up (seg synthesis arm) --------
train_stage ovenccw oven 1 2500 2 5400 \
    --eval-freq 500 --log-freq 100 \
    --ov-max-factor 1.0 --purity-factor 1.0 --purity-warmup 1200 \
    --canon-consist 1.0 --axis-reg-stra 1 \
    --resume-glb ckpt_r2/oven_stage0.msgpack
run_eval ovenccw_eval oven ckpt_r4/ovenccw_stage1.msgpack ckpt_r2/oven_stage0.msgpack

# ---- 3. drawer extension ----------------------------------------------------
if [ ! -f ckpt_r4/drawerx_stage1_resume.msgpack ] && [ ! -f ckpt_r4/drawerx_stage1.msgpack ]; then
  cp ckpt_r2/drawer_stage1.msgpack ckpt_r4/drawerx_stage1_resume.msgpack
  echo 400 > ckpt_r4/drawerx_stage1.steps
fi
train_stage drawerx drawer 1 1200 2 3300 \
    --eval-freq 400 --log-freq 100 --ov-max-factor 1.0 \
    --resume-glb ckpt_r2/drawer_stage0.msgpack
run_eval drawerx_eval drawer ckpt_r4/drawerx_stage1.msgpack ckpt_r2/drawer_stage0.msgpack

# ---- 4. washing-machine refresh (only if time remains) ---------------------
if [ "$(left)" -ge 3000 ]; then
  if [ ! -f ckpt_r4/wm_stage1_resume.msgpack ] && [ ! -f ckpt_r4/wm_stage1.msgpack ]; then
    cp ckpt_r2/washing_machine_stage1.msgpack ckpt_r4/wm_stage1_resume.msgpack
    echo 800 > ckpt_r4/wm_stage1.steps
  fi
  train_stage wm washing_machine 1 2000 2 2700 \
      --eval-freq 400 --log-freq 100 \
      --ov-max-factor 1.0 --purity-factor 1.0 --axis-reg-stra 1 \
      --resume-glb ckpt_r2/washing_machine_stage0.msgpack
  run_eval wm_eval washing_machine ckpt_r4/wm_stage1.msgpack ckpt_r2/washing_machine_stage0.msgpack
fi

# ---- 5. extend the winner seg arm with the leftover window ------------------
while [ "$(left)" -ge 2400 ]; do
  done=0; [ -f ckpt_r4/ovenccw_stage1.steps ] && done=$(cat ckpt_r4/ovenccw_stage1.steps)
  [ "$done" -ge 8000 ] && break
  rm -f ckpt_r4/ovenccw_stage1.msgpack
  train_stage ovenccw oven 1 $((done + 1500)) 2 2700 \
      --eval-freq 500 --log-freq 100 \
      --ov-max-factor 1.0 --purity-factor 1.0 --purity-warmup 1200 \
      --canon-consist 1.0 --axis-reg-stra 1 \
      --resume-glb ckpt_r2/oven_stage0.msgpack || break
done
rm -f logs_r4/ovenccw_eval_final.log
run_eval ovenccw_eval_final oven ckpt_r4/ovenccw_stage1.msgpack ckpt_r2/oven_stage0.msgpack

# ---- 6. cache-priming bench (also a clean end-window measurement) ----------
if ! over; then
  wait_relay
  brun 1500 python bench.py > logs_r4/bench_end.json 2> logs_r4/bench_end.err
fi

echo R4C-DONE
