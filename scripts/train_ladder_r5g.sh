#!/bin/bash
# Round-5 session-5 tail ladder.  Takes over from r5f once the partlap arm
# (partial-view stage-1 + eval — the round's top-priority never-exercised
# regime) has its eval on disk.  Reorders the remaining arms by information
# value: NEW measurements first (laptopmp: 0.966-teacher spatial-EM laptop;
# drawermp: independent-prismatic drawer), then the cheap repeat-seed evals
# of the round's headline claims, then the safemp evidence regeneration,
# then the glassmp 200-step completion, then the bench cache prime.
# Idempotent like r5c/r5d/r5f.
set -x
cd /root/repo
mkdir -p ckpt_r5 logs_r5
PCKPT=ckpt_r5/playground/ckpt
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH explicitly (epoch seconds)}

left () { echo $(( DEADLINE_EPOCH - $(date +%s) )); }
over () { [ "$(left)" -le 180 ]; }

wait_relay () {
  until timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); float((x @ x).sum())" >/dev/null 2>&1; do
    over && exit 0
    echo "[$(date +%H:%M:%S)] relay down; waiting" >> logs_r5/ladder_r5g.log
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

echo $$ > /tmp/train_run_r5g.pid

maybe_healthy_ab () {
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

harvest () {  # <name> <stage>
  local name=$1 stage=$2
  local latest
  latest=$(ls -v "$PCKPT"/playground_stage${stage}_net_Iter*.msgpack 2>/dev/null | tail -1)
  if [ -n "$latest" ]; then
    local it=${latest##*Iter}; it=${it%.msgpack}
    echo "$it" > "ckpt_r5/${name}_stage${stage}.steps"
    cp "$latest" "ckpt_r5/${name}_stage${stage}_resume.msgpack"
  fi
  rm -rf "$PCKPT"
}

train_stage () {  # <name> <cli-category> <produced-shape-type> <stage> <target> <bs> <budget-s> extra...
  local name=$1 cat=$2 prod=$3 stage=$4 target=$5 bs=$6 budget=$7; shift 7
  local final="ckpt_r5/${name}_stage${stage}.msgpack"
  local produced="ckpt_r5/${prod}_stage${stage}.msgpack"
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
      echo "$name stage$stage: steps file says done but no resume ckpt — retraining" >> logs_r5/ladder_r5g.log
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
  over && return 0
  wait_relay
  brun 2700 python run.py eval --category "$cat" --dataset synthetic \
      --ckpt "$ck" --ckpt-glb "$glb" \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      "$@" > "logs_r5/${log}.log" 2>&1
}

# ---- 0. partlap eval leftover (skipped if r5f did it) ---------------------------
pglb=ckpt_r5/partlap_stage0.msgpack
run_eval partlap_eval laptop_partial ckpt_r5/partlap_stage1.msgpack "$pglb"

# ---- 1. laptopmp (spatial-EM teacher 0.966; warm from the r3 laptop final) ------
if [ ! -f ckpt_r5/laptopmp_seed.msgpack ] && [ -f ckpt_r3/laptop_stage1.msgpack ]; then
  python - <<'EOF'
from flax import serialization
raw = serialization.msgpack_restore(open("ckpt_r3/laptop_stage1.msgpack", "rb").read())
weights = raw["params"] if "opt_state" in raw and "params" in raw else raw
open("ckpt_r5/laptopmp_seed.msgpack", "wb").write(serialization.to_bytes(weights))
EOF
fi
if [ -f ckpt_r5/laptopmp_seed.msgpack ] && [ ! -f ckpt_r5/laptopmp_stage1_resume.msgpack ]; then
  cp ckpt_r5/laptopmp_seed.msgpack ckpt_r5/laptopmp_stage1_resume.msgpack
  echo 0 > ckpt_r5/laptopmp_stage1.steps
fi
train_stage laptopmp laptop laptop 1 1600 2 4200 \
    --resume-glb ckpt_r3/laptop_stage0.msgpack \
    --eval-freq 400 --log-freq 100 \
    --motion-pair-factor 1.0 --motion-pair-spatial 0.3 \
    --attn-temp-start 4.0 --attn-temp-steps 1200 \
    --purity-factor 1.0 --purity-warmup 1500 --ov-max-factor 1.0
run_eval laptopmp_eval laptop ckpt_r5/laptopmp_stage1.msgpack \
    ckpt_r3/laptop_stage0.msgpack

# ---- 2. drawermp (independent prismatic states; teacher 0.534) ------------------
if [ ! -f ckpt_r5/drawermp_seed.msgpack ] && [ -f ckpt_r4/drawerx_stage1.msgpack ]; then
  python - <<'EOF'
from flax import serialization
raw = serialization.msgpack_restore(open("ckpt_r4/drawerx_stage1.msgpack", "rb").read())
weights = raw["params"] if "opt_state" in raw and "params" in raw else raw
open("ckpt_r5/drawermp_seed.msgpack", "wb").write(serialization.to_bytes(weights))
EOF
fi
if [ -f ckpt_r5/drawermp_seed.msgpack ] && [ ! -f ckpt_r5/drawermp_stage1_resume.msgpack ]; then
  cp ckpt_r5/drawermp_seed.msgpack ckpt_r5/drawermp_stage1_resume.msgpack
  echo 0 > ckpt_r5/drawermp_stage1.steps
fi
train_stage drawermp drawer drawer 1 1600 2 4200 \
    --resume-glb ckpt_r2/drawer_stage0.msgpack \
    --eval-freq 400 --log-freq 100 --indep-prismatic \
    --motion-pair-factor 1.0 --attn-temp-start 4.0 --attn-temp-steps 1200 \
    --purity-factor 1.0 --purity-warmup 1500 --ov-max-factor 1.0
run_eval drawermp_eval drawer ckpt_r5/drawermp_stage1.msgpack \
    ckpt_r2/drawer_stage0.msgpack --indep-prismatic
run_eval drawermp_eval_tied drawer ckpt_r5/drawermp_stage1.msgpack \
    ckpt_r2/drawer_stage0.msgpack

# ---- 3. repeat-seed evals of the headline claims (warm compile cache) -----------
seed_eval () {  # <log-name> <cli-category> <ckpt> <glb>
  local log=$1 cat=$2 ck=$3 glb=$4
  [ -f "$ck" ] || ck="${ck%.msgpack}_resume.msgpack"
  [ -f "$ck" ] || return 0
  grep -q seg_iou "logs_r5/${log}.log" 2>/dev/null && return 0
  over && return 0
  wait_relay
  brun 1800 python run.py eval --category "$cat" --dataset synthetic \
      --ckpt "$ck" --ckpt-glb "$glb" --data-seed 1 \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      > "logs_r5/${log}.log" 2>&1
}
seed_eval ovenmp_eval_seed1 oven ckpt_r5/ovenmp_stage1.msgpack \
    ckpt_r2/oven_stage0.msgpack
seed_eval wmmp_eval_seed1 washing_machine ckpt_r5/wmmp_stage1.msgpack \
    ckpt_r2/washing_machine_stage0.msgpack

# ---- 4. safemp evidence regeneration (recorded finding 8: 0.670) ----------------
MP_FLAGS=(--motion-pair-factor 1.0 --attn-temp-start 4.0 --attn-temp-steps 1200
          --purity-factor 1.0 --purity-warmup 1500 --ov-max-factor 1.0
          --axis-reg-stra 1)
train_stage safemp safe safe 1 1600 2 4200 \
    --resume-glb ckpt_r4/safe_stage0.msgpack \
    --eval-freq 400 --log-freq 100 "${MP_FLAGS[@]}"
run_eval safemp_eval safe ckpt_r5/safemp_stage1.msgpack ckpt_r4/safe_stage0.msgpack
seed_eval safemp_eval_seed1 safe ckpt_r5/safemp_stage1.msgpack \
    ckpt_r4/safe_stage0.msgpack

# ---- 5. glassmp completion (1800 -> 2000) + re-eval -----------------------------
train_stage glassmp eyeglasses eyeglasses 1 2000 1 2400 \
    --resume-glb ckpt_r2/eyeglasses_stage0.msgpack \
    --eval-freq 0 --log-freq 100 \
    --motion-pair-factor 1.0 --attn-temp-start 4.0 --attn-temp-steps 1200 \
    --purity-factor 1.0 --purity-warmup 1500 --ov-max-factor 1.0 \
    --motion-pair-spatial 0.3
run_eval glassmp_eval2 eyeglasses ckpt_r5/glassmp_stage1.msgpack \
    ckpt_r2/eyeglasses_stage0.msgpack

# ---- 6. round-end bench cache prime ---------------------------------------------
if [ ! -s logs_r5/bench_prime.json ]; then
  wait_relay
  brun 2700 python bench.py > logs_r5/bench_prime.json 2> logs_r5/bench_prime.err
fi

echo R5G-LADDER-DONE >> logs_r5/ladder_r5g.log
echo R5G-LADDER-DONE
