#!/bin/bash
# Round-3 ladder, phase E (replaces r3c+r3d which ran concurrently and
# conflicted on ckpt_r3/playground + the eyeglasses stage; both were stopped
# at 00:50 UTC with their child trainers left running).
#
# Queue (serialized, chip-exclusive):
#   0. wait for the two orphaned trainers (ovengt, eyeglasses) to finish;
#      finalize their checkpoints (the dead ladders would have done the mv)
#   1. fused-backward chip A/B — RERUN: the r3d A/B executed at 22:56, the
#      Mosaic C=1 lowering fix landed 23:29 (commit 942f2c0), so the bwd arm
#      crashed on the old code.  Chip is free here, so the big compile routes
#      correctly (axon relay quirk: busy chip => chipless AOT helper => 500).
#   2. evals: ovengt (teacher-forced), eyeglasses, ovenpw (first attempt
#      raced the checkpoint mv and logged only a FileNotFoundError)
#   3. laptop two-stage + eval   (VERDICT #8)
#   4. safe two-stage + eval     (VERDICT #8)
#   5. drawer stage-1 extension + eval (VERDICT #4)
#
# DEADLINE: hard exit when $DEADLINE_EPOCH passes so the chip is free for the
# driver's bench run; every stage is started with a timeout clamped to the
# remaining budget.
set -x
cd /root/repo
mkdir -p ckpt_r3 logs_r3
PCKPT=ckpt_r3/playground/ckpt
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(date -u -d '2026-08-18 09:05' +%s)}

left () { echo $(( DEADLINE_EPOCH - $(date +%s) )); }
over () { [ "$(left)" -le 300 ]; }   # <5 min left: do not start anything

wait_relay () {
  until timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    over && exit 0
    echo "[$(date +%H:%M:%S)] relay down; waiting" >> logs_r3/ladder_r3e.log
    sleep 120
  done
}

# bounded run: clamp any stage's timeout to the remaining deadline budget
brun () {  # brun <max-timeout-s> cmd...
  local t=$1; shift
  local rem; rem=$(left)
  [ "$rem" -le 300 ] && return 1
  [ "$t" -gt "$rem" ] && t=$rem
  timeout "$t" "$@"
}

echo $$ > /tmp/train_run.pid

# ---- 0. drain the orphaned trainers ----------------------------------------
for pid in ${WAIT_PIDS:-}; do
  while kill -0 "$pid" 2>/dev/null; do
    if over; then kill "$pid" 2>/dev/null; sleep 10; fi
    sleep 30
  done
done
# ovengt's r3d parent died before the bookkeeping mv
if [ -f ckpt_r3/oven_stage1.msgpack ] && [ ! -f ckpt_r3/ovengt_stage1.msgpack ]; then
  mv ckpt_r3/oven_stage1.msgpack ckpt_r3/ovengt_stage1.msgpack
fi

train_stage () {  # <bookkeeping-name> <cli-category> <stage> <target> <bs> extra...
  local name=$1 cat=$2 stage=$3 target=$4 bs=$5; shift 5
  local final="ckpt_r3/${name}_stage${stage}.msgpack"
  local produced="ckpt_r3/${cat}_stage${stage}.msgpack"
  local cum_ck="ckpt_r3/${name}_stage${stage}_resume.msgpack"
  local cum_f="ckpt_r3/${name}_stage${stage}.steps"
  local att
  for att in 1 2 3 4 5 6; do
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

# ---- 1. fused-backward A/B (rerun on fixed code) ---------------------------
FB=""
if [ ! -s logs_r3/ab_fusedbwd2.json ]; then
  wait_relay
  { brun 3600 python scripts/bench_ab.py --fused --iters 8
    brun 3600 python scripts/bench_ab.py --fused-bwd --iters 8
  } > logs_r3/ab_fusedbwd2.json 2> logs_r3/ab_fusedbwd2.err
fi
FB=$(python - <<'EOF'
import json, math
rows = []
try:
    for ln in open("logs_r3/ab_fusedbwd2.json"):
        ln = ln.strip()
        if ln.startswith("{"):
            rows.append(json.loads(ln))
except FileNotFoundError:
    pass
fwd = next((r for r in rows if not r["config"].get("fused_bwd")), None)
bwd = next((r for r in rows if r["config"].get("fused_bwd")), None)
if fwd and bwd and math.isfinite(bwd["loss"]) and \
   bwd["sec_per_step"] < fwd["sec_per_step"]:
    print("--fused-bwd")
EOF
)
echo "fused-bwd verdict: '$FB'" >> logs_r3/ladder_r3e.log

# ---- 2. evals ---------------------------------------------------------------
if [ -f ckpt_r3/ovengt_stage1.msgpack ] && [ ! -s logs_r3/ovengt_eval.log ]; then
  wait_relay
  brun 4800 python run.py eval --category oven --dataset synthetic \
      --ckpt ckpt_r3/ovengt_stage1.msgpack --ckpt-glb ckpt_r2/oven_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      --force-gt-labels \
      > logs_r3/ovengt_eval.log 2>&1
fi
if [ -f ckpt_r3/eyeglasses_stage1.msgpack ] && [ ! -s logs_r3/eyeglasses_eval.log ]; then
  wait_relay
  brun 4800 python run.py eval --category eyeglasses --dataset synthetic \
      --ckpt ckpt_r3/eyeglasses_stage1.msgpack \
      --ckpt-glb ckpt_r2/eyeglasses_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --orbit-chunk-k 30 \
      --batch-size 2 --max-batches 15 \
      > logs_r3/eyeglasses_eval.log 2>&1
fi
# first ovenpw eval raced the mv and logged only a traceback — redo it
grep -q 'FileNotFoundError' logs_r3/ovenpw_eval.log 2>/dev/null && rm logs_r3/ovenpw_eval.log
if [ -f ckpt_r3/ovenpw_stage1.msgpack ] && [ ! -s logs_r3/ovenpw_eval.log ]; then
  wait_relay
  brun 4800 python run.py eval --category oven --dataset synthetic \
      --ckpt ckpt_r3/ovenpw_stage1.msgpack --ckpt-glb ckpt_r2/oven_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      > logs_r3/ovenpw_eval.log 2>&1
fi

# ---- 3. laptop two-stage ----------------------------------------------------
train_stage laptop laptop 0 1200 4 $FB
train_stage laptop laptop 1 1200 4 $FB \
    --eval-freq 400 --soft-seg-weights --ov-max-factor 1.0 --axis-reg-stra 1 \
    --resume-glb ckpt_r3/laptop_stage0.msgpack
if [ -f ckpt_r3/laptop_stage1.msgpack ] && [ ! -s logs_r3/laptop_eval.log ]; then
  wait_relay
  brun 4800 python run.py eval --category laptop --dataset synthetic \
      --ckpt ckpt_r3/laptop_stage1.msgpack --ckpt-glb ckpt_r3/laptop_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      > logs_r3/laptop_eval.log 2>&1
fi

# ---- 4. safe two-stage ------------------------------------------------------
train_stage safe safe 0 1200 4 $FB
train_stage safe safe 1 1200 4 $FB \
    --eval-freq 400 --soft-seg-weights --soft-seg-pointwise --ov-max-factor 1.0 \
    --axis-reg-stra 1 --resume-glb ckpt_r3/safe_stage0.msgpack
if [ -f ckpt_r3/safe_stage1.msgpack ] && [ ! -s logs_r3/safe_eval.log ]; then
  wait_relay
  brun 4800 python run.py eval --category safe --dataset synthetic \
      --ckpt ckpt_r3/safe_stage1.msgpack --ckpt-glb ckpt_r3/safe_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      > logs_r3/safe_eval.log 2>&1
fi

# ---- 5. drawer stage-1 extension (from the round-2 400-step ckpt) -----------
if [ ! -f ckpt_r3/drawer_stage1.msgpack ]; then
  if [ ! -f ckpt_r3/drawer_stage1_resume.msgpack ]; then
    cp ckpt_r2/drawer_stage1.msgpack ckpt_r3/drawer_stage1_resume.msgpack
    echo 400 > ckpt_r3/drawer_stage1.steps
  fi
  train_stage drawer drawer 1 1200 4 $FB \
      --eval-freq 400 --soft-seg-weights --ov-max-factor 1.0 \
      --resume-glb ckpt_r2/drawer_stage0.msgpack
fi
if [ -f ckpt_r3/drawer_stage1.msgpack ] && [ ! -s logs_r3/drawer_eval.log ]; then
  wait_relay
  brun 4800 python run.py eval --category drawer --dataset synthetic \
      --ckpt ckpt_r3/drawer_stage1.msgpack --ckpt-glb ckpt_r2/drawer_stage0.msgpack \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      > logs_r3/drawer_eval.log 2>&1
fi

echo R3E-LADDER-DONE
