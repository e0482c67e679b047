#!/bin/bash
# Round-3 ladder, phase I (supersedes r3h after ovencc2 abs-600).
#
# r3f burned its 6 ovencc attempts on two now-fixed bugs (HBM OOM from the
# symmetric two-residual consistency, then a tracer leak from jax.checkpoint
# around the canon pass — loop.py now uses a one-sided stop_gradient target
# instead).  Queue:
#   1. ovencc: oven stage-1 + canonical-consistency + eval  <- headline
#   2. laptop stage-1 (+canon-consist) + eval
#   3. drawer stage-1 extension + eval
#   4. safe two-stage + eval (time permitting)
set -x
cd /root/repo
mkdir -p ckpt_r3 logs_r3
PCKPT=ckpt_r3/playground/ckpt
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(date -u -d '2026-08-18 09:05' +%s)}

left () { echo $(( DEADLINE_EPOCH - $(date +%s) )); }
over () { [ "$(left)" -le 300 ]; }

wait_relay () {
  until timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    over && exit 0
    echo "[$(date +%H:%M:%S)] relay down; waiting" >> logs_r3/ladder_r3i.log
    sleep 120
  done
}

brun () {
  local t=$1; shift
  local rem; rem=$(left)
  [ "$rem" -le 300 ] && return 1
  [ "$t" -gt "$rem" ] && t=$rem
  timeout "$t" "$@"
}

echo $$ > /tmp/train_run.pid

for pid in ${WAIT_PIDS:-}; do
  while kill -0 "$pid" 2>/dev/null; do
    if over; then kill "$pid" 2>/dev/null; sleep 10; fi
    sleep 30
  done
done
# r3f's parent may have died before the stage-0 bookkeeping mv
if [ -f ckpt_r3/laptop_stage0.msgpack ]; then :
elif [ -f ckpt_r3/playground/ckpt ] || true; then
  latest=$(ls -v "$PCKPT"/playground_stage0_net_Iter*.msgpack 2>/dev/null | tail -1)
  if [ -f ckpt_r3/laptop_stage0.msgpack ]; then :
  elif [ -n "$latest" ]; then
    cp "$latest" ckpt_r3/laptop_stage0_resume.msgpack
    it=${latest##*Iter}; echo "${it%.msgpack}" > ckpt_r3/laptop_stage0.steps
  fi
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

run_eval () {  # <log-name> <cli-category> <ckpt> <glb> extra...
  local log=$1 cat=$2 ck=$3 glb=$4; shift 4
  [ -f "$ck" ] || return 0
  grep -q seg_iou "logs_r3/${log}.log" 2>/dev/null && return 0
  wait_relay
  brun 4800 python run.py eval --category "$cat" --dataset synthetic \
      --ckpt "$ck" --ckpt-glb "$glb" \
      --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
      "$@" > "logs_r3/${log}.log" 2>&1
}

# ---- 1. ovengt2: causality experiment -- GT seg + full articulation stack --
# ovencc (pin 1.0) and ovencc2 (pin 10 + relpose-axis, raw then differential)
# all fail to break the degeneracy while the PARTITION is mixed (axis 55-80
# deg, theta spread ~0): with door+body points sharing slots there is no
# differential motion signal to learn the axis from.  Teacher-forcing the GT
# partition isolates the question "does the articulation machinery converge
# once seg is right?"  If yes, the open gap is unsupervised seg at realistic
# training length (reference: 10k-1M steps vs our <=2400 degraded-mode).
train_stage ovengt2 oven 1 800 4 \
    --eval-freq 200 --force-gt-labels \
    --ov-max-factor 1.0 --axis-reg-stra 1 --canon-consist 10.0 \
    --axis-from-relpose 1.0 \
    --resume-glb ckpt_r2/oven_stage0.msgpack
run_eval ovengt2_eval oven ckpt_r3/ovengt2_stage1.msgpack ckpt_r2/oven_stage0.msgpack --force-gt-labels

# ---- 2. laptop stage-1 ------------------------------------------------------
train_stage laptop laptop 0 1200 4
train_stage laptop laptop 1 1200 4 \
    --eval-freq 400 --soft-seg-weights --soft-seg-pointwise \
    --ov-max-factor 1.0 --axis-reg-stra 1 \
    --resume-glb ckpt_r3/laptop_stage0.msgpack
run_eval laptop_eval laptop ckpt_r3/laptop_stage1.msgpack ckpt_r3/laptop_stage0.msgpack

# ---- 3. drawer stage-1 extension --------------------------------------------
if [ ! -f ckpt_r3/drawer_stage1.msgpack ]; then
  if [ ! -f ckpt_r3/drawer_stage1_resume.msgpack ]; then
    cp ckpt_r2/drawer_stage1.msgpack ckpt_r3/drawer_stage1_resume.msgpack
    echo 400 > ckpt_r3/drawer_stage1.steps
  fi
  train_stage drawer drawer 1 1200 4 \
      --eval-freq 400 --soft-seg-weights --ov-max-factor 1.0 \
      --resume-glb ckpt_r2/drawer_stage0.msgpack
fi
run_eval drawer_eval drawer ckpt_r3/drawer_stage1.msgpack ckpt_r2/drawer_stage0.msgpack

# ---- 4. safe two-stage ------------------------------------------------------
train_stage safe safe 0 1200 4
train_stage safe safe 1 1200 4 \
    --eval-freq 400 --soft-seg-weights --soft-seg-pointwise \
    --ov-max-factor 1.0 --axis-reg-stra 1 \
    --resume-glb ckpt_r3/safe_stage0.msgpack
run_eval safe_eval safe ckpt_r3/safe_stage1.msgpack ckpt_r3/safe_stage0.msgpack

echo R3I-LADDER-DONE
