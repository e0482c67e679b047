#!/bin/bash
# Round-4 wrap-up (session-crash-resilient): harvest wm, eval it, extend the
# weakest fresh row (safe stage-1), re-eval, then bank any remaining window
# into the ovenhp long-horizon counter.  All stages deadline-gated.
set -x
cd /root/repo
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(date -u -d '2026-08-19 10:05' +%s)}
left () { echo $(( DEADLINE_EPOCH - $(date +%s) )); }
over () { [ "$(left)" -le 180 ]; }
brun () { local t=$1; shift; local rem; rem=$(left); [ "$rem" -le 180 ] && return 1; [ "$t" -gt "$rem" ] && t=$rem; timeout "$t" "$@"; }
PCKPT=ckpt_r4/playground/ckpt

# ---- 1. wait for the running wm trainer (exact pid), harvest, eval --------
WMPID=$(cat /tmp/wm_run.pid 2>/dev/null)
while [ -n "$WMPID" ] && kill -0 "$WMPID" 2>/dev/null; do
  over && exit 0
  sleep 20
done
if [ -f ckpt_r4/washing_machine_stage1.msgpack ]; then
  mv ckpt_r4/washing_machine_stage1.msgpack ckpt_r4/wm_stage1.msgpack
  echo 1600 > ckpt_r4/wm_stage1.steps
  cp ckpt_r4/wm_stage1.msgpack ckpt_r4/wm_stage1_resume.msgpack
  rm -rf "$PCKPT"
else
  latest=$(ls -v "$PCKPT"/playground_stage1_net_Iter*.msgpack 2>/dev/null | tail -1)
  if [ -n "$latest" ]; then
    it=${latest##*Iter}; it=${it%.msgpack}
    echo $((800 + it)) > ckpt_r4/wm_stage1.steps
    cp "$latest" ckpt_r4/wm_stage1_resume.msgpack
    cp "$latest" ckpt_r4/wm_stage1_partial.msgpack
  fi
  rm -rf "$PCKPT"
fi
WMCK=ckpt_r4/wm_stage1.msgpack
[ -f "$WMCK" ] || WMCK=ckpt_r4/wm_stage1_resume.msgpack
if [ -f "$WMCK" ] && ! grep -q seg_iou logs_r4/wm_eval.log 2>/dev/null; then
  brun 1800 python run.py eval --category washing_machine --dataset synthetic \
    --ckpt "$WMCK" --ckpt-glb ckpt_r2/washing_machine_stage0.msgpack \
    --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
    > logs_r4/wm_eval.log 2>&1
fi

# ---- 2. safe stage-1 extension (+1200 -> cum 2400) -------------------------
if ! over && [ "$(left)" -ge 2100 ]; then
  # the earlier completed run's final file is banked in _resume and in git;
  # remove it so the success check below can only see THIS run's output
  rm -f ckpt_r4/safe_stage1.msgpack
  brun $(( $(left) - 1500 )) python run.py train --category safe --dataset synthetic \
    --stage 1 --steps 1200 --batch-size 2 \
    --resume ckpt_r4/safe_stage1_resume.msgpack \
    --eval-freq 400 --log-freq 100 \
    --ov-max-factor 1.0 --purity-factor 1.0 --axis-reg-stra 1 \
    --resume-glb ckpt_r4/safe_stage0.msgpack \
    --compute-dtype bfloat16 --chunk-a 12 --ckpt-dir ckpt_r4 \
    >> logs_r4/safe_stage1.log 2>&1
  if [ -f ckpt_r4/safe_stage1.msgpack ]; then
    echo 2400 > ckpt_r4/safe_stage1.steps
    cp ckpt_r4/safe_stage1.msgpack ckpt_r4/safe_stage1_resume.msgpack
    rm -rf "$PCKPT"
  else
    latest=$(ls -v "$PCKPT"/playground_stage1_net_Iter*.msgpack 2>/dev/null | tail -1)
    if [ -n "$latest" ]; then
      it=${latest##*Iter}; it=${it%.msgpack}
      echo $((1200 + it)) > ckpt_r4/safe_stage1.steps
      cp "$latest" ckpt_r4/safe_stage1_resume.msgpack
      cp "$latest" ckpt_r4/safe_stage1_partial.msgpack
    fi
    rm -rf "$PCKPT"
  fi
  rm -f logs_r4/safe_eval2.log
  brun 1500 python run.py eval --category safe --dataset synthetic \
    --ckpt ckpt_r4/safe_stage1_resume.msgpack --ckpt-glb ckpt_r4/safe_stage0.msgpack \
    --compute-dtype bfloat16 --chunk-a 12 --batch-size 4 --max-batches 15 \
    > logs_r4/safe_eval2.log 2>&1
fi

# ---- 3. remaining window -> ovenhp counter ---------------------------------
while ! over && [ "$(left)" -ge 900 ]; do
  donec=$(cat ckpt_r4/ovenhp_stage1.steps 2>/dev/null || echo 0)
  rm -f ckpt_r4/oven_stage1.msgpack
  brun $(( $(left) - 300 )) python run.py train --category oven --dataset synthetic \
    --stage 1 --steps 2000 --batch-size 2 \
    --resume ckpt_r4/ovenhp_stage1_resume.msgpack \
    --eval-freq 500 --log-freq 100 \
    --ov-max-factor 1.0 --purity-factor 1.0 --axis-reg-stra 1 \
    --resume-glb ckpt_r2/oven_stage0.msgpack \
    --compute-dtype bfloat16 --chunk-a 12 --ckpt-dir ckpt_r4 \
    >> logs_r4/ovenhp_stage1.log 2>&1
  if [ -f ckpt_r4/oven_stage1.msgpack ]; then
    echo $((donec + 2000)) > ckpt_r4/ovenhp_stage1.steps
    mv ckpt_r4/oven_stage1.msgpack ckpt_r4/ovenhp_stage1_resume.msgpack
    cp ckpt_r4/ovenhp_stage1_resume.msgpack ckpt_r4/ovenhp_stage1_partial.msgpack
    rm -rf "$PCKPT"
  else
    latest=$(ls -v "$PCKPT"/playground_stage1_net_Iter*.msgpack 2>/dev/null | tail -1)
    if [ -n "$latest" ]; then
      it=${latest##*Iter}; it=${it%.msgpack}
      echo $((donec + it)) > ckpt_r4/ovenhp_stage1.steps
      cp "$latest" ckpt_r4/ovenhp_stage1_resume.msgpack
      cp "$latest" ckpt_r4/ovenhp_stage1_partial.msgpack
    fi
    rm -rf "$PCKPT"
    break
  fi
done
echo R4-WRAPUP-DONE
