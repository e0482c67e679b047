#!/bin/bash
# Round-3 phase K: squeeze the last minutes of the healthy-mode window.
# The r3j ovenhp attempt paid the healthy-mode cold stage-1 compile (~17 min
# at one CPU core) and was timeout-cut shortly after stepping began; this
# resumes it with the now-cached executable and NO in-train eval (the eval
# graph's own cold compile would eat the remaining window — the train loop's
# per-step `iou=` field carries the segmentation trajectory instead, and
# save_freq=200 checkpoints let round 4 eval any point of the curve).
set -x
cd /root/repo
PCKPT=ckpt_r3/playground/ckpt
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(date -u -d '2026-08-18 13:12' +%s)}
left () { echo $(( DEADLINE_EPOCH - $(date +%s) )); }

echo $$ > /tmp/train_run.pid
name=ovenhp; stage=1
cum_ck="ckpt_r3/${name}_stage${stage}_resume.msgpack"
cum_f="ckpt_r3/${name}_stage${stage}.steps"
done=0; [ -f "$cum_f" ] && done=$(cat "$cum_f")
todo=$((6000 - done))
res=(); [ -f "$cum_ck" ] && res=(--resume "$cum_ck")
rm -rf "$PCKPT"
rem=$(left); [ "$rem" -le 120 ] && exit 0
timeout "$rem" python run.py train --category oven --dataset synthetic \
    --stage 1 --steps "$todo" --batch-size 4 "${res[@]}" \
    --eval-freq 0 --log-freq 100 \
    --ov-max-factor 1.0 --purity-factor 1.0 --axis-reg-stra 1 \
    --resume-glb ckpt_r2/oven_stage0.msgpack \
    --compute-dtype bfloat16 --chunk-a 12 --ckpt-dir ckpt_r3 \
    >> "logs_r3/${name}_stage${stage}.log" 2>&1
latest=$(ls -v "$PCKPT"/playground_stage${stage}_net_Iter*.msgpack 2>/dev/null | tail -1)
if [ -n "$latest" ]; then
  it=${latest##*Iter}; it=${it%.msgpack}
  echo $((done + it)) > "$cum_f"
  cp "$latest" "$cum_ck"
  # commit-able snapshot for round-4 resume (the _resume name is gitignored)
  cp "$latest" "ckpt_r3/${name}_stage${stage}_partial.msgpack"
fi
echo R3K-DONE
