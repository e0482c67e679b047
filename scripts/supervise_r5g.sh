#!/bin/bash
# Hand over from the running r5f ladder to the reordered r5g tail once the
# partlap arm's EVAL is on disk (never mid-eval), or r5f exits/wedges.
# Explicit-pid kills only (recorded driver pid + /proc descendant walk).
set -u
cd /root/repo
R5F_PID=${R5F_PID:?set R5F_PID (the running r5f ladder pid)}
NEW_DEADLINE=${NEW_DEADLINE:-1787213100}   # ~08:05 UTC
CAP_EPOCH=${CAP_EPOCH:-1787205600}         # 06:00 UTC hard boundary

log () { echo "[supervise-g $(date +%H:%M:%S)] $*" >> logs_r5/ladder_r5g.log; }

descendants () {
  local p=$1 c
  for c in $(cat /proc/$p/task/*/children 2>/dev/null); do
    descendants "$c"
    echo "$c"
  done
}

boundary_reached () {
  kill -0 "$R5F_PID" 2>/dev/null || return 0
  grep -q seg_iou logs_r5/partlap_eval.log 2>/dev/null && return 0
  [ "$(date +%s)" -ge "$CAP_EPOCH" ] && return 0
  return 1
}

until boundary_reached; do sleep 60; done

if kill -0 "$R5F_PID" 2>/dev/null; then
  log "boundary reached; stopping r5f pass pid=$R5F_PID and descendants"
  for p in $(descendants "$R5F_PID") "$R5F_PID"; do
    kill "$p" 2>/dev/null && log "  TERM $p"
  done
  sleep 20
  for p in $(descendants "$R5F_PID") "$R5F_PID"; do
    kill -9 "$p" 2>/dev/null && log "  KILL $p"
  done
fi

log "starting r5g ladder, deadline $NEW_DEADLINE"
DEADLINE_EPOCH=$NEW_DEADLINE nohup bash scripts/train_ladder_r5g.sh \
  >> logs_r5/ladder_r5g_drive.log 2>&1 &
echo $! > /tmp/train_run_r5g_driver.pid
