#!/bin/bash
# Session-5 supervisor: hand over from the running r5d first pass to the
# fixed r5f priority ladder at the first natural boundary — glassmp's eval
# finishing (the last r5d arm worth keeping ahead of partlap), the r5d pass
# exiting on its own, or its inherited 04:48 deadline passing.  Kills only
# explicitly enumerated pids (the recorded r5d driver pid and its /proc
# descendant tree) — never by pattern.
set -u
cd /root/repo
R5D_PID=${R5D_PID:-21694}
OLD_DEADLINE=${OLD_DEADLINE:-1787201296}
NEW_DEADLINE=${NEW_DEADLINE:-1787213100}   # ~08:05 UTC

log () { echo "[supervise $(date +%H:%M:%S)] $*" >> logs_r5/ladder_r5f.log; }

descendants () {  # recursive child pids of $1, leaves first
  local p=$1 c
  for c in $(cat /proc/$p/task/*/children 2>/dev/null); do
    descendants "$c"
    echo "$c"
  done
}

boundary_reached () {
  kill -0 "$R5D_PID" 2>/dev/null || return 0
  grep -q seg_iou logs_r5/glassmp_eval.log 2>/dev/null && return 0
  [ "$(date +%s)" -ge "$OLD_DEADLINE" ] && return 0
  return 1
}

until boundary_reached; do sleep 60; done

if kill -0 "$R5D_PID" 2>/dev/null; then
  log "boundary reached; stopping r5d pass pid=$R5D_PID and descendants"
  for p in $(descendants "$R5D_PID") "$R5D_PID"; do
    kill "$p" 2>/dev/null && log "  TERM $p"
  done
  sleep 20
  for p in $(descendants "$R5D_PID") "$R5D_PID"; do
    kill -9 "$p" 2>/dev/null && log "  KILL $p"
  done
fi

log "starting r5f ladder, deadline $NEW_DEADLINE"
DEADLINE_EPOCH=$NEW_DEADLINE nohup bash scripts/train_ladder_r5f.sh \
  >> logs_r5/ladder_r5f_drive.log 2>&1 &
echo $! > /tmp/train_run_r5f_driver.pid
