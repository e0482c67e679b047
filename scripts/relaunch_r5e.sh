#!/bin/bash
# Session-4 continuation waiter.  The r5c->r5d supervisor inherited the
# session-3 deadline (epoch 1787201296 ~ 04:48 UTC), which truncates the
# r5d ladder before its later arms (safemp tail, glassmp, drawerx2,
# repeat-seed evals, bench prime).  This waiter relaunches the SAME
# idempotent r5d ladder with an extended deadline once the first pass has
# wound down, so completed arms are skipped (steps files / seg_iou greps)
# and only the unfinished tail runs.  Exact-cmdline pid matching only —
# never kill by pattern.
set -u
cd /root/repo
OLD_DEADLINE=${OLD_DEADLINE:-1787201296}
NEW_DEADLINE=${NEW_DEADLINE:-1787205990}   # ~06:06 UTC: leaves >40 min for
                                           # final bench + round wrap-up

runpy_alive () {
  local p cmd
  for p in /proc/[0-9]*; do
    [ -r "$p/cmdline" ] || continue
    cmd=$(tr '\0' ' ' < "$p/cmdline" 2>/dev/null)
    case "$cmd" in
      python\ run.py\ train\ *|python\ run.py\ eval\ *) return 0 ;;
    esac
  done
  return 1
}

ladder_done_early () {
  grep -q R5D-LADDER-DONE logs_r5/ladder_r5d.log 2>/dev/null
}

# Phase 1: wait for the first-pass ladders to wind down (deadline passed or
# r5d finished everything early).
while :; do
  now=$(date +%s)
  [ "$now" -ge $((OLD_DEADLINE + 90)) ] && break
  ladder_done_early && break
  sleep 60
done

# Phase 2: wait for any in-flight run.py to drain (they self-timeout at the
# old deadline; this is just settling time).
while runpy_alive; do
  [ "$(date +%s)" -ge $((OLD_DEADLINE + 900)) ] && break
  sleep 30
done

[ "$(date +%s)" -ge $((NEW_DEADLINE - 300)) ] && exit 0

echo "[relaunch $(date +%H:%M:%S)] starting r5d second pass, deadline $NEW_DEADLINE" \
  >> logs_r5/ladder_r5d.log
DEADLINE_EPOCH=$NEW_DEADLINE nohup bash scripts/train_ladder_r5d.sh \
  >> logs_r5/ladder_r5d_drive.log 2>&1 &
echo $! > /tmp/train_run_r5e.pid
