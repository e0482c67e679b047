#!/bin/bash
# Trainer watchdog v2 for the axon relay's hang modes.
#
# Mode A (2026-08-17, twice): trainer blocks forever inside a relay RPC
# mid-run — no log line for 20+ min while a normal step is <= 6 s.  Bounded
# by the stale-log kill below (threshold arg, default 25 min).
#
# Mode B (2026-08-20, wmmp arm): trainer wedges BEFORE its first step — the
# compile/first-execute RPC hangs AND blocks the relay's execution queue for
# every other client (an independent 256x256 matmul fetch hung until the
# trainer was killed, then completed in 2.8 s).  v1 deliberately left
# pre-first-step trainers alone (relay-down looks the same from the log);
# that turned a bounded wedge into a 105-min stall.  v2 kills any trainer
# older than PRESTEP_THRESH (35 min — worst observed cold remote compile is
# ~20 min) that has not yet produced a step line; the ladder's retry loop +
# the persistent XLA compile cache make kill-and-relaunch cost ~1 min.
#
# Safety: pids are matched by EXACT /proc/<pid>/cmdline fields — never by
# pattern, so nothing else (including this script) can ever match.
#
# Usage: bash scripts/watchdog2.sh <logdir> [stale_thresh_sec] [prestep_thresh_sec]
set -u
LOGDIR=${1:-/root/repo/logs_r5}
THRESH=${2:-1500}          # mid-run staleness: 25 min
PRESTEP_THRESH=${3:-2100}  # pre-first-step wedge: 35 min

trainer_pids () {
  local p cmd
  for p in /proc/[0-9]*; do
    [ -r "$p/cmdline" ] || continue
    cmd=$(tr '\0' ' ' < "$p/cmdline" 2>/dev/null)
    case "$cmd" in
      python\ run.py\ train\ *|*/python\ run.py\ train\ *|python3\ run.py\ train\ *)
        echo "${p#/proc/}" ;;
    esac
  done
}

kill_verified () {  # <pid> <why>
  local pid=$1 why=$2 cmd
  cmd=$(tr '\0' ' ' < "/proc/$pid/cmdline" 2>/dev/null)
  case "$cmd" in
    *run.py\ train\ *)
      echo "[watchdog2 $(date +%H:%M:%S)] $why — killing trainer $pid ($cmd)" \
        >> "$LOGDIR/watchdog.log"
      kill "$pid" 2>/dev/null ;;
  esac
}

while true; do
  sleep 60
  pids=$(trainer_pids)
  [ -z "$pids" ] && continue
  newest=$(ls -t "$LOGDIR"/*.log 2>/dev/null | head -1)
  [ -z "$newest" ] && continue
  age=$(( $(date +%s) - $(stat -c %Y "$newest") ))
  last=$(tail -1 "$newest" 2>/dev/null)
  case "$last" in
    *"step "*|*"eval@"*|*"saved checkpoint"*)
      # mode A: made progress, then went silent
      if [ "$age" -gt "$THRESH" ]; then
        for pid in $pids; do
          kill_verified "$pid" "log '$newest' stale ${age}s mid-run"
        done
        sleep 120
      fi
      ;;
    *)
      # mode B: trainer alive but no step line yet — bound the wedge by
      # process age (etimes covers compile + data warm-up generously)
      for pid in $pids; do
        et=$(ps -p "$pid" -o etimes= 2>/dev/null | tr -d ' ')
        [ -n "$et" ] && [ "$et" -gt "$PRESTEP_THRESH" ] && \
          kill_verified "$pid" "no first step after ${et}s (pre-step wedge)"
      done
      ;;
  esac
done
