#!/bin/bash
# Trainer watchdog for the axon relay's hang mode.
#
# Symptom (twice on 2026-08-17): the trainer blocks forever inside a relay
# RPC — process asleep, CPU time frozen, no log line for 20+ min, while a
# normal step is <= 6 s and even a cold compile is <= ~20 min.  The ladder
# (scripts/train_ladder_r3.sh) already knows how to resume from the periodic
# full-train-state checkpoint; the watchdog just turns a silent indefinite
# hang into a bounded one by killing the hung trainer process.
#
# Safety: pids are matched by EXACT /proc/<pid>/cmdline fields
# (argv[0] ~ python, argv[1] == run.py, argv[2] == train) — never by
# pattern, so nothing else (including this script) can ever match.
#
# Usage: bash scripts/watchdog.sh <logdir> [threshold_sec]  (runs forever)
set -u
LOGDIR=${1:-/root/repo/logs_r3}
THRESH=${2:-1500}   # 25 min: > any legitimate step/eval/compile gap observed

trainer_pids () {
  local p cmd
  for p in /proc/[0-9]*; do
    [ -r "$p/cmdline" ] || continue
    # cmdline fields are NUL-separated; take the first three
    cmd=$(tr '\0' ' ' < "$p/cmdline" 2>/dev/null)
    case "$cmd" in
      python\ run.py\ train\ *|*/python\ run.py\ train\ *|python3\ run.py\ train\ *)
        echo "${p#/proc/}" ;;
    esac
  done
}

while true; do
  sleep 60
  pids=$(trainer_pids)
  [ -z "$pids" ] && continue
  # newest mtime across the ladder's logs
  newest=$(ls -t "$LOGDIR"/*.log 2>/dev/null | head -1)
  [ -z "$newest" ] && continue
  age=$(( $(date +%s) - $(stat -c %Y "$newest") ))
  # Only a trainer that already made progress (last line is a step/eval/
  # checkpoint line) is "hung mid-run" — kill-and-resume helps.  A trainer
  # stuck BEFORE its first step usually means the relay itself is down
  # (observed 19:12-? on 2026-08-17: even jax.devices() hangs); killing it
  # would burn the ladder's bounded retry attempts for nothing, so leave it
  # waiting (the ladder's `timeout 14400` still caps it).
  last=$(tail -1 "$newest" 2>/dev/null)
  case "$last" in
    *"step "*|*"eval@"*|*"saved checkpoint"*) : ;;
    *) continue ;;
  esac
  if [ "$age" -gt "$THRESH" ]; then
    for pid in $pids; do
      # re-verify the exact cmdline before killing
      cmd=$(tr '\0' ' ' < "/proc/$pid/cmdline" 2>/dev/null)
      case "$cmd" in
        *run.py\ train\ *)
          echo "[watchdog $(date +%H:%M:%S)] log '$newest' stale ${age}s — killing hung trainer $pid ($cmd)" \
            >> "$LOGDIR/watchdog.log"
          kill "$pid" 2>/dev/null ;;
      esac
    done
    sleep 120   # give the ladder time to relaunch before re-checking
  fi
done
