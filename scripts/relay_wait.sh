#!/bin/bash
# Relay-recovery monitor: probe the axon backend every ~3 min; when it
# answers, SIGCONT the stopped ladder process tree (and their children) and
# exit.  Usage: bash scripts/relay_wait.sh <ladder_pid>
set -u
LADDER=${1:?ladder pid}
while true; do
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[relay_wait $(date +%H:%M:%S)] relay healthy — resuming ladder $LADDER"
    kill -CONT "$LADDER" 2>/dev/null
    for c in $(pgrep -P "$LADDER"); do
      kill -CONT "$c" 2>/dev/null
      for gc in $(pgrep -P "$c"); do kill -CONT "$gc" 2>/dev/null; done
    done
    exit 0
  fi
  sleep 120
done
