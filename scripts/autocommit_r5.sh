#!/bin/bash
# Periodic evidence snapshotter for the round-5 regeneration ladder.
# The first two round-5 sessions lost logs/checkpoints to VM reboots
# (never committed); this loop commits logs_r5 + harvested ckpt_r5
# artifacts every 10 min so a reboot costs at most one snapshot window.
cd /root/repo
while true; do
  sleep 600
  if [ -n "$(git status --porcelain logs_r5 ckpt_r5 2>/dev/null)" ]; then
    changed=$(git status --porcelain logs_r5 ckpt_r5 | awk '{print $2}' | xargs -n1 basename | tr '\n' ' ')
    git add logs_r5 ckpt_r5 2>/dev/null
    git commit -q -m "Snapshot ladder evidence: ${changed}" 2>/dev/null
  fi
done
