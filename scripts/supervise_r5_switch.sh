#!/bin/bash
# One-shot ladder switcher: once the r5c ladder finishes its two
# lead-category regeneration arms (ovenmp, wmmp — trigger: wmmp eval done,
# or r5c already moved on to safemp), stop r5c and hand the chip to the
# reordered r5d ladder so the partial-view pipeline (VERDICT r4 #4) runs
# before the cheaper warm arms.
# Safety: pids are killed only by exact /proc/<pid>/cmdline field match
# (argv[1] == run.py, argv[2] == train/eval), never by pattern.
set -u
cd /root/repo
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH (epoch seconds)}

boundary_reached () {
  grep -q seg_iou logs_r5/wmmp_eval.log 2>/dev/null && return 0
  [ -f logs_r5/safemp_stage1.log ] && return 0
  # r5c ladder gone entirely (crash/VM restart) -> also take over
  local lp
  lp=$(cat /tmp/train_run_r5c.pid 2>/dev/null || echo "")
  [ -n "$lp" ] && ! kill -0 "$lp" 2>/dev/null && return 0
  return 1
}

runpy_pids () {  # exact-cmdline trainer/eval pids (watchdog-style match)
  local p cmd
  for p in /proc/[0-9]*; do
    [ -r "$p/cmdline" ] || continue
    cmd=$(tr '\0' ' ' < "$p/cmdline" 2>/dev/null)
    case "$cmd" in
      python\ run.py\ train\ *|python\ run.py\ eval\ *) echo "${p#/proc/}" ;;
    esac
  done
}

while ! boundary_reached; do
  [ $(( DEADLINE_EPOCH - $(date +%s) )) -le 600 ] && exit 0
  sleep 60
done

lp=$(cat /tmp/train_run_r5c.pid 2>/dev/null || echo "")
[ -n "$lp" ] && kill "$lp" 2>/dev/null
sleep 2
# only kill a child run.py if r5c had already moved past the wmmp eval
# (i.e. a safemp/partial process the reordered ladder will redo anyway)
if [ -f logs_r5/safemp_stage1.log ]; then
  for pid in $(runpy_pids); do kill "$pid" 2>/dev/null; done
  sleep 5
fi
echo "[switch $(date +%H:%M:%S)] r5c stopped; starting r5d" >> logs_r5/ladder_r5d.log
DEADLINE_EPOCH=$DEADLINE_EPOCH nohup bash scripts/train_ladder_r5d.sh \
  >> logs_r5/ladder_r5d_drive.log 2>&1 &
echo $! > /tmp/train_run_r5d_driver.pid
