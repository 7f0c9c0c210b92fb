#!/usr/bin/env bash
# Sequential multi-seed convergence-proxy queue (one TPU — runs must not
# overlap).  Each run is retried with --resume so a relay flap costs only
# the steps since the last checkpoint, not the whole run.  Result JSON
# lines accumulate in $LOG; feed that to scripts/collect_proxy_results.py.
#
# Usage: bash scripts/run_proxy_queue.sh [LOGFILE]
set -u
LOG=${1:-/tmp/proxy_r3/queue.log}
mkdir -p "$(dirname "$LOG")"
cd "$(dirname "$0")/.."

# Reap children on ANY exit (round-3 post-mortem: a detached proxy run
# survived the builder session and competed with the driver's scoring
# bench).  kill 0 signals the whole process group, including the python
# run under `timeout`.
trap 'trap - INT TERM; kill 0 2>/dev/null' INT TERM

run() {
  desc="$1"; shift
  for attempt in 1 2 3 4 5; do
    echo "[queue] $desc attempt $attempt $(date -u +%FT%TZ)" >>"$LOG.err"
    if [ "$attempt" -eq 1 ]; then
      timeout 5400 python "$@" >>"$LOG" 2>>"$LOG.err" && return 0
    else
      timeout 5400 python "$@" --resume >>"$LOG" 2>>"$LOG.err" && return 0
    fi
  done
  echo "[queue] $desc FAILED after 5 attempts" >>"$LOG.err"
  return 1
}

# Detection: complete the host baseline to >=3 seeds and run the
# device_v4 (exact pixel-space HSV photometric) A/B at 3 seeds.
run "det host s1"  scripts/convergence_proxy.py --variant host --seed 1 --steps 2000
run "det host s2"  scripts/convergence_proxy.py --variant host --seed 2 --steps 2000
run "det v4 s0"    scripts/convergence_proxy.py --variant device_v4 --seed 0 --steps 2000
run "det v4 s1"    scripts/convergence_proxy.py --variant device_v4 --seed 1 --steps 2000
run "det v4 s2"    scripts/convergence_proxy.py --variant device_v4 --seed 2 --steps 2000

# Classification: 3 seeds of host and device (round3_cls_summary.json).
for s in 0 1 2; do
  run "cls host s$s"   scripts/cls_convergence_proxy.py --variant host --seed "$s"
  run "cls device s$s" scripts/cls_convergence_proxy.py --variant device --seed "$s"
done

echo "[queue] DONE $(date -u +%FT%TZ)" >>"$LOG.err"
