#!/usr/bin/env bash
# Round-3b proxy queue: the device_v5 (v4 + per-view JPEG requantization,
# ops/jpeg_quant.py) A/B at 3 seeds, then extra seeds for the host /
# device_v4 arms to tighten the round-3 statistics from 3 to 5 runs.
# Sequential — one TPU; see run_proxy_queue.sh for the retry rationale.
#
# Usage: bash scripts/run_proxy_queue2.sh [LOGFILE]
set -u
LOG=${1:-/tmp/proxy_r3b/queue.log}
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

for s in 0 1 2; do
  run "det v5 s$s" scripts/convergence_proxy.py --variant device_v5 --seed "$s" --steps 2000
done
for s in 3 4; do
  run "det host s$s" scripts/convergence_proxy.py --variant host --seed "$s" --steps 2000
  run "det v4 s$s"   scripts/convergence_proxy.py --variant device_v4 --seed "$s" --steps 2000
done
for s in 3 4; do
  run "det v5 s$s" scripts/convergence_proxy.py --variant device_v5 --seed "$s" --steps 2000
done

echo "[queue] DONE $(date -u +%FT%TZ)" >>"$LOG.err"
