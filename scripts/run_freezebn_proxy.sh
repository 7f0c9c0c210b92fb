#!/usr/bin/env bash
# Two-phase frozen-BN convergence experiment (one TPU — runs must not
# overlap): per seed, train 1000 steps with normal batch-stat BN, then
# resume the SAME run dir with --freeze-bn to 2000 total steps.  Compare
# the held-out mAP of the *_freezebn rows against the uninterrupted
# 2000-step host runs (results_proxy/round3_summary.json: 0.740 +- 0.015)
# — convergence evidence for the `config.freeze_bn` fine-tune recipe at a
# matched total step count.
#
# Usage: bash scripts/run_freezebn_proxy.sh [LOGFILE]
set -u
LOG=${1:-/tmp/proxy_fbn/queue.log}
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
  run "fbn phase1 s$s" scripts/convergence_proxy.py --variant host \
      --seed "$s" --steps 1000
  # phase 2 resumes the phase-1 checkpoint; retries keep --freeze-bn
  run "fbn phase2 s$s" scripts/convergence_proxy.py --variant host \
      --seed "$s" --steps 2000 --freeze-bn --resume
done

echo "[queue] DONE $(date -u +%FT%TZ)" >>"$LOG.err"
