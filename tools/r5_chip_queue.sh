#!/bin/bash
# Round-5 chip queue: the remaining driver-replayable evidence runs
# (VERDICT r4 asks #3/#4/#5/#6). Run serially on a quiet host so the
# host-side legs (collate/upload in serve_bench) are undistorted.
# Usage: bash tools/r5_chip_queue.sh [start_step]
cd "$(dirname "$0")/.."
LOGDIR=logs/requalify
mkdir -p "$LOGDIR"
START=${1:-1}

run() {
  local n=$1 name=$2 tmo=$3; shift 3
  [ "$n" -lt "$START" ] && return 0
  echo "=== [$n] $name start $(date -Is) load=$(cut -d' ' -f1-3 /proc/loadavg)" | tee -a "$LOGDIR/r5_queue.log"
  timeout "$tmo" "$@" > "$LOGDIR/r5_${name}.log" 2>&1
  local rc=$?
  echo "${name} rc=$rc" >> "$LOGDIR/r5_${name}.log"
  echo "=== [$n] $name rc=$rc end $(date -Is)" | tee -a "$LOGDIR/r5_queue.log"
}

run 1 serve_bench 2700 python tools/serve_bench.py
run 2 ffn_micro   3600 python tools/ffn_micro.py
run 3 qkv_micro   1800 python tools/qkv_micro.py
run 4 bench       1800 python bench.py
echo "=== queue done $(date -Is)" | tee -a "$LOGDIR/r5_queue.log"
