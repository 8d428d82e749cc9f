#!/bin/bash
# One-shot requalification queue (.claude/chip-todo.md) — run the moment the
# TPU tunnel answers. Executes every chip-blocked measurement in dependency
# order, tee-ing to logs/requalify/, and keeps going past individual
# failures so one flaky step doesn't lose the session.
#
#   bash tools/chip_requalify.sh            # full queue
#   bash tools/chip_requalify.sh quick      # smoke + bench only
#
# Each step is wrapped in `timeout` — the tunnel dying mid-run must not hang
# the queue (see the round-2 outage postmortem in VERDICT.md).

set -u
cd "$(dirname "$0")/.."
mkdir -p logs/requalify
STAMP=$(date -u +%Y%m%dT%H%M%S)
SUMMARY=logs/requalify/${STAMP}_summary.txt
echo "chip requalification ${STAMP}" | tee "$SUMMARY"

run() { # run <minutes> <name> <cmd...>
  local mins=$1 name=$2; shift 2
  local log=logs/requalify/${STAMP}_${name}.log
  echo "=== ${name}: $*" | tee -a "$SUMMARY"
  local t0=$SECONDS
  if timeout "$((mins * 60))" "$@" >"$log" 2>&1; then
    echo "    OK  ($((SECONDS - t0))s)  $(tail -n1 "$log" | cut -c1-160)" | tee -a "$SUMMARY"
  else
    echo "    FAIL rc=$? ($((SECONDS - t0))s) — see $log" | tee -a "$SUMMARY"
  fi
}

# 1. compiled-kernel checks (incl. the fused-FFN kernel, never yet compiled
#    on hardware — CLAUDE.md kernel ground rule)
run 30 tpu_smoke python tools/tpu_smoke.py

# 2. fused-FFN vs einsum A/B — opt-in (RUN_FFN_MICRO=1): the A/B already
#    decided both "auto" gates (2fa7041: saved-VJP kernel for training,
#    einsum epilogue) and the tool's 8 fresh compiles through the tunnel
#    blew a 30-min budget when queued right after tpu_smoke (2026-08-19).
if [ "${RUN_FFN_MICRO:-0}" = "1" ]; then
  run 45 ffn_micro python tools/ffn_micro.py
fi

# 3. localize the inference forward's slack (476 GB/s vs 794 train)
run 30 infer_breakdown python tools/infer_breakdown.py

# 4. headline (driver-graded JSON line; post-quirk model identity)
run 30 bench python bench.py

if [ "${1:-}" = "quick" ]; then
  echo "quick mode: stopping after bench" | tee -a "$SUMMARY"
  exit 0
fi

# 5-6. convergence requalification (README rows are marked pending on these)
run 90 conv_bert python tools/convergence_run.py --config bert --epochs 20
run 120 conv_full python tools/convergence_run.py --config full --epochs 30

# 7. batched-vs-bs1 validation speedup (VERDICT r1 #3 / r2 #5: measured >=4x)
run 45 eval_bench python tools/eval_bench.py

# 8. entry() forward (verify recipe surface 1)
run 20 entry python -c "
import jax
from __graft_entry__ import entry
fn, (v, b) = entry()
out = jax.jit(fn)(v, b)
print(out.shape, bool(jax.numpy.all(jax.numpy.isfinite(out.astype('float32')))))"

# 9. fp32-vs-bf16 optimizer-state convergence A/B (ADVICE r2 #4)
run 90 conv_bert_fp32state python tools/convergence_run.py --config bert \
  --epochs 20 --optimizer-state-dtype float32

# 10. serving latency/throughput row (VERDICT r2 #8)
run 30 serve_bench python tools/serve_bench.py

echo "done — summarize into docs/ARCHITECTURE.md + README.md and update .claude/chip-todo.md" | tee -a "$SUMMARY"
