#!/usr/bin/env bash
# Full-run re-earn battery: every experiment sequentially, ONE process per
# experiment (the axon TPU worker dislikes long multi-program sessions —
# see .claude/skills/verify/SKILL.md), each with --retrain so all artifacts
# and metrics are reproduced by the CURRENT engine. Dependency order:
# exp00 writes the processed data; exp02 feeds exp_figures/exp_advi via
# cude_fit.npz; exp03/exp04 share symreg fits; exp06 feeds exp06a/exp_advi.
#
# Usage: bash scripts/battery.sh [results/battery_log]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-results/battery_log}
mkdir -p "$LOG"
: > "$LOG/failures.txt"

run() {
  local name=$1; shift
  echo "=== $name: $*"
  local attempt rc
  for attempt in 1 2; do
    timeout 5400 python "$@" >"$LOG/$name.out" 2>"$LOG/$name.err"
    rc=$?
    if [ $rc -eq 0 ]; then
      echo "--- $name ok (attempt $attempt)"
      return 0
    fi
    # axon worker crashes are environmental and retry-safe (fresh process)
    echo "--- $name failed attempt $attempt rc=$rc"
  done
  echo "$name" >> "$LOG/failures.txt"
  return 1
}

run exp00 experiments/exp00_prepare_data.py
run exp01 experiments/exp01_non_conditional.py --retrain
run exp02 experiments/exp02_conditional.py --retrain
run exp02_xl experiments/exp02_xl.py --retrain
run exp03 experiments/exp03_symreg.py --retrain
run exp04 experiments/exp04_symreg_external.py --retrain
run exp05 experiments/exp05_less_data.py --retrain
run exp06 experiments/exp06_saem.py --retrain
run exp06a experiments/exp06a_saem_symreg.py --retrain
run exp07 experiments/exp07_covariate.py --retrain
run exp_parity experiments/exp_parity.py
run exp_symreg_search experiments/exp_symreg_search.py --retrain
run exp_advi experiments/exp_advi.py --retrain
# suppression: main 5-point sweep, then the fine 12-point grid ONE λ PER
# PROCESS (a single process holding the whole fine sweep + 24 validations
# wedges the axon worker after ~40 min — measured twice), merged afterwards,
# then the held-out test-stage revalidation
run exp_suppression experiments/exp_suppression.py --retrain
for lam in $(python -c "
from pathlib import Path
import sys
sys.path.insert(0, 'experiments')
import numpy as np
vals = sorted({0.0, 0.01, 1.0, 10.0, 100.0}
              | {round(float(10.0 ** e), 12) for e in np.linspace(-1.8, -0.6, 7)})
print(' '.join(str(v) for v in vals))"); do
  run "exp_suppression_fine_$lam" experiments/exp_suppression.py \
      --lambdas "$lam" --no-test-stage --retrain
done
run exp_suppression_fine_merge experiments/exp_suppression.py --merge-fine
run exp_suppression_test experiments/exp_suppression.py --test-only
# figures last: re-render the full gallery from the fresh artifacts
run exp_figures experiments/exp_figures.py

echo "=== battery done; failures: $(wc -l < "$LOG/failures.txt")"
cat "$LOG/failures.txt"
