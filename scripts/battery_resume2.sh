#!/usr/bin/env bash
# Resume battery r2b from the session crash during the main suppression
# sweep: re-earn the main 5-point sweep, the fine grid one λ per process
# (a single process holding the whole grid wedges the axon worker), merge,
# the held-out test stage, and the figure gallery.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-results/battery_log_r2c}
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
    echo "--- $name failed attempt $attempt rc=$rc"
  done
  echo "$name" >> "$LOG/failures.txt"
  return 1
}

run exp_suppression experiments/exp_suppression.py --retrain
for lam in $(python -c "
import numpy as np
vals = sorted({0.0, 0.01, 1.0, 10.0, 100.0, 1000.0}
              | {round(float(10.0 ** e), 12) for e in np.linspace(-1.8, -0.6, 7)})
print(' '.join(str(v) for v in vals))"); do
  run "exp_suppression_fine_$lam" experiments/exp_suppression.py \
      --lambdas "$lam" --no-test-stage --retrain
done
run exp_suppression_fine_merge experiments/exp_suppression.py --merge-fine
run exp_suppression_test experiments/exp_suppression.py --test-only
run exp_figures experiments/exp_figures.py

echo "=== battery resume done; failures: $(wc -l < "$LOG/failures.txt")"
cat "$LOG/failures.txt"
