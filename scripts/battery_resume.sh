#!/usr/bin/env bash
# Resume battery 2 from where the session crash left it: remaining fine
# suppression lambdas (one per process — the axon worker wedges if one
# process holds the whole grid), merge, held-out test stage, figures.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-results/battery_log2}
mkdir -p "$LOG"

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

for lam in 1.0 10.0 100.0; do
  run "exp_suppression_fine_$lam" experiments/exp_suppression.py \
      --lambdas "$lam" --no-test-stage --retrain
done
run exp_suppression_fine_merge experiments/exp_suppression.py --merge-fine
run exp_suppression_test experiments/exp_suppression.py --test-only
run exp_figures experiments/exp_figures.py

echo "=== battery resume done; failures: $(wc -l < "$LOG/failures.txt")"
cat "$LOG/failures.txt"
