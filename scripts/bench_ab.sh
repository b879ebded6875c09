#!/bin/bash
# Sequential A/B sweep of outer-solver glue knobs on the real chip.
# Usage: bash scripts/bench_ab.sh [logfile]
# Each line of the log: <tag> then the two JSON lines from bench.py.
LOG=${1:-/tmp/bench_ab.log}
cd "$(dirname "$0")/.."
run() {
  tag=$1; shift
  echo "=== $tag ($*)" | tee -a "$LOG"
  env "$@" timeout 1500 python bench.py 2>/dev/null | grep -E '^\{' | tee -a "$LOG"
}
run maxiter12      STFEM_BENCH_MAXITER=12
run cgs1           STFEM_BENCH_REORTH=0
run vbf16          STFEM_BENCH_VBF16=1
run rich2          STFEM_BENCH_IR_RICH=2
run nopost         STFEM_BENCH_NOPOST=1
echo "done" | tee -a "$LOG"
