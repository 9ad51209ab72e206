#!/bin/bash
# Run graft.ScanBench and record its JSON summary line as a per-round
# artifact (SCANBENCH_r{N}.json at the repo root) so the funnel/scan
# numbers vs the reference's 24/28 ms headlines are diffable across
# rounds the same way CORRECTNESS_r{N}/BENCH_r{N} are.
# Usage: scripts/scanbench.sh <round> [nVectors]
set -e
cd "$(dirname "$0")/.."
ROUND="${1:?usage: scripts/scanbench.sh <round> [nVectors]}"
N="${2:-1000000}"
OUT="SCANBENCH_r${ROUND}.json"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" scripts/run.sh graft.ScanBench "$N" \
  | tee /dev/stderr | grep '^{' | tail -1 > "$OUT"
echo "wrote $OUT" >&2
