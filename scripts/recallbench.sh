#!/bin/bash
# Run graft.RecallBench and record its JSON summary line as a per-round
# artifact (RECALL_r{N}.json at the repo root) so the recall-vs-
# oversampling and IVF-probe retention numbers vs the reference's
# 90/95/99.99% claims (README.md:134-153) are diffable across rounds.
# Usage: scripts/recallbench.sh <round> [sfDir] [nQueries]
set -e
cd "$(dirname "$0")/.."
ROUND="${1:?usage: scripts/recallbench.sh <round> [sfDir] [nQueries]}"
SF="${2:-/root/testdata/sf0.01}"
NQ="${3:-20}"
OUT="RECALL_r${ROUND}.json"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" scripts/run.sh graft.RecallBench "$SF" "$NQ" \
  | tee /dev/stderr | grep '^{"metric"' | tail -1 > "$OUT"
echo "wrote $OUT" >&2
