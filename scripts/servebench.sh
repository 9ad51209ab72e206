#!/bin/bash
# Run graft.ServeBench and record its JSON summary line as a per-round
# artifact (SERVEBENCH_r{N}.json at the repo root) so the VectorDB-API
# serving latencies (plain vs enableServing vs batched vs 16-way
# concurrent searchVector) are diffable across rounds the way the
# SCANBENCH/RECALL artifacts are.
# Usage: scripts/servebench.sh <round> [nDocs] [dim]
# A non-default dim writes SERVEBENCH_r{N}_{nDocs}x{dim}.json — e.g.
# `scripts/servebench.sh 8 1000000 1024` records the API-level row at
# the reference's own 1M × 1024-dim geometry (README.md:9).
set -e
cd "$(dirname "$0")/.."
ROUND="${1:?usage: scripts/servebench.sh <round> [nDocs] [dim]}"
N="${2:-100000}"
DIM="${3:-64}"
if [ "$N" = 100000 ] && [ "$DIM" = 64 ]; then
  OUT="SERVEBENCH_r${ROUND}.json"
else
  OUT="SERVEBENCH_r${ROUND}_${N}x${DIM}.json"
fi
scripts/settle.sh
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-16g}" \
  scripts/run.sh graft.ServeBench "$N" "$DIM" \
  | tee -a /dev/stderr | grep '^{"metric"' | tail -1 > "$OUT"
echo "wrote $OUT" >&2
