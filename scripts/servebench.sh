#!/bin/bash
# Run graft.ServeBench and record its JSON summary line as a per-round
# artifact (SERVEBENCH_r{N}.json at the repo root) so the VectorDB-API
# serving latencies (plain vs enableServing vs batched vs 16-way
# concurrent searchVector) are diffable across rounds the way the
# SCANBENCH/RECALL artifacts are.
# Usage: scripts/servebench.sh <round> [nDocs]
set -e
cd "$(dirname "$0")/.."
ROUND="${1:?usage: scripts/servebench.sh <round> [nDocs]}"
N="${2:-100000}"
OUT="SERVEBENCH_r${ROUND}.json"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" scripts/run.sh graft.ServeBench "$N" \
  | tee /dev/stderr | grep '^{"metric"' | tail -1 > "$OUT"
echo "wrote $OUT" >&2
