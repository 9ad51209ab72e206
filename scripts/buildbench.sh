#!/bin/bash
# Run graft.BuildBench and record its JSON summary line as a per-round
# artifact (BUILDBENCH_r{N}.json at the repo root): bulk index-build
# throughput through the full write path (embed -> calibrate -> pack ->
# two-tier write) plus warm search over the built index.
# Usage: scripts/buildbench.sh <round> [nDocs]
set -e
cd "$(dirname "$0")/.."
ROUND="${1:?usage: scripts/buildbench.sh <round> [nDocs]}"
N="${2:-1000000}"
OUT="BUILDBENCH_r${ROUND}.json"
scripts/settle.sh
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" scripts/run.sh graft.BuildBench "$N" \
  | tee -a /dev/stderr | grep '^{"metric"' | tail -1 > "$OUT"
echo "wrote $OUT" >&2
