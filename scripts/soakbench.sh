#!/bin/bash
# Run graft.SoakBench (long-horizon continuous-crawl soak) and record its
# JSON summary as a per-round artifact (SOAKBENCH_r{N}.json) so the
# "MOR commit latency stays O(batch) as the corpus grows" claim is
# diffable across rounds like SCANBENCH_r{N}/RECALL_r{N}.
# Usage: scripts/soakbench.sh <round> [nBatches] [batchSize]
set -e
cd "$(dirname "$0")/.."
ROUND="${1:?usage: scripts/soakbench.sh <round> [nBatches] [batchSize]}"
N="${2:-100}"
B="${3:-200}"
OUT="SOAKBENCH_r${ROUND}.json"
scripts/settle.sh
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" scripts/run.sh graft.SoakBench "$N" "$B" \
  | tee -a /dev/stderr | grep '^{' | tail -1 > "$OUT"
echo "wrote $OUT" >&2
