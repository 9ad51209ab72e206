#!/bin/bash
# Run graft.TxBench (steady-state transactional cycle: pin → commit →
# compact-under-pin → pinned read → close, corpus built ONCE) and record
# its JSON summary as a per-round artifact (TXBENCH_r{N}.json). This is
# the regression signal the driver-gate x1 query can't provide — its
# per-rep DB rebuild makes its bench line ~90% ingest.
# Usage: scripts/txbench.sh <round> [reps] [batchSize]
set -e
cd "$(dirname "$0")/.."
ROUND="${1:?usage: scripts/txbench.sh <round> [reps] [batchSize]}"
REPS="${2:-40}"
B="${3:-2000}"
OUT="TXBENCH_r${ROUND}.json"
scripts/settle.sh
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" scripts/run.sh graft.TxBench "$REPS" "$B" \
  | tee -a /dev/stderr | grep '^{' | tail -1 > "$OUT"
echo "wrote $OUT" >&2
