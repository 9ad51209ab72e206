#!/bin/bash
# Run graft.IvfBench and record its JSON summary line as a per-round
# artifact (IVFBENCH_r{N}.json at the repo root): the (ivfCells, nprobe)
# recall/latency tuning grid over the clustered synthetic manifold at
# the reference's native 1024-dim — the guidance table for the engine's
# one index knob (ARCHITECTURE.md "IVF tuning").
# Usage: scripts/ivfbench.sh <round> [nDocs] [dim] [nQueries]
set -e
cd "$(dirname "$0")/.."
ROUND="${1:?usage: scripts/ivfbench.sh <round> [nDocs] [dim] [nQueries]}"
N="${2:-200000}"
DIM="${3:-1024}"
NQ="${4:-20}"
OUT="IVFBENCH_r${ROUND}.json"
scripts/settle.sh
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-16g}" \
  scripts/run.sh graft.IvfBench "$N" "$DIM" "$NQ" \
  | tee -a /dev/stderr | grep '^{"metric"' | tail -1 > "$OUT"
echo "wrote $OUT" >&2
