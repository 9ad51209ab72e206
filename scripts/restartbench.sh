#!/bin/bash
# Run graft.RestartBench and record its JSON summary line as a per-round
# artifact (RESTARTBENCH_r{N}.json at the repo root): the serving-tier
# restart walls under MOR + incremental serving + NSW — cold build vs
# pure-IO same-version reload vs the r14 warm CHAIN restart (seed blocks
# + one layer of missed commit windows) vs the no-seed cold baseline
# (ARCHITECTURE.md "Warm restart").
# Usage: scripts/restartbench.sh <round> [nDocs] [dim] [nQueries] [nBlocks]
set -e
cd "$(dirname "$0")/.."
ROUND="${1:?usage: scripts/restartbench.sh <round> [nDocs] [dim] [nQueries] [nBlocks]}"
N="${2:-4000000}"
DIM="${3:-1024}"
NQ="${4:-20}"
NB="${5:-4}"
OUT="RESTARTBENCH_r${ROUND}.json"
scripts/settle.sh
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-26g}" \
  scripts/run.sh graft.RestartBench "$N" "$DIM" "$NQ" "$NB" \
  | tee -a /dev/stderr | grep '^{"metric"' | tail -1 > "$OUT"
echo "wrote $OUT" >&2
