#!/bin/bash
# Run graft.GraphBench and record its JSON summary line as a per-round
# artifact (GRAPHBENCH_r{N}.json at the repo root): the per-block NSW
# serving graph (index = nsw) vs the linear prepared scan — recall@10,
# served latency, and serve-build wall across the efSearch grid
# (ARCHITECTURE.md "Per-block graph search").
# Usage: scripts/graphbench.sh <round> [nDocs] [dim] [nQueries] [nBlocks]
# SPARK_GRAFT_GRAPH_IVF=1 adds the composed ivf_nsw probed sweep
# (learned cells + per-block graphs, nprobe 4/all).
set -e
cd "$(dirname "$0")/.."
ROUND="${1:?usage: scripts/graphbench.sh <round> [nDocs] [dim] [nQueries] [nBlocks]}"
N="${2:-1000000}"
DIM="${3:-1024}"
NQ="${4:-20}"
NB="${5:-4}"
OUT="GRAPHBENCH_r${ROUND}.json"
scripts/settle.sh
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-16g}" \
  scripts/run.sh graft.GraphBench "$N" "$DIM" "$NQ" "$NB" \
  | tee -a /dev/stderr | grep '^{"metric"' | tail -1 > "$OUT"
echo "wrote $OUT" >&2
