#!/bin/bash
# Run graft.IncBench and record its JSON summary line as a per-round
# artifact (INCBENCH_r{N}.json at the repo root): commit-to-serve
# latency under a commit stream — full serving rebuild per commit vs
# the incremental chain refresh (VectorDB.incrementalServing), MOR
# storage + NSW graphs (ARCHITECTURE.md "Incremental serving refresh").
# Usage: scripts/incbench.sh <round> [nDocs] [dim] [nBlocks] [commits] [batch]
set -e
cd "$(dirname "$0")/.."
ROUND="${1:?usage: scripts/incbench.sh <round> [nDocs] [dim] [nBlocks] [commits] [batch]}"
N="${2:-500000}"
DIM="${3:-1024}"
NB="${4:-2}"
COMMITS="${5:-6}"
BATCH="${6:-2000}"
OUT="INCBENCH_r${ROUND}.json"
# True-geometry serving blocks (enableServing(blocks) pin, r12) are
# 250k rows each at the defaults: the NSW graph build inside them needs
# intra-block parallelism, or every serve build/flatten is a
# single-threaded ~75 s wall (INCBENCH_r13_1thread) instead of ~15 s.
# Since r14 the builder auto-sizes (buildThreads = 0 divides the JVM's
# core budget among in-flight builds); the default run exercises that
# auto path — export SPARK_GRAFT_GRAPH_BUILD_THREADS to pin a width.
scripts/settle.sh
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-16g}" \
SPARK_GRAFT_GRAPH_BUILD_THREADS="${SPARK_GRAFT_GRAPH_BUILD_THREADS:-0}" \
  scripts/run.sh graft.IncBench "$N" "$DIM" "$NB" "$COMMITS" "$BATCH" \
  | tee -a /dev/stderr | grep '^{"metric"' | tail -1 > "$OUT"
echo "wrote $OUT" >&2
