#!/bin/bash
# Round-13 artifact re-recording chain (verdict tasks 2/3/4/5): runs the
# remaining headline benches SEQUENTIALLY so no run pollutes another's
# timings. scanbench.sh 13 runs separately before this chain.
set -e
cd "$(dirname "$0")/.."

echo "=== servebench 100k x 64 $(date)"
scripts/servebench.sh 13

echo "=== servebench 1M x 1024 $(date)"
scripts/servebench.sh 13 1000000 1024

echo "=== recallbench synth 1M x 1024 $(date)"
SYNTH=1 SUFFIX=_1m scripts/recallbench.sh 13 1000000 1024 100 8 0.5 20

echo "=== graphbench 4M true geometry (4 x 1M blocks) $(date)"
SPARK_DRIVER_MEM=26g SPARK_GRAFT_GRAPH_BUILD_THREADS=8 \
  scripts/graphbench.sh 13_4m_true 4000000 1024 20 4

echo "=== graphbench 8M true geometry (2 x 4M blocks) $(date)"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_GRAPH_BUILD_THREADS=8 \
  scripts/graphbench.sh 13_8m_true 8000000 1024 20 2

echo "=== incbench $(date)"
scripts/incbench.sh 13

echo "=== incbench pool $(date)"
scripts/incbench.sh 13_pool

echo "=== chain done $(date)"
