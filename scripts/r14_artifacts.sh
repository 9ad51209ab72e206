#!/bin/bash
# Round-14 artifact chain (r13 verdict tasks 2/3/4): the graph grids at
# both TRUE geometries — now recording the r14 warm path natively (first
# nsw row = cold build incl. _nav/_blocks persist; later ef rows = pure-IO
# warm reloads) — and the incremental grid on the auto-sized build pool.
# NO SPARK_GRAFT_GRAPH_BUILD_THREADS export anywhere: the grids exercise
# the out-of-the-box buildThreads=0 auto default (task 3's done bar).
# Runs SEQUENTIALLY so no run pollutes another's timings.
set -e
cd "$(dirname "$0")/.."

echo "=== graphbench 4M true geometry (4 x 1M blocks) $(date)"
SPARK_DRIVER_MEM=26g scripts/graphbench.sh 14_4m_true 4000000 1024 20 4

echo "=== graphbench 8M true geometry (2 x 4M blocks) $(date)"
SPARK_DRIVER_MEM=48g scripts/graphbench.sh 14_8m_true 8000000 1024 20 2

echo "=== incbench (auto pool default) $(date)"
scripts/incbench.sh 14

echo "=== chain done $(date)"
