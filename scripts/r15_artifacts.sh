#!/bin/bash
# Round-15 artifact chain (r14 verdict tasks 1-8). Every recording goes
# through the writeback-settle protocol (scripts/settle.sh at the script
# level, Bench.settleWriteback / ScanBench.settle() in-run) — the r14b
# contamination class (a bare scan slower than the funnel that contains
# it) is reproducible at will without it on a degraded device and gone
# with it. Runs SEQUENTIALLY; dd-test the device first (this box
# degraded to ~50 MB/s direct reads on 2026-08-16 — absolute rows carry
# that day's offset, stamped via loadavg/io_probe/dirty_kb).
set -e
cd "$(dirname "$0")/.."

echo "=== scanbench 1M, two consecutive settled draws $(date)"
SKIP_4M=1 scripts/scanbench.sh 15
SKIP_4M=1 scripts/scanbench.sh 15b

echo "=== scanbench 4M $(date)"
scripts/settle.sh
SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=32 scripts/run.sh graft.ScanBench 4000000 \
  | grep '^{' | tail -1 > SCANBENCH_r15_4m.json

echo "=== graphbench 8M true geometry, post-nav-v2 re-stamp $(date)"
SPARK_DRIVER_MEM=48g scripts/graphbench.sh 15_8m_true 8000000 1024 20 2

echo "=== cold-build variance, 3 fresh-JVM cold rows over one ingest $(date)"
scripts/coldbuild.sh 15

echo "=== ivfbench re-record at HEAD (learned centroids default) $(date)"
scripts/ivfbench.sh 15

echo "=== chain done $(date)"
