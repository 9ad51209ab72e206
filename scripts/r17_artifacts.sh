#!/bin/bash
# Round-17 artifact chain. Serving-side code did NOT change this round,
# so per the settle-protocol guardrail (r16 verdict item 8) the
# SCANBENCH/SERVEBENCH/RECALL artifacts are NOT re-recorded — r16's
# stand. What r17 records: the quiet forked local bench at the driver's
# 32-cpu shape (now with d8/t11 and the tx_phases split), used both for
# the r16-noise adjudication and the baseline refresh.
# Runs SEQUENTIALLY on a quiet box (never alongside sbt test).
set -e
cd "$(dirname "$0")/.."

echo "=== quiet forked local bench at sf0.1, driver 32-cpu shape $(date)"
scripts/settle.sh
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g \
  scripts/run.sh graft.Bench | grep '^{' | tail -1 > BENCH_r17_local.json

echo "=== chain done $(date)"
