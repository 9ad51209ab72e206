#!/bin/bash
# Round-17 artifact chain (OPTIMIZATION round 1). Serving-side code did
# NOT change this round, so per the settle-protocol guardrail (r16
# verdict item 8) the SCANBENCH/SERVEBENCH/RECALL artifacts are NOT
# re-recorded — r16's stand. What r17 records:
#   BENCH_r17_before.json  — quiet pre-optimization draw (committed from
#                            the round's first settled window)
#   BENCH_r17_after.json   — quiet post-optimization draw (also copied
#                            to BENCH_r17_local.json)
#   BENCH_r17_abba.json    — base-vs-head family ABBA pairs (the
#                            drift-proof per-family adjudication)
#   BENCH_baseline_local.json — guard baseline refreshed from head-code
#                            per-query minima
# Runs SEQUENTIALLY on a quiet box (never alongside sbt test).
set -e
cd "$(dirname "$0")/.."

echo "=== quiet forked local bench at sf0.1, driver 32-cpu shape $(date)"
scripts/settle.sh
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g \
  scripts/run.sh graft.Bench | grep '^{' | tail -1 > BENCH_r17_local.json

echo "=== chain done $(date)"
