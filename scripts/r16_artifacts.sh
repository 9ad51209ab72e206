#!/bin/bash
# Round-16 artifact chain (r15 verdict tasks 2, 4, 5). Everything runs
# through the writeback-settle protocol; runs SEQUENTIALLY on a quiet
# box (never alongside sbt test).
set -e
cd "$(dirname "$0")/.."

echo "=== scanbench 1M+4M, then a second consecutive 1M draw $(date)"
scripts/scanbench.sh 16
SKIP_4M=1 scripts/scanbench.sh 16b

echo "=== servebench API row, default 100k x 64 $(date)"
scripts/servebench.sh 16

echo "=== servebench at the reference's own 1M x 1024 geometry $(date)"
scripts/servebench.sh 16 1000000 1024

echo "=== recallbench synth 1M x 1024 $(date)"
SYNTH=1 SUFFIX=_1m scripts/recallbench.sh 16 1000000 1024 100 8 0.5 20

echo "=== quiet forked local bench at sf0.1 $(date)"
scripts/settle.sh
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=8g \
  scripts/run.sh graft.Bench | grep '^{' | tail -1 > BENCH_r16_local.json

echo "=== chain done $(date)"
