#!/bin/bash
# Run graft.ScanBench and record its JSON summary line as a per-round
# artifact (SCANBENCH_r{N}.json at the repo root) so the funnel/scan
# numbers vs the reference's 24/28 ms headlines are diffable across
# rounds the same way CORRECTNESS_r{N}/BENCH_r{N} are.
# Also records the 4M-vector row (SCANBENCH_r{N}_4m.json) so the
# "ahead of linear scaling at 4M" crossover claim stays diffable per
# round; skip it with SKIP_4M=1.
# Usage: scripts/scanbench.sh <round> [nVectors]
set -e
cd "$(dirname "$0")/.."
ROUND="${1:?usage: scripts/scanbench.sh <round> [nVectors]}"
N="${2:-1000000}"
OUT="SCANBENCH_r${ROUND}.json"
scripts/settle.sh
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" scripts/run.sh graft.ScanBench "$N" \
  | tee -a /dev/stderr | grep '^{' | tail -1 > "$OUT"
echo "wrote $OUT" >&2
if [ -z "${SKIP_4M:-}" ]; then
  OUT4="SCANBENCH_r${ROUND}_4m.json"
  # 4M runs the full-box serving regime: 32 threads (the crossover claim
  # compares against the reference's linear scaling, which assumes the
  # whole machine) and a 24g heap — the funnel tiers keep ~1.4 KB/row
  # resident (~6 GB at 4M), and a 48g G1 heap measured multi-second
  # full-GC pauses that a 24g heap does not.
  scripts/settle.sh
  SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM_4M:-24g}" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS_4M:-32}" \
    scripts/run.sh graft.ScanBench 4000000 \
    | tee -a /dev/stderr | grep '^{' | tail -1 > "$OUT4"
  echo "wrote $OUT4" >&2
fi
# 16M extends the crossover table one more octave (~22 GB resident funnel
# tiers → 40g heap, <2x the live set so G1 stays off the full-GC cliff the
# 48g/4M case measured). Opt-in: it quadruples the artifact runtime.
if [ -n "${RUN_16M:-}" ]; then
  OUT16="SCANBENCH_r${ROUND}_16m.json"
  scripts/settle.sh
  SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM_16M:-40g}" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS_16M:-32}" \
    scripts/run.sh graft.ScanBench 16000000 \
    | tee -a /dev/stderr | grep '^{' | tail -1 > "$OUT16"
  echo "wrote $OUT16" >&2
fi
