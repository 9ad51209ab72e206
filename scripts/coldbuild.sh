#!/bin/bash
# Cold serve-build variance recording (r14 verdict item 6): one ingest,
# then REPS fresh-JVM cold builds over the same folder with _nav/_blocks
# swept and the writeback-settle protocol between rows. Three rows
# within ~1.3x = the historical 188-300s band was writeback, not code.
# Usage: scripts/coldbuild.sh <round> [n] [dim] [nBlocks] [reps]
set -e
cd "$(dirname "$0")/.."
ROUND="${1:?usage: scripts/coldbuild.sh <round> [n] [dim] [nBlocks] [reps]}"
N="${2:-4000000}"
DIM="${3:-1024}"
NB="${4:-4}"
REPS="${5:-3}"
DIR="$(mktemp -d /tmp/graft-coldbuild-XXXX)/db"
OUT="COLDBUILD_r${ROUND}.json"
MEM="${SPARK_DRIVER_MEM:-26g}"

scripts/settle.sh
SPARK_DRIVER_MEM="$MEM" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
  scripts/run.sh graft.ColdBuildProbe ingest "$DIR" "$N" "$DIM" "$NB" \
  | tee -a /dev/stderr | grep '^{' | tail -1 > /tmp/coldbuild_ingest.json

ROWS=""
for i in $(seq 1 "$REPS"); do
  rm -rf "$DIR/_nav" "$DIR/_blocks"
  scripts/settle.sh
  ROW=$(SPARK_DRIVER_MEM="$MEM" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
    scripts/run.sh graft.ColdBuildProbe build "$DIR" "$NB" "$DIM" \
    | tee -a /dev/stderr | grep '^{' | tail -1)
  ROWS="$ROWS$ROW,"
done
printf '{"metric":"cold_build_variance","n":%s,"dim":%s,"n_blocks":%s,"ingest":%s,"rows":[%s]}\n' \
  "$N" "$DIM" "$NB" "$(cat /tmp/coldbuild_ingest.json)" "${ROWS%,}" > "$OUT"
rm -rf "$(dirname "$DIR")"
echo "wrote $OUT" >&2
