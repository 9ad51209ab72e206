#!/bin/bash
# Run graft.RecallBench and record its JSON summary line as a per-round
# artifact (RECALL_r{N}.json at the repo root) so the recall-vs-
# oversampling and IVF-probe retention numbers vs the reference's
# 90/95/99.99% claims (README.md:134-153) are diffable across rounds.
# Usage: scripts/recallbench.sh <round> [sfDir] [nQueries]
#        SYNTH=1 scripts/recallbench.sh <round> [n] [dim] [clusters] \
#          [intrinsicDim] [sigma] [nQueries]
# The SYNTH regime writes RECALL_r{N}_synth.json: a clustered unit-sphere
# manifold at the reference's own 1024-dim geometry, where the sweep
# reproduces the reference's retention *shape* (the driver's near-random
# 64-dim fixtures depress absolute recall — see ARCHITECTURE.md).
set -e
cd "$(dirname "$0")/.."
ROUND="${1:?usage: scripts/recallbench.sh <round> ...}"
shift
if [ -n "$SYNTH" ]; then
  # SUFFIX distinguishes extra synth geometries, e.g. SUFFIX=_1m for the
  # per-round 1M x 1024 row (the reference's own scale; round-11 verdict
  # item 5 — retention regressions must be caught at the geometry that
  # mirrors the ~99.99% claim, not only at 100k).
  OUT="RECALL_r${ROUND}_synth${SUFFIX}.json"
  scripts/settle.sh
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-16g}" \
    scripts/run.sh graft.RecallBench synth "$@" \
    | tee -a /dev/stderr | grep '^{"metric"' | tail -1 > "$OUT"
else
  SF="${1:-/root/testdata/sf0.01}"
  NQ="${2:-20}"
  OUT="RECALL_r${ROUND}.json"
  scripts/settle.sh
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" scripts/run.sh graft.RecallBench "$SF" "$NQ" \
    | tee -a /dev/stderr | grep '^{"metric"' | tail -1 > "$OUT"
fi
echo "wrote $OUT" >&2
