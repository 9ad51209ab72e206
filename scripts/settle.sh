#!/bin/bash
# Writeback-settle protocol for bench recording (r14 verdict item 2):
# a draw recorded behind another run's unflushed gigabytes reads 1.2-2x
# slow with nothing wrong in the plan (SCANBENCH_r14b's 49 ms bare scan
# under its own 22 ms funnel row). Sync, then wait until the page
# cache's Dirty pool drains below SETTLE_DIRTY_KB (default 64 MB) or
# SETTLE_MAX_S (default 60 s) passes; stamp what it settled at.
sync
want="${SETTLE_DIRTY_KB:-65536}"
max="${SETTLE_MAX_S:-60}"
for _ in $(seq 1 "$max"); do
  d=$(awk '/^Dirty:/{print $2}' /proc/meminfo)
  [ "${d:-0}" -lt "$want" ] && break
  sleep 1
done
echo "[settle] Dirty=$(awk '/^Dirty:/{print $2}' /proc/meminfo)kB loadavg=$(cut -d' ' -f1 /proc/loadavg)" >&2
