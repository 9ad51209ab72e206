#!/usr/bin/env python3
"""Compare two graft Bench artifacts query by query, separating plan
regressions from machine drift.

Since round 11 every Bench line stamps `cpu_probe_ms` — a deterministic
single-thread probe (same work every run) — so the per-query ratio can
be NORMALIZED by the probe ratio: a query that got 1.4x slower on a
machine whose probe also got 1.4x slower hasn't regressed. When either
artifact predates the probe, raw ratios are printed and labeled as such
(BENCH_r11_local vs BENCH_r10_local is uniformly ~1.4x raw — recorded
machine drift, see ROADMAP "Round 11 continuation").

Usage: scripts/bench_diff.py OLD.json NEW.json [--threshold 1.5]
Exit code 1 when any normalized (or raw, if unnormalizable) ratio
exceeds the threshold — usable as a round-gate guard.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag queries whose ratio exceeds this (default 1.5)")
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)

    # queries_min (min over reps) is the steady-state signal; fall back
    # to queries (median) for artifacts that predate the min record.
    oq = old.get("queries_min") or old.get("queries") or {}
    nq = new.get("queries_min") or new.get("queries") or {}

    op, np_ = old.get("cpu_probe_ms"), new.get("cpu_probe_ms")
    probe_ratio = (np_ / op) if (op and np_) else None
    if probe_ratio:
        print(f"cpu probe: {op:.0f} -> {np_:.0f} ms "
              f"(machine ratio {probe_ratio:.2f}; ratios below are normalized)")
    else:
        print("cpu probe absent in one side: ratios are RAW "
              "(machine drift not separated)")
    # IO companion (since r11 session 4): the CPU probe is blind to
    # disk/page-cache drift — a flagged query with a quiet CPU ratio but
    # an inflated IO ratio is shuffle-IO machine drift, not a plan
    # regression (the r11 d4 false positive). Advisory only: ratios
    # below stay CPU-normalized.
    oio, nio = old.get("io_probe_ms"), new.get("io_probe_ms")
    if oio and nio:
        print(f"io probe:  {oio:.0f} -> {nio:.0f} ms "
              f"(io subsystem ratio {nio / oio:.2f}, advisory)")

    flagged = []
    for q in sorted(set(oq) & set(nq)):
        if not oq[q]:
            continue
        raw = nq[q] / oq[q]
        norm = raw / probe_ratio if probe_ratio else raw
        mark = ""
        if norm > args.threshold:
            mark = "  <-- regression?"
            flagged.append(q)
        elif norm < 1 / args.threshold:
            mark = "  (faster)"
        n = f"{norm:.2f}x" + ("" if probe_ratio is None else " norm")
        print(f"  {q:32s} {oq[q]:8.3f} -> {nq[q]:8.3f} s  {n}{mark}")

    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    if only_old:
        print(f"removed queries: {', '.join(only_old)}")
    if only_new:
        print(f"new queries: {', '.join(only_new)}")
    if flagged:
        print(f"FLAGGED ({len(flagged)}): {', '.join(flagged)}")
        sys.exit(1)
    print("no regressions above threshold")


if __name__ == "__main__":
    main()
