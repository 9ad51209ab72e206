#!/usr/bin/env python3
"""Record the driver fixtures' parquet PHYSICAL schemas (including
logical/converted types) as a diffable per-round artifact.

Why: the round-8 -> round-9 fixture regeneration silently switched
events.ts from TIMESTAMP(NANOS) to TIMESTAMP(MICROS, isAdjustedToUTC
=false), which errored six queries in the round gate and took a round
to triage from stack traces. This fingerprint makes the next drift a
one-line diff: `python3 scripts/fixture_schema.py [sfDir] > FIXTURE_
SCHEMA_r{N}.json` per round, then diff against the prior round's file.

Uses pyarrow (driver-side tooling, same as check_oracle.py).
"""
import json
import sys
from pathlib import Path

import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def table_schema(path: Path):
    """Per-column physical + logical type from the parquet metadata
    (the arrow-level schema hides e.g. isAdjustedToUTC)."""
    meta = pq.ParquetFile(path).metadata
    schema = meta.schema
    cols = []
    for i in range(len(schema)):
        c = schema.column(i)
        cols.append({
            "name": c.path,
            "physical_type": str(c.physical_type),
            "logical_type": str(c.logical_type),
            "converted_type": str(c.converted_type),
        })
    return {"num_rows": meta.num_rows, "columns": cols}


def main():
    sf_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
    out = {"sf_dir": str(sf_dir), "tables": {}}
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            out["tables"][t] = table_schema(p)
        else:
            out["tables"][t] = None
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
