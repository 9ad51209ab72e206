#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against views
named after the parquet tables in <sfDir>, loads the Spark result parquet
from <outDir>/<name>/, sorts columns by name, sorts rows, and compares
values (floats to 1e-9 relative after both sides were already rounded by
the queries themselves). Usage:
    python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def rows_by_sorted_cols(rel):
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(norm_cell(row[i]) for i in order) for row in rel.fetchall()]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql)
            want_cols = sorted(want.columns)
            want_rows = rows_by_sorted_cols(want)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = rows_by_sorted_cols(got)
        except Exception as e:
            print(f"FAIL {name}: spark result missing/unreadable: {str(e)[:200]}")
            n_fail += 1
            continue
        if want_cols != got_cols:
            print(f"FAIL {name}: columns differ: oracle={want_cols} spark={got_cols}")
            n_fail += 1
            continue
        # The driver hashes typed values: a DuckDB HUGEINT (bare sum())
        # vs Spark BIGINT fails its hash even when every value is equal.
        # Mirror that here by requiring the oracle's result types to match
        # the Spark parquet types column-for-column (sorted by name).
        want_types = [str(t) for _, t in
                      sorted(zip(want.columns, want.types), key=lambda p: p[0])]
        got_types = [str(t) for _, t in
                     sorted(zip(got.columns, got.types), key=lambda p: p[0])]
        if want_types != got_types:
            diffs = [f"{c}: oracle={w} spark={g}"
                     for c, w, g in zip(want_cols, want_types, got_types) if w != g]
            print(f"FAIL {name}: column types differ: {'; '.join(diffs)}")
            n_fail += 1
            continue
        if len(want_rows) != len(got_rows):
            print(f"FAIL {name}: row count differs: oracle={len(want_rows)} spark={len(got_rows)}")
            n_fail += 1
            continue
        bad = [(i, w, g) for i, (w, g) in enumerate(zip(want_rows, got_rows)) if w != g]
        if bad:
            i, w, g = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(want_rows)} rows differ; first at {i}:")
            print(f"   oracle: {w}")
            print(f"   spark : {g}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
