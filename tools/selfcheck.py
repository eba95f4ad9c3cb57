#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: loads each query's
parquet dump, runs the corresponding oracle SQL in DuckDB against the same
testdata tables, and compares values exactly (columns sorted by name, rows
sorted by all columns). Exit 0 iff everything matches.
"""
import json
import math
import sys

import duckdb

def canon(df):
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float) and math.isnan(v):
                vals.append("NaN")
            else:
                vals.append(repr(v))
        rows.append(tuple(vals))
    rows.sort()
    return rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
            exp = exp[sorted(exp.columns)]
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            got = got[sorted(got.columns)]
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} oracle={list(exp.columns)}")
            n_bad += 1
            continue
        got_rows, exp_rows = canon(got), canon(exp)
        if got_rows != exp_rows:
            diffs = [(a, b) for a, b in zip(got_rows, exp_rows) if a != b]
            print(f"FAIL {name}: {len(got_rows)} vs {len(exp_rows)} rows, "
                  f"{len(diffs)} differing; first: "
                  f"{diffs[0] if diffs else (got_rows[:1], exp_rows[:1])}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got_rows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
