#!/usr/bin/env python3
"""Dev-only local oracle harness (mirrors the driver's t2 check).

Runs each oracle SQL from `outDir/oracle_sql.json` in DuckDB against the
testdata parquet tables, loads the Spark result parquet for the same query
name, sorts columns by name, and compares row-by-row (strict multiset +
order equality). NOT part of the shipped library — the engine is pure Scala;
this exists so mismatches are caught before the driver runs.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_bad += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
            continue
        g = [tuple(norm_cell(v) for v in row) for row in got.itertuples(index=False)]
        w = [tuple(norm_cell(v) for v in row) for row in want.itertuples(index=False)]
        if g == w:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
        else:
            bad = next(i for i, (a, b) in enumerate(zip(g, w)) if a != b)
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  spark:  {g[bad]}")
            print(f"  duckdb: {w[bad]}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
