#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB correctness gate.

Usage: python3 scripts/oracle_check.py /tmp/verify_out_r3 /root/testdata/sf0.01
Loads each <out>/<query> parquet, runs <out>/oracle_sql.json's SQL in
DuckDB against the sf tables, and compares sorted-by-column-name rows.
"""
import json, sys, math
import duckdb

out, sf = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out}/oracle_sql.json"))
tables = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in tables:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def norm(v):
    if isinstance(v, float):
        # pandas renders parquet NULL doubles as NaN; NaN != NaN would
        # flag byte-equal rows as differing (both engines emit NULL)
        if math.isnan(v):
            return None
        return round(v, 6)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

ok = bad = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
        o_df = con.execute(sql).df()
        s_cols = sorted(spark_df.columns)
        o_cols = sorted(o_df.columns)
        if s_cols != o_cols:
            print(f"FAIL {name}: schema {s_cols} vs {o_cols}")
            bad += 1
            continue
        s_rows = sorted(tuple(norm(v) for v in r) for r in spark_df[s_cols].itertuples(index=False))
        o_rows = sorted(tuple(norm(v) for v in r) for r in o_df[o_cols].itertuples(index=False))
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows {len(s_rows)} vs {len(o_rows)}")
            bad += 1
        elif s_rows != o_rows:
            diff = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            print(f"FAIL {name}: values differ, e.g. {diff}")
            bad += 1
        else:
            ok += 1
    except Exception as e:
        print(f"ERR  {name}: {e}")
        bad += 1
print(f"{ok} OK, {bad} FAIL/ERR (of {len(oracle)} oracled)")
sys.exit(1 if bad else 0)
