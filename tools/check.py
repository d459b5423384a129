#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage:
    python3 tools/check.py [SF_DIR] [VERIFY_OUT]

Reads each SparkEntry query result (parquet written by `graft.Verify`)
and the dumped oracle_sql.json, runs every oracle in DuckDB over the
same testdata parquet, then compares:
    - schema (column names, sorted)
    - row count
    - exact cell values after sorting columns by name and rows by all
      columns (strictest plausible interpretation of the driver's
      hash-compare)

Dev tooling only — the shipped Scala library has no Python dependency.
"""
import duckdb
import glob
import json
import math
import os
import sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for f in sorted(glob.glob(f"{SF}/*.parquet")):
    name = os.path.basename(f)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

with open(f"{OUT}/oracle_sql.json") as fh:
    oracles = json.load(fh)

def normalize(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

n_ok = n_bad = 0
results = {}
names = sorted(set(os.path.basename(p) for p in glob.glob(f"{OUT}/*") if os.path.isdir(p)))
for name in names:
    spark_parts = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not spark_parts:
        results[name] = "NO_SPARK_OUTPUT"
        n_bad += 1
        continue
    sdf = con.execute(
        "SELECT * FROM read_parquet(?)", [spark_parts]).fetchdf()
    if name not in oracles:
        results[name] = f"ROWS_ONLY rows={len(sdf)}"
        n_ok += 1
        continue
    try:
        odf = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR {e}"
        n_bad += 1
        continue
    s, o = normalize(sdf), normalize(odf)
    if list(s.columns) != list(o.columns):
        results[name] = f"SCHEMA_MISMATCH spark={list(s.columns)} oracle={list(o.columns)}"
        n_bad += 1
        continue
    if len(s) != len(o):
        results[name] = f"ROWCOUNT_MISMATCH spark={len(s)} oracle={len(o)}"
        n_bad += 1
        continue
    bad = None
    for col in s.columns:
        sv, ov = list(s[col]), list(o[col])
        for i, (x, y) in enumerate(zip(sv, ov)):
            # pandas NaN/None normalization
            xn = None if (x is None or (isinstance(x, float) and math.isnan(x))) else x
            yn = None if (y is None or (isinstance(y, float) and math.isnan(y))) else y
            if isinstance(xn, float) or isinstance(yn, float):
                try:
                    xn = float(xn) if xn is not None else None
                    yn = float(yn) if yn is not None else None
                except (TypeError, ValueError):
                    pass
            if not cells_equal(xn, yn):
                bad = f"VALUE_MISMATCH col={col} row={i} spark={x!r} oracle={y!r}"
                break
        if bad:
            break
    if bad:
        results[name] = bad
        n_bad += 1
    else:
        results[name] = f"OK rows={len(s)}"
        n_ok += 1

for name in sorted(results):
    status = results[name]
    flag = "PASS" if status.startswith(("OK", "ROWS_ONLY")) else "FAIL"
    print(f"[{flag}] {name}: {status}")
print(f"\n{n_ok} pass, {n_bad} fail")
sys.exit(1 if n_bad else 0)
