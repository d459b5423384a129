#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage:
    python3 tools/check.py [SF_DIR] [VERIFY_OUT]

Reads each SparkEntry query result (parquet written by `graft.Verify`)
and the dumped oracle_sql.json, runs every oracle in DuckDB over the
same testdata parquet, then compares BIT-EXACTLY:
    - schema (column names, sorted)
    - row count
    - cell values after sorting columns by name and rows canonically.
      Decimals compare as exact decimal.Decimal (scale included),
      floats compare by IEEE bits (struct.pack), no float coercion
      anywhere. This is strictly stricter than any plausible driver
      hash — local green implies driver green.

Round-1 lesson: the previous version round-tripped through pandas
fetchdf() and float()-coerced Decimals, which collapsed exactly the
double-vs-decimal differences the driver's hash detects (17 false
greens). fetchall() keeps Decimal objects exact.

Dev tooling only — the shipped Scala library has no Python dependency.
"""
import datetime
import decimal
import glob
import json
import math
import os
import struct
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for f in sorted(glob.glob(f"{SF}/*.parquet")):
    name = os.path.basename(f)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

with open(f"{OUT}/oracle_sql.json") as fh:
    oracles = json.load(fh)


def canon(v):
    """Canonical, order-defining, exactness-preserving rendering."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return "f:" + struct.pack(">d", v).hex()  # IEEE bit-exact
    if isinstance(v, decimal.Decimal):
        return "d:" + str(v)  # exact digits AND scale
    if isinstance(v, (datetime.datetime, datetime.date)):
        return "t:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "b:" + v.hex()
    return f"{type(v).__name__}:{v!r}"


def fetch_sorted(cur):
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    rows_sorted = sorted(
        (tuple(r[i] for i in order) for r in rows),
        key=lambda r: tuple(canon(v) for v in r),
    )
    return cols_sorted, rows_sorted


def driver_sim_mismatch(spark_parts, oracle_sql):
    """Simulate the driver's asymmetric rendering: Spark parquet read
    preserves DECIMAL scale ('147196.00'); the oracle side goes
    through float64 (shortest repr, '147196.0'). Any cell whose
    canonical string differs between those two renderings is a driver
    hash mismatch even when the values are numerically equal — this
    model reproduced round 1's red set 54/54. Empirically: emit NO
    DECIMAL columns from Spark and the two renderings coincide."""
    import pandas as pd

    sdf = pd.read_parquet(spark_parts[0]) if len(spark_parts) == 1 else pd.concat(
        [pd.read_parquet(p) for p in spark_parts]
    )
    odf = con.execute(oracle_sql).fetchdf()

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if v is pd.NaT:
            return "NULL"
        return str(v)

    def frame(df):
        cols = sorted(df.columns)
        rows = sorted(
            tuple(cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)
        )
        return cols, rows

    sc, sr = frame(sdf)
    oc, orw = frame(odf)
    if sc != oc:
        return f"driver-sim SCHEMA spark={sc} oracle={oc}"
    if len(sr) != len(orw):
        return f"driver-sim ROWS {len(sr)} vs {len(orw)}"
    for i, (a, b) in enumerate(zip(sr, orw)):
        if a != b:
            diff = [(c, x, y) for c, x, y in zip(sc, a, b) if x != y]
            return f"driver-sim VALUE row={i} {diff[:3]}"
    return None


n_ok = n_bad = 0
results = {}
# enumerate the UNION of produced outputs and declared oracles: an
# oracle whose output dir is missing (Verify died partway, or the
# output got mangled) must FAIL, not silently vanish from the report
out_dirs = {
    os.path.basename(p) for p in glob.glob(f"{OUT}/*") if os.path.isdir(p)
}
names = sorted(out_dirs | set(oracles.keys()))
for name in names:
    if ONLY and name not in ONLY:
        continue
    spark_parts = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not spark_parts:
        results[name] = "NO_SPARK_OUTPUT"
        n_bad += 1
        continue
    scols, srows = fetch_sorted(
        con.execute("SELECT * FROM read_parquet(?)", [spark_parts])
    )
    if name not in oracles:
        results[name] = f"ROWS_ONLY rows={len(srows)}"
        n_ok += 1
        continue
    try:
        ocols, orows = fetch_sorted(con.execute(oracles[name]))
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR {e}"
        n_bad += 1
        continue
    if scols != ocols:
        results[name] = f"SCHEMA_MISMATCH spark={scols} oracle={ocols}"
        n_bad += 1
        continue
    if len(srows) != len(orows):
        results[name] = f"ROWCOUNT_MISMATCH spark={len(srows)} oracle={len(orows)}"
        n_bad += 1
        continue
    # per-column mismatch accounting for diagnosis
    col_bad = {c: 0 for c in scols}
    examples = {}
    for sr, orow in zip(srows, orows):
        for ci, c in enumerate(scols):
            if canon(sr[ci]) != canon(orow[ci]):
                col_bad[c] += 1
                if c not in examples:
                    examples[c] = (sr[ci], orow[ci])
    bad_cols = {c: n for c, n in col_bad.items() if n}
    if bad_cols:
        det = "; ".join(
            f"{c}×{n} e.g. spark={examples[c][0]!r} oracle={examples[c][1]!r}"
            for c, n in bad_cols.items()
        )
        results[name] = f"VALUE_MISMATCH {det}"
        n_bad += 1
        continue
    sim = driver_sim_mismatch(spark_parts, oracles[name])
    if sim:
        results[name] = sim
        n_bad += 1
    else:
        results[name] = f"OK rows={len(srows)}"
        n_ok += 1

for name in sorted(results):
    status = results[name]
    flag = "PASS" if status.startswith(("OK", "ROWS_ONLY")) else "FAIL"
    print(f"[{flag}] {name}: {status}")
print(f"\n{n_ok} pass, {n_bad} fail")
sys.exit(1 if n_bad else 0)
