#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Runs each SQL in <verifyOutDir>/oracle_sql.json against DuckDB with the
parquet tables of <sfDir> registered by name, loads the Spark result
parquet from <verifyOutDir>/<query>/, and compares:
  - row count
  - column names (sorted)
  - values: columns sorted by name, rows sorted by all columns, exact
    equality (doubles compared bit-exactly, like a hash would)
Prints one line per query plus a summary; exits nonzero on any mismatch.
"""
import datetime
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(table):
    """arrow table -> (sorted column names, sorted list of row tuples)"""
    cols = sorted(table.column_names)
    pydict = {c: table.column(c).to_pylist() for c in cols}
    n = table.num_rows
    rows = []
    for i in range(n):
        row = []
        for c in cols:
            v = pydict[c][i]
            if isinstance(v, datetime.datetime) and v.tzinfo is not None:
                # Spark writes tz-adjusted timestamps, DuckDB naive UTC —
                # normalize (the real driver may NOT; prefer string/epoch
                # output columns in queries)
                v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
            if isinstance(v, float):
                # bit-exact: NaN canonicalized, -0.0 != 0.0 kept distinct
                v = ("f", math.nan if math.isnan(v) else v.hex())
            elif isinstance(v, list):
                v = ("l", tuple(map(str, v)))
            else:
                v = (type(v).__name__, str(v))
            row.append(v)
        rows.append(tuple(row))
    rows.sort()
    return cols, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    failures = []
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"[MISS] {name}: no Spark output at {spark_dir}")
            failures.append(name)
            continue
        try:
            want = con.sql(sql).arrow()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            failures.append(name)
            continue
        got = pq.read_table(spark_dir)
        wc, wr = canon(want)
        gc, gr = canon(got)
        if wc != gc:
            print(f"[SCHEMA] {name}: duckdb cols {wc} != spark cols {gc}")
            failures.append(name)
        elif len(wr) != len(gr):
            print(f"[ROWS] {name}: duckdb {len(wr)} != spark {len(gr)}")
            failures.append(name)
        elif wr != gr:
            bad = next(i for i, (a, b) in enumerate(zip(wr, gr)) if a != b)
            print(f"[VALUES] {name}: first diff at sorted row {bad}:")
            print(f"   duckdb: {wr[bad]}")
            print(f"   spark : {gr[bad]}")
            failures.append(name)
        else:
            # flag cross-engine type drift even when str() values match
            wt = {f.name: str(f.type) for f in want.schema}
            gt = {f.name: str(f.type) for f in got.schema}
            drift = {c: (wt[c], gt[c]) for c in wt if wt[c] != gt[c]}
            note = f"  (type drift: {drift})" if drift else ""
            print(f"[OK] {name}: {len(gr)} rows{note}")
    # queries registered WITHOUT an oracle (non-SQL-expressible, e.g. the
    # HLL sketch) get the driver's weaker rows-only check: output exists
    # and has rows
    rows_only = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)) and d not in oracle)
    for name in rows_only:
        try:
            n = pq.read_table(os.path.join(out_dir, name)).num_rows
        except Exception as e:
            n = -1
            print(f"[ROWS-ONLY-ERR] {name}: {e}")
        if n > 0:
            print(f"[ROWS-ONLY] {name}: {n} rows (no oracle)")
        else:
            print(f"[ROWS-ONLY-FAIL] {name}: {n} rows")
            failures.append(name)
    print(f"\n{len(oracle) - len([f for f in failures if f in oracle])}"
          f"/{len(oracle)} queries match"
          + (f"; {len(rows_only)} rows-only checked" if rows_only else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
