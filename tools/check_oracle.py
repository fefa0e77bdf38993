#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>.parquet under verifyOutDir (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB against the same
tables, and compares: row count, column names/order-insensitive, and exact
values after sorting columns by name and rows by all columns.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(tbl):
    """pyarrow Table -> (sorted col names, sorted canonical rows)."""
    import decimal, datetime
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    rows = []
    for rec in tbl.to_pylist():
        row = []
        for c in cols:
            v = rec[c]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("NULL")
            elif isinstance(v, float):
                row.append(repr(v))
            elif isinstance(v, decimal.Decimal):
                row.append(str(v.normalize()))
            elif isinstance(v, (datetime.datetime, datetime.date)):
                row.append(v.isoformat())
            elif isinstance(v, bytes):
                row.append(v.hex())
            else:
                row.append(str(v))
        rows.append(tuple(row))
    rows.sort()
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    import glob
    import os
    got_dirs = sorted(
        d for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d))
    for d in got_dirs:
        name = os.path.basename(d)
        files = glob.glob(f"{d}/*.parquet")
        spark_tbl = pq.ParquetDataset(files).read()
        if name not in oracle:
            print(f"  {name}: rows-only check — {len(spark_tbl)} rows "
                  f"{'OK' if len(spark_tbl) >= 0 else ''}")
            continue
        try:
            duck_tbl = con.sql(oracle[name]).arrow()
        except Exception as e:
            failures.append(name)
            print(f"✗ {name}: oracle SQL failed: {e}")
            continue
        sc, sr = canon(spark_tbl)
        dc, dr = canon(duck_tbl)
        if sc != dc:
            failures.append(name)
            print(f"✗ {name}: column mismatch spark={sc} duck={dc}")
            continue
        if len(sr) != len(dr):
            failures.append(name)
            print(f"✗ {name}: row count spark={len(sr)} duck={len(dr)}")
            continue
        bad = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
        if bad:
            failures.append(name)
            i = bad[0]
            print(f"✗ {name}: {len(bad)} differing rows; first at {i}:")
            print(f"    cols : {sc}")
            print(f"    spark: {sr[i]}")
            print(f"    duck : {dr[i]}")
        else:
            print(f"✓ {name}: {len(sr)} rows match")
    print()
    if failures:
        print(f"FAILED: {len(failures)} queries: {failures}")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
