#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>.parquet under verifyOutDir (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB against the same
tables, and compares: row count, column names/order-insensitive, and exact
values after sorting columns by name and rows by all columns.

Oracles have a LATENCY CONTRACT, same as engine plans: each oracle's DuckDB
wall-time is printed, and any oracle slower than ORACLE_BUDGET_SEC (default
10 s, env-overridable) FAILS the check even when its values match — a slow
oracle can blow the driver's whole gate (round 5: q497 at >7 min left
CORRECTNESS_r05.json empty). Rule of thumb: no oracle may re-evaluate an
expression ladder per recursive step; hoist LUTs/ladders into non-recursive
CTE columns and compute each derived value once via nested derived tables.
"""
import json
import math
import os
import sys
import time

import duckdb
import pyarrow.parquet as pq

BUDGET_SEC = float(os.environ.get("ORACLE_BUDGET_SEC", "10"))

# Legacy slow tier: q382's oracle carries a genuine 2,400-step serial
# recursion (~12 s after its CTEs were MATERIALIZED) and keeps a wider
# ceiling. The other four former members (q122/q134/q135/q169) were
# cured by the same fix — DuckDB inlines multiply-referenced CTEs, so
# an iterative chain re-ran its whole upstream per round (q122's
# double n$prev reference was 2^rounds) — and now meet the default
# budget with two orders of magnitude to spare; their exemptions are
# gone so a regression cannot hide under an old ceiling.
LEGACY_BUDGET_SEC = {
    "q382_pack_planner": 45.0,
}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(tbl, exact_decimals=False):
    """pyarrow Table -> (sorted col names, sorted canonical rows).

    exact_decimals=False mirrors the DRIVER's hasher (decimals through
    float); True renders decimals as exact normalized strings — used only
    by the secondary masking tripwire below, never for the verdict.
    """
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
                # Mirror the DRIVER's hasher, which canonicalizes any
                # decimal-typed cell THROUGH FLOAT ("305911" -> "305911.0").
                # Round 6 lesson: str(v.normalize()) made a DECIMAL(38,0)
                # oracle column hash-equal to a Spark BIGINT locally while
                # the driver flagged it — every integral oracle output
                # column must be CAST(... AS BIGINT) in its final
                # projection, and this canon keeps the local gate honest.
                row.append(str(v.normalize()) if exact_decimals
                           else repr(float(v)))
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
    slow = []
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
            t0 = time.monotonic()
            duck_tbl = con.sql(oracle[name]).arrow()
            oracle_sec = time.monotonic() - t0
        except Exception as e:
            failures.append(name)
            print(f"✗ {name}: oracle SQL failed: {e}")
            continue
        budget = LEGACY_BUDGET_SEC.get(name, BUDGET_SEC)
        # Self-defense against machine noise (the same policy Bench
        # applies to suspect regressions): the sandbox shows sustained
        # multi-minute load spikes that inflate wall-clock 5x (q253 read
        # 20.1s in one gate pass and 3.8-5.1s isolated; q496 failed one
        # pass at >10s and re-ran at 2.9s). An over-budget reading gets
        # up to two re-timings with a settling pause; the verdict is the
        # MIN — a genuinely slow oracle is slow every time.
        retries = 0
        while oracle_sec > budget and retries < 2:
            time.sleep(2.0)
            t0 = time.monotonic()
            con.sql(oracle[name]).arrow()
            oracle_sec = min(oracle_sec, time.monotonic() - t0)
            retries += 1
        slow.append((oracle_sec, name))
        if oracle_sec > budget:
            failures.append(name)
            print(f"✗ {name}: ORACLE OVER BUDGET — {oracle_sec:.1f}s "
                  f"min of {retries + 1} (budget {budget:.0f}s); a slow "
                  f"oracle can blow the driver's gate even when values "
                  f"match")
            continue
        sc, sr = canon(spark_tbl)
        dc, dr = canon(duck_tbl)
        # Type-drift tripwire: a DECIMAL/float oracle column whose Spark
        # twin is integral WILL fail the driver's hash even when every
        # value matches (round-6 q262/q400/q416/q461/q504). Name the
        # drifting columns so the fix (CAST ... AS BIGINT in the oracle's
        # final projection) is obvious.
        import pyarrow.types as pt
        for c in sc:
            if c not in duck_tbl.column_names:
                continue
            dt = duck_tbl.schema.field(c).type
            st = spark_tbl.schema.field(c).type
            if (pt.is_decimal(dt) or pt.is_floating(dt)) \
                    and pt.is_integer(st):
                print(f"  ⚠ {name}.{c}: oracle type {dt} vs spark {st} — "
                      f"CAST the oracle column AS BIGINT")
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
            # Masking tripwire (r7 advice): the float canon collapses
            # decimals beyond 2^53, so two genuinely different DECIMAL
            # cells can compare equal above. When BOTH sides carry a
            # decimal column, re-compare with exact decimal rendering and
            # warn if float-canon equality masked a real difference —
            # driver parity keeps this a warning, not a verdict.
            both_dec = [c for c in sc if c in duck_tbl.column_names
                        and pt.is_decimal(duck_tbl.schema.field(c).type)
                        and pt.is_decimal(spark_tbl.schema.field(c).type)]
            if both_dec:
                _, sxr = canon(spark_tbl, exact_decimals=True)
                _, dxr = canon(duck_tbl, exact_decimals=True)
                if sxr != dxr:
                    i = next(j for j, (a, b) in enumerate(zip(sxr, dxr))
                             if a != b)
                    print(f"  ⚠ {name}: float-canon equality MASKS an "
                          f"exact decimal difference (cols {both_dec}); "
                          f"first at row {i}:")
                    print(f"    spark: {sxr[i]}")
                    print(f"    duck : {dxr[i]}")
            print(f"✓ {name}: {len(sr)} rows match"
                  + (f" [oracle {oracle_sec:.1f}s]" if oracle_sec >= 1 else ""))
    print()
    if slow:
        print("slowest oracles (budget {:.0f}s):".format(BUDGET_SEC))
        for sec, name in sorted(slow, reverse=True)[:10]:
            budget = LEGACY_BUDGET_SEC.get(name, BUDGET_SEC)
            flag = " ← OVER BUDGET" if sec > budget else (
                " [legacy budget]" if name in LEGACY_BUDGET_SEC else "")
            print(f"  {sec:6.2f}s  {name}{flag}")
        print()
    if failures:
        print(f"FAILED: {len(failures)} queries: {failures}")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
