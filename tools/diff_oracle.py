#!/usr/bin/env python3
"""Per-query value diff: Spark verify output (parquet) vs DuckDB oracle.

Usage: python3 tools/diff_oracle.py <verify_out_dir> <sf_dir> [query ...]

For each query with an oracle in <verify_out_dir>/oracle_sql.json, runs the
oracle SQL in DuckDB against the sf_dir parquet tables, sorts both results by
all columns (by name), and prints the first mismatching cell with full
precision plus both types. This is a dev harness (python/duckdb are
driver-side tools, not part of the Scala library).
"""
import json, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_bad = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        try:
            s = con.sql(f"SELECT * FROM '{spark_glob}'").df()
            o = con.sql(sql).df()
        except Exception as e:
            print(f"{name}: ERROR {e}")
            n_bad += 1
            continue
        s = s.reindex(sorted(s.columns), axis=1)
        o = o.reindex(sorted(o.columns), axis=1)
        if list(s.columns) != list(o.columns):
            print(f"{name}: COLS spark={list(s.columns)} oracle={list(o.columns)}")
            n_bad += 1
            continue
        if len(s) != len(o):
            print(f"{name}: ROWS spark={len(s)} oracle={len(o)}")
            n_bad += 1
            continue
        cols = list(s.columns)
        s = s.sort_values(cols, ignore_index=True)
        o = o.sort_values(cols, ignore_index=True)
        bad = None
        for c in cols:
            sv, ov = s[c], o[c]
            # compare as rendered strings — that's what a hash-compare sees
            ss = sv.map(render)
            os_ = ov.map(render)
            neq = ss != os_
            if neq.any():
                i = int(neq.idxmax())
                bad = (c, i, ss[i], os_[i], str(sv.dtype), str(ov.dtype))
                break
        if bad:
            c, i, a, b, ta, tb = bad
            print(f"{name}: DIFF col={c} row={i} spark={a!r}({ta}) oracle={b!r}({tb})")
            n_bad += 1
        else:
            print(f"{name}: OK ({len(s)} rows)")
    print(f"-- {n_bad} queries differ")
    sys.exit(1 if n_bad else 0)


def render(v):
    if v is None:
        return "NULL"
    try:
        import math
        if isinstance(v, float) and math.isnan(v):
            return "NULL"
    except Exception:
        pass
    if isinstance(v, float):
        return repr(v)
    return str(v)


if __name__ == "__main__":
    main()
