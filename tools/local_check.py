#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet against DuckDB oracle results (sort columns by name, sort rows,
compare values). Usage: local_check.py <sfdir> <verify_out_dir> [query...]"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = canon(con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df())
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(want)}")
            n_fail += 1
            continue
        mism = None
        for c in got.columns:
            ga, wa = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(ga, wa)):
                if not values_equal(x, y):
                    mism = (c, i, x, y)
                    break
            if mism:
                break
        if mism:
            c, i, x, y = mism
            print(f"FAIL {name}: value col={c} row={i} spark={x!r} duck={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(oracle)} oracle queries")
    # gate semantics for callers (graft.Verify --adversarial): any
    # mismatch — or an empty sweep, which would mask a dump failure —
    # is a nonzero exit
    if n_fail > 0 or n_pass == 0:
        sys.exit(1)

if __name__ == "__main__":
    main()
