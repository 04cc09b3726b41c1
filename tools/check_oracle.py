#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
Verify output parquet against its DuckDB oracle SQL on the same
testdata, sorting columns by name (like the driver) and rows by all
columns. Usage: check_oracle.py <sfDir> <verifyOutDir> [query...]"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written dir (e.g. ScaleUp output)
            p = os.path.join(p, "*.parquet")
        if glob.glob(p) or os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output at {spark_glob}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{spark_glob}'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:300]}")
            n_fail += 1
            continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns differ\n  spark={gc}\n  duck ={wc}")
            n_fail += 1
            continue
        got = got[gc].sort_values(gc).reset_index(drop=True)
        want = want[wc].sort_values(wc).reset_index(drop=True)
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(want)}")
            n_fail += 1
            continue
        diffs = []
        for c in gc:
            a, b = got[c], want[c]
            # The driver hashes typed values: a *kind* mismatch (e.g.
            # DuckDB HUGEINT sum -> float64/object vs Spark int64) is a
            # hash FAIL even when pandas == says values are equal.
            # Width-only differences (int32 vs int64) hash identically.
            if a.dtype.kind != b.dtype.kind:
                diffs.append(f"col {c}: dtype spark={a.dtype} duck={b.dtype}")
                continue
            try:
                neq = (a != b) & ~(a.isna() & b.isna())
            except Exception:
                neq = a.astype(str) != b.astype(str)
            if neq.any():
                i = neq.idxmax()
                diffs.append(f"col {c}: {int(neq.sum())} diffs, first at row {i}: "
                             f"spark={a[i]!r} duck={b[i]!r}")
        if diffs:
            print(f"FAIL {name} ({len(got)} rows):")
            for d in diffs[:5]:
                print(f"  {d}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
