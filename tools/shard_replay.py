#!/usr/bin/env python3
"""Sharded DuckDB replay for oracles whose monolithic replay is
disk-bound at sf10 volume (round-13 verdict item 2: q106, q178).

The staged SQL comes from `graft.tools.ShardSqlDump` — generated from
the SAME constants and helper spellings as the monolithic oracle, so
the two cannot drift. Stage kinds:
  once  - statements (split on ';;') executed as-is
  shard - executed NSH times with {S}/{NSH} substituted (each sharded
          stage INSERTs into a pre-created table, bounding DuckDB temp
          to one shard's expansion)
  loop  - statements (split on ';;') repeated until the stage's single
          SELECT returns 0 (the min-label fixpoint that replaces the
          quadratic recursive closure)
The plan's final stage leaves a `want` table; it is compared to the
engine parquet with the same sorted full-value compare as
tools/check_oracle.py.

Usage: tools/shard_replay.py <sfDir> <verifyOutDir> <query> [n_shards]
(run `tools/run.sh graft.Verify <sfDir> <out> <query>` first).
"""
import glob
import json
import os
import subprocess
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir, query = sys.argv[1], sys.argv[2], sys.argv[3]
    nsh = int(sys.argv[4]) if len(sys.argv) > 4 else 30
    here = os.path.dirname(os.path.abspath(__file__))
    plan = json.loads(subprocess.run(
        [os.path.join(here, "run.sh"), "graft.tools.ShardSqlDump", query],
        check=True, capture_output=True, text=True).stdout.strip())
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written dir (ScaleUp fixtures)
            p = os.path.join(p, "*.parquet")
        if glob.glob(p) or os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    for i, st in enumerate(plan["stages"]):
        kind, sql = st["kind"], st["sql"]
        if kind == "once":
            for stmt in sql.split(";;"):
                con.execute(stmt)
            print(f"stage {i + 1}: once done")
        elif kind == "shard":
            for s in range(nsh):
                con.execute(sql.replace("{NSH}", str(nsh))
                               .replace("{S}", str(s)))
            print(f"stage {i + 1}: {nsh} shards done")
        elif kind == "loop":
            it = 0
            while True:
                it += 1
                changed = None
                for stmt in sql.split(";;"):
                    if stmt.strip().upper().startswith("SELECT"):
                        changed = con.sql(stmt).fetchone()[0]
                    else:
                        con.execute(stmt)
                if changed == 0:
                    break
            print(f"stage {i + 1}: loop converged after {it} iterations")
        else:
            raise ValueError(f"unknown stage kind {kind}")

    want = con.sql("SELECT * FROM want").df()
    got = con.sql(f"SELECT * FROM '{out_dir}/{query}/*.parquet'").df()
    gc, wc = sorted(got.columns), sorted(want.columns)
    assert gc == wc, (gc, wc)
    got = got[gc].sort_values(gc).reset_index(drop=True)
    want = want[wc].sort_values(wc).reset_index(drop=True)
    assert len(got) == len(want), (len(got), len(want))
    for c in gc:
        a, b = got[c], want[c]
        assert a.dtype.kind == b.dtype.kind, (c, a.dtype, b.dtype)
        neq = (a != b) & ~(a.isna() & b.isna())
        assert not neq.any(), \
            (c, int(neq.sum()), a[neq.idxmax()], b[neq.idxmax()])
    print(f"PASS {query} ({len(got)} rows)")


if __name__ == "__main__":
    main()
