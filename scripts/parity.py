#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify's
parquet dumps + oracle_sql.json, run each oracle in DuckDB over the
same sf dir, and compare (rows, schema-by-name, value hash with
column-name sort). Usage: parity.py <sfDir> <verifyOutDir>
"""
import sys, json, duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
tables = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
con = duckdb.connect()
for t in tables:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracles.items()):
    try:
        got = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        want = con.execute(sql).fetchdf()
        g = got.reindex(sorted(got.columns), axis=1)
        w = want.reindex(sorted(want.columns), axis=1)
        status = []
        if list(g.columns) != list(w.columns):
            status.append(f"schema got={list(g.columns)} want={list(w.columns)}")
        if len(g) != len(w):
            status.append(f"rows got={len(g)} want={len(w)}")
        if not status:
            gs = g.astype(str).apply(lambda r: "|".join(r), axis=1)
            ws = w.astype(str).apply(lambda r: "|".join(r), axis=1)
            if sorted(gs) != sorted(ws):
                diff = set(sorted(gs)) ^ (set(sorted(ws)))
                status.append(f"hash ({len(diff)} differing rows, e.g. {list(diff)[:4]})")
        if status:
            fails.append(name)
            print(f"FAIL {name}: {'; '.join(status)[:400]}")
        else:
            print(f"ok   {name} ({len(g)} rows)")
    except Exception as e:
        fails.append(name)
        print(f"ERR  {name}: {str(e)[:300]}")
print(f"\n{len(oracles)-len(fails)}/{len(oracles)} pass")
sys.exit(1 if fails else 0)
