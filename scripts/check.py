#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
SparkEntry.queries parquet dump against its DuckDB oracle (sorted rows,
columns sorted by name). Usage: check.py [sfDir] [outDir]"""
import sys, os, json, math
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    pq = f"{out}/{name}"
    if not os.path.isdir(pq):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}"); fails += 1; continue
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); fails += 1; continue
    gs = g.sort_values(list(g.columns)).reset_index(drop=True)
    ws = w.sort_values(list(w.columns)).reset_index(drop=True)
    eq = True
    for c in g.columns:
        a, b = gs[c], ws[c]
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            same = all((math.isnan(x) and math.isnan(y)) or x == y
                       for x, y in zip(a.astype(float), b.astype(float)))
        else:
            same = a.astype(str).equals(b.astype(str))
        if not same:
            bad = [(i, gs[c][i], ws[c][i]) for i in range(len(gs))
                   if str(gs[c][i]) != str(ws[c][i])][:3]
            print(f"FAIL {name}: column {c} differs, e.g. {bad}")
            eq = False; fails += 1; break
    if eq:
        print(f"OK   {name}: {len(g)} rows")
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
