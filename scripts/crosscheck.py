#!/usr/bin/env python3
"""Dev-side oracle cross-check: run Verify's parquet dumps against the
DuckDB oracle SQL, mimicking the driver's compare (columns sorted by name,
row multisets compared). Usage: crosscheck.py <sfDir> <verifyOutDir>
"""
import sys, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name:20s} MISSING spark output"); fail += 1; continue
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name:20s} ORACLE ERROR: {str(e)[:120]}"); fail += 1; continue
    got = pd.concat([pd.read_parquet(f) for f in files])
    gs = got.reindex(sorted(got.columns), axis=1)
    ws = want.reindex(sorted(want.columns), axis=1)
    if sorted(gs.columns) != sorted(ws.columns):
        print(f"{name:20s} SCHEMA MISMATCH got={sorted(gs.columns)} want={sorted(ws.columns)}")
        fail += 1; continue
    try:
        ws = ws.astype(gs.dtypes.to_dict())
    except Exception:
        pass
    key = list(gs.columns)
    g = gs.sort_values(key).reset_index(drop=True)
    w = ws.sort_values(key).reset_index(drop=True)
    if len(g) != len(w):
        print(f"{name:20s} ROWS got={len(g)} want={len(w)}"); fail += 1; continue
    eq = g.equals(w)
    if not eq:
        diffmask = ~(g == w) & ~(g.isna() & w.isna())
        ndiff = int(diffmask.any(axis=1).sum())
        print(f"{name:20s} VALUES differ in {ndiff}/{len(g)} rows")
        bad = diffmask.any(axis=1)
        print(pd.concat([g[bad].head(3).add_prefix("got_"),
                         w[bad].head(3).add_prefix("want_")], axis=1).to_string())
        fail += 1
    else:
        print(f"{name:20s} OK ({len(g)} rows)")
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
