#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/duckcheck.py <sfDir> <verifyOutDir>

For each query in <out>/oracle_sql.json: run the SQL in DuckDB with tables
registered from <sfDir>, load the engine's parquet from <out>/<name>/, sort
columns by name and rows by all columns, and compare cell-by-cell (exact for
non-floats, 1e-9 for floats — the engine rounds float outputs so exact match
is expected; any tolerance hit is reported).
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no engine parquet")
            failures += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
            failures += 1
            continue
        g, e = normalize(got), normalize(exp)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            failures += 1
            continue
        ok = True
        for c in g.columns:
            gv, ev = g[c].values, e[c].values
            if np.issubdtype(g[c].dtype, np.floating) or np.issubdtype(e[c].dtype, np.floating):
                gv = np.asarray(gv, dtype=float); ev = np.asarray(ev, dtype=float)
                both_nan = np.isnan(gv) & np.isnan(ev)
                close = np.isclose(gv, ev, rtol=0, atol=1e-9) | both_nan
                if not close.all():
                    i = int(np.argmin(close))
                    print(f"FAIL {name}: col {c} row {i}: {gv[i]} vs {ev[i]}")
                    ok = False; break
                exact = (gv == ev) | both_nan
                if not exact.all():
                    i = int(np.argmin(exact))
                    print(f"WARN {name}: col {c} float-only-close at row {i}: {gv[i]} vs {ev[i]}")
            else:
                if not (pd.Series(gv).fillna("__N") == pd.Series(ev).fillna("__N")).all():
                    m = (pd.Series(gv).fillna("__N") != pd.Series(ev).fillna("__N"))
                    i = int(np.argmax(m.values))
                    print(f"FAIL {name}: col {c} row {i}: {gv[i]!r} vs {ev[i]!r}")
                    ok = False; break
        if ok:
            print(f"OK   {name}: {len(g)} rows")
        else:
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle queries match")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
