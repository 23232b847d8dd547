#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query in
outDir, run the oracle SQL in DuckDB over the sfDir parquet tables and
compare (schema-insensitively: columns sorted by name, rows sorted,
values compared with exact equality; floats compared exactly to catch
any accumulation-order drift early).

Usage: check_oracle.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

with open(os.path.join(outdir, "oracle_sql.json")) as f:
    oracles = json.load(f)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # arrays/lists are unhashable for sorting -- stringify them
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     hasattr(v, "__array__") and not isinstance(v, (str, bytes))
                     ).any():
            df[c] = df[c].map(lambda v: str(list(v)) if v is not None else None)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = []
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    got = pd.read_parquet(d)
    if name not in oracles:
        print(f"{name:24s} NO-ORACLE rows={len(got)}")
        continue
    want = con.execute(oracles[name]).fetchdf()
    g, w = canon(got), canon(want)
    ok_cols = list(g.columns) == list(w.columns)
    ok_rows = len(g) == len(w)
    status = "OK"
    if not ok_cols:
        status = f"COLS got={list(g.columns)} want={list(w.columns)}"
    elif not ok_rows:
        status = f"ROWS got={len(g)} want={len(w)}"
    else:
        try:
            # exact compare after normalizing dtypes via astype(object)
            import numpy as np
            for c in g.columns:
                gv, wv = g[c].to_numpy(), w[c].to_numpy()
                if np.issubdtype(g[c].dtype, np.floating) or np.issubdtype(w[c].dtype, np.floating):
                    if not np.allclose(gv.astype(float), wv.astype(float), rtol=0, atol=0, equal_nan=True):
                        bad = np.where(gv.astype(float) != wv.astype(float))[0][:3]
                        status = f"VAL col={c} rows={bad.tolist()} got={gv[bad].tolist()} want={wv[bad].tolist()}"
                        break
                else:
                    if not (pd.Series(gv).astype(str).equals(pd.Series(wv).astype(str))):
                        neq = (pd.Series(gv).astype(str) != pd.Series(wv).astype(str))
                        bad = neq[neq].index[:3].tolist()
                        status = f"VAL col={c} rows={bad} got={[gv[i] for i in bad]} want={[wv[i] for i in bad]}"
                        break
        except Exception as e:
            status = f"ERR {e}"
    if status != "OK":
        fails.append(name)
    print(f"{name:24s} {status}  rows={len(got)}")

print(f"\n{'FAIL: ' + ', '.join(fails) if fails else 'ALL OK'}")
sys.exit(1 if fails else 0)
