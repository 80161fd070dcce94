#!/usr/bin/env python3
"""Dev-only harness: emulate the driver's t2 correctness gate locally.

Usage: python3 tools/localcheck.py <sfdir> <verify_out_dir>
Reads each <verify_out_dir>/<name>/ parquet (graft.Verify output) and compares
against the DuckDB oracle from oracle_sql.json, with columns sorted by name
and rows compared in order. Not part of the engine (driver-side python only).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(os.path.basename(p) for p in glob.glob(f"{outdir}/*") if os.path.isdir(p))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no output parquet"); n_fail += 1; continue
        got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        if name not in oracle:
            print(f"rows {name}: {len(got)} rows (no oracle)"); continue
        try:
            want = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        import numpy as np
        neq = (got.values != want.values)
        # NaN != NaN; treat aligned NaNs (nullable numerics) as equal
        neq = neq & ~(pd.isna(got.values) & pd.isna(want.values))
        if neq.any():
            r, c = np.argwhere(neq)[0]
            print(f"FAIL {name}: first diff row {r} col {got.columns[c]}: "
                  f"spark={got.iloc[r, c]!r} duckdb={want.iloc[r, c]!r} "
                  f"({neq.sum()} cells differ / {neq.size})")
            n_fail += 1; continue
        print(f"PASS {name}: {len(got)} rows"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
