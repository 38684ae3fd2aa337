#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: load the Spark parquet result,
run the oracle SQL in DuckDB (tables = views over the sf parquet), sort
columns by name, sort rows, compare values. Dev-only tool (not part of
the Scala library).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize: floats rounded, everything to str
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        # sort part files: glob order is filesystem-arbitrary, and the
        # ordered compare below relies on the query's total order being
        # preserved across files (Verify writes coalesce(1), but stay
        # robust if that ever changes)
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"[MISS] {name}: no spark result"); n_bad += 1; continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            exp = norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}"); n_bad += 1; continue
        # ordered compare on the sorted-column frame
        ok_cols = list(got.columns) == list(exp.columns)
        g = got.astype(str).values.tolist()
        x = exp.astype(str).values.tolist()
        if ok_cols and g == x:
            print(f"[OK]   {name}: {len(g)} rows"); n_ok += 1
        else:
            print(f"[FAIL] {name}: cols {list(got.columns)} vs {list(exp.columns)}; "
                  f"rows {len(g)} vs {len(x)}")
            if ok_cols:
                for i, (a, b) in enumerate(zip(g, x)):
                    if a != b:
                        print(f"   first diff at row {i}: spark={a} duck={b}"); break
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
