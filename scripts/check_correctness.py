#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracle SQL over the same parquet tables and compare.

Usage: python3 scripts/check_correctness.py <sfDir> <verifyOutDir>
(Driver-side tooling only — the shipped library has no Python dependency.)
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"MISSING  {name}: no spark output")
            n_bad += 1
            continue
        got = pd.concat([pd.read_parquet(p) for p in sorted(files)])
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_bad += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"SCHEMA   {name}: spark={list(g.columns)} duckdb={list(w.columns)}")
            n_bad += 1
            continue
        if len(g) != len(w):
            print(f"ROWS     {name}: spark={len(g)} duckdb={len(w)}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            print(f"OK       {name} ({len(g)} rows)")
            n_ok += 1
        except AssertionError as e:
            print(f"MISMATCH {name}: {str(e).splitlines()[-1][:200]}")
            diff = (g != w) & ~(g.isna() & w.isna())
            bad_rows = diff.any(axis=1)
            print(g[bad_rows].head(3))
            print(w[bad_rows].head(3))
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
