#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Runs each oracle SQL from <verifyOutDir>/oracle_sql.json against DuckDB
views over <sfDir>/*.parquet, loads the Spark result parquet the Verify
main dumped, sorts columns by name and rows by all columns, and reports
exact / approximate diffs per query. Driver-side-only tooling (duckdb,
pandas) — not part of the shipped library.
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_bad = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL  {name}: no spark output")
            n_bad += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        got, want = canon(got), canon(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} != "
                  f"{list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
            continue
        bad_cols = []
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                af = a.astype(float)
                bf = b.astype(float)
                if not ((af == bf) | (af.isna() & bf.isna())).all():
                    mx = (af - bf).abs().max()
                    bad_cols.append(f"{c} (float, maxdiff={mx:g})")
            else:
                if not (a.astype(object).where(pd.notna(a), None)
                        .eq(b.astype(object).where(pd.notna(b), None))).all():
                    bad_cols.append(c)
        dt = [f"{c}:{got[c].dtype}!={want[c].dtype}" for c in got.columns
              if str(got[c].dtype) != str(want[c].dtype)]
        if bad_cols:
            print(f"FAIL  {name}: value diff in {bad_cols} dtypes:{dt}")
            n_bad += 1
        else:
            note = f" [dtype: {dt}]" if dt else ""
            print(f"OK    {name}: {len(got)} rows{note}")
    print(f"\n{len(oracle) - n_bad}/{len(oracle)} queries match")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
