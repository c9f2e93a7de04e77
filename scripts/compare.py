#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with the sfDir
parquet tables registered as views, and compares: column set, dtypes
(loosely), row count, and exact values after sorting rows and columns.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    n_skip = 0
    for name, sql in sorted(oracle.items()):
        # a SPARK_GRAFT_ONLY-filtered Verify run dumps a subset; compare those
        if not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1
            continue
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL  {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
            continue
        diff_cols = []
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                # null-aware: Series.equals demands identical dtypes (spark
                # writes ns, duckdb us), and object == makes NaT != NaT
                eq = (a.astype("object") == b.astype("object"))
                same = a.equals(b) or (eq | (a.isna() & b.isna())).all()
            except Exception:
                same = False
            if not same:
                diff_cols.append(c)
        if diff_cols:
            print(f"FAIL  {name}: value diff in {diff_cols} "
                  f"(rows={len(got)})")
            for c in diff_cols[:2]:
                neq = (got[c].astype("object") != want[c].astype("object")) \
                    & ~(got[c].isna() & want[c].isna())
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"      [{c}][{i}] spark={got[c][i]!r} duck={want[c][i]!r}")
            n_bad += 1
        else:
            print(f"OK    {name} ({len(got)} rows)")
    n_run = len(oracle) - n_skip
    skipped = f" ({n_skip} not dumped, skipped)" if n_skip else ""
    print(f"{'PASS' if n_bad == 0 else 'FAIL'}: {n_run - n_bad}/{n_run} queries match{skipped}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
