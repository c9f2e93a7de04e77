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
import pyarrow as pa
import pyarrow.dataset as pa_ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_type(t: pa.DataType) -> str:
    """Arrow type → comparison key, tuned against CORRECTNESS_r03 ground
    truth: the driver's typed hash tolerates integer WIDTH drift (int8…64,
    22 green queries carry int32-vs-int64 columns), date-vs-timestamp
    (conversion_funnel is green), string widths, and list wrappers — but
    NOT DuckDB HUGEINT/DECIMAL where Spark wrote an integer (all 9 r3
    hash-fails), and we assume not int-vs-float either."""
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "datetime"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_type(t.value_type)}>"
    return str(t)


def type_diffs(spark_schema: pa.Schema, duck_schema: pa.Schema):
    """Per-column normalized-type mismatches between the Spark parquet dump
    and the DuckDB oracle result (matched by name; missing columns are
    reported by the column check, not here)."""
    duck = {f.name: f.type for f in duck_schema}
    out = []
    for f in spark_schema:
        if f.name in duck:
            a, b = norm_type(f.type), norm_type(duck[f.name])
            if a != b:
                out.append(f"{f.name}: spark={a} duck={b}")
    return out


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
            spark_tbl = pa_ds.dataset(f"{out_dir}/{name}", format="parquet").to_table()
            duck_tbl = con.sql(sql).arrow()
            got = spark_tbl.to_pandas()
            want = duck_tbl.to_pandas()
            # date-vs-timestamp is type-tolerated (see norm_type); align the
            # VALUE representation too so midnight timestamps equal dates
            for tbl, df in ((spark_tbl, got), (duck_tbl, want)):
                for f in tbl.schema:
                    if norm_type(f.type) == "datetime":
                        df[f.name] = pd.to_datetime(df[f.name])
            got, want = canon(got), canon(want)
        except Exception as e:
            print(f"FAIL  {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
            continue
        # the driver hashes raw-TYPED values: a DuckDB HUGEINT column with
        # values identical to Spark's BIGINT still hash-fails there, so any
        # normalized arrow-type drift is a failure here too (round-3 lesson)
        tdiff = type_diffs(spark_tbl.schema, duck_tbl.schema)
        if tdiff:
            print(f"FAIL  {name}: TYPE drift {tdiff}")
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
