"""Driver-style self-check: run every __spark_entry__ query against its
DuckDB oracle at a given SF and report row-count / schema / value match.

Usage: python scripts/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def value_repr(df: pd.DataFrame) -> list[tuple]:
    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("check_entry")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows, cols={sorted(sdf.columns)} ({dt:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        s, o = canonical(sdf), canonical(odf)
        ok_rows = len(s) == len(o)
        ok_cols = list(s.columns) == list(o.columns)
        ok_vals = ok_rows and ok_cols and value_repr(s) == value_repr(o)
        status = "OK   " if (ok_rows and ok_cols and ok_vals) else "FAIL "
        if status.startswith("FAIL"):
            failures.append(name)
        print(
            f"{status} {name}: rows {len(s)}/{len(o)} cols_match={ok_cols} "
            f"vals_match={ok_vals} ({dt:.1f}s)"
        )
        if not ok_vals and ok_rows and ok_cols and len(s) > 0:
            sv, ov = value_repr(s), value_repr(o)
            for i, (a, b) in enumerate(zip(sv, ov)):
                if a != b:
                    print(f"      first diff row {i}:\n       spark={a}\n       duck ={b}")
                    break
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
