#!/usr/bin/env python
"""Self-check replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` DuckDB
equivalent on the same sf directory, compare row counts, column sets,
and an order-insensitive value hash (columns sorted by name, rows
sorted, floats rounded the way both sides already round).

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from pandas_dq_spark.session import get_spark

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    import datetime

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and isinstance(
                sample.iloc[0], (datetime.date, datetime.datetime)
            ):
                # Spark returns datetime.date where DuckDB returns a
                # midnight Timestamp — comparable once both are datetimes
                df[c] = pd.to_datetime(df[c])
            else:
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_rows_only = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle error {ex}")
            n_fail += 1
            continue
        a, b = norm(sdf), norm(odf)
        ok_rows = len(a) == len(b)
        ok_cols = list(a.columns) == list(b.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
                )
                ok_vals = True
            except AssertionError as ex:
                ok_vals = False
                detail = str(ex).splitlines()[0]
        if ok_rows and ok_cols and ok_vals:
            print(f"pass {name}: {len(a)} rows")
            n_pass += 1
        else:
            print(
                f"FAIL {name}: rows {len(a)}/{len(b)} cols_match={ok_cols} "
                f"vals_match={ok_vals}"
                + (f" [{detail}]" if not ok_vals and ok_rows and ok_cols else "")
            )
            if not ok_cols:
                print(f"  spark cols:  {list(a.columns)}")
                print(f"  oracle cols: {list(b.columns)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} FAIL")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
