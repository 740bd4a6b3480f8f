"""Self-check harness: replicate the driver's Spark-vs-DuckDB compare.

For every query in ``__spark_entry__.queries()`` with an oracle, run
both engines at the given scale factor and compare row count, column
names/dtypes, and an order-insensitive value multiset (columns sorted
by name, rows sorted by all columns). Reports per-query PASS/FAIL with
a diff preview so mismatches are debuggable before the driver runs.

Usage: python tools/selfcheck.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_pipeline_gcp_spark.schemas import TESTDATA_TABLES  # noqa: E402
from spotify_pipeline_gcp_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[ns]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        if str(s[c].dtype) != str(d[c].dtype):
            problems.append(f"dtype[{c}] spark={s[c].dtype} duck={d[c].dtype}")
    if problems:
        return problems
    if len(s) == len(d):
        for c in s.columns:
            if pd.api.types.is_float_dtype(s[c]):
                eq = (s[c].fillna(-1e308) - d[c].fillna(-1e308)).abs() <= 0
            else:
                eq = s[c].fillna("__n__").eq(d[c].fillna("__n__")) if s[c].dtype == object else s[c].fillna(-1).eq(d[c].fillna(-1))
            if not bool(eq.all()):
                bad = (~eq).idxmax()
                problems.append(
                    f"values[{c}]: {int((~eq).sum())} diffs, first at sorted-row {bad}: "
                    f"spark={s[c][bad]!r} duck={d[c][bad]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failed.append(name)
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            passed.append(name)
            print(f"PASS  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")

    print(
        f"\n{len(passed)} passed, {len(failed)} failed, "
        f"{len(rows_only)} rows-only, sf_dir={sf_dir}"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
