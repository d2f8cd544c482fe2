"""Differential harness: run a registry query on Spark and its oracle on
DuckDB over the same parquet tables, and compare EXACTLY the way the
external driver does — both sides canonicalized through **pandas**
(`spark_df.toPandas()` vs duckdb `con.execute(sql).df()`), rows sorted
on the raw frame, every cell stringified via `astype(str)`, then strict
equality.

Why pandas and not `fetchall()` Python objects: DuckDB's `sum(INTEGER)`
returns HUGEINT, which `fetchall()` yields as a plain Python int
(indistinguishable from Spark's bigint) but pandas renders as float64 —
so the stringified value is '6277.0' against Spark's '6277'.  Two
consecutive rounds a fetchall-based harness was declared
driver-identical and wasn't (text_search_and et al. passed locally,
failed externally).  Sorting happens on the RAW frame, like the driver,
so array-typed columns crash here too (pandas `sort_values` cannot
factorize list cells) instead of being silently papered over.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd

from nabatshy_spark.catalog import TABLES


def run_oracle_df(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        return con.execute(sql).df()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-identical canonicalization: columns ordered by sorted
    name, rows sorted on the raw (pre-stringify) frame, then every cell
    stringified.  No float tolerance, no type coercion beyond what
    pandas itself applies when materializing each engine's result."""
    cols = sorted(df.columns)
    df = df.loc[:, cols]
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort")
    return df.reset_index(drop=True).astype(str)


def compare(spark_df, sql: str, sf_dir: str):
    """Return (ok, message)."""
    o_df = run_oracle_df(sql, sf_dir)
    s_df = spark_df.toPandas()

    if sorted(s_df.columns) != sorted(o_df.columns):
        return False, (
            f"schema mismatch: spark={sorted(s_df.columns)} "
            f"oracle={sorted(o_df.columns)}"
        )
    if len(s_df) != len(o_df):
        return False, f"row count mismatch: spark={len(s_df)} oracle={len(o_df)}"

    try:
        s_c = _canon(s_df)
    except TypeError as e:
        return False, f"spark result not canonicalizable (driver would crash): {e}"
    try:
        o_c = _canon(o_df)
    except TypeError as e:
        return False, f"oracle result not canonicalizable (driver would crash): {e}"

    if s_c.equals(o_c):
        return True, f"ok ({len(s_df)} rows)"

    for col in s_c.columns:
        neq = s_c[col].to_numpy() != o_c[col].to_numpy()
        if neq.any():
            rn = int(neq.argmax())
            return False, (
                f"value mismatch row {rn} col {col}: "
                f"spark={s_c[col].iloc[rn]!r} oracle={o_c[col].iloc[rn]!r} "
                f"(spark dtype={s_df[col].dtype}, oracle dtype={o_df[col].dtype})"
            )
    return False, "frames differ but no cell mismatch found (dtype-level divergence)"
