"""Differential harness: run a registry query on Spark and its oracle on
DuckDB over the same parquet tables, and compare the way the driver does
— row count, schema shape, order-insensitive values — with float
tolerance on top so we catch real semantic drift, not summation-order
noise.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

from nabatshy_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _norm(v):
    # NOTE: deliberately NO date→datetime promotion: the driver's
    # value-hash compares raw stringified values, so a query whose
    # Spark side emits TIMESTAMP where the oracle emits DATE (e.g.
    # date_trunc('week') — DATE in DuckDB, timestamp in Spark) must
    # FAIL here too, not be papered over (caught live in round 2:
    # weekly_revenue_wow passed this harness and failed the driver
    # simulation until both sides cast to DATE).
    if isinstance(v, datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _sort_key(row):
    return tuple(str(v) for v in row)


def compare(spark_df, sql: str, sf_dir: str, rel_tol: float = 1e-9, abs_tol: float = 1e-9):
    """Return (ok, message). Columns are matched by sorted name, rows
    compared order-insensitively (sorted by stringified values)."""
    o_cols, o_rows = run_oracle(sql, sf_dir)
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(s_cols) != sorted(o_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"

    col_order = sorted(s_cols)
    s_idx = [s_cols.index(c) for c in col_order]
    o_idx = [o_cols.index(c) for c in col_order]
    s_sorted = sorted(
        (tuple(_norm(r[i]) for i in s_idx) for r in s_rows), key=_sort_key
    )
    o_sorted = sorted(
        (tuple(_norm(r[i]) for i in o_idx) for r in o_rows), key=_sort_key
    )
    for rn, (sr, orow) in enumerate(zip(s_sorted, o_sorted)):
        for cn, (sv, ov) in enumerate(zip(sr, orow)):
            # STRICT stringified equality, exactly like the driver's
            # value-hash — float tolerance here let summation-order
            # drift pass locally and fail externally (caught live
            # twice on round-boundary averages; the fix is decimal
            # sums or coarser rounding in the QUERY, not tolerance in
            # the harness).
            if str(sv) != str(ov):
                return False, (
                    f"value mismatch row {rn} col {col_order[cn]}: "
                    f"spark={sv!r} oracle={ov!r}"
                )
    return True, f"ok ({len(s_rows)} rows)"
