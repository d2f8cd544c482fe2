"""Table profiling: per-column quality stats in ONE scan.

A 100 TB ingest pipeline gates every batch on a data-quality profile
(null rates, cardinalities, value ranges). The naive form runs one job
per column; this operator computes every column's stats inside a single
aggregate pass — one scan, one (tiny) shuffle of partial aggregates —
then unpivots the 1-row result into (column, metric…) rows with
``stack``, which is driver-free and constant-size.

Exact distinct counts are kept because the oracle gate needs exactness;
the 100 TB switch is ``approx_count_distinct`` (HLL, fixed-size partial
state instead of per-column distinct expansion) — same plan otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) — min/max rendered as strings so mixed-type
    columns share one schema (native-type comparison happens first;
    only the final scalar is cast)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null{i}"),
            F.count_distinct(F.col(c)).alias(f"__dist{i}"),
            F.min(c).cast("string").alias(f"__min{i}"),
            F.max(c).cast("string").alias(f"__max{i}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null{i}, __dist{i}, __min{i}, __max{i}"
        for i, c in enumerate(cols)
    )
    return one.selectExpr(
        "__n as n_rows",
        f"stack({len(cols)}, {stack_args}) as "
        "(column, n_nulls, n_distinct, min_value, max_value)",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
