"""Statistical operators over fact tables: rolling time-range
aggregates, z-score outliers, equi-width histograms, correlation — the
profiling/monitoring layer a pipeline runs next to ingest (the
reference exposes only fixed-bucket series, api/service.go:1341-1428;
these are the standard generalizations).

All pure DataFrame plans: one shuffle each (the window partition or
the group-by), aggregation JVM-side, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_range_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int,
) -> DataFrame:
    """Per row: count/sum of the key's rows in the trailing
    ``window_seconds`` (inclusive of the current row) — the
    RANGE-frame window (§2.8) behind rate limiting, rolling quotas and
    trailing-average features. One hash shuffle on the key; within a
    partition Spark keeps a sliding frame over the sorted rows, so
    cost is O(rows), not O(rows × frame)."""
    sec = F.unix_micros(F.col(ts_col).cast("timestamp")) / 1_000_000.0
    w = (
        Window.partitionBy(key_col)
        .orderBy(sec)
        .rangeBetween(-window_seconds, 0)
    )
    return df.select(
        F.col(key_col),
        F.col(ts_col),
        F.count("*").over(w).alias("n_trailing"),
        F.round(F.sum(value_col).over(w), 4).alias("sum_trailing"),
    )


def zscore_outliers(
    df: DataFrame, group_col: str, value_col: str, threshold: float = 2.5
) -> DataFrame:
    """Rows whose value deviates more than ``threshold`` sample
    standard deviations from their group mean. Group moments come from
    an aggregate + broadcast-back join (NOT an unbounded window — a
    whole-partition window frame would buffer each group in one task,
    while the agg is partial/map-side combined and its result is
    group-cardinality-sized)."""
    moments = df.groupBy(group_col).agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_samp(value_col).alias("__sd"),
    )
    z = (F.col(value_col) - F.col("__mu")) / F.col("__sd")
    return (
        df.join(F.broadcast(moments), group_col)
        .filter(F.col("__sd") > 0)
        .withColumn("zscore", F.round(z, 6))
        .filter(F.abs(F.col("zscore")) > threshold)
        .drop("__mu", "__sd")
    )


def equi_width_histogram(
    df: DataFrame, value_col: str, buckets: int = 20
) -> DataFrame:
    """Equi-width histogram: global min/max (one O(1)-output agg,
    broadcast back as a 1-row join) then width_bucket per row and a
    bucket count — two scans, no sort, no driver loop. The max value
    lands in the top bucket (width_bucket's half-open upper edge is
    folded down) so counts sum to n."""
    bounds = df.agg(
        F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi")
    )
    width = (F.col("__hi") - F.col("__lo")) / buckets
    # explicit floor arithmetic (≡ width_bucket for in-range values)
    # so an oracle can replicate the exact same FP operations
    b = F.least(
        F.floor((F.col(value_col) - F.col("__lo")) / width).cast("int") + 1,
        F.lit(buckets),
    )
    return (
        df.join(F.broadcast(bounds))
        .select(
            b.alias("bucket"),
            F.round(F.col("__lo") + (b - 1) * width, 4).alias("bucket_lo"),
            F.round(F.col("__lo") + b * width, 4).alias("bucket_hi"),
        )
        .groupBy("bucket", "bucket_lo", "bucket_hi")
        .agg(F.count("*").alias("n"))
    )


def correlations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation over ``cols`` in ONE aggregate
    pass (all pairs as expressions in a single agg — one scan, one
    tiny shuffle of the combined moment state), unpivoted to
    (col_a, col_b, corr) rows."""
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    aggs = [
        F.round(F.corr(a, b), 6).alias(f"__c{i}") for i, (a, b) in enumerate(pairs)
    ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', __c{i}" for i, (a, b) in enumerate(pairs)
    )
    return one.selectExpr(
        f"stack({len(pairs)}, {stack_args}) as (col_a, col_b, corr)"
    )


def winsorize(
    df: DataFrame, value_col: str, lo_p: float = 0.01, hi_p: float = 0.99
) -> DataFrame:
    """Winsorization: clip ``value_col`` to its [lo_p, hi_p] exact
    percentiles — the outlier-taming pre-pass before scaling/training.
    Bounds come from ONE scalar aggregate broadcast back (two numbers;
    never a sort of the data); the clip is codegen'd least/greatest.
    At 100 TB the same-alias switch is approx_percentile bounds."""
    bounds = df.agg(
        F.expr(f"percentile({value_col}, {lo_p})").alias("__lo"),
        F.expr(f"percentile({value_col}, {hi_p})").alias("__hi"),
    )
    return (
        df.join(F.broadcast(bounds))
        .withColumn(
            f"{value_col}_winsorized",
            F.round(
                F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
                6,
            ),
        )
        .drop("__lo", "__hi")
    )


def ewma_last(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    order_col: str,
    depth: int = 8,
) -> DataFrame:
    """Per-key exponentially-weighted moving average (α=1/2) of the
    last ``depth`` values, reported at each key's latest row — the
    classic "current smoothed level" feature for monitoring/features.

    Implemented as ``depth`` explicit ``lag`` terms over one window
    (no recursion — Spark has no recursive per-row state, and a bounded
    lag pyramid is the scale-safe shape: one partition-local pass).
    Cross-engine determinism by construction: weights are powers of
    two (exact doubles) and the weighted sum is a FIXED left-to-right
    expression tree, so Spark and DuckDB compute identical IEEE bits —
    no aggregate reassociation anywhere.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    out = df.select(
        key_col, ts_col, order_col, F.col(val_col).cast("double").alias("__v0")
    )
    for j in range(1, depth):
        out = out.withColumn(f"__v{j}", F.lag("__v0", j).over(w))
    num = " + ".join(
        f"coalesce(__v{j}, 0.0d) * {0.5 ** j!r}d" for j in range(depth)
    )
    den = " + ".join(
        f"(CASE WHEN __v{j} IS NULL THEN 0.0d ELSE {0.5 ** j!r}d END)"
        for j in range(depth)
    )
    rn = F.row_number().over(
        Window.partitionBy(key_col).orderBy(
            F.col(ts_col).desc(), F.col(order_col).desc()
        )
    )
    # try_divide: a key whose visible lag window is entirely NULL has
    # denominator 0 — the smoothed level is undefined (NULL), not a
    # crash (ANSI mode raises DIVIDE_BY_ZERO on plain `/`).
    scored = (
        out.withColumn("__ewma", F.expr(f"try_divide(({num}), ({den}))"))
        .withColumn("__rn", rn)
        .withColumn(
            "__n", F.count("*").over(Window.partitionBy(key_col))
        )
    )
    return (
        scored.filter(F.col("__rn") == 1)
        .select(
            key_col,
            F.col("__n").alias("n_events"),
            F.round("__ewma", 6).alias("ewma_value"),
        )
        .orderBy(key_col)
    )
