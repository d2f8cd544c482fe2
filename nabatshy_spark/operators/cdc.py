"""Change-data-capture style compaction (SURVEY §2.11 extension
surface): collapse an append-only event/upsert log to the latest
record per key — the standard "log → table" materialization every
ingest pipeline runs before serving or training on mutable entities.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: list[Column],
) -> DataFrame:
    """Keep exactly the newest row per key, newest defined by
    ``order_cols`` descending with the caller responsible for making
    the order total (e.g. ``[F.col("ts"), F.col("event_id")]`` —
    a unique tiebreaker makes the survivor deterministic and the
    operation idempotent under replays/retries).

    Scale shape: one hash shuffle on the key; Spark's
    WindowGroupLimit pushes the rn=1 limit into each sort, so a hot
    key never materializes its full history in one task's sort
    buffer. This beats ``groupBy(max(struct(...)))`` when rows are
    wide — the window carries the whole row without packing it into
    agg state.
    """
    w = Window.partitionBy(key_col).orderBy(*[c.desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    order_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an append-only
    change log: per key, consecutive runs of the same ``attr_col``
    value collapse into one VERSION with a validity interval
    [valid_from, valid_to) in epoch-µs (NULL valid_to ⇒ current).

    Classic gaps-and-islands: a change flag (value differs from its
    lag) cumulative-sums into a version id — two window passes and a
    version-grain aggregate, all on the same (key × time) partition
    order, so the log shuffles ONCE. Emitting epoch-µs keeps the
    interval columns engine-portable (timestamp stringification is
    the only cross-engine hazard here)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.select(
        F.col(key_col), us.alias("__us"), F.col(attr_col), F.col(order_col)
    )
    w = Window.partitionBy(key_col).orderBy("__us", order_col)
    changed = (
        F.lag(attr_col).over(w).isNull()
        | (F.col(attr_col) != F.lag(attr_col).over(w))
    ).cast("int")
    versioned = base.withColumn(
        "__vid",
        F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    versions = versioned.groupBy(key_col, "__vid").agg(
        F.first(attr_col).alias(attr_col),
        F.min("__us").alias("valid_from_us"),
        F.count("*").alias("n_events"),
    )
    wv = Window.partitionBy(key_col).orderBy("__vid")
    return (
        versions.withColumn("valid_to_us", F.lead("valid_from_us").over(wv))
        .withColumn("is_current", F.col("valid_to_us").isNull())
        .select(
            key_col,
            F.col("__vid").alias("version"),
            attr_col,
            "valid_from_us",
            "valid_to_us",
            "n_events",
            "is_current",
        )
    )
