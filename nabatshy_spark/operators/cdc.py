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
