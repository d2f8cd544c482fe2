"""Watermarked streaming pre-aggregation (SURVEY §2.9, "optional —
beyond parity"): materialize the 15-bucket style time series
incrementally instead of recomputing it per query.

The reference recomputes every dashboard series from the raw table on
each request (api/service.go:1341-1428). At 100 TB that's the wrong
trade: a streaming aggregation with a watermark maintains per-bucket
partials in state, emits finalized buckets once late data can no
longer arrive, and the dashboard reads the tiny rollup table instead.

Late-data policy (which the reference lacks entirely): events later
than the watermark delay are dropped from the rollup — an explicit,
documented bound instead of silent recompute drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def bucketed_rollup(
    spans: DataFrame,
    bucket_seconds: int = 60,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming DataFrame of per-(bucket, endpoint) rollups.

    ``spans`` must be a *streaming* frame with the wide span schema.
    Bucketing uses the same floor-epoch arithmetic as the batch path
    (T2/T4), expressed through an event-time timestamp column so the
    watermark applies.
    """
    with_ts = spans.withColumn(
        "__ts", F.timestamp_micros(F.expr("start_time_unix_nano div 1000"))
    ).withWatermark("__ts", watermark)
    return (
        with_ts.groupBy(
            # group by the window struct itself — projecting .start
            # inside groupBy severs the watermark linkage and append
            # mode is rejected
            F.window("__ts", f"{bucket_seconds} seconds").alias("__w"),
            F.col("name"),
        )
        .agg(
            F.count("*").alias("n"),
            F.avg(F.col("duration_ns") / F.lit(1_000_000.0)).alias("avg_ms"),
            F.max(F.col("duration_ns") / F.lit(1_000_000.0)).alias("max_ms"),
        )
        .select(
            F.col("__w").getField("start").alias("bucket"),
            "name",
            "n",
            "avg_ms",
            "max_ms",
        )
    )


def start_rollup_to_memory(
    rollup: DataFrame, query_name: str = "span_rollup"
) -> StreamingQuery:
    """Append-mode sink (buckets emit once finalized past the
    watermark). Memory sink for tests; production would write a
    partitioned rollup table via foreachBatch."""
    return (
        rollup.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
