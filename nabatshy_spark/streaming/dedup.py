"""Streaming ingest deduplication (SURVEY §2.9 extension surface).

The reference's collector is at-least-once with no dedup: a retried
OTLP POST inserts its spans twice (reference collector/controller.go:
28-95 acks only after insert, so a dropped ack ⇒ duplicate batch).
Batch-side `dedup_exact` repairs that after the fact; this operator
prevents it AT INGEST with bounded state: Spark's
``dropDuplicatesWithinWatermark`` keeps one row per key and expires a
key's dedup state once the watermark passes its event time.

Scale shape: state is a per-key entry in the state store, partitioned
by the dedup key — a retry storm dedups map-side within the shuffle
partition that owns the key, and the watermark bound means state size
tracks the RETRY WINDOW, not the stream's lifetime (the unbounded
alternative, plain ``dropDuplicates``, OOMs a 100 TB/day stream in
hours). Duplicates arriving later than the watermark delay fall back
to the batch dedup pass — the same explicit late-data policy as
preagg.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate rows (same ``key_cols``) arriving within the
    watermark horizon of each other. ``ts_col`` must be the event-time
    timestamp column the watermark tracks."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def dedup_span_stream(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Wide-span specialization: identity is (trace_id, span_id) — the
    OTLP primary key — with event time from start_time_unix_nano."""
    with_ts = stream.withColumn(
        "__ts", F.timestamp_micros(F.expr("start_time_unix_nano div 1000"))
    )
    return dedup_stream(with_ts, ["trace_id", "span_id"], "__ts", watermark).drop(
        "__ts"
    )
