"""Span table sink (SURVEY §2.1 S7): partitioned, append-only parquet.

The reference's storage contract is ClickHouse MergeTree ORDER BY
(start_time_unix_nano, trace_id) (db/clickhouse.go:107-109) — i.e.
time-ordered storage enabling range pruning. The Spark equivalent:

- directory partitioning on an hour bucket of the span start time →
  partition pruning for the time-range predicates (P3/P4);
- ``sortWithinPartitions(start, trace_id)`` before write → parquet
  row-group min/max on both keys, so point lookups and sub-hour
  ranges skip row groups.

At 100 TB the hour bucket yields manageable partition counts
(24×365 ≈ 9k dirs/year, each internally parallel); switch the bucket
to day + add trace-id bucketing if span volume per hour exceeds a few
GB per file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PARTITION_COL = "ingest_hour"


def with_partition_col(df: DataFrame) -> DataFrame:
    return df.withColumn(
        PARTITION_COL,
        F.date_format(
            F.timestamp_micros(F.expr("start_time_unix_nano div 1000")),
            "yyyy-MM-dd-HH",
        ),
    )


def append_spans(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Append a batch of wide span rows, time-partitioned and
    row-group-sorted. At-least-once (no dedup), matching the
    reference's replay behavior (SURVEY §2.9).

    ``fmt`` selects the columnar file format: ``parquet`` (default) or
    ``orc`` — both stripe/row-group indexed, so the sort-within-
    partition min/max pruning works identically; ORC is the drop-in
    for Hive-ecosystem consumers."""
    (
        with_partition_col(df)
        .sortWithinPartitions("start_time_unix_nano", "trace_id")
        .write.mode("append")
        .partitionBy(PARTITION_COL)
        .format(fmt)
        .save(path)
    )


def read_spans(spark, path: str, fmt: str = "parquet") -> DataFrame:
    df = spark.read.format(fmt).load(path)
    return df.drop(PARTITION_COL) if PARTITION_COL in df.columns else df


def idempotent_append(df: DataFrame, path: str, batch_id: int) -> bool:
    """Exactly-once batch append: the write is keyed by ``batch_id``
    and lands via staging-then-rename, so a replayed micro-batch (the
    at-least-once retry the reference simply re-inserts,
    collector/controller.go:28-95) is a no-op instead of a duplicate.

    This is the standard idempotent `foreachBatch` sink pattern:
    Structured Streaming replays a failed batch with the SAME
    batch_id, so "directory batch=<id> committed ⇒ skip" upgrades the
    pipeline to effectively-exactly-once without any dedup state. The
    rename is atomic per batch directory; a crash mid-write leaves
    only a staging dir that the next replay overwrites. Returns True
    if this call performed the write, False for a replay no-op.

    Use as: ``stream.writeStream.foreachBatch(
    lambda b, i: idempotent_append(b, path, i))``. Readers
    ``spark.read.parquet(path + "/batch=*")`` or just ``path`` —
    the batch key is a plain partition column.
    """
    import os
    import shutil

    final = os.path.join(path, f"batch={batch_id}")
    if os.path.exists(os.path.join(final, "_SUCCESS")):
        return False
    staging = os.path.join(path, f".staging-batch-{batch_id}")
    shutil.rmtree(staging, ignore_errors=True)
    (
        with_partition_col(df)
        .sortWithinPartitions("start_time_unix_nano", "trace_id")
        .write.mode("overwrite")
        .parquet(staging)
    )
    os.makedirs(path, exist_ok=True)
    try:
        os.rename(staging, final)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)  # lost a concurrent race
        return False
    return True


def backfill_hours(df: DataFrame, path: str, hours: list[str]) -> None:
    """Recompute specific hour partitions in place — the operational
    backfill a 100 TB table needs when late/corrected data arrives for
    a window (the reference re-inserts and relies on MergeTree
    collapse; here the partition IS the replacement unit).

    Dynamic partition overwrite (`partitionOverwriteMode=dynamic`)
    replaces ONLY the hour directories present in ``df`` — every other
    partition is untouched, so concurrent readers of other hours are
    unaffected and a re-run of the same backfill is idempotent. The
    ``hours`` list is asserted against the batch to prevent a mis-built
    frame from silently clobbering extra partitions.
    """
    batch = with_partition_col(df)
    found = {r[0] for r in batch.select(PARTITION_COL).distinct().collect()}
    extra = found - set(hours)
    if extra:
        raise ValueError(f"backfill batch contains undeclared hours: {sorted(extra)}")
    (
        batch.sortWithinPartitions("start_time_unix_nano", "trace_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(PARTITION_COL)
        .parquet(path)
    )
