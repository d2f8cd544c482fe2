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


def perceptual_dedup_stream(
    stream: DataFrame,
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Perceptual image dedup AT INGEST: hash each arriving image
    payload with dHash (operators/multimodal.image_dhash — a stateless
    Arrow-batched stage, streaming-safe) and keep the FIRST image per
    perceptual hash within the watermark horizon. Catches the ingest
    pattern exact keys cannot: the same creative re-exported at a
    different exposure/quality arrives minutes apart and byte/pixel
    identity sees two distinct rows, while the gradient-sign hash sees
    one. State is one entry per distinct dhash, expired by the
    watermark — bounded by the dedup window, not stream lifetime.

    Input schema: (doc_id long, payload binary, ``ts_col`` timestamp).
    Output: the surviving rows with their ``dhash`` attached;
    undecodable payloads are keyed by an error sentinel unique per
    doc, so poison rows pass through without deduping each other."""

    def batches(it):
        # Closure, not a module-level def: cloudpickle ships it by
        # VALUE so the external driver's executors don't need
        # /root/repo on sys.path (see sources/layout.py incident).
        import pandas as pd

        # ONE hash definition shared with the batch operator
        # (multimodal.image_dhash) — stream↔batch dedup equivalence
        # requires bit-exact parity, so the pipeline is never
        # duplicated here (ADVICE r7).
        from nabatshy_spark.operators.multimodal import dhash_hex

        for pdf in it:
            hashes = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    hashes.append(dhash_hex(payload))
                except Exception:
                    hashes.append(f"__err_{doc_id}")
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"],
                    "__event_ts": pdf["__event_ts"],
                    "dhash": hashes,
                }
            )
            yield out

    hashed = stream.select(
        "doc_id", "payload", F.col(ts_col).alias("__event_ts")
    ).mapInPandas(
        batches,
        schema="doc_id long, payload binary, __event_ts timestamp, dhash string",
    )
    return dedup_stream(hashed, ["dhash"], "__event_ts", watermark).withColumnRenamed(
        "__event_ts", ts_col
    )
