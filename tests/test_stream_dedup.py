"""Streaming ingest dedup (§2.9 extension): a replayed batch must
come out exactly once; state stays bounded by the watermark."""

from __future__ import annotations

from pyspark.sql import functions as F

from nabatshy_spark.streaming.dedup import dedup_span_stream


def test_stream_dedup_replayed_batch_once(spark, tmp_path):
    wide = (
        spark.read.parquet("/root/repo/tests/data/spans.parquet")
        .filter(F.col("parent_span_id") == "")
        .limit(40)
    )
    src = str(tmp_path / "dup_src")
    # an at-least-once retry: the same 40 spans written twice as two
    # files — both land inside the watermark window
    wide.write.parquet(src)
    wide.write.mode("append").parquet(src)
    assert spark.read.parquet(src).count() == 80

    stream = spark.readStream.schema(wide.schema).parquet(src)
    deduped = dedup_span_stream(stream, watermark="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("stream_dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("stream_dedup_out")
    assert out.count() == 40, "each retried span survives exactly once"
    assert out.select("trace_id", "span_id").distinct().count() == 40
    assert out.columns == wide.columns
