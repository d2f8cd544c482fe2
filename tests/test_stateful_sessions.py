"""Streaming stateful sessionization (applyInPandasWithState) — closed
sessions must match the batch sessionizer on the same data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nabatshy_spark.streaming.stateful import sessionize_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(*specs):
    return [(uid, T0 + dt.timedelta(minutes=m)) for uid, m in specs]


def test_streaming_sessions_match_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    schema = "user_id long, ts timestamp"

    # chunk 1: u1 has two events 10min apart (one session), u2 one event
    chunk1 = _rows((1, 0), (1, 10), (2, 5))
    # chunk 2: 10h later — advances the watermark far past chunk-1
    # sessions' end + gap, and opens new (still-unclosed) sessions
    chunk2 = _rows((1, 600), (2, 610))
    # chunk 3: later still — the batch whose watermark (from chunk 2)
    # actually fires the chunk-1 timeouts
    chunk3 = _rows((1, 1300))

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .start()
    )
    try:
        import shutil

        for i, chunk in enumerate([chunk1, chunk2, chunk3]):
            staged = tmp_path / f"stage{i}"
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                str(staged), mode="overwrite"
            )
            part = next(staged.glob("part-*.parquet"))
            shutil.copy(part, src / f"chunk{i}.parquet")
            q.processAllAvailable()
        got = {
            (r.user_id, r.session_start, r.session_end, r.n_events, r.duration_secs)
            for r in spark.table("closed_sessions").collect()
        }
    finally:
        q.stop()

    # batch twin over chunks 1+2: sessions that have provably closed
    # (end + gap < final watermark = chunk-3 max ts − 1h; Spark runs an
    # extra no-data micro-batch to fire timeouts under the advanced
    # watermark, so closure catches up to it)
    from nabatshy_spark.operators.sessions import session_stats

    batch = spark.createDataFrame(chunk1 + chunk2, schema)
    wm = T0 + dt.timedelta(minutes=1300) - dt.timedelta(hours=1)
    expected = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.duration_secs)
        for r in session_stats(batch, gap_minutes=30)
        .filter(F.col("session_end") + F.expr("INTERVAL 30 MINUTES") < F.lit(wm))
        .collect()
    }
    assert expected == {
        (1, T0, T0 + dt.timedelta(minutes=10), 2, 600),
        (2, T0 + dt.timedelta(minutes=5), T0 + dt.timedelta(minutes=5), 1, 0),
        (1, T0 + dt.timedelta(minutes=600), T0 + dt.timedelta(minutes=600), 1, 0),
        (2, T0 + dt.timedelta(minutes=610), T0 + dt.timedelta(minutes=610), 1, 0),
    }
    assert got == expected


def test_builtin_session_window_matches_batch_gaps(spark, tmp_path):
    """The declarative session_window rollup must produce the same
    session boundaries as the batch gap-based sessionizer on the same
    data (closed sessions only; gap 30m)."""
    from pyspark.sql import functions as F

    from nabatshy_spark.operators.sessions import sessionize
    from nabatshy_spark.streaming.preagg import session_window_rollup

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    )
    src = str(tmp_path / "sess_src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        session_window_rollup(stream, "user_id", "ts", gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in spark.table("sess_out").collect()
    }
    batch = sessionize(ev, gap_minutes=30)
    want = {
        (r.user_id, r.session_start, r.n_events)
        for r in batch.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }
    # the stream's watermark may hold back the final (unclosed)
    # sessions near max(ts); everything emitted must match batch
    assert got <= want
    assert len(got) >= 0.8 * len(want)
