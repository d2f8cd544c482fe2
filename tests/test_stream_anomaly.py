"""Streaming z-score anomaly detection (applyInPandasWithState) —
flags must match an offline Welford replay of the same chunk order."""

from __future__ import annotations

import datetime as dt
import math
import shutil

from nabatshy_spark.streaming.anomaly import anomaly_stream

T0 = dt.datetime(2024, 1, 1)


def _welford_replay(chunks, z=3.0, min_obs=5):
    stats = {}
    flags = []
    for chunk in chunks:
        for uid, ts, v in sorted(chunk, key=lambda r: (r[0], r[1])):
            n, mean, m2 = stats.get(uid, (0, 0.0, 0.0))
            if n >= min_obs:
                sd = math.sqrt(m2 / n)
                if sd > 0 and abs(v - mean) > z * sd:
                    flags.append((uid, ts, v, round((v - mean) / sd, 6)))
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
            stats[uid] = (n, mean, m2)
    return flags


def test_streaming_anomaly_matches_welford_replay(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    schema = "user_id long, ts timestamp, value double"

    base = [
        (1, T0 + dt.timedelta(minutes=i), 10.0 + (i % 3))  # sd ≈ 0.8
        for i in range(8)
    ]
    spike = [(1, T0 + dt.timedelta(minutes=20), 100.0)]  # >> 3σ
    calm2 = [(2, T0 + dt.timedelta(minutes=i), 5.0 + (i % 2)) for i in range(6)]
    chunks = [base + calm2, spike + [(2, T0 + dt.timedelta(minutes=30), 5.5)]]

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        anomaly_stream(stream, z=3.0, min_obs=5)
        .writeStream.format("memory")
        .queryName("anomalies")
        .outputMode("append")
        .start()
    )
    try:
        for i, chunk in enumerate(chunks):
            staged = tmp_path / f"stage{i}"
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                str(staged), mode="overwrite"
            )
            shutil.copy(
                next(staged.glob("part-*.parquet")), src / f"chunk{i}.parquet"
            )
            q.processAllAvailable()
        got = {
            (r.user_id, r.ts, r.value, r.zscore)
            for r in spark.table("anomalies").collect()
        }
    finally:
        q.stop()

    want = set(_welford_replay(chunks))
    assert got == want
    # exactly the planted spike is flagged
    assert {(u, v) for u, _, v, _ in got} == {(1, 100.0)}
